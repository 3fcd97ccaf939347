package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Column-level function pack (F1-F13) evaluated through Spark. */
class ColumnFunctionsSpec extends SparkSpec {

  private def one(c: org.apache.spark.sql.Column): Any = {
    spark.range(1).select(c.as("r")).collect()(0).get(0)
  }

  test("normalizePvName appends .VAL only without a field suffix (F1)") {
    assert(one(PvFunctions.normalizePvName(lit("XX:m1"))) == "XX:m1.VAL")
    assert(one(PvFunctions.normalizePvName(lit("XX:m1.RBV"))) == "XX:m1.RBV")
    assert(one(PvFunctions.normalizePvName(lit("  XX:m1 ; drop"))) == "XX:m1.VAL")
  }

  test("cleanString strips ;/# tails and trims (F2)") {
    assert(one(PvFunctions.cleanString(lit("abc; DROP TABLE x"))) == "abc")
    assert(one(PvFunctions.cleanString(lit("hello # comment"))) == "hello")
  }

  test("cleanValue parses numbers incl. b'..' relics, null otherwise (F3)") {
    assert(one(PvFunctions.cleanValue(lit("1.25"))) == 1.25)
    assert(one(PvFunctions.cleanValue(lit("b'42.5'"))) == 42.5)
    assert(one(PvFunctions.cleanValue(lit("Open"))) == null)
  }

  test("tformat / ts2iso render UTC timestamps (F5/F8)") {
    assert(one(PvFunctions.tformat(lit(1704717015L))) == "2024-Jan-08 12:30:15")
    assert(one(PvFunctions.ts2iso(lit(1704717015250000L))) == "2024-01-08 12:30:15.250")
  }

  test("charArrayAsString decodes int waveforms up to NUL (F9)") {
    assert(one(PvFunctions.charArrayAsString(
      array(lit(72), lit(105), lit(0), lit(88)))) == "Hi")
    assert(one(PvFunctions.charArrayAsString(array(lit(79), lit(107)))) == "Ok")
  }

  test("enumLabel resolves ordinal through a per-PV label map (F10)") {
    val labels = map(lit("XX:sh"), array(lit("Closed"), lit("Open")))
    assert(one(PvFunctions.enumLabel(labels, lit("XX:sh"), lit(1))) == "Open")
    assert(one(PvFunctions.enumLabel(labels, lit("XX:sh"), lit(0))) == "Closed")
  }

  test("enumLabel degrades to null on bad input instead of throwing or wrapping (F10, cache.py:171-178)") {
    val labels = map(lit("XX:sh"), array(lit("Closed"), lit("Open")))
    // missing key, out-of-range ordinal, non-integral ordinal: all null
    assert(one(PvFunctions.enumLabel(labels, lit("YY:zz"), lit(1)).isNull) == true)
    assert(one(PvFunctions.enumLabel(labels, lit("XX:sh"), lit(5)).isNull) == true)
    assert(one(PvFunctions.enumLabel(labels, lit("XX:sh"), lit("junk")).isNull) == true)
    // ordinal -1 maps to array index 0 (INVALID_INDEX_OF_ZERO even under
    // try_element_at) and -2 to end-relative index -1 (the LAST label):
    // both must degrade to null, not throw or wrap around
    assert(one(PvFunctions.enumLabel(labels, lit("XX:sh"), lit(-1)).isNull) == true)
    assert(one(PvFunctions.enumLabel(labels, lit("XX:sh"), lit(-2)).isNull) == true)
  }

  test("yesNo: int(float(v)) 0/1 -> No/Yes, everything else Unknown (F13, WebStatus.py:87-94)") {
    assert(one(PvFunctions.yesNo(lit(0))) == "No")
    assert(one(PvFunctions.yesNo(lit(1))) == "Yes")
    assert(one(PvFunctions.yesNo(lit("1.0"))) == "Yes") // int(float("1.0")) == 1
    assert(one(PvFunctions.yesNo(lit("0.7"))) == "No") // truncation toward zero
    assert(one(PvFunctions.yesNo(lit(7))) == "Unknown") // reference default
    assert(one(PvFunctions.yesNo(lit("Open"))) == "Unknown") // ValueError path, no ANSI throw
  }

  test("timehash drops the 0x prefix and last hex digit like the reference (F12)") {
    // hex(17047170150000) = 'f8143a64ff0' (11 digits) -> first 10 kept
    val full = java.lang.Long.toHexString(17047170150000L)
    assert(one(PvFunctions.timehash(lit(1704717015L))) == full.dropRight(1))
  }

  test("validPvName whitelists the reference charset (P5)") {
    assert(one(PvFunctions.validPvName(lit("XX:m1.VAL"))) == true)
    assert(one(PvFunctions.validPvName(lit("bad name with spaces"))) == false)
  }

  test("hashname UDF matches the driver-side function (F11)") {
    val got = spark.range(1).select(GraftUdfs.hashnameCol(lit("XX:m1.VAL"))).collect()(0).getInt(0)
    assert(got == PvFunctions.hashname("XX:m1.VAL"))
  }
}
