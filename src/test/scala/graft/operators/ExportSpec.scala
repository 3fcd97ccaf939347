package graft.operators

import graft.SparkSpec

class ExportSpec extends SparkSpec {

  test("asciiRows: `ts value date time` lines with hformat fixed width") {
    val sp = spark
    import sp.implicits._
    val df = Seq(
      (1704672000000000L, 185.22),
      (1704672065250000L, 1.1e-9))
      .toDF("tsUs", "dvalue")
    val lines = Export.asciiRows(df, "tsUs", "dvalue", hfLength = 12).as[String].collect()
    assert(lines(0) == "1704672000.000000  185.2200 20240108 000000")
    assert(lines(1) == "1704672065.250000  1.10000e-09 20240108 000105")
  }

  test("asciiHeader carries pv metadata + enum legend (webapp.py:293-311)") {
    val h = Export.asciiHeader("XX:shutter.VAL", "Shutter state", "enum",
      1704672000000000L, 1705881600000000L, 42L, Seq("Closed", "Open"))
    assert(h.contains("# pvname:     XX:shutter.VAL"))
    assert(h.contains("# time range: 2024-01-08 00:00:00 to 2024-01-22 00:00:00"))
    assert(h.contains("#    0: Closed"))
    assert(h.contains("#    1: Open"))
    assert(h.endsWith("# ts           value        date      time\n"))
  }

  test("saveRestore matches write_saverestore byte-for-byte (util.py:391-424)") {
    val vals = Seq("XX:m1.VAL" -> "1.5", "XX:s1.VAL" -> "Open")
    assert(Export.saveRestore(vals) == Seq(
      "# Plain Save/Restore script", "XX:m1.VAL  1.5", "XX:s1.VAL  Open"))
    assert(Export.saveRestore(vals, "idl", header = Seq("snapshot 1")) == Seq(
      "; IDL save restore script", "; snapshot 1",
      "s = caput('XX:m1.VAL', 1.5)", "s = caput('XX:s1.VAL', Open)"))
    assert(Export.saveRestore(vals, "python") == Seq(
      "#!/usr/bin/env python", "#  Python save restore script", "from epics import caput",
      "caput('XX:m1.VAL', 1.5)", "caput('XX:s1.VAL', Open)"))
  }
}
