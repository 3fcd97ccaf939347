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

  test("alignedRows: hand-derived golden line (S11, scripts/get_pvarch:138-223)") {
    val sp = spark
    import sp.implicits._
    // hand derivation for hformat(100123.0, 12): exponent 5 -> 'f' form,
    // prec (12-7)+4-5 = 4 -> ' 100123.0000' (exactly 12 wide), trailing
    // '000' trim -> ' 100123.0'; each field keeps its one leading space,
    // so concat_ws(" ") yields TWO spaces between fields. This pins the
    // rendering independently of the DuckDB oracle (the one defect class
    // a two-sided hash match cannot see is a shared mis-derivation)
    val df = Seq((1705017600000000L, 100123.0, 100456.0, 107890.0))
      .toDF("tsUs", "click", "purchase", "view")
    val lines = Export.alignedRows(df, "tsUs", Seq("click", "purchase", "view"))
      .as[String].collect()
    assert(lines.toSeq == Seq(
      "1705017600.000000  100123.0  100456.0  107890.0"))
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

  test("stringPvTable decodes char-array waveforms to (iso, value) rows (Q5)") {
    val sp = spark
    import sp.implicits._
    // "Open" + NUL + junk: F9 must stop at the NUL
    val df = Seq(
      (1704672000000000L, Seq(79, 112, 101, 110, 0, 88)),
      (1704672001500000L, Seq(83, 104, 117, 116))).toDF("tsUs", "wave")
    val got = Export.stringPvTable(df, "tsUs", "wave")
      .collect().map(r => (r.getAs[String]("iso"), r.getAs[String]("value")))
    assert(got.toSeq == Seq(
      ("2024-01-08 00:00:00.000", "Open"),
      ("2024-01-08 00:00:01.500", "Shut")))
  }

  test("plotTrace culls and emits iso-x/numeric-y plot frames (Q4)") {
    val sp = spark
    import sp.implicits._
    val df = (0 until 100).map(i => (i.toLong * 1000000L, i.toLong, i * 1.0))
      .toDF("tsUs", "id", "v")
    val got = Export.plotTrace(df, "tsUs", "id", "v", sample = 10, percent = 10.0).collect()
    // every 10th row + the <p10 / >p90 outliers, x formatted, y double
    assert(got.length > 10 && got.length < 40)
    assert(got.head.getAs[String]("x").startsWith("1970-01-01 00:00:00"))
    assert(got.map(_.getAs[Double]("y")).toSeq == got.map(_.getAs[Double]("y")).toSeq.sorted)
  }

  test("autoYLog: documented percentile-spread rule (web_utils.py:113-127)") {
    val sp = spark
    import sp.implicits._
    // 4 decades of positive spread -> log
    assert(Export.autoYLog((1 to 1000).map(i => math.pow(10, i % 5 * 1.0)).toDF("v"), "v"))
    // narrow spread -> linear
    assert(!Export.autoYLog((1 to 1000).map(_.toDouble % 7 + 1).toDF("v"), "v"))
    // any negative value -> linear
    assert(!Export.autoYLog(Seq(-1.0, 10.0, 1e6).toDF("v"), "v"))
  }

  test("lttb: endpoints kept, one point per bucket, spike survives, small keys pass through") {
    val sp = spark
    import sp.implicits._
    // key "a": 100 points on a flat line except a spike at ts=55; 4 buckets
    // over (0, 99) -> <= 6 points out, spike MUST be among them (largest
    // triangle in its bucket). key "b": 3 points -> pass-through.
    val rows = (0 until 100).map(i => ("a", i.toLong, if (i == 55) 50.0 else 1.0)) ++
      Seq(("b", 1L, 1.0), ("b", 2L, 2.0), ("b", 3L, 3.0))
    val df = rows.toDF("k", "ts", "v")
    val got = Export.lttb(df, "k", "ts", "v", buckets = 4).collect()
      .map(r => (r.getAs[String]("k"), r.getAs[Long]("ts"), r.getAs[Double]("v")))
    val a = got.filter(_._1 == "a")
    assert(a.length == 6) // first + last + one per non-empty bucket
    assert(a.exists(p => p._2 == 0L) && a.exists(p => p._2 == 99L)) // endpoints
    assert(a.exists(p => p._2 == 55L && p._3 == 50.0)) // the spike survives
    val b = got.filter(_._1 == "b")
    assert(b.length == 3) // <= buckets+2 points: untouched
  }

  test("lttb: duplicate instants collapse to max before selection") {
    val sp = spark
    import sp.implicits._
    val rows = (0 until 50).map(i => ("a", i.toLong, 1.0)) :+ ("a", 25L, 9.0)
    val got = Export.lttb(rows.toDF("k", "ts", "v"), "k", "ts", "v", buckets = 4)
      .collect().map(r => (r.getAs[Long]("ts"), r.getAs[Double]("v"))).toMap
    assert(got(25L) == 9.0) // the deduped max, and selected as its bucket's point
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
