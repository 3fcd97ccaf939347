package graft

import org.apache.spark.sql.functions._

import graft.streaming.Downsampler.RawSample
import graft.streaming.LatestView

class ArchiveSpec extends SparkSpec {

  private val S = 1000000L

  private def samplesDf = {
    val sp = spark
    import sp.implicits._
    Seq(
      ("pv1", 10 * S, "1.0"), ("pv1", 20 * S, "2.0"), ("pv1", 30 * S, "3.0"),
      ("pv1", 40 * S, "4.0"), ("pv2", 15 * S, "a")).toDF("pvname", "tsUs", "value")
  }

  private def cacheDf = {
    val sp = spark
    import sp.implicits._
    Seq(("pv1", 99 * S, "9.9"), ("pv2", 98 * S, "z")).toDF("pvname", "tsUs", "value")
  }

  test("getData: range + one point before tmin + current cache value (Q3)") {
    val a = new Archive(samplesDf, Some(cacheDf))
    val plain = a.getData("pv1", 25 * S, 45 * S)
      .collect().map(r => (r.getAs[Long]("tsUs"), r.getAs[String]("value")))
    // 20s is the early point before tmin=25s; 30/40 in range
    assert(plain.toSeq == Seq((20 * S, "2.0"), (30 * S, "3.0"), (40 * S, "4.0")))

    val withCur = a.getData("pv1", 25 * S, 45 * S, withCurrent = Some(true), nowUs = 50 * S)
      .collect().map(r => (r.getAs[Long]("tsUs"), r.getAs[String]("value")))
    assert(withCur.toSeq == Seq((20 * S, "2.0"), (30 * S, "3.0"), (40 * S, "4.0"), (50 * S, "9.9")))
  }

  test("getData auto-enables with_current when tmax lands near now (archiver.py:139-146)") {
    val a = new Archive(samplesDf, Some(cacheDf))
    // t1 = 45s is within 60s of now = 50s -> live cache row joins in unasked
    val auto = a.getData("pv1", 25 * S, 45 * S, nowUs = 50 * S)
      .collect().map(_.getAs[Long]("tsUs"))
    assert(auto.toSeq == Seq(20 * S, 30 * S, 40 * S, 50 * S))
    // an historical window (t1 far from now) stays history-only
    val hist = a.getData("pv1", 25 * S, 45 * S, nowUs = 500 * S)
      .collect().map(_.getAs[Long]("tsUs"))
    assert(hist.toSeq == Seq(20 * S, 30 * S, 40 * S))
    // Some(false) forces it off even at the live edge
    val forced = a.getData("pv1", 25 * S, 45 * S, withCurrent = Some(false), nowUs = 50 * S)
      .collect().map(_.getAs[Long]("tsUs"))
    assert(forced.toSeq == Seq(20 * S, 30 * S, 40 * S))
  }

  test("valueAtTime returns the latest at-or-before row (Q2)") {
    val a = new Archive(samplesDf)
    val r = a.valueAtTime("pv1", 35 * S).collect()
    assert(r.length == 1 && r(0).getAs[Long]("tsUs") == 30 * S)
  }

  test("cacheSince without a cache frame derives one row per PV, deterministic on ts ties (P1)") {
    val sp = spark
    import sp.implicits._
    val dup = Seq( // pv1 has two rows at the same tsUs: value tie-break picks "b"
      ("pv1", 10 * S, "a"), ("pv1", 10 * S, "b"), ("pv2", 5 * S, "x"))
      .toDF("pvname", "tsUs", "value")
    val got = new Archive(dup).cacheSince(0L).collect()
      .map(r => (r.getAs[String]("pvname"), r.getAs[String]("value"))).sortBy(_._1)
    assert(got.toSeq == Seq(("pv1", "b"), ("pv2", "x")))
  }

  test("refreshDelta returns only recently-changed rows (Q6)") {
    val a = new Archive(samplesDf, Some(cacheDf))
    val d = a.refreshDelta(nowUs = 100 * S, ageUs = 1500000L * 1)
    assert(d.collect().map(_.getAs[String]("pvname")).toSet == Set("pv1"))
  }

  test("activity: trailing-window liveness counts, silent dimension PVs visible") {
    val sp = spark
    import sp.implicits._
    val samples = Seq(
      ("a", 95L, "1"), ("a", 99L, "2"), ("a", 100L, "3"), // 3 inside (90, 100]
      ("a", 80L, "0"),                                    // before the window
      ("b", 92L, "1"),                                    // 1 inside -> below min 2
      ("c", 101L, "1")                                    // after tUs -> excluded
    ).toDF("pvname", "tsUs", "value")
    val dim = Seq("a", "b", "c", "d").toDF("pvname")
    val got = new Archive(samples).activity(100L, 10L, 2L, Some(dim)).collect()
      .map(r => (r.getAs[String]("pvname"), r.getAs[Long]("n_recent"), r.getAs[Boolean]("alive")))
      .sortBy(_._1)
    assert(got.toSeq == Seq(("a", 3L, true), ("b", 1L, false),
      ("c", 0L, false), ("d", 0L, false)))
    // without a dimension, only PVs with in-window samples appear
    val bare = new Archive(samples).activity(100L, 10L, 2L).collect()
      .map(_.getAs[String]("pvname")).sorted
    assert(bare.toSeq == Seq("a", "b"))
  }

  test("Generic.getRows: where-map conjunction + order + limit (P3/P4)") {
    val sp = spark
    import sp.implicits._
    val df = Seq((1L, "a", 10), (2L, "a", 20), (3L, "b", 30)).toDF("id", "grp", "v")
    val rows = Generic.getRows(df, Map("grp" -> "a"), Some(("v", false))).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(2L, 1L))
    val one = Generic.getRows(df, Map("grp" -> "a"), Some(("v", false)), limitOne = true).collect()
    assert(one.map(_.getLong(0)).toSeq == Seq(2L))
    assert(df.where(Generic.handleWhere(3L)).collect().map(_.getLong(0)).toSeq == Seq(3L))
  }

  test("LatestView.latest keeps the newest row per PV (A1/S2)") {
    val sp = spark
    import sp.implicits._
    val ds = Seq(
      RawSample("p1", 10 * S, "1", "1"), RawSample("p1", 30 * S, "3", "3"),
      RawSample("p1", 20 * S, "2", "2"), RawSample("p2", 5 * S, "x", "x")).toDS()
    val got = LatestView.latest(ds).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).sortBy(_._1)
    assert(got.toSeq == Seq(("p1", 30 * S, "3"), ("p2", 5 * S, "x")))
  }

  test("LatestView as a streaming update-mode aggregation (T1/Q6)") {
    val sp = spark
    import sp.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = sp.sqlContext
    val input = MemoryStream[RawSample]
    val q = LatestView.latest(input.toDS())
      .writeStream.format("memory").queryName("latest_out").outputMode("complete").start()
    try {
      input.addData(RawSample("p1", 10 * S, "1", "1"), RawSample("p2", 5 * S, "x", "x"))
      q.processAllAvailable()
      input.addData(RawSample("p1", 30 * S, "3", "3"))
      q.processAllAvailable()
      val got = sp.table("latest_out").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getString(2))).sortBy(_._1)
      assert(got.toSeq == Seq(("p1", 30 * S, "3"), ("p2", 5 * S, "x")))
    } finally q.stop()
  }
}
