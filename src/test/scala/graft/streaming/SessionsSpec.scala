package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.TimeSeries

class SessionsSpec extends SparkSpec {

  private val S = 1000000L // one second in micros

  test("closed sessions match the batch rollup once the watermark passes") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    val base = 1700000000000000L
    // key a: two sessions (gap 10 s, events 3 s apart then a 30 s hole);
    // key b: one session; no event lands exactly on a gap boundary
    val evs = Seq(
      ("a", base), ("a", base + 3 * S), ("a", base + 5 * S),
      ("a", base + 40 * S), ("a", base + 42 * S),
      ("b", base + 1 * S))
    val input = MemoryStream[(String, Long)]
    val out = Sessions.streaming(input.toDF().toDF("k", "t"), "k", "t",
      gapUs = 10 * S, watermarkDelayUs = 5 * S)
    val q = out.writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    try {
      input.addData(evs)
      q.processAllAvailable()
      // advance the watermark far past every session close
      input.addData(("z", base + 1000 * S))
      q.processAllAvailable()
      input.addData(("z", base + 2000 * S))
      q.processAllAvailable()
      val got = sp.table("sess").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      val batch = TimeSeries.sessionStats(
        evs.toDF("k", "t"), "k", "t", gapUs = 10 * S)
        .collect()
        .map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSet
      // the z heartbeat key's own (possibly still-open) sessions excluded
      assert(got.filter(_._1 != "z") == batch.filter(_._1 != "z"))
      assert(got.filter(_._1 != "z").size == 3)
    } finally q.stop()
  }

  test("an event exactly on the gap boundary continues the session (batch parity)") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    val base = 1700000000000000L
    val evs = Seq(("a", base), ("a", base + 10 * S)) // exactly gap apart
    val input = MemoryStream[(String, Long)]
    val out = Sessions.streaming(input.toDF().toDF("k", "t"), "k", "t",
      gapUs = 10 * S, watermarkDelayUs = 5 * S)
    val q = out.writeStream.format("memory").queryName("sess_edge")
      .outputMode("append").start()
    try {
      input.addData(evs)
      q.processAllAvailable()
      input.addData(("z", base + 1000 * S))
      q.processAllAvailable()
      input.addData(("z", base + 2000 * S))
      q.processAllAvailable()
      val got = sp.table("sess_edge").collect()
        .filter(_.getString(0) == "a").map(_.getLong(3)).sorted.toSeq
      // session_window merges touching windows: one 2-event session,
      // exactly like the batch `> gapUs` rule
      assert(got == Seq(2L))
      val batch = TimeSeries.sessionStats(evs.toDF("k", "t"), "k", "t", 10 * S)
        .collect().map(_.getLong(4)).toSeq
      assert(batch == Seq(2L))
    } finally q.stop()
  }
}
