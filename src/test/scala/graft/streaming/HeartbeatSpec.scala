package graft.streaming

import graft.SparkSpec
import Downsampler.Sample
import Heartbeat._

class HeartbeatSpec extends SparkSpec {

  private val H = 3600L * 1000000L // 1h in us

  test("force intervals land in [13h, 21h) and are deterministic per (pv, k)") {
    (0 until 50).foreach { k =>
      val i = forceIntervalUs("XX:m1.VAL", k)
      assert(i >= MinForceUs && i < MinForceUs + SpanForceUs)
      assert(i == forceIntervalUs("XX:m1.VAL", k))
    }
    assert(forceIntervalUs("XX:m1.VAL", 0) != forceIntervalUs("XX:m2.VAL", 0))
  }

  test("silent gaps are filled so no gap exceeds 21h (>=1 sample/24h)") {
    val samples = Seq(
      Sample("pv", 0, "1.0", "1.0"),
      Sample("pv", 100 * H, "2.0", "2.0")) // 100h silence, then nothing to 200h
    val out = replayKey(samples, 200 * H)
    val all = (samples ++ out).sortBy(_.tsUs)
    all.sliding(2).foreach {
      case Seq(a, b) => assert(b.tsUs - a.tsUs < MinForceUs + SpanForceUs)
      case _ =>
    }
    // forced rows repeat the last real value
    assert(out.filter(_.tsUs < 100 * H).forall(_.value == "1.0"))
    assert(out.filter(_.tsUs > 100 * H).forall(_.value == "2.0"))
    assert(out.nonEmpty)
  }

  test("no heartbeat when data is dense") {
    val samples = (0 until 48).map(i => Sample("pv", i * 4 * H, i.toString, i.toString))
    assert(replayKey(samples, 48 * 4 * H).isEmpty)
  }

  test("streaming heartbeat re-emits the cached value for a quiet PV") {
    val sp = spark
    import sp.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = sp.sqlContext
    val input = MemoryStream[Sample]
    // force window shrunk to ~300-400ms so the timeout fires in-test
    val q = streaming(input.toDS(), minUs = 300000L, spanUs = 100000L)
      .writeStream.format("memory").queryName("hb_out").outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(100L))
      .start()
    try {
      input.addData(Sample("HB:pv.VAL", 1000000L, "7.5", "7.5"))
      val deadline = System.currentTimeMillis() + 20000
      var rows = Array.empty[Sample]
      while (rows.isEmpty && System.currentTimeMillis() < deadline) {
        Thread.sleep(200)
        rows = sp.table("hb_out").as[Sample].collect()
      }
      assert(rows.nonEmpty,
        s"no heartbeat emitted within 20s; exception=${q.exception}; status=${q.status}")
      // the forced sample repeats the cached value at ~wall-clock time
      assert(rows.forall(s => s.pvname == "HB:pv.VAL" && s.value == "7.5"))
      assert(rows.forall(_.tsUs > 1000000L))
    } finally q.stop()
  }

  test("replayBatch matches per-key replay") {
    val sp = spark
    import sp.implicits._
    val samples = Seq(
      Sample("a", 0, "1", "1"), Sample("a", 90 * H, "2", "2"),
      Sample("b", 10 * H, "5", "5"))
    val got = replayBatch(samples.toDS(), 120 * H).collect().toVector.sortBy(s => (s.pvname, s.tsUs))
    val want = samples.groupBy(_.pvname).toVector.flatMap { case (_, ss) =>
      replayKey(ss.sortBy(_.tsUs), 120 * H)
    }.sortBy(s => (s.pvname, s.tsUs))
    assert(got == want)
  }
}
