package graft.streaming

import graft.SparkSpec
import Alerts._

class AlertsSpec extends SparkSpec {

  private val S = 1000000L
  private def cfg(op: String, trip: String, timeoutUs: Long = 10 * S, active: Boolean = true) =
    AlertConfig(1L, "XX:m1.VAL", "Motor1", op, trip, timeoutUs, active)
  private def obs(ts: Long, v: String) = Observation(1L, ts, v)

  test("comparison op table (cache.py:35-36) — numeric coercion") {
    assert(tripped("gt", "3.2", "3.0"))
    assert(!tripped("gt", "2.8", "3.0"))
    assert(tripped("le", "3.0", "3.0"))
    assert(tripped("ne", "1", "2"))
    assert(tripped("eq", "1.0", "1")) // numeric compare, not string
    assert(tripped("lt", "-1e2", "0"))
    intercept[IllegalArgumentException](tripped("??", "1", "2"))
  }

  test("string comparison when either side is non-numeric (cache.py:609-616)") {
    assert(tripped("eq", "Open", "Open"))
    assert(tripped("gt", "b", "a"))
    assert(!tripped("gt", "a", "b"))
    // numeric-looking value vs non-numeric trip -> string compare
    assert(tripped("lt", "10", "9a")) // "10" < "9a" as strings
    assert(!tripped("lt", "10", "9")) // both numeric -> 10 < 9 is false
  }

  test("ok->alarm edge notifies; stay-alarm and alarm->ok do not (doc/alerts.rst:42-48)") {
    val events = replayKey(
      Seq(obs(0, "2.0"), obs(20 * S, "5.0"), obs(40 * S, "6.0"), obs(60 * S, "1.0")),
      cfg("gt", "3.0"))
    // 2.0: ok (no transition event, status stays ok)
    // 5.0: ok->alarm + notify; 6.0: stay alarm (no event); 1.0: alarm->ok (event, no mail)
    assert(events.map(e => (e.tsUs, e.status, e.notified)) == Vector(
      (20 * S, "alarm", true), (60 * S, "ok", false)))
  }

  test("timeout debounces re-notification of flapping values") {
    val events = replayKey(
      Seq(obs(0, "5.0"), obs(2 * S, "1.0"), obs(4 * S, "5.0"), obs(30 * S, "1.0"), obs(32 * S, "5.0")),
      cfg("gt", "3.0", timeoutUs = 10 * S))
    // first trip notifies at t=0; re-trip at t=4s inside the 10s timeout
    // transitions but does NOT notify; re-trip at t=32s notifies again
    assert(events.map(e => (e.tsUs, e.status, e.notified)) == Vector(
      (0L, "alarm", true), (2 * S, "ok", false), (4 * S, "alarm", false),
      (30 * S, "ok", false), (32 * S, "alarm", true)))
  }

  test("inactive alerts are skipped entirely") {
    assert(replayKey(Seq(obs(0, "5.0")), cfg("gt", "3.0", active = false)).isEmpty)
  }

  test("notified events are debounce-bounded: <= 1 per alert per timeout window") {
    // the bound deliverStream's per-batch collect relies on (its batch
    // cardinality is alert-config count × windows, never data volume):
    // an adversarial flapping stream — a trip every second for 100 s
    // against a 10 s timeout — must notify at most ceil(span/timeout)
    // times no matter how many observations arrive
    val timeout = 10 * S
    val flaps = (0 until 100).flatMap(t =>
      Seq(obs(t * S, "5.0"), obs(t * S + S / 2, "1.0")))
    val events = replayKey(flaps, cfg("gt", "3.0", timeoutUs = timeout))
    val notified = events.filter(_.notified)
    assert(notified.nonEmpty)
    assert(notified.size <= (99 * S) / timeout + 1,
      s"${notified.size} notifications for a ${99}s flap span under a 10s timeout")
    // and consecutive notifications are at least one timeout apart
    notified.map(_.tsUs).sliding(2).foreach {
      case Seq(a, b) => assert(b - a >= timeout)
      case _ => ()
    }
  }

  test("mailBody interpolates template + op description + plot link (cache.py:632-703)") {
    val c = cfg("gt", "3.0")
    val ev = AlertEvent(1L, c.pvname, 0L, "5.0", "alarm", notified = true)
    val body = Alerts.mailBody(c, ev,
      "%PV% is %COMP% %TRIP% (now %VALUE%); other=%PV(XX:other)%",
      n => if (n == "XX:other") Some("7") else None,
      plotBaseUrl = "http://host/pvarch")
    assert(body ==
      "XX:m1.VAL is greater than 3.0 (now 5.0); other=7\nSee http://host/pvarch/plot/1days/now/XX:m1.VAL")
    // empty template falls back like the reference
    assert(Alerts.mailBody(c, ev, "", _ => None) == "error message")
  }

  test("parseEnumLabels builds the F10 map from pvextra JSON (cache.py:171-206)") {
    val sp = spark
    import sp.implicits._
    import org.apache.spark.sql.functions._
    val pvextra = Seq(("XX:sh", """["Closed","Open"]"""), ("XX:st", """["Off","On","Err"]"""))
      .toDF("pvname", "data")
    val labels = pvextra.select(map_from_entries(collect_list(struct(col("pvname"),
      graft.functions.PvFunctions.parseEnumLabels(col("data"))))).as("m"))
      .crossJoin(Seq(("XX:st", 2)).toDF("pv", "ord"))
      .select(graft.functions.PvFunctions.enumLabel(col("m"), col("pv"), col("ord")))
      .collect()(0).getString(0)
    assert(labels == "Err")
  }

  test("streaming alerts match batch replay across micro-batches") {
    val sp = spark
    import sp.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = sp.sqlContext
    val configs = Map(1L -> cfg("gt", "3.0", timeoutUs = 10 * S))
    val observations = Seq(
      obs(0, "2.0"), obs(5 * S, "5.0"), obs(10 * S, "6.0"),
      obs(15 * S, "1.0"), obs(40 * S, "9.0"))
    val input = MemoryStream[Observation]
    val q = Alerts.streaming(input.toDS(), configs)
      .writeStream.format("memory").queryName("alerts_out").outputMode("append").start()
    try {
      input.addData(observations.take(3))
      q.processAllAvailable()
      input.addData(observations.drop(3))
      q.processAllAvailable()
      val got = sp.table("alerts_out").as[AlertEvent].collect().toVector.sortBy(_.tsUs)
      val want = replayKey(observations, configs(1L)).sortBy(_.tsUs)
      assert(got == want)
    } finally q.stop()
  }

  test("replayBatch evaluates each alert against its config") {
    val sp = spark
    import sp.implicits._
    val configs = Map(
      1L -> AlertConfig(1L, "pv1", "hi", "gt", "10", 5 * S, active = true),
      2L -> AlertConfig(2L, "pv2", "lo", "lt", "0", 5 * S, active = true))
    val observations = Seq(
      Observation(1L, 0, "11"), Observation(1L, 10 * S, "9"),
      Observation(2L, 0, "-1"), Observation(2L, 10 * S, "1"),
      Observation(3L, 0, "1")) // no config -> dropped
    val got = replayBatch(observations.toDS(), configs).collect().toVector
      .sortBy(e => (e.alertId, e.tsUs))
    assert(got.map(e => (e.alertId, e.status, e.notified)) == Vector(
      (1L, "alarm", true), (1L, "ok", false),
      (2L, "alarm", true), (2L, "ok", false)))
  }
}
