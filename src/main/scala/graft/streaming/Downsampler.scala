package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** T2/T3 — the deadtime/deadband downsampler with limbo semantics, the one
  * genuinely stateful operator of the reference (archiver.py:362-463,
  * doc/setup.rst:74-96), re-expressed as a keyed stateful op usable both as a
  * Structured Streaming `flatMapGroupsWithState` and as a deterministic batch
  * replay (same per-key step function, so the two stay in lockstep).
  *
  * Semantics (per PV, events in time order; all times in epoch micros):
  *  - first event always emits;
  *  - an event later than `lastEmitTs + deadtime` emits, except that a
  *    double-typed PV must also move more than `|deadband|` from the last
  *    emitted value (unparseable values compare as "moved");
  *  - an event inside the deadtime goes to the limbo buffer (latest change
  *    wins), provided it is >1 ms after the last emit;
  *  - once the deadtime expires (next arrival, stream timeout, or end of a
  *    batch replay), the limbo value emits with its ORIGINAL timestamp — the
  *    true change time is preserved (doc/setup.rst:82-85) — and the deadtime
  *    restarts from that timestamp.
  *
  * Note on deadband fidelity: in the reference, a deadband-suppressed change
  * lands in limbo and the same `collect()` pass flushes it (tnow ≥ ts always,
  * archiver.py:399-414), so the shipped code's deadband barely filters.
  * We implement the *documented* semantics (deadband-failed changes are "no
  * change"), which is what its docs and config defaults describe.
  *
  * Scale: state is three scalars + one buffered event per PV ("thousands of
  * PVs" — doc/overview.rst:7-8), keyed shuffle only; no skew risk.
  */
object Downsampler {

  /** An ingest change event (SURVEY §2.1 S1). */
  case class RawSample(pvname: String, tsUs: Long, value: String, cvalue: String)

  /** Per-PV archiving parameters (pv table — schema.py:6-19). */
  case class PvConfig(dtype: String, deadtimeUs: Long, deadband: Double)

  /** An archived sample (accepted by the downsampler). */
  case class Sample(pvname: String, tsUs: Long, value: String, cvalue: String)

  /** Keyed operator state. */
  case class State(
      lastTsUs: Long,
      lastValue: String,
      limbo: Option[RawSample])

  val DefaultConfig: PvConfig = PvConfig("double", 5000000L, 1.0e-8)

  /** UTF-8 binary string order — the order Spark SQL sorts strings in
    * (UTF8String byte comparison). The equal-timestamp tie-break must use
    * THIS ordering everywhere: the secondary-sort batch replays tie-break
    * via `sortWithinPartitions` (Spark binary order), so the streaming
    * twins' in-memory sorts use the same order, or supplementary-plane
    * values (where UTF-16 code-unit order and UTF-8 byte order disagree)
    * would process in a different sequence and desynchronize the state
    * machines.
    */
  val Utf8Order: Ordering[String] = (x: String, y: String) => {
    val a = x.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val b = y.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(a.length, b.length)
    var r = 0
    while (r == 0 && i < n) { r = (a(i) & 0xff) - (b(i) & 0xff); i += 1 }
    if (r != 0) r else a.length - b.length
  }

  /** (tsUs, value) event order with the UTF-8 tie-break. */
  val EventOrder: Ordering[(Long, String)] = Ordering.Tuple2(Ordering.Long, Utf8Order)

  /** Minimum gap (1 ms, archiver.py:398) below which a change is ignored. */
  private final val MinGapUs = 1000L

  /** `clean_value` (archiver.py:34-44): float parse incl. b'..' unwrap. */
  def parseDouble(v: String): Option[Double] = {
    val s =
      if (v != null && v.startsWith("b'") && v.endsWith("'")) v.substring(2, v.length - 1)
      else v
    try Option(s).map(_.trim.toDouble)
    catch { case _: NumberFormatException => None }
  }

  /** Process one event against the state; returns (emits, new state). */
  def onEvent(st: Option[State], e: RawSample, cfg: PvConfig): (Vector[Sample], State) =
    st match {
      case None =>
        (Vector(Sample(e.pvname, e.tsUs, e.value, e.cvalue)), State(e.tsUs, e.value, None))
      case Some(s0) =>
        var s = s0
        val out = Vector.newBuilder[Sample]
        // arrival advances the clock: flush an expired limbo first
        if (s.limbo.isDefined && e.tsUs > s.lastTsUs + cfg.deadtimeUs) {
          val l = s.limbo.get
          out += Sample(l.pvname, l.tsUs, l.value, l.cvalue)
          s = State(l.tsUs, l.value, None)
        }
        if (e.tsUs > s.lastTsUs + cfg.deadtimeUs) {
          val moved =
            if (cfg.dtype == "double")
              (parseDouble(e.value), parseDouble(s.lastValue)) match {
                case (Some(a), Some(b)) => math.abs(a - b) > math.abs(cfg.deadband)
                case _ => true // unparseable → treat as changed (archiver.py:386-388)
              }
            else true
          if (moved) {
            out += Sample(e.pvname, e.tsUs, e.value, e.cvalue)
            s = State(e.tsUs, e.value, None)
          }
        } else if (e.tsUs > s.lastTsUs + MinGapUs) {
          s = s.copy(limbo = Some(e))
        }
        (out.result(), s)
    }

  /** Flush the limbo if the clock has passed the deadtime. */
  def onClock(st: State, nowUs: Long, cfg: PvConfig): (Vector[Sample], State) =
    st.limbo match {
      case Some(l) if nowUs > st.lastTsUs + cfg.deadtimeUs =>
        (Vector(Sample(l.pvname, l.tsUs, l.value, l.cvalue)), State(l.tsUs, l.value, None))
      case _ => (Vector.empty, st)
    }

  /** Pure per-key replay: events must be time-ordered; the trailing limbo is
    * flushed (a batch replay sees the complete history).
    */
  def replayKey(events: Iterable[RawSample], cfg: PvConfig): Vector[Sample] = {
    var st: Option[State] = None
    val out = Vector.newBuilder[Sample]
    events.foreach { e =>
      val (emits, s) = onEvent(st, e, cfg)
      out ++= emits
      st = Some(s)
    }
    st.flatMap(_.limbo).foreach { l =>
      // end-of-history flush: deadtime has trivially expired by "now"
      out += Sample(l.pvname, l.tsUs, l.value, l.cvalue)
    }
    out.result()
  }

  /** Batch replay over a Dataset — the deterministic twin used for
    * correctness tests and backfills. Secondary sort, not per-key
    * materialization: one shuffle on the key, Spark's external
    * (spill-capable) sort orders `(pvname, tsUs, value)` within partitions,
    * and a streaming run iterator applies [[onEvent]] with O(1) state per
    * key — a multi-year backfill of one hot PV cannot OOM an executor the
    * way a `groupByKey` + in-memory sort would.
    */
  def replayBatch(
      ds: Dataset[RawSample],
      configs: Map[String, PvConfig] = Map.empty,
      default: PvConfig = DefaultConfig): Dataset[Sample] = {
    val spark = ds.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    ds.repartition(col("pvname"))
      .sortWithinPartitions(col("pvname"), col("tsUs"), col("value"))
      .as[RawSample]
      .mapPartitions { it =>
        var curPv: String = null
        var st: Option[State] = None
        var cfg: PvConfig = default
        def trailing(): Vector[Sample] =
          // end-of-history flush: deadtime has trivially expired by "now"
          st.flatMap(_.limbo).map(l => Sample(l.pvname, l.tsUs, l.value, l.cvalue)).toVector
        val main = it.flatMap { e =>
          val boundary = if (curPv != null && e.pvname != curPv) trailing() else Vector.empty
          if (e.pvname != curPv) {
            curPv = e.pvname; st = None; cfg = configs.getOrElse(e.pvname, default)
          }
          val (emits, s2) = onEvent(st, e, cfg)
          st = Some(s2)
          boundary ++ emits
        }
        // lazy tail: evaluated only after `main` is exhausted
        main ++ Iterator.single(()).flatMap(_ => trailing())
      }
  }

  /** Streaming form: `flatMapGroupsWithState` in Append mode with a
    * processing-time timeout that flushes the limbo when a PV goes quiet
    * (SURVEY §2.9 T2).
    *
    * `timeoutMs <= 0` disables the quiet-PV flush (the limbo then flushes
    * on next arrival only) — used by deterministic tests, since a registered
    * processing-time timeout makes the default trigger run continuous
    * no-data batches.
    */
  def streaming(
      ds: Dataset[RawSample],
      configs: Map[String, PvConfig] = Map.empty,
      timeoutMs: Long = 1000L): Dataset[Sample] = {
    val spark = ds.sparkSession
    import spark.implicits._
    // NoTimeout when disabled: merely DECLARING ProcessingTimeTimeout makes
    // the micro-batch engine schedule no-data batches forever (its
    // shouldRunAnotherBatch is unconditional), which busy-loops a default
    // trigger and keeps processAllAvailable from ever settling
    val timeoutConf =
      if (timeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout else GroupStateTimeout.NoTimeout
    ds.groupByKey(_.pvname)
      .flatMapGroupsWithState[State, Sample](OutputMode.Append(), timeoutConf) {
        (pv: String, it: Iterator[RawSample], gs: GroupState[State]) =>
          val cfg = configs.getOrElse(pv, DefaultConfig)
          val out = Vector.newBuilder[Sample]
          var st: Option[State] = gs.getOption
          if (gs.hasTimedOut) {
            st.foreach { s =>
              val nowUs = gs.getCurrentProcessingTimeMs() * 1000L
              val (emits, s2) = onClock(s, nowUs, cfg)
              out ++= emits
              st = Some(s2)
            }
          }
          it.toVector.sortBy(e => (e.tsUs, e.value))(EventOrder).foreach { e =>
            val (emits, s2) = onEvent(st, e, cfg)
            out ++= emits
            st = Some(s2)
          }
          st.foreach { s =>
            gs.update(s)
            if (timeoutMs > 0 && s.limbo.isDefined) gs.setTimeoutDuration(timeoutMs)
          }
          out.result().iterator
      }
  }
}
