package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import Downsampler.Sample

/** T3 — forced heartbeat (archiver.py:419-440, util.py:348-354): any PV
  * silent longer than its per-PV force interval (uniform 13-21 h, seeded)
  * gets its last value re-archived, guaranteeing ≥1 sample/PV/24 h so
  * time-range queries always find a "point before tmin".
  *
  * Determinism: the reference draws `randint` at runtime and stamps emits
  * with the sweep's wall clock (a 300 s grid); here the interval sequence is
  * a seeded PRNG per (pvname, draw index) and the batch replay stamps the
  * forced sample at exactly `lastTs + interval`, making replays reproducible.
  */
object Heartbeat {

  final val MinForceUs: Long = 13L * 3600 * 1000000L
  final val SpanForceUs: Long = 8L * 3600 * 1000000L

  /** k-th force interval for a PV (seeded; mirrors util.py:348-354's
    * 13 h + rand(8 h) draw). `minUs`/`spanUs` default to the reference's
    * 13-21 h window; tests shrink them to drive the timeout path quickly.
    */
  def forceIntervalUs(pvname: String, k: Int, seed: Long = 42L,
      minUs: Long = MinForceUs, spanUs: Long = SpanForceUs): Long = {
    val rng = new scala.util.Random(seed ^ pvname.hashCode.toLong ^ (k.toLong << 32))
    minUs + rng.nextLong(spanUs)
  }

  /** Batch replay over one PV's archived samples (time-ordered): synthetic
    * heartbeat rows in the silent gaps, up to `horizonUs`.
    */
  def replayKey(samples: Iterable[Sample], horizonUs: Long, seed: Long = 42L): Vector[Sample] = {
    val out = Vector.newBuilder[Sample]
    var last: Option[Sample] = None
    var k = 0
    def fill(until: Long): Unit = last.foreach { l =>
      var ts = l.tsUs
      var value = l.value
      var cvalue = l.cvalue
      var interval = forceIntervalUs(l.pvname, k, seed)
      while (ts + interval < until) {
        ts += interval
        out += Sample(l.pvname, ts, value, cvalue)
        k += 1
        interval = forceIntervalUs(l.pvname, k, seed)
      }
    }
    samples.foreach { s =>
      fill(s.tsUs)
      last = Some(s)
      k = 0
    }
    fill(horizonUs)
    out.result()
  }

  /** Secondary-sort form: shuffle on the key, external sort within
    * partitions on `(pvname, tsUs, value)` (the value tie-break keeps the
    * carried value partition-order independent), then a streaming run
    * iterator with O(1) state per key — no per-key materialization, so one
    * hot PV's multi-year history cannot OOM an executor.
    */
  def replayBatch(ds: Dataset[Sample], horizonUs: Long, seed: Long = 42L): Dataset[Sample] = {
    val spark = ds.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    ds.repartition(col("pvname"))
      .sortWithinPartitions(col("pvname"), col("tsUs"), col("value"))
      .as[Sample]
      .mapPartitions { it =>
        var curPv: String = null
        var last: Sample = null
        var k = 0
        def fill(until: Long): Vector[Sample] = {
          if (last == null) Vector.empty
          else {
            val out = Vector.newBuilder[Sample]
            var ts = last.tsUs
            var interval = forceIntervalUs(last.pvname, k, seed)
            while (ts + interval < until) {
              ts += interval
              out += Sample(last.pvname, ts, last.value, last.cvalue)
              k += 1
              interval = forceIntervalUs(last.pvname, k, seed)
            }
            out.result()
          }
        }
        val main = it.flatMap { s =>
          val boundary = if (curPv != null && s.pvname != curPv) fill(horizonUs) else Vector.empty
          if (s.pvname != curPv) { curPv = s.pvname; last = null; k = 0 }
          val gapFill = fill(s.tsUs)
          last = s; k = 0
          boundary ++ gapFill
        }
        main ++ Iterator.single(()).flatMap(_ => fill(horizonUs))
      }
  }

  case class HbState(lastTs: Long, value: String, cvalue: String, k: Int)

  /** Streaming form: per-PV processing-time timeout re-emits the cached
    * value when the force interval elapses with no real sample (stamped at
    * the wall clock, like the reference's sweep). `minUs`/`spanUs` shrink
    * the 13-21 h window for tests.
    */
  def streaming(ds: Dataset[Sample], seed: Long = 42L,
      minUs: Long = MinForceUs, spanUs: Long = SpanForceUs): Dataset[Sample] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.groupByKey(_.pvname)
      .flatMapGroupsWithState[HbState, Sample](
        OutputMode.Append(), GroupStateTimeout.ProcessingTimeTimeout) {
        (pv: String, it: Iterator[Sample], gs: GroupState[HbState]) =>
          val out = Vector.newBuilder[Sample]
          var st = gs.getOption
          if (gs.hasTimedOut) {
            st.foreach { s =>
              val nowUs = gs.getCurrentProcessingTimeMs() * 1000L
              out += Sample(pv, nowUs, s.value, s.cvalue)
              st = Some(HbState(nowUs, s.value, s.cvalue, s.k + 1))
            }
          }
          it.toVector.sortBy(s => (s.tsUs, s.value))(Downsampler.EventOrder).foreach { s =>
            st = Some(HbState(s.tsUs, s.value, s.cvalue, 0))
          }
          st.foreach { s =>
            gs.update(s)
            gs.setTimeoutDuration(math.max(forceIntervalUs(pv, s.k, seed, minUs, spanUs) / 1000L, 1L))
          }
          out.result().iterator
      }
  }
}
