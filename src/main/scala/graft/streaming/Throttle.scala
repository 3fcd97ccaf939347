package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.operators.TimeSeries.throttle]] — the live
  * per-key rate cap: at most `perWindow` events pass per `(key, tumbling
  * windowUs bucket)`, survivors chosen FIRST by `(tsUs, value)` exactly like
  * the batch row_number cap. State per key is two scalars (current bucket,
  * its pass count); the cap therefore holds across micro-batch boundaries —
  * a window whose quota was spent in batch N admits nothing in batch N+1.
  *
  * Delivery contract (T7, as for [[Smoothing]]): per-key event-time
  * monotone across batches, same-instant ties inside one batch; late events
  * (an earlier bucket than the state's) are dropped, not re-admitted —
  * replay the batch operator to reconstruct history.
  */
object Throttle {

  /** Per-key cap state: the tumbling bucket being filled and how many
    * events it has admitted.
    */
  case class CapState(bucket: Long, n: Int, lastTsUs: Long)

  def streaming(ds: Dataset[Smoothing.Point], windowUs: Long,
      perWindow: Int): Dataset[Smoothing.Point] = {
    require(windowUs > 0, s"windowUs must be positive, got $windowUs")
    require(perWindow >= 1, s"perWindow must be >= 1, got $perWindow")
    val spark = ds.sparkSession
    import spark.implicits._
    ds.groupByKey(_.pvname)
      .flatMapGroupsWithState[CapState, Smoothing.Point](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (_: String, it: Iterator[Smoothing.Point], gs: GroupState[CapState]) =>
          val out = Vector.newBuilder[Smoothing.Point]
          var st = gs.getOption.getOrElse(CapState(Long.MinValue, 0, Long.MinValue))
          // (ts, value) ASC mirrors the batch orderBy(ts, tieBreak=value)
          it.toVector.sortBy(p => (p.tsUs, p.value)).foreach { p =>
            val b = p.tsUs / windowUs // truncating, like the batch `DIV`
            if (b > st.bucket) st = CapState(b, 0, st.lastTsUs)
            if (b >= st.bucket && p.tsUs >= st.lastTsUs && st.n < perWindow) {
              st = CapState(st.bucket, st.n + 1, p.tsUs)
              out += p
            } // over quota, or late (earlier bucket / before the admit
              // frontier): dropped
          }
          gs.update(st)
          out.result().iterator
      }
  }
}
