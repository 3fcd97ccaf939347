package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.operators.EventAnalytics.funnel]]: per-user
  * step-completion state turns a live event stream into append-mode
  * `(user, stage, step, tsUs)` completion rows — count them per stage for a
  * live funnel dashboard, or derive `t_i − t_{i−1}` latencies for the
  * [[graft.operators.EventAnalytics.funnelLatency]] report.
  *
  * Fold rule (identical to the batch recurrence under per-key event-time
  * monotone delivery, the T7 convention): the next expected step completes
  * at the FIRST qualifying event — strictly after the previous step's
  * completion and within `horizonUs` of it. Events for already-completed or
  * not-yet-reached steps fold away; late events (before the last folded
  * instant) are dropped. State per key is one bounded array of completion
  * times (≤ steps.length longs) plus the last folded instant.
  */
object FunnelStream {

  case class Event(userId: Long, tsUs: Long, tieBreak: Long, eventType: String)

  /** A step completion, stamped with the qualifying event's time. */
  case class Completion(userId: Long, stage: Int, step: String, tsUs: Long)

  /** Per-key fold state: completion time of each completed prefix step and
    * the last folded (ts, tieBreak) for late-drop.
    */
  case class FunnelState(doneTimes: Seq[Long], lastTs: Long, lastTie: Long)

  def streaming(ds: Dataset[Event], steps: Seq[String], horizonUs: Long): Dataset[Completion] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(horizonUs > 0, s"horizonUs must be positive, got $horizonUs")
    val spark = ds.sparkSession
    import spark.implicits._
    ds.groupByKey(_.userId)
      .flatMapGroupsWithState[FunnelState, Completion](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (u: Long, it: Iterator[Event], gs: GroupState[FunnelState]) =>
          val out = Vector.newBuilder[Completion]
          var st = gs.getOption.getOrElse(FunnelState(Vector.empty, Long.MinValue, Long.MinValue))
          it.toVector.sortBy(e => (e.tsUs, e.tieBreak)).foreach { e =>
            val fresh = e.tsUs > st.lastTs ||
              (e.tsUs == st.lastTs && e.tieBreak > st.lastTie)
            if (fresh) {
              val next = st.doneTimes.length
              if (next < steps.length && e.eventType == steps(next)) {
                val qualifies =
                  next == 0 ||
                    (e.tsUs > st.doneTimes(next - 1) &&
                      e.tsUs <= st.doneTimes(next - 1) + horizonUs)
                if (qualifies) {
                  out += Completion(u, next + 1, steps(next), e.tsUs)
                  st = st.copy(doneTimes = st.doneTimes :+ e.tsUs)
                }
              }
              st = st.copy(lastTs = e.tsUs, lastTie = e.tieBreak)
            } // late or duplicate instant: dropped (T7)
          }
          gs.update(st)
          out.result().iterator
      }
  }
}
