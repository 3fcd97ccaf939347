package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming twin of [[graft.operators.TimeSeries.sessionStats]] built on
  * Structured Streaming's NATIVE `session_window` aggregation — the
  * Spark-first answer to gap sessionization: the engine merges overlapping
  * per-event windows in its own session-window state store, emits a session
  * exactly once when the event-time watermark passes its close, and the
  * whole thing is one `groupBy().agg()` — no custom state machine to
  * maintain for the common case (the custom-fold pattern stays in
  * [[FunnelStream]]/[[Downsampler]] where semantics genuinely need it).
  *
  * Boundary semantics: `session_window` merges windows that OVERLAP OR
  * TOUCH (spec-verified), so an event at exactly `prev + gap` continues the
  * session — the same rule as the batch `> gapUs` form; closed-session
  * output is equivalent to [[graft.operators.TimeSeries.sessionStats]]
  * including the boundary case.
  *
  * Output (append mode, one row per CLOSED session):
  * `(key, start_us, end_us, n_events)` — `end_us` is the last event's
  * timestamp (max), matching the batch rollup, not the window's exclusive
  * end.
  */
object Sessions {

  /** `df` must expose `key` (string) and `tsUs` (epoch micros, long). */
  def streaming(df: DataFrame, key: String, tsUs: String, gapUs: Long,
      watermarkDelayUs: Long): DataFrame = {
    require(gapUs > 0, s"gapUs must be positive, got $gapUs")
    require(gapUs % 1000000L == 0 && watermarkDelayUs % 1000000L == 0,
      "session_window/watermark take whole-second durations")
    df.withColumn("__ts", timestamp_micros(col(tsUs)))
      .withWatermark("__ts", s"${watermarkDelayUs / 1000000L} seconds")
      .groupBy(session_window(col("__ts"), s"${gapUs / 1000000L} seconds"),
        col(key))
      .agg(
        min(col(tsUs)).as("start_us"),
        max(col(tsUs)).as("end_us"),
        count(lit(1)).as("n_events"))
      .select(col(key), col("start_us"), col("end_us"), col("n_events"))
  }
}
