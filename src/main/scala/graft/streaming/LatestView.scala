package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import Downsampler.RawSample

/** S2/A1 — the latest-value cache as a streaming aggregation: one row per
  * PV carrying the newest (value, cvalue, ts), updated each micro-batch
  * (the reference's `cache` table + `update_cache` loop, cache.py:314-320,
  * 433-462). Run with `outputMode("update")` so sinks receive only changed
  * PVs per batch — exactly the web layer's refresh delta (Q6,
  * webapp.py:52-76).
  *
  * `max_by` over a struct is map-side combinable: at any fleet size the
  * shuffle carries one row per PV per batch.
  */
object LatestView {

  def latest(ds: Dataset[RawSample]): DataFrame =
    ds.groupBy(col("pvname"))
      .agg(max_by(struct(col("tsUs"), col("value"), col("cvalue")), col("tsUs")).as("__l"))
      .select(col("pvname"), col("__l.tsUs").as("tsUs"), col("__l.value").as("value"),
        col("__l.cvalue").as("cvalue"))
}
