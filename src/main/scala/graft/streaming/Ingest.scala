package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}

import graft.store.SampleStore
import Downsampler.{PvConfig, RawSample, Sample}

/** SURVEY §3.2 — the whole ingest lifecycle as ONE Structured Streaming
  * topology (replacing the reference's two daemons + MySQL-as-IPC):
  *
  *   source (CA events as RawSample rows)
  *     ├─ T2 downsampler (flatMapGroupsWithState) ─ foreachBatch → partitioned store
  *     └─ A1 latest-value view (update-mode agg)  ─ any update-mode sink
  *
  * Late/out-of-order data (T7): each micro-batch is sorted per key before
  * the stateful step; an optional event-time watermark bounds state for
  * sources that can be hours late.
  */
object Ingest {

  /** The archive branch: downsample and append to the partitioned store.
    * Returns the started query; `checkpoint` makes it exactly-once across
    * restarts.
    */
  def archiveTo(
      source: Dataset[RawSample],
      path: String,
      runWidthUs: Long,
      configs: Map[String, PvConfig] = Map.empty,
      checkpoint: Option[String] = None,
      triggerMs: Long = 1000L,
      limboTimeoutMs: Long = 1000L): StreamingQuery = {
    val spark = source.sparkSession
    import spark.implicits._
    val down = Downsampler.streaming(source, configs, timeoutMs = limboTimeoutMs)
    val w = down.writeStream
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(triggerMs))
      .foreachBatch { (batch: Dataset[Sample], _: Long) =>
        val df = batch.toDF()
          .select(col("pvname"), col("tsUs"), col("value"), col("cvalue"))
        SampleStore.write(SampleStore.normalize(df, runWidthUs), path)
      }
    checkpoint.fold(w)(c => w.option("checkpointLocation", c)).start()
  }

  /** The cache branch: latest value per PV into an update-mode sink
    * (memory sink for tests; JDBC/Delta upsert via foreachBatch in a real
    * deployment).
    */
  def latestTo(source: Dataset[RawSample], queryName: String): StreamingQuery =
    LatestView.latest(source)
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .start()

  /** Optional T7 watermarking: declare `tsUs` as event time with a lateness
    * bound. NOTE: this bounds state for event-time-timeout and windowed-
    * aggregation operators downstream; the processing-time-timeout
    * downsampler keeps per-PV state regardless (its state is three scalars
    * per PV — bounded by fleet size, not by time).
    */
  def withEventTime(source: Dataset[RawSample], delay: String): Dataset[RawSample] = {
    val spark = source.sparkSession
    import spark.implicits._
    source
      .withColumn("__et", timestamp_micros(col("tsUs")))
      .withWatermark("__et", delay)
      .drop("__et")
      .as[RawSample]
  }
}
