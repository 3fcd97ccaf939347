package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Streaming corpus ingest: the LLM-pipeline dedup/curation operators
  * attached to an append-mode document stream — a crawl drop arrives as a
  * stream, not a table, and dedup is the one stage that genuinely needs
  * cross-batch STATE (sampling/splits/PII are stateless per-row and compose
  * directly, proven in TextAnalysisSpec's streaming test).
  */
object DocStream {

  /** Stateful exact dedup over a document stream: first arrival of each
    * text fingerprint passes, later copies are dropped. The batch twins are
    * [[graft.operators.Dedup.exact]] (corpus-wide) and
    * [[graft.operators.Dedup.incrementalExact]] (shard-vs-corpus); this is
    * the "as it arrives" form.
    *
    * State is the fingerprint set, bounded by the event-time watermark:
    * re-fetches of a page cluster in time, so a crawl re-emitting a
    * document within `delay` of first sight is dropped while the state
    * store only ever holds one horizon's worth of fingerprints — the
    * difference between O(corpus) state (a plain streaming
    * `dropDuplicates`, which never expires) and a bounded store at 100 TB.
    * Duplicates farther apart than the horizon fall through to the batch
    * [[graft.operators.Dedup.incrementalExact]] pass against the
    * accumulated store — the standard streaming/batch split.
    */
  def dedupedDocs(docs: DataFrame, text: String, tsCol: String,
      delay: String): DataFrame = {
    val withFp = docs.withColumn("fp", TextAnalysis.fingerprint(col(text)))
    // null-text docs (fetch failures) carry a null fingerprint and are NOT
    // duplicates of one another — the batch twins keep them all (a null
    // anti-join key matches nothing), so the stream must too; routing them
    // through dropDuplicates would group null keys and keep only the first
    val nullFp = withFp.where(col("fp").isNull)
    withFp.where(col("fp").isNotNull)
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("fp")
      .unionByName(nullFp)
  }
}
