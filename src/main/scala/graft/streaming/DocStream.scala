package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

import graft.operators.{Dedup, TextAnalysis}

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

  /** LSH bucket occupancy for [[lshCandidatePairs]]: the doc ids seen in
    * one (band, bucket) cell, in arrival order, capped at `maxBucket`.
    */
  case class BucketState(docs: Vector[Long])

  /** A near-duplicate candidate pair (normalized `d1 < d2`). */
  case class CandPair(d1: Long, d2: Long)

  /** Streaming MinHash-LSH near-dup candidate detection — the fuzzy sibling
    * of [[dedupedDocs]]: as documents arrive, each one's banded signature
    * buckets are probed against everything previously seen in those buckets
    * and collision pairs are emitted — the batch
    * [[graft.operators.Dedup.lshCandidates]] band join, incrementally. The
    * downstream exact-Jaccard verify is a per-pair lookup against the
    * accumulated store (pair-frame-sized, not stateful), so candidates are
    * the one stage that needs cross-batch state.
    *
    * The signature is the PER-ROW array-lambda form
    * ([[graft.operators.Dedup.minhashSignatureCols]]) — map-only, so the
    * only stateful operator is the keyed `flatMapGroupsWithState` over
    * `(band, bucket)` cells. State per cell is at most `maxBucket` doc ids:
    * a boilerplate bucket every crawl page hashes into stops ACCUMULATING
    * (and stops emitting O(n²) pairs) at the cap — the skew guard the batch
    * side expresses as `maxGroupSize`, and the reason state stays bounded
    * at 100 TB. Within a micro-batch arrivals fold in doc-id order
    * (deterministic); the same pair may surface from several bands —
    * consumers treat the output as a SET, exactly like the batch join
    * before its `distinct()`.
    *
    * Output (Append mode): `(d1, d2)` collision pairs.
    */
  def lshCandidatePairs(docs: DataFrame, id: String, text: String,
      n: Int, numPerm: Int, bands: Int, maxBucket: Int = 64): DataFrame = {
    require(bands > 0 && numPerm % bands == 0,
      s"numPerm $numPerm must divide into bands $bands")
    require(maxBucket >= 2, s"maxBucket must be >= 2, got $maxBucket")
    val spark = docs.sparkSession
    import spark.implicits._
    val rows = numPerm / bands
    val sig = docs
      .select(col(id).cast("long").as("doc") +:
        Dedup.minhashSignatureCols(col(text), n, numPerm): _*)
      .where(col("mh0").isNotNull)
    val bandStructs = (0 until bands).map { b =>
      val cs = (b * rows until (b + 1) * rows).map(i => col(s"mh$i"))
      struct(lit(b).as("band"), concat_ws("_", cs: _*).as("bucket"))
    }
    sig.select(col("doc"), explode(array(bandStructs: _*)).as("__b"))
      .select(col("__b.band").as("band"), col("__b.bucket").as("bucket"), col("doc"))
      .as[(Int, String, Long)]
      .groupByKey { case (band, bucket, _) => (band, bucket) }
      .flatMapGroupsWithState[BucketState, CandPair](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        case (_, it, gs) =>
          var acc = gs.getOption.map(_.docs).getOrElse(Vector.empty)
          val arrivals = it.map(_._3).toVector.sorted.distinct.filterNot(acc.contains)
          val out = Vector.newBuilder[CandPair]
          arrivals.foreach { d =>
            if (acc.size < maxBucket) {
              acc.foreach(p => out += (if (p < d) CandPair(p, d) else CandPair(d, p)))
              acc = acc :+ d
            }
          }
          gs.update(BucketState(acc))
          out.result().iterator
      }
      .toDF("d1", "d2")
  }
}
