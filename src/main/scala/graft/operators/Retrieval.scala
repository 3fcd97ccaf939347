package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval: combining ranked runs from different systems
  * (lexical BM25, embedding ANN, ...) into one result list.
  *
  * Reference surface: the engine's retrieval pack gives a lexical ranker
  * ([[TextAnalysis.bm25]]) and several semantic rankers
  * ([[Similarity.bruteForceKnn]] and its LSH/IVF/PQ scale variants), all
  * emitting the same (id, rank) contract — fusion is the standard way a
  * curation pipeline actually uses them together (find docs "about" a
  * topic by keyword AND by meaning).
  */
object Retrieval {

  /** Reciprocal-rank fusion (Cormack/Clarke/Buettcher, SIGIR'09):
    * `score(d) = Σ_runs 1/(c + rank_run(d))` — the de-facto standard
    * hybrid-search combiner (c=60 in the original paper) because it needs
    * no score calibration between systems, only ranks. A document missing
    * from a run simply contributes nothing for it.
    *
    * Input runs each expose (`id`, `rank`) with rank starting at 1; runs
    * are top-k lists, so every frame here is k-sized — fusion costs one
    * union + one tiny aggregation regardless of corpus size (the corpus
    * was paid inside the runs). With two runs the double sum is exactly
    * commutative (a+b == b+a bitwise), so the rounded score is
    * engine-reproducible without ordering care; for 3+ runs the rounding
    * absorbs association differences.
    *
    * Output: top `k` of (id, rrf, n_runs) by (rrf DESC, id).
    */
  def rrfFuse(runs: Seq[DataFrame], id: String, c: Int = 60, k: Int = 10): DataFrame = {
    require(runs.nonEmpty, "rrfFuse needs at least one ranked run")
    runs
      .map(_.select(col(id), (lit(1.0) / (lit(c) + col("rank"))).as("__s")))
      .reduce(_ unionByName _)
      .groupBy(col(id))
      .agg(round(sum(col("__s")), 6).as("rrf"), count(lit(1)).cast("long").as("n_runs"))
      .orderBy(col("rrf").desc, col(id))
      .limit(k)
  }

  /** Search-result diversification by source capping — the re-rank stage
    * between candidate generation and presentation: at most `perGroup` hits
    * per `group` survive (in score order), then the global top `k` is cut.
    * Prevents one domain from monopolizing a result page — the retrieval
    * face of the corpus-curation per-source cap.
    *
    * Ordering is fully deterministic: both cuts order by
    * `(score DESC, id)` over the already-6dp-rounded score. Plan shape: one
    * group-keyed row_number window (per-task state = one group's hits),
    * then a TakeOrdered global cut; the final rank window sees at most `k`
    * rows. `scored` is any frame with (id, group, score) — BM25, cosine,
    * or fused scores alike.
    */
  def diversifiedTopK(scored: DataFrame, id: String, score: String, group: String,
      perGroup: Int, k: Int): DataFrame = {
    require(perGroup >= 1, s"perGroup must be >= 1, got $perGroup")
    require(k >= 1, s"k must be >= 1, got $k")
    val wg = Window.partitionBy(col(group)).orderBy(col(score).desc, col(id))
    val capped = scored
      .withColumn("__gr", row_number().over(wg))
      .where(col("__gr") <= perGroup)
      .orderBy(col(score).desc, col(id))
      .limit(k)
    val wk = Window.orderBy(col(score).desc, col(id)) // <= k rows
    capped
      .withColumn("rank", row_number().over(wk).cast("long"))
      .select(col(id), col(group), col(score), col("__gr").cast("long").as("group_rank"), col("rank"))
  }
}
