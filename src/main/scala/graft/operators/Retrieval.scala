package graft.operators

import org.apache.spark.sql.DataFrame
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
}
