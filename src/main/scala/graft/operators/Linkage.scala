package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Blocked fuzzy record linkage (entity resolution): find, for every left
  * record, its best-scoring right-side match above a threshold — without
  * ever comparing all pairs.
  *
  * The classic Fellegi–Sunter pipeline re-expressed as three declarative
  * stages Catalyst can push around:
  *
  *  1. '''Multi-pass blocking''' — each pass is a plain equi-join on one
  *     cheap derived key (e.g. "nation + name prefix", "nation + name
  *     suffix"). A single blocking key misses matches whose corruption
  *     falls inside the key; running several alternative passes and
  *     unioning the candidate pairs is the standard recall fix, and each
  *     pass stays an ordinary shuffle-or-broadcast hash join whose work is
  *     bounded by block sizes — NEVER the |L|×|R| cross product.
  *  2. '''Pair dedup''' — the same true pair usually surfaces in several
  *     passes; `dropDuplicates(left id, right id)` collapses them with one
  *     hash aggregate (the scoring fields ride along — they are
  *     functionally dependent on the ids, so no second join to re-fetch
  *     them).
  *  3. '''Scoring + best-match''' — per-field similarity is normalized
  *     Levenshtein (`1 − lev/maxLen`, codegen'd built-in on both this
  *     engine and any SQL oracle), the record score is the 6-dp-rounded
  *     field mean, and the winner per left record is one
  *     `row_number`-over-(score desc, right id) window partitioned by the
  *     left id — a keyed window, no global sort.
  *
  * At 100 TB each stage scales independently: blocking joins shuffle on the
  * block key (choose keys so blocks stay thousands of rows — the knob is
  * key granularity, exactly like production ER systems), the dedup and the
  * window shuffle on ids. Skewed blocks are visible as skewed join keys and
  * AQE's skew-join split applies as-is.
  */
object Linkage {

  /** Best right-side match per left record.
    *
    * Both frames must expose the same `blockKeys` (one column per blocking
    * pass) and `fuzzyFields` (string columns scored by normalized edit
    * distance). Output: `left_id`, `right_id`, one `sim_<field>` per fuzzy
    * field (6 dp), and their mean `score` (6 dp) — only pairs with
    * `score >= minScore`, best (then smallest `right_id`) per left record.
    */
  def bestMatches(left: DataFrame, right: DataFrame,
      leftId: String, rightId: String,
      blockKeys: Seq[String], fuzzyFields: Seq[String],
      minScore: Double): DataFrame = {
    require(blockKeys.nonEmpty, "at least one blocking pass is required")
    require(fuzzyFields.nonEmpty, "at least one fuzzy field is required")
    require(minScore >= 0.0 && minScore <= 1.0, s"minScore in [0,1], got $minScore")

    val lFields = fuzzyFields.map(f => col(f).as(s"__lf_$f"))
    val rFields = fuzzyFields.map(f => col(f).as(s"__rf_$f"))
    // small inputs ride their cached-scan width into every blocking join
    // (r14 probe: a 3-task 1.2 s stage = three 1-partition probe sides) —
    // spreadSmall round-robins them across the cluster and no-ops at scale
    val (lSpread, rSpread) = (SizeGates.spreadSmall(left), SizeGates.spreadSmall(right))
    val candidates = blockKeys.map { key =>
      val l = lSpread.select(col(leftId).as("left_id") +: col(key).as("__bk") +: lFields: _*)
      val r = rSpread.select(col(rightId).as("right_id") +: col(key).as("__bk") +: rFields: _*)
      l.join(r, "__bk").drop("__bk")
    }.reduce(_ unionByName _)
      .dropDuplicates("left_id", "right_id")

    val sims = fuzzyFields.map { f =>
      val (lf, rf) = (col(s"__lf_$f"), col(s"__rf_$f"))
      round(lit(1.0) - levenshtein(lf, rf).cast("double") /
        greatest(length(lf), length(rf), lit(1)).cast("double"), 6).as(s"sim_$f")
    }
    val scored = candidates
      .select(col("left_id") +: col("right_id") +: sims: _*)
      .withColumn("score",
        round(fuzzyFields.map(f => col(s"sim_$f")).reduce(_ + _) / fuzzyFields.size, 6))
      .where(col("score") >= minScore)

    val best = Window.partitionBy(col("left_id"))
      .orderBy(col("score").desc, col("right_id"))
    scored
      .withColumn("__rn", row_number().over(best))
      .where(col("__rn") === 1)
      .drop("__rn")
  }
}
