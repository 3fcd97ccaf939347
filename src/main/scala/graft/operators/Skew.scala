package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation plan shapes. Spark's partial aggregation already
  * two-phases *algebraic* aggregates (sum/count/min/max combine map-side,
  * so a hot key costs one merged row per task) — salting earns its keep on
  * the aggregates that are NOT algebraic over the raw rows, where a hot
  * key otherwise funnels all its rows through one reducer.
  */
object Skew {

  /** Salted exact count-distinct: `groupBy(key)` with
    * `count_distinct(dedup)` shuffles every (key, dedup) pair of a hot key
    * into one task. Deriving the salt FROM THE DEDUP COLUMN fixes that
    * while staying exact: equal values land in the same (key, salt) cell,
    * so per-cell distinct counts are disjoint and their per-key sum is the
    * true distinct count — phase one fans a hot key across `salts` tasks,
    * phase two merges `salts` small rows. Same result, bounded per-task
    * state at any skew.
    *
    * Output: (`key`, n_distinct, n) — `n` tags along for free as a plain
    * algebraic count.
    */
  /** Key-skew report: Gini coefficient + concentration stats of a key's
    * row-count distribution — the pre-flight check that decides whether a
    * join/aggregate on this key needs salting at all. With counts ranked
    * ascending, `gini = (2·Σ rank·c) / (k·Σc) − (k+1)/k` — every sum is an
    * exact integer, so the coefficient is one engine-stable division; 0 =
    * perfectly uniform keys, →1 = one key owns everything.
    *
    * Plan shape: one keyed count (map-side combinable), then a rank window
    * and a final aggregate over the KEYS-sized count frame, never the raw
    * rows — the window input is bounded by distinct-key cardinality
    * (profile a bucketed hash of the key first when even that frame is
    * too wide).
    *
    * Output: one row
    * `(n_keys, n_rows, max_count, top_share, gini)`.
    */
  def giniReport(df: DataFrame, key: String): DataFrame = {
    val counts = df.where(col(key).isNotNull)
      .groupBy(col(key)).agg(count(lit(1)).as("__c"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("__c"), col(key).cast("string")) // keys-sized frame
    counts.withColumn("__r", row_number().over(w).cast("long"))
      .agg(
        count(lit(1)).as("n_keys"),
        sum(col("__c")).as("n_rows"),
        max(col("__c")).as("max_count"),
        sum(col("__r") * col("__c")).as("__rc"))
      .select(col("n_keys"), col("n_rows"), col("max_count"),
        round(col("max_count") / col("n_rows"), 6).as("top_share"),
        when(col("n_keys") <= 1, lit(0.0)).otherwise(
          round((lit(2L) * col("__rc")) / (col("n_keys") * col("n_rows")) -
            (col("n_keys") + 1L) / col("n_keys").cast("double"), 6))
          .as("gini"))
  }

  def saltedDistinct(df: DataFrame, key: String, dedup: String, salts: Int): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts")
    df.select(col(key), col(dedup).as("__d"),
        pmod(hash(col(dedup)), lit(salts)).as("__salt"))
      .groupBy(col(key), col("__salt"))
      .agg(count_distinct(col("__d")).as("__nd"), count(lit(1)).as("__n"))
      .groupBy(col(key))
      .agg(sum(col("__nd")).cast("long").as("n_distinct"),
        sum(col("__n")).cast("long").as("n"))
  }
}
