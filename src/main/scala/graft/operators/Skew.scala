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
