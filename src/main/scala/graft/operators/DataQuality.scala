package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations over arbitrary frames — the
  * Deequ/expectations-style audit a training-data pipeline gates its inputs
  * on (null rates, value ranges, cross-column consistency, referential
  * integrity), expressed as Column predicates so every rule compiles into
  * the ONE scan it is checked by.
  *
  * Semantics: a row VIOLATES a rule when the predicate is not TRUE — SQL
  * three-valued logic deliberately counts a NULL predicate as a violation
  * (a null inside `value BETWEEN 0 AND 400` means the row could not be
  * shown to satisfy the expectation).
  */
object DataQuality {

  /** One expectation: `passes` must evaluate TRUE on every row. */
  final case class Rule(name: String, passes: Column)

  private def quantize6(c: Column): Column = floor(c * 1000000.0) / 1000000.0

  /** Evaluate all `rules` against `df` in ONE map-side-combinable
    * aggregation pass (a single scan regardless of rule count): returns one
    * row per rule — `(rule, n_rows, n_violations, violation_rate)` with the
    * rate floor-quantized (ratio of two engine-exact longs). An empty frame
    * reports zero rows and a 0.0 rate for every rule.
    */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "no rules to check")
    val aggs = count(lit(1)).as("__n") +:
      rules.zipWithIndex.map { case (r, i) =>
        sum(when(!coalesce(r.passes, lit(false)), 1L).otherwise(0L)).as(s"__v$i")
      }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = rules.zipWithIndex.map { case (r, i) =>
      struct(lit(r.name).as("rule"), col("__n").as("n_rows"),
        coalesce(col(s"__v$i"), lit(0L)).as("n_violations"))
    }
    one.select(explode(array(rows: _*)).as("__r"))
      .select(col("__r.rule").as("rule"), col("__r.n_rows").as("n_rows"),
        col("__r.n_violations").as("n_violations"))
      .withColumn("violation_rate",
        when(col("n_rows") === 0, lit(0.0))
          .otherwise(quantize6(col("n_violations") / col("n_rows"))))
  }

  /** Referential-integrity expectation as the same report row: every
    * `childKey` value in `child` must resolve in `parent(parentKey)`.
    * Violations = child rows whose key has no parent match (null child keys
    * are violations too — they cannot be shown to resolve).
    *
    * Plan shape: one keyed left-anti join (broadcast when the parent key
    * set is small — the planner/AQE decides) plus two count aggregates;
    * nothing is collected.
    */
  def refIntegrity(name: String, child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String): DataFrame = {
    val keys = parent.select(col(parentKey).as("__pk")).distinct()
    val orphans = child.select(col(childKey).as("__ck"))
      .join(keys, col("__ck") === col("__pk"), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
    val total = child.agg(count(lit(1)).as("n_rows"))
    total.crossJoin(orphans) // two 1-row frames
      .select(lit(name).as("rule"), col("n_rows"), col("n_violations"))
      .withColumn("violation_rate",
        when(col("n_rows") === 0, lit(0.0))
          .otherwise(quantize6(col("n_violations") / col("n_rows"))))
  }
}
