package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** `spark.sql.extensions=graft.plans.GraftExtensions` — registers the
  * engine's native expressions and optimizer rules in any session (the
  * deployment path for a real cluster; [[graft.Engine.tune]] installs the
  * same pieces into an already-built session for tests/local runs).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => BucketPruneRule)
    ext.injectOptimizerRule(_ => DivRangePushdown)
  }
}

object GraftExtensions {
  type FunctionDescription = (FunctionIdentifier, ExpressionInfo,
    Seq[org.apache.spark.sql.catalyst.expressions.Expression] => org.apache.spark.sql.catalyst.expressions.Expression)

  val hformatFunction: FunctionDescription = (
    FunctionIdentifier("graft_hformat"),
    new ExpressionInfo(classOf[HFormatExpr].getName, "graft_hformat"),
    (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
      HFormatExpr.build(children))

  val hashnameFunction: FunctionDescription = (
    FunctionIdentifier("graft_hashname"),
    new ExpressionInfo(classOf[HashNameExpr].getName, "graft_hashname"),
    (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
      HashNameExpr.build(children))

  val normalizeTextFunction: FunctionDescription = (
    FunctionIdentifier("graft_normalize_text"),
    new ExpressionInfo(classOf[NormalizeTextExpr].getName, "graft_normalize_text"),
    (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
      NormalizeTextExpr.build(children))

  val functions: Seq[FunctionDescription] =
    Seq(hformatFunction, hashnameFunction, normalizeTextFunction)
}
