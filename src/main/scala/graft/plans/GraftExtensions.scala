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
    ext.injectFunction(GraftExtensions.hformatFunction)
    ext.injectOptimizerRule(_ => BucketPruneRule)
    ext.injectOptimizerRule(_ => DivRangePushdown)
  }
}

object GraftExtensions {
  val hformatFunction: (FunctionIdentifier, ExpressionInfo, Seq[org.apache.spark.sql.catalyst.expressions.Expression] => org.apache.spark.sql.catalyst.expressions.Expression) = (
    FunctionIdentifier("graft_hformat"),
    new ExpressionInfo(classOf[HFormatExpr].getName, "graft_hformat"),
    (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
      HFormatExpr.build(children))
}
