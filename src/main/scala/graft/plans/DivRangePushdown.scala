package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, Expression, GreaterThan, GreaterThanOrEqual, IntegralDivide, LessThan, LessThanOrEqual, Literal, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Derived-column pushdown: a range predicate on `expr DIV k` (the engine's
  * epoch-unit conversions and run-id derivations, e.g. `ts_us = ts DIV
  * 1000`) implies a range predicate on `expr` itself — which, unlike the
  * division, data sources can push into parquet row-group/page pruning. The
  * original conjunct is kept (results are identical); only the implied raw
  * bound is added.
  *
  * Soundness for k > 0, literal v > 0 (IntegralDivide truncates toward 0):
  *   (a div k) >= v  ⟺  a >= v*k
  *   (a div k) >  v  ⟺  a >= (v+1)*k
  *   (a div k) <  v  ⟺  a < v*k
  *   (a div k) <= v  ⟺  a < (v+1)*k
  * (negative `a` falls on the "false"/"true" side consistently in each
  * case). Products that would overflow Long are skipped.
  */
object DivRangePushdown extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val derived = conjuncts.flatMap(implied).filterNot(d =>
        conjuncts.exists(_.semanticEquals(d)))
      if (derived.isEmpty) f
      else Filter(And(cond, derived.reduce[Expression](And(_, _))), child)
  }

  private def mulExact(a: Long, b: Long): Option[Long] =
    try Some(Math.multiplyExact(a, b)) catch { case _: ArithmeticException => None }

  /** (v+1)*k with BOTH the increment and the product overflow-checked —
    * v = Long.MaxValue would otherwise wrap before mulExact sees it.
    */
  private def incMulExact(v: Long, k: Long): Option[Long] =
    try Some(Math.multiplyExact(Math.addExact(v, 1L), k))
    catch { case _: ArithmeticException => None }

  private def implied(p: Expression): Option[Expression] = p match {
    case GreaterThanOrEqual(IntegralDivide(e, Literal(k: Long, LongType), _), Literal(v: Long, LongType))
        if k > 0 && v > 0 =>
      mulExact(v, k).map(b => GreaterThanOrEqual(e, Literal(b)))
    case GreaterThan(IntegralDivide(e, Literal(k: Long, LongType), _), Literal(v: Long, LongType))
        if k > 0 && v > 0 =>
      incMulExact(v, k).map(b => GreaterThanOrEqual(e, Literal(b)))
    case LessThan(IntegralDivide(e, Literal(k: Long, LongType), _), Literal(v: Long, LongType))
        if k > 0 && v > 0 =>
      mulExact(v, k).map(b => LessThan(e, Literal(b)))
    case LessThanOrEqual(IntegralDivide(e, Literal(k: Long, LongType), _), Literal(v: Long, LongType))
        if k > 0 && v > 0 =>
      incMulExact(v, k).map(b => LessThan(e, Literal(b)))
    // literal-on-the-left mirror forms
    case LessThanOrEqual(l @ Literal(_: Long, LongType), d: IntegralDivide) =>
      implied(GreaterThanOrEqual(d, l))
    case LessThan(l @ Literal(_: Long, LongType), d: IntegralDivide) =>
      implied(GreaterThan(d, l))
    case GreaterThanOrEqual(l @ Literal(_: Long, LongType), d: IntegralDivide) =>
      implied(LessThanOrEqual(d, l))
    case GreaterThan(l @ Literal(_: Long, LongType), d: IntegralDivide) =>
      implied(LessThan(d, l))
    case _ => None
  }
}
