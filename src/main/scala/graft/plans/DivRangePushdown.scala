package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, Cast, Expression, GreaterThan, GreaterThanOrEqual, IntegralDivide, LessThan, LessThanOrEqual, Literal, PredicateHelper, UnixMicros}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Derived-column pushdown: a range predicate on a monotone derivation of a
  * raw column implies a range predicate on the raw column itself — which,
  * unlike the derivation, data sources can push into parquet row-group/page
  * pruning. The original conjunct is kept (results are identical); only the
  * implied raw bound is added. Two derivation families are understood:
  *
  *  - `expr DIV k` (the engine's epoch-unit conversions and run-id
  *    derivations). Soundness for k > 0, literal v > 0 (IntegralDivide
  *    truncates toward 0):
  *      (a div k) >= v  ⟺  a >= v*k
  *      (a div k) >  v  ⟺  a >= (v+1)*k
  *      (a div k) <  v  ⟺  a < v*k
  *      (a div k) <= v  ⟺  a < (v+1)*k
  *    (negative `a` falls on the "false"/"true" side consistently in each
  *    case). Products that would overflow Long are skipped.
  *
  *  - `unix_micros(t)` (the `ts_us` derivation when `events.ts` is a
  *    parquet TIMESTAMP(MICROS) — see [[graft.sources.Tables.events]]).
  *    `unix_micros` is a bijection between timestamps and their internal
  *    epoch-micros longs, so every comparison carries over verbatim with
  *    the long literal re-typed as a timestamp literal (same internal
  *    value). For an NTZ column the derivation is `unix_micros(cast(ts as
  *    timestamp))`; the cast is the identity on the internal value only
  *    when the session timezone is UTC, so that rewrite is guarded on it.
  *
  * Derivations close transitively (run-id predicates are `unix_micros(ts)
  * DIV week`: the DIV step yields a `unix_micros` bound, which then yields
  * a raw `ts` bound), so [[apply]] iterates `implied` to a fixpoint over
  * the conjunct set.
  */
object DivRangePushdown extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjunctivePredicates(cond)
      var all = conjuncts
      var frontier = conjuncts
      var derived = Seq.empty[Expression]
      while (frontier.nonEmpty) {
        val next = frontier.flatMap(implied)
          .filterNot(d => all.exists(_.semanticEquals(d)))
        derived ++= next
        all ++= next
        frontier = next
      }
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

  /** The raw expression + re-typed literal for a `unix_micros` comparison:
    * the micros long `v` as a timestamp literal on the un-derived column.
    * Timestamp literals store the same internal Long, so this is purely a
    * re-typing; the NTZ form additionally needs the UTC-session guard.
    */
  private def tsBound(t: Expression, v: Long): Option[(Expression, Literal)] = t match {
    // the cast-stripping case must come first: a Cast's own dataType is
    // TimestampType too, and the bound belongs on the raw NTZ column (a
    // predicate left on the cast never reaches PushedFilters)
    case c: Cast if c.dataType == TimestampType && c.child.dataType == TimestampNTZType &&
        SQLConf.get.sessionLocalTimeZone == "UTC" =>
      Some((c.child, Literal(v, TimestampNTZType)))
    case a if a.dataType == TimestampType => Some((a, Literal(v, TimestampType)))
    case _ => None
  }

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
    // unix_micros is a bijection: comparisons carry over with the literal
    // re-typed (no sign constraint, no overflow risk)
    case GreaterThanOrEqual(UnixMicros(t), Literal(v: Long, LongType)) =>
      tsBound(t, v).map { case (a, l) => GreaterThanOrEqual(a, l) }
    case GreaterThan(UnixMicros(t), Literal(v: Long, LongType)) =>
      tsBound(t, v).map { case (a, l) => GreaterThan(a, l) }
    case LessThan(UnixMicros(t), Literal(v: Long, LongType)) =>
      tsBound(t, v).map { case (a, l) => LessThan(a, l) }
    case LessThanOrEqual(UnixMicros(t), Literal(v: Long, LongType)) =>
      tsBound(t, v).map { case (a, l) => LessThanOrEqual(a, l) }
    // literal-on-the-left mirror forms
    case LessThanOrEqual(l @ Literal(_: Long, LongType), d) if mirrors(d) =>
      implied(GreaterThanOrEqual(d, l))
    case LessThan(l @ Literal(_: Long, LongType), d) if mirrors(d) =>
      implied(GreaterThan(d, l))
    case GreaterThanOrEqual(l @ Literal(_: Long, LongType), d) if mirrors(d) =>
      implied(LessThanOrEqual(d, l))
    case GreaterThan(l @ Literal(_: Long, LongType), d) if mirrors(d) =>
      implied(LessThan(d, l))
    case _ => None
  }

  private def mirrors(e: Expression): Boolean = e match {
    case _: IntegralDivide | _: UnixMicros => true
    case _ => false
  }
}
