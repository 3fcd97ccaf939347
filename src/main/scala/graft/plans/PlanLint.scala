package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{RDDScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.WindowExec

/** Physical-plan linter: walks an executed plan and reports the shapes that
  * kill a job at 100 TB long before any row is read — the checks a reviewer
  * runs by eye on `.explain("formatted")`, as a library, so they can run in
  * CI over every registered query instead of on whichever plan someone
  * remembered to look at.
  *
  * Rules (each finding names the rule, the node, and why it bites):
  *  - `cartesian-product`: `CartesianProductExec` — O(n·m) row pairs.
  *  - `nested-loop-join`: `BroadcastNestedLoopJoinExec` — fine for a 1-row
  *    bound/constant frame (the documented control-plane cross joins),
  *    fatal for anything data-sized; flagged so call sites must be
  *    consciously allowlisted.
  *  - `global-window`: `WindowExec` with an empty partition spec — moves
  *    the WHOLE input to one task ("No Partition Defined" at runtime).
  *    Benign only on control-plane frames (chunk seeds, 1-row offsets).
  *  - `driver-materialized-input`: `RDDScanExec` ("ExistingRDD") — the
  *    input was collected/created on the driver; the operator upstream of
  *    it is not reading from the cluster.
  *
  * Linting inspects the plan only — no job runs.
  */
object PlanLint {

  final case class Finding(rule: String, node: String, detail: String)

  def lintPlan(plan: SparkPlan): Seq[Finding] =
    lintPlan(plan, new java.util.IdentityHashMap[AnyRef, AnyRef]())

  private def lintPlan(plan: SparkPlan,
      seenCaches: java.util.IdentityHashMap[AnyRef, AnyRef]): Seq[Finding] = {
    val here = plan match {
      case c: CartesianProductExec =>
        Seq(Finding("cartesian-product", c.nodeName,
          "O(left·right) pair blowup; join keys missing or non-equi"))
      case j: BroadcastNestedLoopJoinExec =>
        Seq(Finding("nested-loop-join", j.nodeName,
          "broadcast side re-scanned per partition; only safe for a " +
            "control-plane-sized (≈1-row) side"))
      case w: WindowExec if w.partitionSpec.isEmpty =>
        Seq(Finding("global-window", w.nodeName,
          "empty PARTITION BY moves the whole input to one task"))
      case r: RDDScanExec =>
        Seq(Finding("driver-materialized-input", r.nodeName,
          "input was materialized on the driver (ExistingRDD), not read " +
            "from a distributed source"))
      case _ => Nil
    }
    // plain collect() stops at adaptive boundaries: descend through AQE
    // wrappers, materialized query stages, AND cached-plan scans (a
    // persist() must not hide its subplan from the audit — the cached work
    // still runs). Each distinct cached relation is audited ONCE, however
    // many scans reference it: that matches runtime, where the cache
    // materializes a single time.
    val kids = plan match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case s: QueryStageExec => Seq(s.plan)
      case im: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
        // plan branches get per-branch InMemoryRelation COPIES (fresh attr
        // ids) that all share one cacheBuilder — the thing that actually
        // materializes once; dedupe on it
        val unit: AnyRef = im.relation.cacheBuilder
        if (seenCaches.containsKey(unit)) Nil
        else { seenCaches.put(unit, unit); Seq(im.relation.cachedPlan) }
      case o => o.children
    }
    here ++ kids.flatMap(lintPlan(_, seenCaches)) ++
      plan.subqueries.flatMap(lintPlan(_, seenCaches))
  }

  def lint(df: DataFrame): Seq[Finding] = lintPlan(df.queryExecution.executedPlan)
}
