package graft.operators

import org.apache.spark.sql.DataFrame

/** Stats-first routing for the driver/distributed size gates — ONE
  * convention (r12 verdict #3):
  *
  *  - a gate that only picks a PHYSICAL PLAN may read Catalyst statistics
  *    (`optimizedPlan.stats`, no driver job);
  *  - a gate that admits a frame to DRIVER MEMORY (a collect, a CSR build,
  *    a union-find table) must confirm with an EXACT count — statistics
  *    are estimates, and an underestimate would OOM the driver;
  *  - loop CONVERGENCE counts are semantic and always stay exact.
  *
  * The composition of the first two is [[definitelyExceeds]]: statistics
  * may send a frame to the distributed path EARLY (the only direction that
  * is conservative for driver memory — both paths are spec-pinned to
  * identical output, so routing is a physical choice only); anything under
  * the bytes bound still pays the exact count it was already paying. The
  * payoff is at scale: the expensive case IS the huge frame, which now
  * routes to the distributed plan without first running a corpus-sized
  * count job just to learn it is huge.
  */
object SizeGates {

  /** True when `df` is, per Catalyst statistics alone, definitely larger
    * than a `maxRows`-row driver bound: `sizeInBytes >= maxRows ·
    * maxRowBytes`. `maxRowBytes` is a deliberate OVER-estimate of row
    * width — overshooting it only routes fat-but-few-row frames to the
    * distributed path, which is the right call anyway (the driver bound
    * protects BYTES, rows are its proxy). Falls back to `false` (the exact
    * count) when the estimate cannot be trusted:
    *  - implausible statistics (absent stats surface as
    *    defaultSizeInBytes ≈ 2⁶³);
    *  - any Join upstream — size-only estimation MULTIPLIES the sides for
    *    non-equi joins (the blocked sweeps' `b1 <= b2` pair join made a
    *    toy-scale pair list read as gigabytes and silently flipped three
    *    cluster queries onto the distributed component loop), and
    *    equi-join fanout estimates are unreliable in both directions.
    * Reading `optimizedPlan.stats` launches no job.
    */
  def definitelyExceeds(df: DataFrame, maxRows: Long,
      maxRowBytes: Long = 1024L): Boolean = {
    val plan = df.queryExecution.optimizedPlan
    // a persisted-but-unmaterialized gate frame optimizes to an
    // InMemoryRelation LEAF whose stats still carry the child estimate —
    // the join must be hunted inside the cached physical plan too
    def physJoin(p: org.apache.spark.sql.execution.SparkPlan): Boolean = p.exists {
      case _: org.apache.spark.sql.execution.joins.BaseJoinExec => true
      // AQE wraps the real plan as a constructor arg, not a child — unwrap
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        physJoin(a.inputPlan)
      // a cache built over another cache: the join may sit arbitrarily
      // deep behind nested InMemoryTableScans (q_cluster_best's memoized
      // pair frame) — recurse through each cached build plan
      case s: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
        physJoin(s.relation.cachedPlan)
      case _ => false
    }
    val joined = plan.exists {
      case _: org.apache.spark.sql.catalyst.plans.logical.Join => true
      case imr: org.apache.spark.sql.execution.columnar.InMemoryRelation =>
        physJoin(imr.cachedPlan)
      case _ => false
    }
    val bytes = plan.stats.sizeInBytes
    !joined && bytes > 0 && bytes < BigInt(1L << 53) &&
      bytes >= BigInt(maxRows) * maxRowBytes
  }

  /** The row count the [[definitelyExceeds]] statistics imply:
    * `sizeInBytes / maxRowBytes` — the SAME row-width over-estimate the
    * exceed test used, so a caller that sizes downstream work (e.g. a
    * block count) off this value is consistent with the admission decision
    * it just made. Only meaningful right after `definitelyExceeds`
    * returned true (the stats are then known join-untainted and
    * plausible); returns 0 otherwise-shaped stats defensively. */
  def statsRowEstimate(df: DataFrame, maxRowBytes: Long = 1024L): Long = {
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (bytes <= 0 || bytes >= BigInt(1L << 53)) 0L
    else (bytes / maxRowBytes).toLong
  }
}
