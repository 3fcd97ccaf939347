package graft

/** Plan audit: pushed filters + pruned read schemas must reach the scans of
  * the flagship queries (SURVEY §4 "free" optimizations, verified).
  */
class PlanAuditSpec extends SparkSpec {

  private def formatted(q: String): String = {
    val df = SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
    org.apache.spark.sql.execution.debug.codegenString(df.queryExecution.executedPlan)
    df.queryExecution.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
  }

  test("range scan pushes key + time filters and prunes columns") {
    val plan = formatted("q_range_scan")
    assert(plan.contains("PushedFilters") && plan.contains("event_type"), plan)
    // DivRangePushdown: the ts_us range becomes a raw-nanos pushed filter
    assert(plan.contains("GreaterThanOrEqual(ts,1704672000000000000)"), plan)
    assert(plan.contains("LessThan(ts,1705881600000000000)"), plan)
    // only needed columns are read
    val readSchema = plan.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(!readSchema.contains("props"), readSchema)
  }

  test("dim join broadcasts the part dimension") {
    val plan = formatted("q_dim_join")
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("latest-per-key is a two-phase (partial) aggregation, not a window") {
    val plan = formatted("q_latest_per_key")
    assert(plan.contains("HashAggregate") || plan.contains("SortAggregate"), plan)
    assert(!plan.contains("Window"), plan)
  }
}
