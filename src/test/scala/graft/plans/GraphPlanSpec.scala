package graft.plans

import org.apache.spark.sql.functions._

/** Plan-shape pins for the iterative graph loops' 100×-scale story: the
  * cached edge frame is pre-partitioned on the loop's join key, so the
  * EDGE-sized side must never re-exchange inside a round — only the
  * nodes-sized state side and the group-back aggregate may shuffle. At toy
  * scale AQE broadcasts the state side and hides the question, so the test
  * forces the merge/shuffle join path the 100× plan would take.
  */
class GraphPlanSpec extends graft.SparkSpec {

  test("pre-partitioned cached edge frame is not re-exchanged by the per-round join (forced non-broadcast)") {
    val sp = spark
    import sp.implicits._
    val b0 = sp.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val b1 = sp.conf.getOption("spark.sql.adaptive.autoBroadcastJoinThreshold")
    try {
      sp.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      sp.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val e = (0L until 200L).map(i => (i % 50, (i * 7 + 1) % 50)).toDF("src", "dst")
        .where(col("src") =!= col("dst"))
      val outd = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
      // the pageRank `ed` build, layout pinned to the join key
      val ed = e.join(outd, Seq("src")).repartition(col("src")).persist()
      ed.count() // materialize so the cached layout is the one planned against
      try {
        val sums = ed.select(col("dst").as("node"), lit(1L).as("m"))
          .groupBy(col("node")).agg(sum(col("m")).as("m"))
          .localCheckpoint() // the loop state: LogicalRDD, unknown layout
        // one pageRank-shaped round: edges ⟕ state, re-aggregate by dst
        val round = ed
          .join(sums.select(col("node").as("__sn"), col("m")),
            ed("src") === col("__sn"), "left_outer")
          .select(col("dst").as("node"),
            (col("outdeg") + coalesce(col("m"), lit(0L))).as("c"))
          .groupBy(col("node")).agg(sum(col("c")).as("m"))
        val plan = round.queryExecution.executedPlan.toString
        // the edge side of the per-round join must be the BARE cached scan:
        // no Exchange (the hash(src) layout satisfies the join's
        // distribution) and no Sort (the cached build already sorted by
        // src) between the join and InMemoryTableScan — otherwise every
        // round at 100× re-shuffles the corpus. A raw Exchange count would
        // also see the exchanges INSIDE the cached-build rendering, so
        // assert on the join's immediate left child instead.
        val lines = plan.linesIterator.toVector
        val joinIdx = lines.indexWhere(l => l.contains("SortMergeJoin") && l.contains("LeftOuter"))
        assert(joinIdx >= 0, s"expected a forced SortMergeJoin round:\n$plan")
        assert(lines(joinIdx + 1).contains("InMemoryTableScan"),
          s"edge side not a bare cached scan:\n$plan")
      } finally ed.unpersist(blocking = false)
    } finally {
      sp.conf.set("spark.sql.autoBroadcastJoinThreshold", b0)
      b1 match {
        case Some(v) => sp.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", v)
        case None => sp.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      }
    }
  }
}
