package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Plan-shape pins for the iterative graph loops' 100×-scale story: the
  * cached edge frame is pre-partitioned on the loop's join key, so the
  * EDGE-sized side must never re-exchange inside a round — only the
  * nodes-sized state side and the group-back aggregate may shuffle. At toy
  * scale AQE broadcasts the state side and hides the question, so the tests
  * force the merge/shuffle join path the 100× plan would take.
  *
  * One pin per loop shape: pageRank's left-outer round join, BOTH of hits'
  * alternating halves (src-keyed hub read, dst-keyed auth read — the two
  * cached copies), and labelPropagation's vote join.
  */
class GraphPlanSpec extends graft.SparkSpec {

  /** The edge frame is the JOIN's LEFT child in every loop, so the first
    * InMemoryTableScan printed after the join line is the edge side; a bare
    * cached scan means no Exchange and no Sort lines in between. Scanning to
    * the first InMemoryTableScan (not a fixed line offset) survives wrapper
    * nodes AQE or a Spark upgrade may insert, and never indexes past the end
    * (r11 ADVICE: exact line adjacency was brittle).
    */
  private def assertBareCachedEdgeSide(df: DataFrame, joinPred: String => Boolean,
      what: String): Unit = {
    val plan = df.queryExecution.executedPlan.toString
    val lines = plan.linesIterator.toVector
    val joinIdx = lines.indexWhere(joinPred)
    assert(joinIdx >= 0, s"[$what] expected the forced non-broadcast join in:\n$plan")
    val below = lines.drop(joinIdx + 1)
    val memIdx = below.indexWhere(_.contains("InMemoryTableScan"))
    assert(memIdx >= 0, s"[$what] no InMemoryTableScan under the round join:\n$plan")
    val between = below.take(memIdx)
    assert(!between.exists(l => l.contains("Exchange") || l.contains("Sort")),
      s"[$what] Exchange/Sort between the round join and the cached edge scan " +
        s"(the 100× plan would re-shuffle the corpus every round):\n$plan")
  }

  /** Runs `body` with broadcast joins disabled (both planner and AQE
    * thresholds), restoring the session confs afterwards. */
  private def forcedNonBroadcast[A](sp: SparkSession)(body: => A): A = {
    val b0 = sp.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val b1 = sp.conf.getOption("spark.sql.adaptive.autoBroadcastJoinThreshold")
    try {
      sp.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      sp.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      body
    } finally {
      sp.conf.set("spark.sql.autoBroadcastJoinThreshold", b0)
      b1 match {
        case Some(v) => sp.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", v)
        case None => sp.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      }
    }
  }

  private def edges200(sp: SparkSession): DataFrame = {
    import sp.implicits._
    (0L until 200L).map(i => (i % 50, (i * 7 + 1) % 50)).toDF("src", "dst")
      .where(col("src") =!= col("dst"))
  }

  test("pageRank round: pre-partitioned cached edge frame is not re-exchanged (forced non-broadcast)") {
    val sp = spark
    forcedNonBroadcast(sp) {
      val e = edges200(sp)
      val outd = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
      // the pageRank `ed` build, partitioning AND ordering pinned to the
      // join key — the exact production shape (Graph.pageRank's cache)
      val ed = e.join(outd, Seq("src")).repartition(col("src"))
        .sortWithinPartitions(col("src")).persist()
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
        assertBareCachedEdgeSide(round,
          l => l.contains("SortMergeJoin") && l.contains("LeftOuter"), "pageRank")
      } finally ed.unpersist(blocking = false)
    }
  }

  test("hits rounds: BOTH cached copies (src- and dst-keyed) serve their half bare (forced non-broadcast)") {
    val sp = spark
    forcedNonBroadcast(sp) {
      val e = edges200(sp)
      val eBySrc = e.repartition(col("src")).sortWithinPartitions(col("src")).persist()
      val eByDst = e.repartition(col("dst")).sortWithinPartitions(col("dst")).persist()
      eBySrc.count(); eByDst.count()
      try {
        // the loop state after a half-round: LogicalRDD, unknown layout
        val raw = e.select(col("dst").as("node"), lit(3L).as("raw"))
          .groupBy(col("node")).agg(sum(col("raw")).as("raw"))
          .localCheckpoint()
        // auth half (round ≥ 2): hub state read through the SRC-keyed copy
        val authHalf = eBySrc
          .join(raw.select(col("node").as("__hn"), col("raw").as("__hr")),
            col("src") === col("__hn"))
          .groupBy(col("dst").as("node"))
          .agg(sum(expr("__hr DIV 2L")).as("raw"))
        assertBareCachedEdgeSide(authHalf,
          l => l.contains("Join") && l.contains("Inner"), "hits auth half")
        // hub half: auth state read through the DST-keyed copy
        val hubHalf = eByDst
          .join(raw.select(col("node").as("__an"), col("raw").as("__ar")),
            col("dst") === col("__an"))
          .groupBy(col("src").as("node"))
          .agg(sum(expr("__ar DIV 2L")).as("raw"))
        assertBareCachedEdgeSide(hubHalf,
          l => l.contains("Join") && l.contains("Inner"), "hits hub half")
      } finally { eBySrc.unpersist(blocking = false); eByDst.unpersist(blocking = false) }
    }
  }

  test("labelPropagation round: the vote join reads the src-keyed cache bare (forced non-broadcast)") {
    val sp = spark
    import sp.implicits._
    forcedNonBroadcast(sp) {
      val e = edges200(sp)
      val eBySrc = e.repartition(col("src")).sortWithinPartitions(col("src")).persist()
      eBySrc.count()
      try {
        val seeded = Seq((1L, 10L), (2L, 20L)).toDF("node", "label").localCheckpoint()
        val ns = e.select(col("dst").as("node"),
            when(col("dst") % 2 === 0, col("dst")).as("label")).distinct()
          .localCheckpoint()
        val voters = seeded.unionByName(ns.where(col("label").isNotNull))
        val votes = eBySrc
          .join(voters, eBySrc("src") === col("node"))
          .groupBy(col("dst"), col("label"))
          .agg(count(lit(1)).as("__cnt"))
        assertBareCachedEdgeSide(votes,
          l => l.contains("Join") && l.contains("Inner"), "labelPropagation votes")
      } finally eBySrc.unpersist(blocking = false)
    }
  }
}
