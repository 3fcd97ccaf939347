package graft.store

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LayoutSpec extends SparkSpec {

  test("interleave: Morton bits — dim1 even positions, dim2 odd") {
    val sp = spark
    import sp.implicits._
    val got = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 0L), (0L, 3L), (3L, 3L), (5L, 2L))
      .toDF("a", "b")
      .select(Layout.interleave(col("a"), col("b"), 3).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // by hand: z(1,0)=1, z(0,1)=2, z(3,0)=0b0101=5, z(0,3)=0b1010=10,
    // z(3,3)=15, z(5,2)=0b011001=25 (a bits at 0,2,4; b bits at 1,3,5)
    assert(got == Seq(0L, 1L, 2L, 5L, 10L, 15L, 25L))
  }

  test("zOrderKey: buckets stay inside the bit budget at any range") {
    val sp = spark
    import sp.implicits._
    // dimension ranges far beyond 2^4 force non-trivial bucket widths
    val rows = (0 until 1000).map(i => (i.toLong, i.toLong * 7919L, i.toLong * 104729L))
      .toDF("id", "x", "y")
    val keys = Layout.zOrderKey(rows, "x", "y", bits = 4)
      .select(col("zkey")).collect().map(_.getLong(0))
    assert(keys.forall(k => k >= 0 && k < (1L << 8))) // 2*4 interleaved bits
    assert(keys.distinct.length > 1)
  }

  test("zOrderKey drops rows with a null dimension and keys the rest") {
    val sp = spark
    import sp.implicits._
    val rows = Seq((1L, Some(1L), Some(2L)), (2L, None, Some(3L)), (3L, Some(4L), None))
      .toDF("id", "x", "y")
    val got = Layout.zOrderKey(rows, "x", "y", bits = 8).select(col("id")).collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("rangeBounds: exact interpolated percentiles as split points") {
    val sp = spark
    import sp.implicits._
    val rows = (1 to 9).map(_.toDouble).toDF("v") // quartiles of 1..9: 3, 5, 7
    val got = Layout.rangeBounds(rows, "v", parts = 4)
      .collect().map(r => r.getAs[Long]("boundary") -> r.getAs[Double]("bound")).toMap
    assert(got == Map(1L -> 3.0, 2L -> 5.0, 3L -> 7.0))
  }

  test("z-order range partitions bound BOTH dimensions (the data-skipping win)") {
    val sp = spark
    import sp.implicits._
    // 64 users x 64 times — a time-sorted layout leaves every partition
    // covering the full user range; the z-order layout must not
    val rows = (for (u <- 0 until 64; t <- 0 until 64) yield (u.toLong, t.toLong))
      .toDF("user_id", "ts_us")
    val parts = 16
    def avgUserSpan(df: org.apache.spark.sql.DataFrame, sortCol: String): Double = {
      val spans = df.repartitionByRange(parts, col(sortCol))
        .select(col("user_id"), spark_partition_id().as("p"))
        .groupBy(col("p")).agg((max(col("user_id")) - min(col("user_id"))).as("span"))
        .collect().map(_.getAs[Long]("span"))
      spans.sum.toDouble / spans.length
    }
    val zed = Layout.zOrderKey(rows, "user_id", "ts_us", bits = 6)
    val zSpan = avgUserSpan(zed, "zkey")
    val tSpan = avgUserSpan(rows.withColumn("zkey", col("ts_us")), "zkey")
    // time-sorted partitions span ~the full 63-wide user range; z-ordered
    // partitions a small corner of it
    assert(tSpan > 60.0)
    assert(zSpan < tSpan / 2.0)
  }

  test("compactionPlan: contiguous first-fit groups; oversized file isolated") {
    val sp = spark
    import sp.implicits._
    val files = Seq(
      ("p1", "f01", 600L), ("p1", "f02", 600L), ("p1", "f03", 600L), // spills into grp 0
      ("p1", "f04", 600L),  // cum_before 1800 -> grp 1
      ("p1", "f05", 5000L), // oversized: cum_before 2400 -> grp 2, alone
      ("p1", "f06", 100L),  // cum_before 7400 -> grp 7 (after the big one)
      ("p2", "f01", 10L))   // other partition independent
      .toDF("part", "file", "rows")
    val got = Layout.compactionPlan(files, "part", "file", "rows", targetRows = 1000L)
      .collect()
      .map(r => (r.getAs[String]("part"), r.getAs[String]("file")) ->
        ((r.getAs[Long]("grp"), r.getAs[Long]("grp_rows"), r.getAs[Long]("grp_files"))))
      .toMap
    assert(got(("p1", "f01"))._1 == 0L)
    assert(got(("p1", "f02"))._1 == 0L)
    assert(got(("p1", "f03"))._1 == 1L) // cum_before 1200 -> group 1
    assert(got(("p1", "f04"))._1 == 1L)
    assert(got(("p1", "f05")) == ((2L, 5000L, 1L))) // big file alone
    assert(got(("p1", "f06"))._1 == 7L)
    assert(got(("p2", "f01")) == ((0L, 10L, 1L)))
    // groups are contiguous runs: files sorted by name have nondecreasing grp
    val grpsInOrder = got.toSeq.filter(_._1._1 == "p1").sortBy(_._1._2).map(_._2._1)
    assert(grpsInOrder == grpsInOrder.sorted)
  }

  test("backfillPlan lists exactly the empty windows of the grid") {
    val sp = spark
    import sp.implicits._
    val W = 100L
    // key a: data in windows 0 and 2 of [0, 400) -> missing 1, 3
    // key b: only window 3 -> missing 0, 1, 2
    val df = Seq(("a", 10L), ("a", 50L), ("a", 250L), ("b", 390L),
      ("a", 500L) /* outside the grid */).toDF("k", "t")
    val got = graft.store.Layout.backfillPlan(df, "k", "t", 0L, 400L, W)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toList
    assert(got == List(
      ("a", 100L, 200L), ("a", 300L, 400L),
      ("b", 0L, 100L), ("b", 100L, 200L), ("b", 200L, 300L)))
  }

  test("clusteringDepth: disjoint ranges depth 1, full overlap depth n") {
    val sp = spark
    import sp.implicits._
    val files = Seq(
      // key a: 3 disjoint files -> avg depth 1
      ("a", "f1", 0.0, 9.0), ("a", "f2", 10.0, 19.0), ("a", "f3", 20.0, 29.0),
      // key b: 3 fully overlapping files -> every file overlaps all 3
      ("b", "f1", 0.0, 100.0), ("b", "f2", 0.0, 100.0), ("b", "f3", 5.0, 50.0))
      .toDF("k", "f", "lo", "hi")
    val got = graft.store.Layout.clusteringDepth(files, "k", "f", "lo", "hi")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toList
    assert(got == List(("a", 3L, 1.0, 1L), ("b", 3L, 3.0, 3L)))
  }
}
