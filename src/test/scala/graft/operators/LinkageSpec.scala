package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LinkageSpec extends SparkSpec {

  // ten clean records and their one-char-corrupted twins; the corruption
  // position cycles so every blocking third gets hit somewhere
  private def frames = {
    val sp = spark
    import sp.implicits._
    val clean = (0 until 10).map(i => (i.toLong, f"record-number-$i%04d", s"grp${i % 2}"))
      .toDF("id", "name", "grp")
    val dirty = (0 until 10).map { i =>
      val nm = f"record-number-$i%04d".toCharArray
      nm(i % nm.length) = '#'
      (i.toLong + 100L, new String(nm), s"grp${i % 2}")
    }.toDF("id", "name", "grp")
    def keyed(df: org.apache.spark.sql.DataFrame) = df.select(
      col("id"), col("name"), col("grp"),
      concat(col("grp"), lit(":"), col("name").substr(lit(6), lit(13))).as("bk_a"),
      concat(col("grp"), lit(":"), col("name").substr(lit(1), lit(5)),
        col("name").substr(lit(11), lit(8))).as("bk_b"),
      concat(col("grp"), lit(":"), col("name").substr(lit(1), lit(10))).as("bk_c"))
    (keyed(clean), keyed(dirty))
  }

  test("bestMatches re-links every corrupted twin despite single-key blocking misses") {
    val (clean, dirty) = frames
    val out = Linkage.bestMatches(clean, dirty, "id", "id",
      Seq("bk_a", "bk_b", "bk_c"), Seq("name"), minScore = 0.9)
      .collect().map(r => r.getAs[Long]("left_id") -> r.getAs[Long]("right_id")).toMap
    assert(out.size == 10)
    out.foreach { case (l, r) => assert(r == l + 100L, s"left $l matched $r") }
    // a SINGLE pass cannot: corruption inside that pass's key window hides
    // the pair, so some records go unmatched
    val onePass = Linkage.bestMatches(clean, dirty, "id", "id",
      Seq("bk_c"), Seq("name"), minScore = 0.9).count()
    assert(onePass < 10, s"one blocking pass matched all $onePass — test data too easy")
  }

  test("bestMatches emits one row per left record, per-field sims and their mean") {
    val (clean, dirty) = frames
    val out = Linkage.bestMatches(clean, dirty, "id", "id",
      Seq("bk_a", "bk_b", "bk_c"), Seq("name", "grp"), minScore = 0.5)
    assert(out.columns.toSeq ==
      Seq("left_id", "right_id", "sim_name", "sim_grp", "score"))
    val rows = out.collect()
    assert(rows.map(_.getAs[Long]("left_id")).distinct.length == rows.length)
    rows.foreach { r =>
      val expected = BigDecimal((r.getAs[Double]("sim_name") + r.getAs[Double]("sim_grp")) / 2)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getAs[Double]("score") - expected) < 1e-9)
      // one char of 18 differs: 1 - 1/18
      assert(r.getAs[Double]("sim_name") >= 0.944444)
      assert(r.getAs[Double]("sim_grp") == 1.0)
    }
  }

  test("minScore excludes weak candidates entirely") {
    val (clean, dirty) = frames
    val none = Linkage.bestMatches(clean, dirty, "id", "id",
      Seq("bk_a", "bk_b", "bk_c"), Seq("name"), minScore = 0.999)
    assert(none.count() == 0)
  }

  test("parameter validation fails loudly") {
    val (clean, dirty) = frames
    intercept[IllegalArgumentException] {
      Linkage.bestMatches(clean, dirty, "id", "id", Seq(), Seq("name"), 0.5)
    }
    intercept[IllegalArgumentException] {
      Linkage.bestMatches(clean, dirty, "id", "id", Seq("bk_a"), Seq(), 0.5)
    }
    intercept[IllegalArgumentException] {
      Linkage.bestMatches(clean, dirty, "id", "id", Seq("bk_a"), Seq("name"), 1.5)
    }
  }
}
