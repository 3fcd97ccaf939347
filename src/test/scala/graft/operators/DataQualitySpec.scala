package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DataQualitySpec extends SparkSpec {

  test("check: one scan, per-rule counts, null predicate counts as violation") {
    val sp = spark
    import sp.implicits._
    import DataQuality.Rule
    val df = Seq(
      (Some(5.0), Some("a")),
      (Some(-1.0), Some("b")), // range violation
      (None, Some("a")), // null value: violates BOTH value rules (3VL)
      (Some(7.0), None))
      .toDF("v", "k")
    val got = DataQuality.check(df, Seq(
      Rule("v_nonneg", col("v") >= 0),
      Rule("v_present", col("v").isNotNull),
      Rule("k_present", col("k").isNotNull)))
      .collect()
      .map(r => (r.getAs[String]("rule"),
        (r.getAs[Long]("n_rows"), r.getAs[Long]("n_violations"), r.getAs[Double]("violation_rate"))))
      .toMap
    assert(got("v_nonneg") == ((4L, 2L, 0.5))) // the -1 AND the null
    assert(got("v_present") == ((4L, 1L, 0.25)))
    assert(got("k_present") == ((4L, 1L, 0.25)))
  }

  test("check: empty frame reports zero rows and 0.0 rates") {
    val sp = spark
    import sp.implicits._
    import DataQuality.Rule
    val df = Seq((1L, "x")).toDF("a", "b").where(lit(false))
    val got = DataQuality.check(df, Seq(Rule("a_pos", col("a") > 0))).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getAs[Long]("n_rows") == 0L && r.getAs[Long]("n_violations") == 0L
      && r.getAs[Double]("violation_rate") == 0.0)
  }

  test("refIntegrity: orphans and null child keys are violations") {
    val sp = spark
    import sp.implicits._
    val child = Seq(Some(1L), Some(2L), Some(99L), None).toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val r = DataQuality.refIntegrity("child.fk_resolves", child, "fk", parent, "pk")
      .collect().head
    assert(r.getAs[String]("rule") == "child.fk_resolves")
    assert(r.getAs[Long]("n_rows") == 4L)
    assert(r.getAs[Long]("n_violations") == 2L) // 99 and the null
    assert(r.getAs[Double]("violation_rate") == 0.5)
  }
}
