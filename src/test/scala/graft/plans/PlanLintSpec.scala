package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PlanLintSpec extends SparkSpec {

  test("flags cartesian products, global windows, driver-materialized inputs") {
    val sp = spark
    import sp.implicits._
    // spark.range (not a local Seq): ConvertToLocalRelation would fold a
    // local-relation cross join into one LocalTableScan with no join node
    val a = sp.range(10).toDF("x")
    val b = sp.range(10).toDF("y")

    val cart = PlanLint.lint(a.crossJoin(b))
    assert(cart.exists(f => f.rule == "cartesian-product" || f.rule == "nested-loop-join"),
      cart.toString)

    val w = org.apache.spark.sql.expressions.Window.orderBy(col("x"))
    val globalWin = PlanLint.lint(a.withColumn("r", row_number().over(w)))
    assert(globalWin.exists(_.rule == "global-window"), globalWin.toString)

    val local = sp.createDataFrame(
      sp.sparkContext.parallelize(Seq(org.apache.spark.sql.Row(1, "a"))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("x",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("s",
          org.apache.spark.sql.types.StringType))))
    assert(PlanLint.lint(local).exists(_.rule == "driver-materialized-input"))
  }

  test("a clean keyed aggregation produces no findings") {
    val sp = spark
    import sp.implicits._
    val df = (1 to 100).map(i => (i % 5, i)).toDF("k", "v")
      .groupBy(col("k")).agg(sum(col("v")))
    assert(PlanLint.lint(df).isEmpty)
  }
}
