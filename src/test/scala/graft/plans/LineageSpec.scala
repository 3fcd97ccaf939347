package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LineageSpec extends SparkSpec {

  test("lineage traces aggregates, joins, renames back to source columns") {
    val dir = "/root/testdata/sf0.001"
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val or = spark.read.parquet(s"$dir/orders.parquet")
    val q = li.join(or, li("l_orderkey") === or("o_orderkey"))
      .groupBy(col("o_orderstatus").as("status"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
        .as("revenue"),
        count(lit(1)).as("n"))
    val lin = Lineage.columns(q)
    assert(lin("status") == Set("orders.parquet.o_orderstatus"), lin.toString)
    assert(lin("revenue") ==
      Set("lineitem.parquet.l_extendedprice", "lineitem.parquet.l_discount"),
      lin.toString)
    assert(lin("n") == Set.empty[String], lin.toString) // count(1): no roots
  }

  test("lineage follows window functions and unions") {
    val sp = spark
    import sp.implicits._
    val dir = "/root/testdata/sf0.001"
    val ev = spark.read.parquet(s"$dir/events.parquet")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("event_id"))
    val ranked = ev.select(col("event_type"),
      row_number().over(w).as("rn"), col("value").as("v"))
    val lin = Lineage.columns(ranked)
    // rn's ORDER/PARTITION inputs count as lineage (they determine the value)
    assert(lin("rn") == Set("events.parquet.event_type", "events.parquet.event_id"),
      lin.toString)
    assert(lin("v") == Set("events.parquet.value"))

    val u = ev.select(col("value").as("x"))
      .union(ev.select(col("event_id").cast("double").as("x")))
    val linU = Lineage.columns(u)
    assert(linU("x") == Set("events.parquet.value", "events.parquet.event_id"),
      linU.toString)
  }
}
