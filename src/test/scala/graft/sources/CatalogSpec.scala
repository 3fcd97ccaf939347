package graft.sources

import graft.SparkSpec

class CatalogSpec extends SparkSpec {

  test("registered views + native functions answer plain SQL") {
    val dir = "/root/testdata/sf0.001"
    Catalog.register(spark, dir)
    val viaSql = spark.sql(
      """SELECT event_type, count(*) AS n, graft_hformat(avg(value), 4) AS avg_fmt
        |FROM events_ts
        |WHERE ts_us >= 1704672000000000 AND value IS NOT NULL
        |GROUP BY event_type ORDER BY event_type""".stripMargin).collect()
    assert(viaSql.nonEmpty)
    assert(viaSql.forall(r => r.getString(2) != null && r.getString(2).nonEmpty))
    // joins across registered views work and match the DataFrame path
    val sqlCount = spark.sql(
      """SELECT count(*) FROM lineitem JOIN orders ON l_orderkey = o_orderkey"""
    ).collect().head.getLong(0)
    val dfCount = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir),
        org.apache.spark.sql.functions.col("l_orderkey") ===
          org.apache.spark.sql.functions.col("o_orderkey")).count()
    assert(sqlCount == dfCount && sqlCount > 0)
    // re-registration is idempotent
    Catalog.register(spark, dir)
    assert(spark.sql("SELECT count(*) FROM events_ts").collect().head.getLong(0) > 0)
  }
}
