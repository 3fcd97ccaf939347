package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewSpec extends SparkSpec {

  test("saltedDistinct: exact at any salt width, including a heavily skewed key") {
    val sp = spark
    import sp.implicits._
    // key "hot" gets 500 rows over 100 users (each user repeated), "cold" 3
    val df = ((1 to 500).map(i => ("hot", (i % 100).toLong)) ++
      Seq(("cold", 1L), ("cold", 1L), ("cold", 2L)))
      .toDF("k", "u")
    val expected = df.groupBy(col("k"))
      .agg(countDistinct(col("u")).as("nd"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    for (salts <- Seq(1, 7, 64)) {
      val got = Skew.saltedDistinct(df, "k", "u", salts)
        .collect()
        .map(r => (r.getAs[String]("k"),
          (r.getAs[Long]("n_distinct"), r.getAs[Long]("n")))).toMap
      assert(got == expected, s"salts=$salts")
    }
    assert(expected("hot") == ((100L, 500L)) && expected("cold") == ((2L, 3L)))
  }

  test("saltedDistinct: null dedup values behave like count_distinct (ignored)") {
    val sp = spark
    import sp.implicits._
    val df = Seq(("a", java.lang.Long.valueOf(1L)), ("a", null.asInstanceOf[java.lang.Long]),
      ("a", java.lang.Long.valueOf(1L))).toDF("k", "u")
    val got = Skew.saltedDistinct(df, "k", "u", 8).collect()
      .map(r => (r.getAs[Long]("n_distinct"), r.getAs[Long]("n"))).head
    // count_distinct skips nulls; the row count does not
    assert(got == ((1L, 3L)))
  }

  test("giniReport: uniform keys score 0; a dominant key drives gini and top_share up") {
    val sp = spark
    import sp.implicits._
    val uniform = (0 until 40).map(i => ("k" + (i % 4))).toDF("k")
    val u = Skew.giniReport(uniform, "k").collect()(0)
    assert(u.getAs[Long]("n_keys") == 4L && u.getAs[Long]("n_rows") == 40L)
    assert(u.getAs[Double]("gini") == 0.0)
    assert(u.getAs[Double]("top_share") == 0.25)

    // counts 1,1,1,17: gini = 2*(1*1+2*1+3*1+4*17)/(4*20) - 5/4 = 148/80 - 1.25 = 0.6
    val skewed = (Seq.fill(17)("hot") ++ Seq("a", "b", "c")).toDF("k")
    val s = Skew.giniReport(skewed, "k").collect()(0)
    assert(s.getAs[Long]("max_count") == 17L)
    assert(s.getAs[Double]("top_share") == 0.85)
    assert(s.getAs[Double]("gini") == 0.6)
  }

  test("countMinAudit: estimates never undercount; wide sketch is exact; topN caps") {
    val sp = spark
    import sp.implicits._
    val rows = ((Seq.fill(10)(1L) ++ Seq.fill(7)(2L) ++ Seq.fill(3)(3L) ++
      Seq(4L, 5L)).map(Option(_)) :+ Option.empty[Long]).toDF("k")
    // 5 keys into a wide sketch: collisions effectively impossible at
    // width 4096 x depth 4 -> estimate == exact everywhere
    val wide = Skew.countMinAudit(rows, "k", width = 4096, depth = 4, topN = 3)
      .collect()
    assert(wide.length == 3) // topN cap
    assert(wide.map(r => (r.getAs[Long]("k"), r.getAs[Long]("exact"))).toSeq ==
      Seq((1L, 10L), (2L, 7L), (3L, 3L)))
    assert(wide.forall(_.getAs[Long]("overcount") == 0L))
    // 5 keys into 2 cells MUST collide: the CM one-sided error guarantee
    // (estimate >= exact) still holds, and at least one key overcounts
    val tight = Skew.countMinAudit(rows, "k", width = 2, depth = 2, topN = 5)
      .collect()
    assert(tight.forall(r => r.getAs[Long]("estimate") >= r.getAs[Long]("exact")))
    assert(tight.exists(_.getAs[Long]("overcount") > 0L))
  }

  test("saltedJoin == plain inner join on a hot-key fixture; joins on (key, salt)") {
    val sp = spark
    import sp.implicits._
    // 90% of fact rows share key 1 (the hot key)
    val fact = (1 to 1000).map(i => (if (i <= 900) 1L else (i % 50).toLong, i.toDouble))
      .toDF("k", "v")
    val dim = (0L to 49L).map(k => (k, s"d$k")).toDF("k", "name")
    val salted = Skew.saltedJoin(fact, dim, "k", salts = 8, tieBreak = "v")
    val plain = fact.join(dim, Seq("k"))
    assert(salted.count() == plain.count())
    assert(salted.select("k", "v", "name").except(plain.select("k", "v", "name")).count() == 0)
    assert(plain.select("k", "v", "name").except(salted.select("k", "v", "name")).count() == 0)
    // the physical join condition carries the salt: hot key spreads
    val plan = salted.queryExecution.executedPlan.toString
    assert(plan.contains("__salt"), plan)
  }
}
