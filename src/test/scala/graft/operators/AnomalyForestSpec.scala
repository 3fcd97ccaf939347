package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AnomalyForestSpec extends SparkSpec {

  test("training is deterministic: same data + seed = identical forest") {
    val sp = spark
    import sp.implicits._
    val df = (1 to 300).map(i => (i.toLong, (i % 17).toDouble, (i % 5).toDouble))
      .toDF("id", "a", "b")
    val f1 = AnomalyForest.train(df, "id", Seq(col("a"), col("b")), 5, 64, 4)
    val f2 = AnomalyForest.train(df, "id", Seq(col("a"), col("b")), 5, 64, 4)
    assert(f1 == f2)
    assert(f1.trees.size == 5)
  }

  test("an obvious outlier isolates earliest (smallest average path)") {
    val sp = spark
    import sp.implicits._
    // tight cluster around 0..9 plus one far point — the far point should
    // rank first (shortest isolation path)
    val rows = (1 to 200).map(i => (i.toLong, (i % 10).toDouble)) :+ (999L, 1000.0)
    val df = rows.toDF("id", "v")
    // sampleSize covers every row: an outlier absent from the training
    // sample scores like the nearest in-sample boundary point by design
    val top = AnomalyForest.anomalies(df, "id", Seq(col("v")),
      nTrees = 25, sampleSize = 256, maxDepth = 6, topN = 3)
      .collect().map(r => r.getLong(0))
    assert(top.head == 999L, s"outlier not ranked first: ${top.toList}")
  }

  test("scoreSql emits the same tree the expression scores (structure parity)") {
    val sp = spark
    import sp.implicits._
    val df = (1 to 100).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    val forest = AnomalyForest.train(df, "id", Seq(col("v")), 3, 32, 4)
    val sql = AnomalyForest.scoreSql(forest, Seq("v"))
    // every split threshold appears verbatim (shortest-round-trip) in the SQL
    def thresholds(t: AnomalyForest.ITree): Seq[Double] = t match {
      case AnomalyForest.ISplit(_, th, lo, hi) => th +: (thresholds(lo) ++ thresholds(hi))
      case _ => Nil
    }
    val ths = forest.trees.flatMap(thresholds)
    assert(ths.nonEmpty)
    ths.foreach(th => assert(sql.contains(th.toString), s"missing threshold $th"))
    // and Spark itself parses + evaluates the SQL to the same scores
    val viaExpr = df.select(col("id"),
      AnomalyForest.scoreExpr(forest, Seq(col("v").cast("double"))).as("s"))
    val viaSql = df.select(col("id"), expr(sql).as("s"))
    assert(viaExpr.except(viaSql).count() == 0 && viaSql.except(viaExpr).count() == 0)
  }
}
