package graft

/** Tiny driver-contract smoke: SparkEntry.entry must return rows > 0 on
  * sf0.001 (mirrors the driver's t1 check).
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
    val n = SparkEntry.entry(spark).count()
    println(s"ENTRY_ROWS=$n")
    spark.stop()
    if (n <= 0) sys.exit(1)
  }
}
