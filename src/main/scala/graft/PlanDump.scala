package graft

/** Manual helper: prints formatted plans (not part of `sbt test`). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session("local[8]")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val qs = if (args.length > 1) args.drop(1).toSeq else Seq("q_range_scan", "q_get_data")
    qs.foreach { q =>
      println(s"========== $q")
      SparkEntry.queries(q)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
