package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Diagnostic main for the `_dist_*` probe pair (r10 verdict ask #1):
  * rebuilds the same memoized inputs Bench uses, runs the selected probes
  * once each, and prints wall, SPARK JOB COUNT, and the per-round trace
  * ([[graft.operators.Graph.RoundTrace]]) — the decomposition that tells a
  * plan defect (few rounds, fat per-round cost) apart from irreducible
  * iteration work (many cheap rounds at the job floor).
  *
  * Not part of the bench contract; run via
  * `sbt "runMain graft.ProbeProfile _dist_kcore _dist_hits"` with
  * `SPARK_GRAFT_SF_DIR` pointing at a testdata scale dir.
  */
object ProbeProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq else Seq("_dist_kcore", "_dist_hits")
    val cpus = Runtime.getRuntime.availableProcessors()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(jobStart: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })
    // inputs untimed, exactly like Bench's dist-twin phase
    SparkEntry.sharedFrameBuilders.toSeq.sortBy(_._1).foreach { case (_, fn) =>
      fn(spark, sfDir).count()
    }
    for (name <- names) {
      val fn = SparkEntry.distTwinQueries(name)
      System.gc()
      val j0 = jobs.get()
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      // listener dispatch is async — give the bus a moment to drain so the
      // job count isn't read short (diagnostic-grade, not exact)
      Thread.sleep(500)
      val nj = jobs.get() - j0
      println(f"PROBE $name wall=$wall%.2fs jobs=$nj rows=$n")
      val trace = name match {
        case "_dist_kcore" => operators.Graph.lastKCoreTrace
        case "_dist_hits" => operators.Graph.lastHitsTrace
        case _ => Nil
      }
      trace.foreach(r => println(s"  round=${r.round} wallMs=${r.wallMs} rows=${r.rows}"))
    }
    spark.stop()
  }
}
