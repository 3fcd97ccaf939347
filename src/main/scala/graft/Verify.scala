package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // local-iteration subset (comma-separated names); the driver never sets
    // this, so its runs always dump the full surface
    val only = sys.env.get("SPARK_GRAFT_VERIFY_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
    val failed = selected.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        None
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        Some(name)
      } finally
        // the dump is this frame's only evaluation — release the query's
        // call-scoped operator persists so a 259-query pass doesn't pin
        // one users-sized frame per rank call (r10 verdict #4)
        operators.TimeSeries.releaseCallScopedPersists()
    }
    // loud summary: a query that stops resolving must not vanish silently
    // from the round's correctness surface (round 5 lost 53 queries to a
    // testdata schema change with only per-query stderr lines as evidence)
    if (failed.nonEmpty)
      System.err.println(
        s"[verify] SUMMARY: ${failed.size}/${selected.size} queries FAILED to dump: ${failed.mkString(", ")}")
    else
      System.err.println(s"[verify] SUMMARY: all ${selected.size} queries dumped")
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // static oracles + the data-dependent ones (IVF centroids trained here
    // with the engine's own seeded code, embedded as SQL literals). A
    // failure generating the dynamic entries must not sink the whole dump —
    // the affected queries just degrade to rows-only for the round.
    val dynamic =
      try SparkEntry.dataDependentOracles(spark, sfDir)
      catch { case e: Throwable =>
        System.err.println(s"[verify] data-dependent oracles failed: ${e.getMessage}")
        Map.empty[String, String]
      }
    val oracles = SparkEntry.oracleSql ++ dynamic
    val json = oracles
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
