package graft.sources

import org.apache.spark.sql.SparkSession

/** Plain-SQL surface: register the driver testdata (and the derived
  * micros-normalized events view) as temp views, so every capability is
  * reachable from `spark.sql("...")` alongside the DataFrame API — the
  * engine's native functions (`graft_hformat`, `graft_hashname`,
  * `graft_normalize_text`) are installed by [[graft.Engine.tune]] and
  * compose with these views in one statement.
  */
object Catalog {

  /** Idempotent: re-running repoints the views at `dir`. */
  def register(spark: SparkSession, dir: String): Unit = {
    graft.Engine.tune(spark)
    Tables.all.foreach { t =>
      Tables(spark, dir, t).createOrReplaceTempView(t)
    }
    // events with the epoch-micros `ts_us` column every query keys on,
    // whichever physical timestamp type the parquet carries
    Tables.events(spark, dir).createOrReplaceTempView("events_ts")
  }
}
