package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's standard tuning.
  *
  * Local mode is a stand-in for a multi-executor cluster: every knob here is
  * chosen to behave identically on `local[32]` and on a 1000-executor
  * deployment (AQE on, modest shuffle parallelism locally, broadcast joins for
  * dimension tables).
  */
object Engine {

  /** 3-decimal HALF_UP formatter for artifact JSON — the one copy
    * (Bench/Scale both emit with it, so the artifacts can never drift on
    * rounding). Non-finite doubles render as JSON null: BigDecimal throws
    * on NaN/Infinity, and a crashed artifact writer is worse than a null
    * cell. */
  private[graft] def fmt3(v: Double): String =
    if (v.isNaN || v.isInfinite) "null"
    else BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString

  /** Confs every session needs, applicable to an existing session too (all are
    * runtime SQL confs). `nanosAsLong` lets Spark read the parquet
    * TIMESTAMP(NANOS) columns the reference-style event feeds carry; we expose
    * them as epoch-nanos longs and derive epoch-micros (see [[Tables]]).
    */
  def tune(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    // AQE on unless explicitly disabled (benchmark experiments)
    val aqe = sys.env.getOrElse("SPARK_GRAFT_AQE", "true")
    spark.conf.set("spark.sql.adaptive.enabled", aqe)
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", aqe)
    // engine extensions, idempotently (a cluster deployment would instead
    // set spark.sql.extensions=graft.plans.GraftExtensions)
    Seq(graft.plans.BucketPruneRule, graft.plans.DivRangePushdown).foreach { r =>
      if (!spark.experimental.extraOptimizations.contains(r))
        spark.experimental.extraOptimizations = spark.experimental.extraOptimizations :+ r
    }
    registerFunctions(spark)
    spark
  }

  /** Just the native-function registrations — for library code that needs
    * `graft_hformat`/`graft_hashname` to resolve but must NOT rewrite the
    * caller's session config the way [[tune]] does (timezone, AQE,
    * nanosAsLong are session-wide side effects an embedding application
    * owns).
    */
  def registerFunctions(spark: SparkSession): SparkSession = {
    graft.plans.GraftExtensions.functions.foreach { case (ident, info, builder) =>
      if (!spark.sessionState.functionRegistry.functionExists(ident))
        spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
    spark
  }

  def session(master: String = "local[32]", appName: String = "graft"): SparkSession = {
    val s = SparkSession
      .builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    tune(s)
  }
}
