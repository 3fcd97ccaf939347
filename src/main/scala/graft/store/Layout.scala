package graft.store

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical-layout helpers: multi-dimensional clustering keys for
  * write-time data skipping.
  *
  * A 100 TB store sorted by time alone answers time-range scans well and
  * key-range scans terribly: every file spans the whole key domain, so
  * min/max file statistics prune nothing. Z-ordering (Morton interleave of
  * bucketized dimensions) bounds EVERY clustered dimension's range within a
  * file, so parquet row-group stats and partition pruning fire on any of
  * them — the same trick Delta's OPTIMIZE ZORDER and Hudi clustering apply.
  * Everything here is pure integer column arithmetic: codegen'd, map-only,
  * engine-exact.
  */
object Layout {

  /** Morton interleave of two bucket indices (`bits` low bits each; dim 1
    * occupies even output bits, dim 2 odd). Inputs must be in
    * `[0, 2^bits)` — [[zOrderKey]]'s bucketization guarantees it.
    */
  def interleave(b1: Column, b2: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    (0 until bits).flatMap { i =>
      Seq(shiftleft(shiftright(b1, i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftright(b2, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_.bitwiseOR(_))
  }

  /** Range-partition boundary planner: the `parts − 1` exact interpolated
    * percentiles of a column — the split points a writer hands to
    * `repartitionByRange`/bucketing so output files carry equal row counts
    * regardless of value skew (fixed-width ranges don't). ONE combinable
    * aggregate; output is `parts − 1` rows.
    */
  def rangeBounds(df: DataFrame, c: String, parts: Int): DataFrame = {
    require(parts >= 2, s"parts must be >= 2, got $parts")
    val fracs = (1 until parts).map(i => i.toDouble / parts)
    df.where(col(c).isNotNull)
      .agg(expr(s"percentile($c, array(${fracs.mkString(", ")}))").as("__b"))
      .select(posexplode(col("__b")).as(Seq("__i", "__v")))
      .select((col("__i") + 1).cast("long").as("boundary"),
        round(col("__v"), 6).as("bound"))
  }

  /** Z-order clustering key over two integral dimensions: each is
    * bucketized to `bits` bits with an integer bucket width derived from
    * the frame's own min/max (`w = ((max - min) div 2^bits) + 1`, so the
    * index never overflows the bit budget and `(x - min) * k` overflow
    * can't occur — the subtraction happens BEFORE any scaling), then
    * Morton-interleaved. Rows with a null in either dimension are dropped —
    * they have no position in the curve.
    *
    * Plan shape: ONE combinable min/max aggregate (a 1-row frame broadcast
    * by the cross join) + a map-only key projection. Sorting/range-
    * partitioning by `zkey` before writing is the caller's move:
    * `df.repartitionByRange(n, col("zkey"))` → files whose min/max bound
    * BOTH dimensions.
    *
    * Output: the input columns plus `zkey`.
    */
  def zOrderKey(df: DataFrame, c1: String, c2: String, bits: Int = 16): DataFrame = {
    val pow = 1L << bits
    // filter FIRST so the min/max frame sees exactly the rows that get keys
    val nn = df.where(col(c1).isNotNull && col(c2).isNotNull)
    val mm = nn.agg(
      min(col(c1)).cast("long").as("__min1"), max(col(c1)).cast("long").as("__max1"),
      min(col(c2)).cast("long").as("__min2"), max(col(c2)).cast("long").as("__max2"))
    val b1 = expr(s"($c1 - __min1) div (greatest(CAST(1 AS BIGINT), ((__max1 - __min1) div $pow) + 1))")
    val b2 = expr(s"($c2 - __min2) div (greatest(CAST(1 AS BIGINT), ((__max2 - __min2) div $pow) + 1))")
    nn
      .crossJoin(broadcast(mm))
      .withColumn("zkey", interleave(b1.cast("long"), b2.cast("long"), bits))
      .drop("__min1", "__max1", "__min2", "__max2")
  }

  /** Small-file compaction planner: assign a partition's files (in file-name
    * order) to merged output groups of ~`targetRows` rows — the OPTIMIZE/
    * compaction pass every streaming-ingested store needs once thousands of
    * micro-batch files accumulate. First-fit in order keeps each group a
    * CONTIGUOUS run of input files, so a time-ordered layout stays
    * time-ordered after compaction: `grp = (cum_before) div targetRows`
    * over the per-partition running row count — pure BIGINT, engine-exact.
    * A file larger than `targetRows` gets its own group (never split —
    * rewriting row subsets is what compaction is avoiding).
    *
    * Operates on FILE METADATA (one row per file — the run-registry /
    * listing frame, never the data): per-partition windows over file counts
    * are control-plane-sized by construction. Output: `(part, file, rows,
    * grp, grp_rows, grp_files)`.
    */
  def compactionPlan(files: DataFrame, part: String, file: String, rows: String,
      targetRows: Long): DataFrame = {
    require(targetRows > 0, s"targetRows must be positive, got $targetRows")
    val wc = org.apache.spark.sql.expressions.Window
      .partitionBy(col(part)).orderBy(col(file))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val assigned = files
      .select(col(part), col(file), col(rows).cast("long").as("__r"))
      .withColumn("__cum", sum(col("__r")).over(wc))
      .withColumn("grp", expr(s"(__cum - __r) div $targetRows"))
    val wg = org.apache.spark.sql.expressions.Window
      .partitionBy(col(part), col("grp"))
    assigned
      .withColumn("grp_rows", sum(col("__r")).over(wg))
      .withColumn("grp_files", count(lit(1)).over(wg))
      .select(col(part), col(file), col("__r").as("rows"), col("grp"),
        col("grp_rows"), col("grp_files"))
  }

  /** Backfill planner: which fixed-width time windows inside
    * `[tminUs, tmaxUs)` have NO data for a key — the work list a backfill
    * job consumes after an outage (the complement of
    * [[graft.operators.TimeSeries.gaps]], computed against an explicit
    * window grid so empty-from-the-start keys still plan correctly). One
    * keyed distinct over (key, window) + one anti-join against the
    * key-grid cross (keys × windows frame — control-plane sized: windows
    * are a FIXED grid, never data rows).
    *
    * Output: `(key, window_start_us, window_end_us)` per missing window.
    */
  def backfillPlan(df: DataFrame, key: String, ts: String, tminUs: Long,
      tmaxUs: Long, widthUs: Long): DataFrame = {
    require(widthUs > 0 && tmaxUs > tminUs, s"bad grid [$tminUs,$tmaxUs) / $widthUs")
    val present = df
      .where(col(key).isNotNull && col(ts) >= tminUs && col(ts) < tmaxUs)
      .select(col(key).as("__k"),
        ((col(ts) - tminUs).cast("long") / widthUs).cast("long").as("__w"))
      .distinct()
    val nWin = ((tmaxUs - tminUs) + widthUs - 1) / widthUs
    val keys = present.select(col("__k")).distinct()
    val grid = keys.select(col("__k"),
      explode(sequence(lit(0L), lit(nWin - 1))).as("__w"))
    grid.join(present, Seq("__k", "__w"), "left_anti")
      .select(col("__k").as(key),
        (lit(tminUs) + col("__w") * widthUs).as("window_start_us"),
        least(lit(tmaxUs), lit(tminUs) + (col("__w") + 1) * widthUs)
          .as("window_end_us"))
      .orderBy(col(key), col("window_start_us"))
  }

  /** Clustering-depth audit (the Snowflake "average depth" statistic) for
    * a file layout: per partition key, how many files' [min,max] ranges a
    * point query must open on average — 1.0 = perfectly clustered, rising
    * depth = the sort order has decayed and a re-cluster (e.g. by
    * [[zOrderKey]]) is due. Depth is measured at file BOUNDARY events (the
    * exact average over the value axis weighted by span would need value
    * distribution; boundary sampling is the standard audit): for each
    * file, count files whose range overlaps it, then average.
    *
    * Input is a FILE STATS frame (file, min, max per key) — metadata-sized,
    * so the pairwise overlap join is bounded by files², not rows.
    *
    * Output: `(key, n_files, avg_depth, max_depth)`.
    */
  def clusteringDepth(files: DataFrame, key: String, file: String, lo: String,
      hi: String): DataFrame = {
    val a = files.select(col(key).as("__k"), col(file).as("__f"),
      col(lo).as("__alo"), col(hi).as("__ahi"))
    val b = files.select(col(key).as("__k2"), col(lo).as("__blo"), col(hi).as("__bhi"))
    a.join(b, col("__k") === col("__k2") &&
        col("__alo") <= col("__bhi") && col("__blo") <= col("__ahi"))
      .groupBy(col("__k"), col("__f"))
      .agg(count(lit(1)).as("__depth"))
      .groupBy(col("__k"))
      .agg(count(lit(1)).as("n_files"),
        round(avg(col("__depth")), 6).as("avg_depth"),
        max(col("__depth")).as("max_depth"))
      .select(col("__k").as(key), col("n_files"), col("avg_depth"),
        col("max_depth"))
      .orderBy(col(key))
  }
}
