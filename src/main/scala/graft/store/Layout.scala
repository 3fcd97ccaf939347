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
}
