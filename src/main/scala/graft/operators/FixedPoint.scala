package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Order-independent fixed-point aggregation helpers.
  *
  * A `round(sum(double), k)` / `round(avg(double), k)` output is
  * summation-order dependent at the ulp level, and Spark's partial-agg
  * scheduling changes the order with partitioning — the q_dtw and
  * q_embed_cov incidents were both a half-ulp drift amplified through a
  * k-dp rounding into a hash mismatch against the oracle. The cure is the
  * same everywhere: quantize each addend to a fixed grid as a BIGINT, sum
  * exactly (integer addition commutes), and divide/round ONCE — then any
  * engine that mirrors the quantization reproduces the value bit-for-bit
  * regardless of scheduling.
  *
  * Grid choice trades resolution against overflow: the sums are bounded by
  * `n · max|v| · scale < 2^63` (and `n · (max|v| · scale)² < 2^63` for
  * second moments), so wide-range values take a coarser grid. Every call
  * site documents its bound.
  */
object FixedPoint {

  /** Exact integer accumulation of `v` on the `1/scale` grid, emitted as a
    * double rounded to `outScale` places. */
  def sum(v: Column, scale: Double, outScale: Int): Column =
    round(org.apache.spark.sql.functions.sum(
      round(v * scale).cast("long")) / scale, outScale)

  /** The quantized addend itself (for sums that need a custom combination,
    * e.g. products of two grids). */
  def q(v: Column, scale: Double): Column = round(v * scale).cast("long")

  /** 6-dp mean on the 1e-6 grid — the bucket-mean workhorse. Bound:
    * `n · |v| ≤ ~9.2e12` per group. */
  def mean6(v: Column): Column =
    round(org.apache.spark.sql.functions.sum(
      round(v * 1000000.0).cast("long")) / (count(lit(1)) * 1000000.0), 6)

  /** Mean on an arbitrary grid, rounded to `outScale`. */
  def mean(v: Column, scale: Double, outScale: Int): Column =
    round(org.apache.spark.sql.functions.sum(
      round(v * scale).cast("long")) / (count(lit(1)) * scale), outScale)
}
