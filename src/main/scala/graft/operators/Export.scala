package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{GraftUdfs, PvFunctions}

/** S10/S11/S12 — formatted export (webapp.py:260-323, scripts/get_pvarch:
  * 138-223, util.py:391-424). The row body is a distributed projection
  * (hformat + date formatting stay on executors); only the header block —
  * a dozen lines — is assembled on the driver.
  */
object Export {

  /** S10 ASCII data rows: `ts value YYYYMMDD HHMMSS` (webapp.py:312-322),
    * value fixed-width via hformat (util.py:427-491). Produces a single
    * `line` column ordered by time.
    */
  def asciiRows(df: DataFrame, tsUs: String, dvalue: String, hfLength: Int = 12): DataFrame =
    df.select(
      col(tsUs),
      concat_ws(
        " ",
        format_string("%.6f", col(tsUs).cast("double") / 1e6),
        graft.plans.HFormatExpr.hformat(col(dvalue), lit(hfLength)),
        date_format(timestamp_micros(col(tsUs)), "yyyyMMdd HHmmss")).as("line"))
      .orderBy(col(tsUs))
      .select(col("line"))

  /** S11 multi-PV aligned export (scripts/get_pvarch:138-223): one line per
    * aligned timestamp with each series' value in fixed-width hformat —
    * feed it the output of [[TimeSeries.locfAlign]].
    */
  def alignedRows(df: DataFrame, tsUs: String, seriesCols: Seq[String], hfLength: Int = 12): DataFrame =
    df.select(
      col(tsUs),
      concat_ws(
        " ",
        format_string("%.6f", col(tsUs).cast("double") / 1e6) +:
          seriesCols.map(c => graft.plans.HFormatExpr.hformat(col(c), lit(hfLength))): _*).as("line"))
      .orderBy(col(tsUs))
      .select(col("line"))

  /** S10 header block (webapp.py:293-311). Driver-side string assembly. */
  def asciiHeader(
      pvname: String,
      description: String,
      dtype: String,
      t0Us: Long,
      t1Us: Long,
      npts: Long,
      enumLabels: Seq[String] = Nil): String = {
    val fmt = (us: Long) =>
      java.time.Instant.ofEpochMilli(us / 1000)
        .atZone(java.time.ZoneOffset.UTC)
        .format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))
    val legend =
      if (enumLabels.isEmpty) ""
      else enumLabels.zipWithIndex.map { case (l, i) => s"#    $i: $l" }
        .mkString("# enum legends:\n", "\n", "\n")
    s"""|# pvname:     $pvname
        |# desc:       $description
        |# type:       $dtype
        |# time range: ${fmt(t0Us)} to ${fmt(t1Us)}
        |# npts:       $npts
        |$legend# ts           value        date      time
        |""".stripMargin
  }

  /** Q5 — the string-PV table (webapp.py:390-394): the first string-typed
    * PV's window rendered as `(iso timestamp, decoded value)` rows — F8
    * `ts2iso` + F9 `chararray_as_string` composed as one distributed
    * projection over a [[TimeSeries.getData]] window. `charArr` is the
    * int-array waveform column (decoded up to the first NUL).
    */
  def stringPvTable(df: DataFrame, tsUs: String, charArr: String): DataFrame =
    df.select(
      col(tsUs),
      PvFunctions.ts2iso(col(tsUs)).as("iso"),
      PvFunctions.charArrayAsString(col(charArr)).as("value"))
      .orderBy(col(tsUs))

  /** Q4 — engine side of plot assembly (webapp.py:396-409 +
    * web_utils.py:177-237): cull the series (Q1 decimation — the driver
    * loop to the 30k cap is [[TimeSeries.decimateToCap]]), then emit the
    * plot frame: `x` = ISO timestamps, `y` = numeric values. Layout, enum
    * tick labels, and colors are presentation-layer per SURVEY §2.10.
    */
  def plotTrace(
      df: DataFrame,
      tsUs: String,
      tieBreak: String,
      value: String,
      sample: Int = 3,
      percent: Double = 15.0): DataFrame =
    TimeSeries.decimate(df, tsUs, tieBreak, value, sample, percent)
      .select(
        col(tsUs),
        col(tieBreak),
        PvFunctions.ts2iso(col(tsUs)).as("x"),
        col(value).cast("double").as("y"))
      .orderBy(col(tsUs), col(tieBreak))

  /** Q4 helper — `auto_ylog`'s DOCUMENTED heuristic (web_utils.py:113-127):
    * a non-negative series goes log-scale when its 1st-99th percentile
    * spread (over values > 1e-150) exceeds ×200. The reference SHIPS this
    * disabled (the function body returns False); the aggregation is
    * provided for deployments that re-enable it — one distributed pass,
    * one 3-value row to the driver.
    */
  def autoYLog(df: DataFrame, value: String): Boolean = {
    val r = df.agg(
      min(col(value).cast("double")).as("mn"),
      expr(s"percentile(CASE WHEN $value > 1e-150 THEN CAST($value AS DOUBLE) END, 0.01)").as("p01"),
      expr(s"percentile(CASE WHEN $value > 1e-150 THEN CAST($value AS DOUBLE) END, 0.99)").as("p99"))
      .collect()(0)
    !r.isNullAt(0) && r.getDouble(0) >= 0 &&
      !r.isNullAt(1) && !r.isNullAt(2) && r.getDouble(1) > 0 &&
      r.getDouble(2) / r.getDouble(1) > 200.0
  }

  /** S12 save/restore writer (util.py:391-424), byte-parity with
    * `write_saverestore`: flavor headers, `cmt`-prefixed extra header
    * lines, and per-flavor value lines (values UNQUOTED in idl/python, two
    * spaces in plain).
    */
  def saveRestore(
      pvvals: Seq[(String, String)],
      format: String = "plain",
      header: Seq[String] = Nil): Seq[String] = {
    val fmt = format.toLowerCase
    val (head, xfmt, cmt) =
      if (fmt.startsWith("idl"))
        (Seq("; IDL save restore script"), (p: String, v: String) => s"s = caput('$p', $v)", ";")
      else if (fmt.startsWith("py"))
        (Seq("#!/usr/bin/env python", "#  Python save restore script", "from epics import caput"),
          (p: String, v: String) => s"caput('$p', $v)", "#")
      else
        (Seq("# Plain Save/Restore script"), (p: String, v: String) => s"$p  $v", "#")
    head ++ header.map(h => s"$cmt $h") ++ pvvals.map { case (p, v) => xfmt(p, v) }
  }
}
