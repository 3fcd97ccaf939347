package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S8/S9 — the reference's two text input formats (cache.py:570-588,
  * web_utils.py:269-322), parsed distributively with `spark.read.text` +
  * column ops (no driver-side line loop).
  */
object PvListFile {

  /** S8 PV-list file (cache.py:570-588): `#` comments and blank lines are
    * skipped; each surviving line holds one or more PV names split on
    * commas/whitespace. Result: (line_id, pvname); PVs sharing a line_id are
    * "related" seeds for the pair graph (score 10, cache.py:529-564) via
    * [[graft.operators.Pairs.coOccurrence]].
    */
  def pvNames(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .withColumn("line_id", monotonically_increasing_id())
      .withColumn("value", trim(regexp_replace(col("value"), "#.*$", "")))
      .where(col("value") =!= "")
      .select(
        col("line_id"),
        explode(split(col("value"), "[,\\s]+")).as("pvname"))
      .where(col("pvname") =!= "")

  /** S9 status-page template (web_utils.py:269-322, doc/web_templates.rst):
    * classifies each line as section / hr / space / row and splits row lines
    * `PV1,PV2 | description | format` into typed columns.
    */
  def template(spark: SparkSession, path: String): DataFrame = {
    // reference line filter: '#' comments and lines shorter than 2 chars
    // are skipped (web_utils.py:276-277); hr/space/section classify by
    // PREFIX — the docs' own '----' divider must not parse as a PV row —
    // and a section title runs to the first ']' or end of line
    // (web_utils.py:278-288)
    val lines = spark.read.text(path)
      .withColumn("line_id", monotonically_increasing_id())
      .withColumn("value", trim(col("value")))
      .where(length(col("value")) >= 2 && !col("value").startsWith("#"))
    lines.select(
      col("line_id"),
      when(col("value").startsWith("["), "section")
        .when(col("value").startsWith("--"), "hr")
        .when(col("value").startsWith("<>"), "space")
        .otherwise("row").as("kind"),
      when(col("value").startsWith("["),
        regexp_extract(col("value"), "^\\[([^\\]]*)", 1)).as("section"),
      split(trim(try_element_at(split(col("value"), "\\|"), lit(1))), "[,\\s]+").as("pvnames"),
      trim(try_element_at(split(col("value"), "\\|"), lit(2))).as("description"),
      trim(try_element_at(split(col("value"), "\\|"), lit(3))).as("format"))
  }

  /** S9 rendering semantics (tmpl2jinja row emission, web_utils.py:283-322):
    * the LOGICAL row stream of the generated status page, with the
    * reference's defaulting rules applied —
    *  - every row lands UNDER the section opened by the last preceding
    *    `[Section]` line (web_utils.py:283-322: rows accumulate into the
    *    currently-open section) — a `last(ignoreNulls)` carry-forward over
    *    `line_id`; rows before any section header keep a null section, like
    *    the reference's pre-section preamble;
    *  - every PV name is `normalize_pvname`'d (web_utils.py:297);
    *  - a missing/empty description falls back to the comma-joined
    *    normalized names (web_utils.py:300-303);
    *  - the `yes/no` format marks every PV in the row `yesno = true`
    *    (the `form="yesno"` showpv argument, web_utils.py:304-310).
    * The single-partition `line_id` window is fine at any scale: a template
    * is a human-written control-plane file (hundreds of lines), never a
    * corpus. The jinja/HTML table wrapper stays out of scope (presentation,
    * not analytics) — golden-file parity in PvListFileSpec covers this
    * content; the `q_template_parse` oracle checks the filled section.
    */
  def render(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val norm = transform(col("pvnames"),
      p => graft.functions.PvFunctions.normalizePvName(p))
    val carried = last(col("section"), ignoreNulls = true)
      .over(Window.orderBy(col("line_id")))
    template(spark, path).select(
      col("line_id"),
      col("kind"),
      carried.as("section"),
      when(col("kind") === "row",
        coalesce(when(length(col("description")) > 0, col("description")),
          concat_ws(", ", norm))).as("description"),
      when(col("kind") === "row",
        transform(norm, p => struct(p.as("pvname"),
          coalesce(col("format") === "yes/no", lit(false)).as("yesno")))).as("pvs"))
  }
}
