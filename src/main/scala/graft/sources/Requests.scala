package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** T6 — the request queue (cache.py:705-752): add / drop / suspend PV
  * requests applied onto the PV dimension. The reference polls a `requests`
  * table each loop; here a batch of requests merges declaratively (the
  * streaming form is the same merge inside `foreachBatch` on a config
  * stream).
  *
  * Semantics: the LAST request per PV (by tsUs) wins —
  * add → present + active; suspend → present + inactive; drop → removed.
  * PVs without requests pass through unchanged.
  */
object Requests {

  /** `pvDim(pvname, active, ...)` × `requests(pvname, action, tsUs)` →
    * updated dimension. Only an `add` can CREATE a row — a suspend/drop (or
    * unknown action) naming a PV absent from the dimension is ignored,
    * exactly like the reference's process_requests, which validates the PV
    * exists before applying anything (cache.py:705-752). One full-outer
    * join with a dimension-presence marker does it in a single pass over
    * each input (a separate new-adds anti-join branch would aggregate the
    * request log and scan the dimension twice); the marker filter is what
    * keeps typo'd suspend/drop requests from materializing phantom
    * null-laden rows.
    */
  def apply(pvDim: DataFrame, requests: DataFrame): DataFrame = {
    val latest = requests
      .groupBy(col("pvname"))
      .agg(max_by(col("action"), col("tsUs")).as("__action"))
    val extraCols = pvDim.columns.filterNot(c => c == "pvname" || c == "active")
    pvDim.withColumn("__in_dim", lit(true))
      .join(latest, Seq("pvname"), "full_outer")
      .where(col("__in_dim").isNotNull || col("__action") === "add")
      .where(col("__action").isNull || col("__action") =!= "drop")
      .select(
        col("pvname") +:
          when(col("__action") === "suspend", lit("no"))
            .when(col("__action") === "add", lit("yes"))
            // a null active in the incoming dimension defaults to archived
            // (the reference's add_pv default, cache.py:713-720)
            .otherwise(coalesce(col("active"), lit("yes"))).as("active") +:
          extraCols.map(col).toSeq: _*)
  }
}
