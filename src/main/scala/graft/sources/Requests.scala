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
    * exists before applying anything (cache.py:705-752); a full-outer join
    * here would otherwise materialize phantom null-laden dimension rows
    * from typo'd requests.
    */
  def apply(pvDim: DataFrame, requests: DataFrame): DataFrame = {
    val latest = requests
      .groupBy(col("pvname"))
      .agg(max_by(col("action"), col("tsUs")).as("__action"))
    val extraCols = pvDim.columns.filterNot(c => c == "pvname" || c == "active")
    val updatedExisting = pvDim.join(latest, Seq("pvname"), "left_outer")
      .where(col("__action").isNull || col("__action") =!= "drop")
      .select(
        col("pvname") +:
          when(col("__action") === "suspend", lit("no"))
            .when(col("__action") === "add", lit("yes"))
            .otherwise(col("active")).as("active") +:
          extraCols.map(col).toSeq: _*)
    val newAdds = latest.where(col("__action") === "add")
      .join(pvDim.select(col("pvname")), Seq("pvname"), "left_anti")
      .select(
        col("pvname") +: lit("yes").as("active") +:
          extraCols.map(c => lit(null).cast(pvDim.schema(c).dataType).as(c)): _*)
    updatedExisting.unionByName(newAdds)
  }
}
