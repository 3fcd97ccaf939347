package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Instrument snapshots — the reference's "instruments" surface
  * (web/WebInstruments.py:1-519, PlotViewer.py): an *instrument* is a NAMED
  * SET of PVs, and the core query is "every member PV's value as of time t"
  * (page rendering, save/restore position). The reference answers it with a
  * per-PV `get_value_at_time` loop; here it is ONE declarative plan:
  *
  *  - membership is a tiny dimension → `broadcast` join (the 100 TB samples
  *    side is never shuffled for it);
  *  - the as-of value per (set, pv) is a `max_by` argmax — map-side
  *    combinable partial aggregation, one shuffled row per (set, pv), the
  *    same shape as [[TimeSeries.valueAtTime]] — never a window over the
  *    full history.
  */
object Instruments {

  /** Point-in-time snapshot of every PV in every set: the latest sample row
    * at-or-before `tUs` per (set_name, pvname). `sets` is the membership
    * dimension `(set_name, pvname)`; a PV may belong to several sets (the
    * join fans it out). All non-key sample columns pass through, picked
    * atomically from the winning row with the `(ts, tieBreak)` tie-break
    * every argmax in the engine uses.
    */
  def snapshot(samples: DataFrame, sets: DataFrame, tUs: Long,
      ts: String = "tsUs", tieBreak: String = "value"): DataFrame = {
    val others = samples.columns.filter(_ != "pvname")
    val ord = struct(col(ts), col(tieBreak))
    samples.where(col(ts) <= tUs)
      .join(broadcast(sets), Seq("pvname"))
      .groupBy(col("set_name"), col("pvname"))
      .agg(max_by(struct(others.map(col): _*), ord).as("__r"))
      .select(Seq(col("set_name"), col("pvname")) ++
        others.map(c => col("__r").getField(c).as(c)): _*)
  }

  /** The instrument catalog (WebInstruments.py instruments table): one row
    * per set with member count and the sorted member list.
    */
  def catalog(sets: DataFrame): DataFrame =
    // count DISTINCT members so n_pvs stays coherent with the deduped pvs
    // list when the membership dimension carries duplicate rows (e.g.
    // concatenated set files)
    sets.groupBy(col("set_name"))
      .agg(countDistinct(col("pvname")).as("n_pvs"),
        sort_array(collect_set(col("pvname"))).as("pvs"))

  /** Save a named position (WebInstruments.py save_position): the snapshot
    * stamped with the position name — rows to append to a positions store
    * `(position, set_name, pvname, ts, value…)`. Restoring a position is
    * reading these rows back; re-snapshotting at the saved time gives the
    * same answer from raw history.
    */
  def savePosition(samples: DataFrame, sets: DataFrame, positionName: String, tUs: Long,
      ts: String = "tsUs", tieBreak: String = "value"): DataFrame =
    snapshot(samples, sets, tUs, ts, tieBreak).withColumn("position", lit(positionName))
}
