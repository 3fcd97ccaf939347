package graft.store

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) maintenance: merge a dimension
  * HISTORY table with a fresh SNAPSHOT, closing changed/deleted rows and
  * opening new versions — the warehouse pattern that keeps point-in-time
  * joins honest (an as-of join against this table reproduces any past
  * state; see [[graft.operators.TimeSeries.asofJoin]]).
  *
  * History rows carry `(key, attr, valid_from, valid_to)` with
  * `valid_to IS NULL` marking the current version. The merge is ONE
  * full-outer join of the current slice against the snapshot on the key
  * plus unions of projections — work is bounded by current + snapshot
  * size; closed history passes through untouched (at scale: a partition
  * filter keeps it out of the shuffle entirely). Attribute comparison is
  * null-safe (`<=>`), so a legitimately-null attribute isn't churned every
  * merge.
  */
object Scd2 {

  def merge(history: DataFrame, snapshot: DataFrame, key: String, attr: String,
      tUs: Long): DataFrame = {
    val hist = history.where(col("valid_to").isNotNull)
    val cur = history.where(col("valid_to").isNull)
      .select(col(key), col(attr), col("valid_from"), lit(1).as("__inCur"))
    val snap = snapshot
      .select(col(key), col(attr).as("__new_attr"), lit(1).as("__inSnap"))
    val j = cur.join(snap, Seq(key), "full_outer")
    val same = col(attr) <=> col("__new_attr")
    val inCur = col("__inCur").isNotNull
    val inSnap = col("__inSnap").isNotNull
    val unchanged = j.where(inCur && inSnap && same)
      .select(col(key), col(attr), col("valid_from"), lit(null).cast("long").as("valid_to"))
    val closed = j.where(inCur && (!inSnap || !same))
      .select(col(key), col(attr), col("valid_from"), lit(tUs).as("valid_to"))
    val opened = j.where(inSnap && (!inCur || !same))
      .select(col(key), col("__new_attr").as(attr), lit(tUs).as("valid_from"),
        lit(null).cast("long").as("valid_to"))
    hist.select(col(key), col(attr), col("valid_from"), col("valid_to"))
      .unionByName(unchanged)
      .unionByName(closed)
      .unionByName(opened)
  }
}
