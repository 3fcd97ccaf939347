package graft.store

import org.apache.spark.sql.functions._

import graft.SparkSpec

class Scd2Spec extends SparkSpec {

  private val T = 1000L

  test("merge: unchanged stays open, changed closes + reopens, deleted closes, new opens") {
    val sp = spark
    import sp.implicits._
    val history = Seq(
      (1L, Some("gold"), 0L, None),        // unchanged
      (2L, Some("silver"), 0L, None),      // will change to gold
      (3L, Some("bronze"), 0L, None),      // deleted in snapshot
      (2L, Some("bronze"), -50L, Some(0L)) // closed history passes through
    ).toDF("k", "tier", "valid_from", "valid_to")
    val snapshot = Seq(
      (1L, Some("gold")),
      (2L, Some("gold")),
      (9L, Some("new-tier"))) // brand new key
      .toDF("k", "tier")
    val got = Scd2.merge(history, snapshot, "k", "tier", T)
      .collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[String]("tier"),
        r.getAs[Long]("valid_from"),
        if (r.isNullAt(3)) -1L else r.getAs[Long]("valid_to")))
      .toSet
    assert(got == Set(
      (2L, "bronze", -50L, 0L),   // history untouched
      (1L, "gold", 0L, -1L),      // unchanged, still open
      (2L, "silver", 0L, T),      // closed at T
      (2L, "gold", T, -1L),       // new version opened
      (3L, "bronze", 0L, T),      // deleted -> closed
      (9L, "new-tier", T, -1L)))  // inserted
  }

  test("merge: null attributes compare null-safely (no churn)") {
    val sp = spark
    import sp.implicits._
    val history = Seq((1L, Option.empty[String], 0L, Option.empty[Long]))
      .toDF("k", "tier", "valid_from", "valid_to")
    val snapshot = Seq((1L, Option.empty[String])).toDF("k", "tier")
    val got = Scd2.merge(history, snapshot, "k", "tier", T).collect()
    assert(got.length == 1)
    assert(got(0).isNullAt(3)) // still the open row, not closed/reopened
  }
}
