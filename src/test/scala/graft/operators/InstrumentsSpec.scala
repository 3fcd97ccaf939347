package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class InstrumentsSpec extends SparkSpec {

  private def samples = {
    val sp = spark
    import sp.implicits._
    Seq(
      // pvname, tsUs, value
      ("a", 10L, "a10"),
      ("a", 20L, "a20"),
      ("a", 30L, "a30"), // after t=25: must not win
      ("b", 5L, "b5"),
      ("b", 25L, "b25"), // exactly at t: inclusive
      ("c", 40L, "c40"), // no sample at-or-before t: absent from snapshot
      ("d", 7L, "x"), ("d", 7L, "y") // equal-ts duplicate: value tie-break picks "y"
    ).toDF("pvname", "tsUs", "value")
  }

  private def sets = {
    val sp = spark
    import sp.implicits._
    Seq(("s1", "a"), ("s1", "b"), ("s2", "a"), ("s2", "c"), ("s2", "d"))
      .toDF("set_name", "pvname")
  }

  test("snapshot: latest at-or-before t per (set, pv), inclusive, fan-out, tie-break") {
    val got = Instruments.snapshot(samples, sets, tUs = 25L)
      .orderBy(col("set_name"), col("pvname"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getString(3)))
    assert(got.toSeq == Seq(
      ("s1", "a", 20L, "a20"),
      ("s1", "b", 25L, "b25"),
      ("s2", "a", 20L, "a20"), // same PV surfaces in both sets
      ("s2", "d", 7L, "y"))) // equal-ts resolved by the value tie-break; c absent
  }

  test("snapshot is a broadcast join + partial argmax — no shuffle of history, no window") {
    val df = Instruments.snapshot(samples, sets, tUs = 25L)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("HashAggregate") || plan.contains("SortAggregate"), plan)
  }

  test("catalog lists each set with count and sorted members") {
    val got = Instruments.catalog(sets).orderBy(col("set_name")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getSeq[String](2)))
    assert(got.toSeq == Seq(("s1", 2L, Seq("a", "b")), ("s2", 3L, Seq("a", "c", "d"))))
  }

  test("savePosition stamps the snapshot with the position name") {
    val got = Instruments.savePosition(samples, sets, "park", tUs = 25L)
    assert(got.columns.contains("position"))
    assert(got.select(col("position")).distinct().collect().map(_.getString(0)).toSeq == Seq("park"))
    assert(got.count() == 4)
  }
}
