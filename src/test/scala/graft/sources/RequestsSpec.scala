package graft.sources

import graft.SparkSpec

class RequestsSpec extends SparkSpec {

  test("add/drop/suspend requests merge onto the PV dimension; last request wins") {
    val sp = spark
    import sp.implicits._
    val dim = Seq(
      ("A.VAL", "yes", 1.0), ("B.VAL", "yes", 2.0), ("C.VAL", "no", 3.0))
      .toDF("pvname", "active", "deadtime")
    val reqs = Seq(
      ("B.VAL", "suspend", 10L),
      ("C.VAL", "drop", 10L),
      ("D.VAL", "add", 10L),
      ("E.VAL", "add", 10L), ("E.VAL", "drop", 20L)) // last wins: dropped
      .toDF("pvname", "action", "tsUs")
    val got = Requests(dim, reqs).collect()
      .map(r => (r.getString(0), r.getString(1), Option(r.get(2)))).sortBy(_._1)
    assert(got.toSeq == Seq(
      ("A.VAL", "yes", Some(1.0)), // untouched
      ("B.VAL", "no", Some(2.0)), // suspended
      ("D.VAL", "yes", None))) // added, no dimension metadata yet
  }

  test("only add creates rows; null active defaults to yes (cache.py:705-752)") {
    val sp = spark
    import sp.implicits._
    val dim = Seq(("A.VAL", null.asInstanceOf[String], 1.0))
      .toDF("pvname", "active", "deadtime")
    val reqs = Seq(
      ("X.VAL", "suspend", 10L), // unknown PV: ignored, no phantom row
      ("Y.VAL", "drop", 10L), // unknown PV: ignored
      ("Z.VAL", "bogus", 10L)) // unknown action on unknown PV: ignored
      .toDF("pvname", "action", "tsUs")
    val got = Requests(dim, reqs).collect()
      .map(r => (r.getString(0), r.getString(1))).sortBy(_._1)
    // the null-active dimension row survives as archived-by-default
    assert(got.toSeq == Seq(("A.VAL", "yes")))
  }
}
