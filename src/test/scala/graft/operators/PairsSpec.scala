package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PairsSpec extends SparkSpec {

  private def rel = {
    val sp = spark
    import sp.implicits._
    // groups: g1={a,b,c}, g2={a,b}, g3={b,d}, plus a duplicate membership row
    Seq(("g1", "a"), ("g1", "b"), ("g1", "c"), ("g1", "b"),
      ("g2", "a"), ("g2", "b"), ("g3", "b"), ("g3", "d")).toDF("grp", "m")
  }

  test("coOccurrence counts shared groups with canonical order and set semantics") {
    val got = Pairs.coOccurrence(rel, "grp", "m").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set(("a", "b", 2L), ("a", "c", 1L), ("b", "c", 1L), ("b", "d", 1L)))
  }

  test("mergeScores collapses reversed/duplicate edges with max") {
    val sp = spark
    import sp.implicits._
    val edges = Seq(("a", "b", 3L), ("b", "a", 7L), ("a", "c", 1L)).toDF("m1", "m2", "s")
    val got = Pairs.mergeScores(edges, "m1", "m2", "s").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set(("a", "b", 7L), ("a", "c", 1L)))
  }

  test("related: top-k neighbors from either edge direction") {
    val edges = Pairs.coOccurrence(rel, "grp", "m")
    val got = Pairs.related(edges, "m1", "m2", "score", lit("b"), k = 2).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == Seq(("a", 2L), ("c", 1L))) // score desc, then name
  }

  test("relatedDirect: graph-free point query equals related over the full graph") {
    val direct = Pairs.relatedDirect(rel, "grp", "m", "b", k = 3).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val viaGraph = Pairs.related(
      Pairs.coOccurrence(rel, "grp", "m"), "m1", "m2", "score", lit("b"), k = 3).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(direct.toSeq == viaGraph.toSeq)
    assert(direct.toSeq == Seq(("a", 2L), ("c", 1L), ("d", 1L)))
  }

  test("relatedToSet sums scores across the seed set and excludes it") {
    val edges = Pairs.coOccurrence(rel, "grp", "m")
    val got = Pairs.relatedToSet(edges, "m1", "m2", "score", Seq("a", "c"), k = 5).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    // b: a-b(2) + b-c(1) = 3; d: only b-d, not connected to {a,c}
    assert(got.toSeq == Seq(("b", 3L)))
  }
}
