package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RetrievalSpec extends SparkSpec {

  test("rrfFuse: reciprocal ranks sum across runs, missing docs score one run only") {
    val sp = spark
    import sp.implicits._
    val run1 = Seq((10L, 1L), (20L, 2L), (30L, 3L)).toDF("doc_id", "rank")
    val run2 = Seq((10L, 1L), (30L, 2L)).toDF("doc_id", "rank")
    val got = Retrieval.rrfFuse(Seq(run1, run2), "doc_id", c = 1, k = 10)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("rrf"),
        r.getAs[Long]("n_runs")))
    // 10: 1/2 + 1/2 = 1.0; 30: 1/4 + 1/3 = 0.583333; 20: 1/3 = 0.333333
    assert(got.toSeq == Seq((10L, 1.0, 2L), (30L, 0.583333, 2L), (20L, 0.333333, 1L)))
  }

  test("rrfFuse: k truncates with (score, id) tie-break") {
    val sp = spark
    import sp.implicits._
    val run = Seq((5L, 1L), (3L, 1L), (9L, 2L)).toDF("doc_id", "rank")
    // doc 5 and 3 tie on rank 1 (two single-run frames would be odd, but a
    // single run with equal ranks exercises the tie-break directly)
    val got = Retrieval.rrfFuse(Seq(run), "doc_id", c = 60, k = 2)
      .collect().map(_.getAs[Long]("doc_id"))
    assert(got.toSeq == Seq(3L, 5L)) // equal rrf -> ascending id
  }
}
