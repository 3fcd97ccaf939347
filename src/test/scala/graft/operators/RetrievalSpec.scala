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

  test("diversifiedTopK: per-group cap then global cut, ranks deterministic") {
    val sp = spark
    import sp.implicits._
    // source A owns the 4 best scores; cap 2 lets B and C surface
    val scored = Seq(
      (1L, "A", 9.0), (2L, "A", 8.0), (3L, "A", 7.0), (4L, "A", 6.0),
      (5L, "B", 5.0), (6L, "B", 4.5), (7L, "C", 4.0), (8L, "C", 8.0))
      .toDF("doc_id", "source", "score")
    val got = Retrieval.diversifiedTopK(scored, "doc_id", "score", "source",
      perGroup = 2, k = 5)
      .collect()
      .map(r => (r.getAs[Long]("rank"),
        (r.getAs[Long]("doc_id"), r.getAs[String]("source"), r.getAs[Long]("group_rank"))))
      .toMap
    assert(got(1L) == ((1L, "A", 1L)))
    assert(got(2L) == ((2L, "A", 2L))) // the 8.0 tie breaks by id: 2 before 8
    assert(got(3L) == ((8L, "C", 1L)))
    assert(got(4L) == ((5L, "B", 1L)))
    assert(got(5L) == ((6L, "B", 2L)))
    // docs 3,4 (A beyond cap) and 7 (below global cut at k=5... ) excluded
    assert(!got.values.exists(v => v._1 == 3L || v._1 == 4L))
  }

  test("diversifiedTopK: score ties break by id on both cuts") {
    val sp = spark
    import sp.implicits._
    val scored = Seq(
      (3L, "A", 5.0), (1L, "A", 5.0), (2L, "A", 5.0), (4L, "B", 5.0))
      .toDF("doc_id", "source", "score")
    val got = Retrieval.diversifiedTopK(scored, "doc_id", "score", "source",
      perGroup = 2, k = 3)
      .collect().map(r => (r.getAs[Long]("rank"), r.getAs[Long]("doc_id"))).toMap
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 4L)) // id order inside the tie; 3 capped out
  }

  test("mmr: first pick is max relevance; a near-duplicate of it is deferred") {
    val sp = spark
    import sp.implicits._
    // docs 1 and 2 are nearly identical vectors with top relevance; doc 3
    // is orthogonal with lower relevance. Pure-relevance order is 1,2,3;
    // MMR must interleave: 1 (best), then 3 (2 is redundant), then 2.
    val cands = Seq(
      (7L, 1L, 0.90, Array(1.0f, 0.0f, 0.0f)),
      (7L, 2L, 0.89, Array(0.999f, 0.001f, 0.0f)),
      (7L, 3L, 0.50, Array(0.0f, 1.0f, 0.0f)))
      .toDF("qid", "doc_id", "rel", "vec")
    val got = Retrieval.mmr(cands, "qid", "doc_id", "rel", "vec", k = 3, lambda = 0.5)
      .orderBy(col("rank")).collect()
      .map(r => (r.getAs[Long]("rank"), r.getAs[Long]("doc_id")))
    assert(got.toSeq == Seq((1L, 1L), (2L, 3L), (3L, 2L)))
  }

  test("mmr: lambda=1 reduces to pure relevance order with smallest-id ties") {
    val sp = spark
    import sp.implicits._
    val cands = Seq(
      (1L, 30L, 0.8, Array(1.0f, 0.0f)), (1L, 10L, 0.8, Array(0.0f, 1.0f)),
      (1L, 20L, 0.9, Array(0.5f, 0.5f)))
      .toDF("qid", "doc_id", "rel", "vec")
    val got = Retrieval.mmr(cands, "qid", "doc_id", "rel", "vec", k = 3, lambda = 1.0)
      .orderBy(col("rank")).collect().map(_.getAs[Long]("doc_id"))
    assert(got.toSeq == Seq(20L, 10L, 30L)) // 0.8 tie -> smaller id first
  }

  test("rankMetrics: hand-computed MRR/DCG/nDCG; no-relevant queries score zero") {
    val sp = spark
    import sp.implicits._
    // query 1 (label 0): relevant at ranks 2 and 3; the corpus holds exactly
    // those two other label-0 items, so the ideal ordering is (1,2) -> nrel=2
    // query 2 (label 9): nothing relevant in its list; one other label-9 item exists
    val run = Seq(
      (1L, 11L, 1L), (1L, 12L, 2L), (1L, 13L, 3L), (1L, 14L, 4L), (1L, 15L, 5L),
      (2L, 11L, 1L), (2L, 12L, 2L))
      .toDF("query_id", "neighbor_id", "rank")
    val labels = Seq(
      (1L, 0), (2L, 9), (11L, 7), (12L, 0), (13L, 0), (14L, 7), (15L, 7), (16L, 9))
      .toDF("vec_id", "label")
    val got = Retrieval.rankMetrics(run, labels, "vec_id", "label", k = 5)
      .collect().map(r => (r.getAs[Long]("query_id"),
        (r.getAs[Long]("first_rel_rank"), r.getAs[Long]("n_rel_at_k"), r.getAs[Double]("mrr"),
          r.getAs[Double]("dcg"), r.getAs[Double]("idcg"), r.getAs[Double]("ndcg")))).toMap
    val d = Retrieval.dcgDiscounts(5)
    val dcg1 = BigDecimal(d(1) + d(2)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val idcg1 = BigDecimal(d(0) + d(1)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L)._1 == 2L && got(1L)._2 == 2L && got(1L)._3 == 0.5)
    assert(got(1L)._4 == dcg1 && got(1L)._5 == idcg1)
    assert(math.abs(got(1L)._6 - (d(1) + d(2)) / (d(0) + d(1))) < 1e-6)
    assert(got(2L) == ((0L, 0L, 0.0, 0.0, 1.0, 0.0))) // idcg=1 (one relevant exists), dcg=0
  }

  test("rankAgreement: identical order gives tau 1, full reversal -1, missing items shrink n_shared") {
    val sp = spark
    import sp.implicits._
    val a = Seq((1L, 10L, 1L), (1L, 20L, 2L), (1L, 30L, 3L),
      (2L, 10L, 1L), (2L, 20L, 2L), (2L, 30L, 3L),
      (3L, 10L, 1L), (3L, 20L, 2L), (3L, 99L, 3L))
      .toDF("query_id", "neighbor_id", "rank")
    val b = Seq((1L, 10L, 1L), (1L, 20L, 2L), (1L, 30L, 3L), // same order
      (2L, 30L, 1L), (2L, 20L, 2L), (2L, 10L, 3L),           // reversed
      (3L, 20L, 1L), (3L, 10L, 2L), (3L, 77L, 3L))           // one swap, one item missing
      .toDF("query_id", "neighbor_id", "rank")
    val got = Retrieval.rankAgreement(a, b, k = 3)
      .collect().map(r => (r.getAs[Long]("query_id"),
        (r.getAs[Long]("n_shared"), r.getAs[Long]("concordant"), r.getAs[Long]("discordant"),
          r.getAs[Double]("tau")))).toMap
    assert(got(1L) == ((3L, 3L, 0L, 1.0)))
    assert(got(2L) == ((3L, 0L, 3L, -1.0)))
    assert(got(3L) == ((2L, 0L, 1L, -1.0))) // only 10,20 shared; their order flipped
  }

  test("mmr: result is invariant to input partitioning and row order") {
    val sp = spark
    import sp.implicits._
    val rng = new scala.util.Random(11)
    val cands = (0 until 4).flatMap { q =>
      (0 until 15).map { d =>
        (q.toLong, d.toLong, rng.nextDouble(),
          Array.fill(8)(rng.nextGaussian().toFloat))
      }
    }
    val base = cands.toDF("qid", "doc_id", "rel", "vec")
    val a = Retrieval.mmr(base, "qid", "doc_id", "rel", "vec", k = 5, lambda = 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).sorted
    val b = Retrieval.mmr(base.repartition(7).orderBy(col("rel")), "qid", "doc_id", "rel", "vec",
      k = 5, lambda = 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).sorted
    assert(a.toSeq == b.toSeq)
  }

  test("mmr: k caps output, groups are independent, null vectors dropped") {
    val sp = spark
    import sp.implicits._
    val cands = Seq(
      (1L, 1L, 0.9, Array(1.0f, 0.0f)), (1L, 2L, 0.8, Array(0.0f, 1.0f)),
      (1L, 3L, 0.7, Array(0.5f, 0.5f)),
      (2L, 9L, 0.1, Array(1.0f, 1.0f)),
      (2L, 8L, 0.2, null.asInstanceOf[Array[Float]]))
      .toDF("qid", "doc_id", "rel", "vec")
    val got = Retrieval.mmr(cands, "qid", "doc_id", "rel", "vec", k = 2, lambda = 0.7)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("doc_id")))
    assert(got.count(_._1 == 1L) == 2) // capped at k
    assert(got.filter(_._1 == 2L).map(_._2).toSeq == Seq(9L)) // null vec 8 dropped
  }

  test("rocchioExpand: feedback centroid surfaces an on-topic doc with no query term") {
    val sp = spark
    import sp.implicits._
    val docs = Seq(
      (1L, "spark spark engine"), // lexical hits
      (2L, "spark cluster"),
      (3L, "distributed compute engine"), // no query term, same topic
      (4L, "cooking recipes"))
      .toDF("doc_id", "text")
    val emb = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(1.0f, 0.2f)),
      (3L, Array(0.9f, 0.1f)),
      (4L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val got = Retrieval.rocchioExpand(docs, "doc_id", "text", Seq("spark"),
      emb, "vec_id", "embedding", feedbackK = 2, k = 3)
      .collect().map(_.getAs[Long]("vec_id"))
    // the expanded query (centroid of 1,2) pulls doc 3 into the top 3 even
    // though BM25 alone would never return it; the off-topic 4 stays out
    assert(got.toSet == Set(1L, 2L, 3L))
  }

  test("rocchioExpand: corpus vectors missing embeddings are skipped, k caps output") {
    val sp = spark
    import sp.implicits._
    val docs = Seq((1L, "spark a"), (2L, "spark b"), (3L, "c")).toDF("doc_id", "text")
    val emb = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(1.0f, 0.1f)),
      (3L, null.asInstanceOf[Array[Float]]))
      .toDF("vec_id", "embedding")
    val got = Retrieval.rocchioExpand(docs, "doc_id", "text", Seq("spark"),
      emb, "vec_id", "embedding", feedbackK = 2, k = 10)
      .collect().map(_.getAs[Long]("vec_id"))
    assert(got.toSet == Set(1L, 2L)) // null-embedding doc 3 can't be ranked
  }

  test("phraseSearch: overlapping hits and repeated phrase terms") {
    val sp = spark
    import sp.implicits._
    val docs = Seq(
      (1L, "a b a b a"),   // "a b a" at anchors 0 and 2 (overlapping)
      (2L, "b a b"),       // "a b a"? no: a1 b2 -> anchor 1 has i=0,i=1 but i=2 needs a3
      (3L, null.asInstanceOf[String]),
      (4L, "x a b a y")).toDF("doc_id", "text")
    val got = Retrieval.phraseSearch(docs, "doc_id", "text", Seq("a", "b", "a"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L, 4L -> 1L))
    // repeated single term: "a a" never occurs in doc 1 (alternating)
    val got2 = Retrieval.phraseSearch(docs, "doc_id", "text", Seq("a", "a"))
      .collect()
    assert(got2.isEmpty)
  }
}
