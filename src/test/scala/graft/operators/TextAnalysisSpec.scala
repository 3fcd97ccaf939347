package graft.operators

import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {

  private def docs = {
    val sp = spark
    import sp.implicits._
    Seq(
      (1L, "the cat sat on the mat"),
      (2L, "der hund ist und das haus"),
      (3L, "xyzzy plugh")).toDF("doc_id", "text")
  }

  test("stats: token/char/stopword counts") {
    val got = TextAnalysis.stats(docs, "doc_id", "text").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("n_tokens"), r.getAs[Int]("n_chars"),
        r.getAs[Int]("n_stop"))).sortBy(_._1)
    assert(got(0) == ((1L, 6, 22, 2))) // "the" twice
    assert(got(2) == ((3L, 2, 11, 0)))
  }

  test("qualityScore: high for long low-stopword docs, penalizes stopword density") {
    val got = TextAnalysis.qualityScore(docs, "doc_id", "text").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("quality"))).toMap
    assert(got(2L) > got(1L)) // same-ish length, doc1 has stopwords
    assert(got(1L) > 0)
  }

  test("langId: marker-token votes with 'und' fallback") {
    val got = TextAnalysis.langId(docs, "doc_id", "text").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang_pred"))).toMap
    assert(got(1L) == "en")
    assert(got(2L) == "de")
    assert(got(3L) == "und")
  }

  test("shingles: n-grams with short-doc clamp") {
    val sp = spark
    import sp.implicits._
    val got = Seq(Tuple1("a b")).toDF("t")
      .select(TextAnalysis.shingles(org.apache.spark.sql.functions.col("t"), 3).as("s"))
      .collect()(0).getAs[scala.collection.Seq[String]]("s")
    assert(got.toSeq == Seq("a b")) // shorter than n -> whole doc
  }
}
