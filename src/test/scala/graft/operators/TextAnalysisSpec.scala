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

  test("contamination counts distinct shared n-grams per corpus doc (broadcast semi-join)") {
    val sp = spark
    import sp.implicits._
    val evalSet = Seq((100L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "x alpha beta y"), // shares "alpha beta"
      (2L, "beta gamma delta epsilon beta gamma delta"), // 2 distinct shared bigrams
      (3L, "nothing in common here")).toDF("doc_id", "text")
    val got = TextAnalysis.contamination(corpus, evalSet, "doc_id", "text", n = 2)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_shared")).toMap
    assert(got == Map(1L -> 1L, 2L -> 2L)) // doc 3 clean -> absent
    // the plan broadcasts the eval side: the corpus is never shuffled for the join
    val plan = TextAnalysis.contamination(corpus, evalSet, "doc_id", "text", 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("repetition: duplicate and top-gram fractions (Gopher-style signals)") {
    val sp = spark
    import sp.implicits._
    val df = Seq(
      (1L, "a b a b a b"), // bigrams: ab ba ab ba ab -> 5 total, 2 distinct
      (2L, "u v w x y")).toDF("doc_id", "text") // all 4 bigrams distinct
    val got = TextAnalysis.repetition(df, "doc_id", "text", n = 2)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_grams"),
        r.getAs[Long]("n_distinct"), r.getAs[Double]("dup_frac"), r.getAs[Double]("top_frac")))
      .sortBy(_._1)
    assert(got(0) == ((1L, 5L, 2L, 0.6, 0.6))) // "a b" appears 3/5
    assert(got(1) == ((2L, 4L, 4L, 0.0, 0.25)))
  }

  test("piiRedact counts and redacts emails, IPv4s and +intl phones; clean text untouched") {
    val sp = spark
    import sp.implicits._
    val df = Seq(
      (1L, "mail me at jo.doe+spam@sub.example.org or call +44 (0) 1632-960018 now"),
      (2L, "server 192.168.0.17 and 10.0.0.1 are internal"),
      (3L, "no pii here, just 3.14 and v1.2.3 and a dash - ok")).toDF("doc_id", "text")
    val got = TextAnalysis.piiRedact(df, "doc_id", "text")
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_email"),
        r.getAs[Long]("n_ip"), r.getAs[Long]("n_phone"), r.getAs[String]("redacted")))
      .sortBy(_._1)
    assert(got(0) == ((1L, 1L, 0L, 1L, "mail me at <EMAIL> or call <PHONE> now")))
    assert(got(1) == ((2L, 0L, 2L, 0L, "server <IP> and <IP> are internal")))
    // 3.14 / v1.2.3 are not dotted quads; a bare dash is not a phone
    assert(got(2) == ((3L, 0L, 0L, 0L, "no pii here, just 3.14 and v1.2.3 and a dash - ok")))
  }

  test("null text degrades to null/absent rows, never throws (ANSI-mode safety)") {
    val sp = spark
    import sp.implicits._
    val df = Seq((1L, null.asInstanceOf[String]), (2L, "a b c")).toDF("doc_id", "text")
    // per-row stats: null in, null out (the row is preserved for auditing)
    val s = TextAnalysis.stats(df, "doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.isNullAt(r.fieldIndex("n_tokens"))).toMap
    assert(s == Map(1L -> true, 2L -> false))
    // shingle-explode ops: the null doc simply contributes no shingles
    val rep = TextAnalysis.repetition(df, "doc_id", "text", 2).collect().map(_.getLong(0))
    assert(rep.toSeq == Seq(2L))
    val cont = TextAnalysis.contamination(
      df, Seq((9L, "a b")).toDF("doc_id", "text"), "doc_id", "text", 2)
      .collect().map(_.getLong(0))
    assert(cont.toSeq == Seq(2L))
    // redaction: null text -> null redacted, zero... (counts are null too)
    val pii = TextAnalysis.piiRedact(df, "doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.isNullAt(r.fieldIndex("redacted"))).toMap
    assert(pii == Map(1L -> true, 2L -> false))
  }

  test("piiRedact counts reconcile with the redacted output when patterns nest") {
    val sp = spark
    import sp.implicits._
    // "+123456789" is phone-shaped but lives inside the email's local part:
    // the email replacement consumes it, so it must NOT count as a phone
    val df = Seq((1L, "write a+123456789@x.com now")).toDF("doc_id", "text")
    val r = TextAnalysis.piiRedact(df, "doc_id", "text").collect()(0)
    assert(r.getAs[String]("redacted") == "write <EMAIL> now")
    assert(r.getAs[Long]("n_email") == 1L && r.getAs[Long]("n_phone") == 0L)
  }

  test("vocabTopK: occurrence + doc counts with deterministic tie-break") {
    val sp = spark
    import sp.implicits._
    val df = Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    // doc1 bigrams: "a b","b a","a b"; doc2: "a b","b c"
    val got = TextAnalysis.vocabTopK(df, "doc_id", "text", n = 2, k = 3).collect()
      .map(r => (r.getAs[String]("gram"), r.getAs[Long]("n_occur"), r.getAs[Long]("n_docs")))
    assert(got.toSeq == Seq(("a b", 3L, 2L), ("b a", 1L, 1L), ("b c", 1L, 1L)))
  }

  test("bm25: term-dense doc ranks first, termless docs are excluded") {
    val sp = spark
    import sp.implicits._
    val df = Seq(
      (1L, "spark spark spark pad pad pad"),
      (2L, "spark pad pad pad pad pad"),
      (3L, "nothing relevant here at all x")).toDF("doc_id", "text")
    val got = TextAnalysis.bm25(df, "doc_id", "text", Seq("spark"), k = 10).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("score"), r.getAs[Long]("n_terms")))
    assert(got.map(_._1).toSeq == Seq(1L, 2L)) // 3 has no term -> excluded
    assert(got(0)._2 > got(1)._2 && got.forall(_._3 == 1L))
  }

  test("bm25: multi-term scores add per term and shorter docs win at equal tf") {
    val sp = spark
    import sp.implicits._
    val df = Seq(
      (1L, "spark merge x y"),
      (2L, "spark merge x y z w q r s t u v"),
      (3L, "spark only here")).toDF("doc_id", "text")
    val got = TextAnalysis.bm25(df, "doc_id", "text", Seq("spark", "merge"), k = 10)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("score"),
        r.getAs[Long]("n_terms")))
    val byId = got.map(t => t._1 -> t).toMap
    assert(byId(1L)._3 == 2L && byId(2L)._3 == 2L && byId(3L)._3 == 1L)
    assert(byId(1L)._2 > byId(2L)._2) // same tf, shorter doc scores higher
    assert(got.map(_._1).head == 1L)
  }
}
