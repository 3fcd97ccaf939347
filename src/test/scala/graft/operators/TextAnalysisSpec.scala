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

  test("chunkDocs: overlapping windows reach the end without a contained stub") {
    val sp = spark
    import sp.implicits._
    val df = Seq(
      (1L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"), // 10 toks, chunk 4 step 2 -> 4 chunks
      (2L, "a b"),                           // shorter than chunk -> 1 chunk
      (3L, null.asInstanceOf[String])        // dropped
    ).toDF("doc_id", "text")
    val got = TextAnalysis.chunkDocs(df, "doc_id", "text", chunkTokens = 4, overlap = 2)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_id"),
        r.getAs[String]("chunk"), r.getAs[Long]("n_tokens")))
      .sortBy(t => (t._1, t._2))
    // starts 0,2,4,6: 6+4 = 10 reaches the end, so no start 8 stub
    assert(got.toSeq == Seq(
      (1L, 0L, "t0 t1 t2 t3", 4L), (1L, 1L, "t2 t3 t4 t5", 4L),
      (1L, 2L, "t4 t5 t6 t7", 4L), (1L, 3L, "t6 t7 t8 t9", 4L),
      (2L, 0L, "a b", 2L)))
    // map-only: the plan must not shuffle
    val plan = TextAnalysis.chunkDocs(df, "doc_id", "text", 4, 2)
      .queryExecution.executedPlan
    assert(plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }.isEmpty, plan)
  }

  test("chunkDocs: a non-covering final window is emitted when the step overshoots") {
    val sp = spark
    import sp.implicits._
    // 7 toks, chunk 4, step 3: starts 0,3 -> 3+4=7 covers; chunk 5 step 5 on
    // 7 toks: starts 0,5 -> last chunk is the 2-token tail
    val df = Seq((1L, "x0 x1 x2 x3 x4 x5 x6")).toDF("doc_id", "text")
    val got = TextAnalysis.chunkDocs(df, "doc_id", "text", chunkTokens = 5, overlap = 0)
      .collect().map(r => (r.getAs[Long]("chunk_id"), r.getAs[String]("chunk"),
        r.getAs[Long]("n_tokens"))).sortBy(_._1)
    assert(got.toSeq == Seq((0L, "x0 x1 x2 x3 x4", 5L), (1L, "x5 x6", 2L)))
  }

  test("lmCrossEntropy: add-k bigram model matches the hand fold") {
    val sp = spark
    import sp.implicits._
    val df = Seq(
      (1L, "a b a b"),                 // bigrams: ab, ba, ab
      (2L, "a b"),                     // bigram: ab
      (3L, "solo"),                    // <2 tokens -> excluded
      (4L, null.asInstanceOf[String])  // null -> excluded
    ).toDF("doc_id", "text")
    val got = TextAnalysis.lmCrossEntropy(df, "doc_id", "text", addK = 0.5)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_bigrams"), r.getAs[Double]("xent")))
      .sortBy(_._1)
    // model: c2(ab)=3, c2(ba)=1; c1(a)=3, c1(b)=1; V={a,b} -> 2; k=0.5
    val pAb = (3 + 0.5) / (3 + 0.5 * 2) // 0.875
    val pBa = (1 + 0.5) / (1 + 0.5 * 2) // 0.75
    def log2(x: Double) = math.log(x) / math.log(2.0)
    val x1 = -(log2(pAb) + log2(pBa) + log2(pAb)) / 3
    val x2 = -log2(pAb)
    assert(got.map(_._1).toSeq == Seq(1L, 2L))
    assert(got(0)._2 == 3L && got(1)._2 == 1L)
    assert(math.abs(got(0)._3 - x1) < 1e-6, s"${got(0)._3} vs $x1")
    assert(math.abs(got(1)._3 - x2) < 1e-6, s"${got(1)._3} vs $x2")
  }

  test("oovRate: per-doc OOV fraction against a (deduplicated, broadcast) vocab") {
    val sp = spark
    import sp.implicits._
    val df = Seq((1L, "a b a zz"), (2L, "zz yy"),
      (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val vocab = Seq("a", "b", "b").toDF("token") // the dup must not double-count
    val got = TextAnalysis.oovRate(df, "doc_id", "text", vocab).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("n_oov"), r.getAs[Double]("oov_frac")))
      .sortBy(_._1)
    assert(got.toSeq == Seq((1L, 4L, 1L, 0.25), (2L, 2L, 2L, 1.0)))
    val plan = TextAnalysis.oovRate(df, "doc_id", "text", vocab)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("vocabShift: smoothed log2 ratio matches the hand fold; one-sided tokens rank high") {
    val sp = spark
    import sp.implicits._
    val a = Seq((1L, "x x y"), (2L, "x z")).toDF("doc_id", "text") // x:3 y:1 z:1, total 5
    val b = Seq((3L, "y y y z")).toDF("doc_id", "text")            // y:3 z:1, total 4
    val got = TextAnalysis.vocabShift(a, b, "doc_id", "text", k = 3, addK = 0.5)
      .collect()
      .map(r => (r.getAs[String]("token"), r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
        r.getAs[Double]("shift")))
    // V = |{x,y,z}| = 3; P_a(t) = (n_a + .5)/(5 + 1.5); P_b(t) = (n_b + .5)/(4 + 1.5)
    def shift(na: Long, nb: Long) =
      math.log(((na + 0.5) / 6.5) / ((nb + 0.5) / 5.5)) / math.log(2.0)
    assert(got.map(_._1).toSeq == Seq("x", "y", "z")) // |x| > |y| > |z|
    assert(got(0)._2 == 3L && got(0)._3 == 0L)
    got.foreach { case (t, na, nb, s) =>
      assert(math.abs(s - shift(na, nb)) < 1e-6, s"$t: $s vs ${shift(na, nb)}")
    }
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

  test("datasetCard: volumes, dup fraction over non-null docs, lang entropy") {
    val sp = spark
    import sp.implicits._
    val df = Seq(
      (1L, "en", "web", "a b c"),
      (2L, "en", "web", "a b c"), // exact dup of 1
      (3L, "de", "book", "x y"),
      (4L, "de", "web", null.asInstanceOf[String]))
      .toDF("doc_id", "lang", "source", "text")
    val r = TextAnalysis.datasetCard(df, "text", "lang", "source").collect().head
    assert(r.getAs[Long]("n_docs") == 4L && r.getAs[Long]("n_null_text") == 1L)
    assert(r.getAs[Long]("n_tokens") == 8L) // 3 + 3 + 2, null skipped
    assert(r.getAs[Double]("avg_tokens") == 2.666667)
    assert(r.getAs[Long]("n_langs") == 2L && r.getAs[Long]("n_sources") == 2L)
    // 2 unique texts over 3 non-null docs -> dup_frac = 1 - 2/3
    assert(r.getAs[Double]("dup_frac") == 0.333333)
    // langs split 2/2 -> entropy exactly 1 bit
    assert(r.getAs[Double]("lang_entropy") == 1.0)
  }

  test("topTermsPerGroup: per-group exact heavy hitters with term tie-break") {
    val sp = spark
    import sp.implicits._
    val df = Seq(
      (1L, "web", "a a a b b c"),
      (2L, "web", "b d"),
      (3L, "book", "z z y"),
      (4L, "book", null.asInstanceOf[String]))
      .toDF("doc_id", "source", "text")
    val got = TextAnalysis.topTermsPerGroup(df, "source", "text", k = 2)
      .collect()
      .map(r => (r.getAs[String]("source"), r.getAs[String]("term"),
        r.getAs[Long]("n"), r.getAs[Long]("rank"))).sortBy(t => (t._1, t._4))
    // web: a=3, b=3 -> tie broken on term; book: z=2, y=1
    assert(got.toSeq == Seq(
      ("book", "z", 2L, 1L), ("book", "y", 1L, 2L),
      ("web", "a", 3L, 1L), ("web", "b", 3L, 2L)))
  }

  test("keywords: df-gate drops ubiquitous terms, integer weights rank per doc") {
    val sp = spark
    import sp.implicits._
    // "the" appears in all 4 docs -> df-gate (60%) drops it everywhere;
    // doc 1's "rare" (df=1) outweighs "common" (df=2) despite equal tf
    val df = Seq(
      (1L, "the rare common"),
      (2L, "the common x"),
      (3L, "the y z"),
      (4L, "the w v"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.keywords(df, "doc_id", "text", k = 2, maxDfPct = 60)
      .collect()
      .map(r => (r.getAs[Long]("doc"), r.getAs[Long]("rank"),
        r.getAs[String]("term"), r.getAs[Long]("weight")))
      .sortBy(t => (t._1, t._2))
    assert(!got.exists(_._3 == "the"))
    val d1 = got.filter(_._1 == 1L)
    // rare: tf=1, w = 1 * ((4*100) div 1) = 400; common: 1 * (400 div 2) = 200
    assert(d1.toSeq == Seq((1L, 1L, "rare", 400L), (1L, 2L, "common", 200L)))
    // every doc keeps at most k entries, ranks contiguous from 1
    got.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._2).sorted.toSeq == (1L to rows.length).toSeq)
      assert(rows.length <= 2)
    }
  }

  test("keyphrases: RAKE islands between df-gated stopwords, integer degree/freq") {
    val sp = spark
    import sp.implicits._
    // 'the' is in all 4 docs -> the only stopword at the 80% gate; phrases
    // are the maximal non-stop runs
    val df = Seq(
      (1L, "the quick brown fox the lazy dog"),
      (2L, "the quick brown fox jumps"),
      (3L, "a the brown fox"),
      (4L, "the lazy dog"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.keyphrases(df, "doc_id", "text", k = 4, stopDfPct = 80)
      .collect()
      .map(r => (r.getAs[String]("phrase"), r.getAs[Long]("n_words"),
        r.getAs[Long]("occurrences"), r.getAs[Long]("score_ppm")))
      .toList
    // word (freq, degree): quick (2,7) 3.5; brown (3,9) 3.0; fox (3,9) 3.0;
    // jumps (1,4) 4.0; lazy (2,4) 2.0; dog (2,4) 2.0; a (1,1) 1.0
    assert(got == List(
      ("quick brown fox jumps", 4L, 1L, 13500000L),
      ("quick brown fox", 3L, 1L, 9500000L),
      ("brown fox", 2L, 1L, 6000000L),
      ("lazy dog", 2L, 2L, 4000000L)))
  }

  test("keyphrases: maxPhraseLen drops over-long runs; k caps the output") {
    val sp = spark
    import sp.implicits._
    // 4 docs so the 60% df-gate stops only 'the' (df 4); 'short'/'run'
    // (df 2) stay content words
    val df = Seq(
      (1L, "the one two three four five the short run"),
      (2L, "the short run"),
      (3L, "the x"),
      (4L, "the y"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.keyphrases(df, "doc_id", "text", k = 1,
        stopDfPct = 60, maxPhraseLen = 4)
      .collect().map(r => r.getAs[String]("phrase")).toList
    // the 5-token run is dropped entirely; 'short run' (occ 2) remains
    assert(got == List("short run"))
  }

  test("groupVocabCosine: identical vocab -> 1, disjoint -> no pair, partial overlap in between") {
    val sp = spark
    import sp.implicits._
    val df = Seq(
      (1L, "s1", "a b"),
      (2L, "s2", "a b"), // same frequency vector as s1
      (3L, "s3", "a a"), // shares only 'a' with s1/s2
      (4L, "s4", "zz")) // disjoint vocabulary: no output pair
      .toDF("doc_id", "source", "text")
    val got = TextAnalysis.groupVocabCosine(df, "source", "text")
      .collect()
      .map(r => ((r.getAs[String]("g1"), r.getAs[String]("g2")), r.getAs[Double]("cosine")))
      .toMap
    assert(got(("s1", "s2")) == 1.0)
    // s1=(1,1), s3=(2,0): cos = 2 / (sqrt(2)*2) = 0.707107
    assert(got(("s1", "s3")) == 0.707107 && got(("s2", "s3")) == 0.707107)
    assert(got.size == 3) // s4 pairs with nobody
  }

  test("bpePairCounts: pairs weighted by word frequency; 1-char words and nulls ignored") {
    val sp = spark
    import sp.implicits._
    val df = Seq(
      (1L, "abc ab"),
      (2L, "ab x"), // "x" too short to hold a pair
      (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    // word counts: ab=2, abc=1, x=1 -> pairs: ab = 2 + 1, bc = 1
    val got = TextAnalysis.bpePairCounts(df, "text", k = 10)
      .collect().map(r => (r.getAs[String]("pair"), r.getAs[Long]("n")))
    assert(got.toSeq == Seq(("ab", 3L), ("bc", 1L)))
  }

  test("calibrateByGroup: percent_rank within source; ties share a rank") {
    val sp = spark
    import sp.implicits._
    // source A: 3 distinct qualities -> pct 0, 0.5, 1; source B: a tie on
    // the low score -> both get rank 1 -> pct 0, top gets (3-1)/(3-1) = 1
    val df = Seq(
      (1L, "one", "A"),
      (2L, "one two", "A"),
      (3L, "one two three four", "A"),
      (4L, "x", "B"),
      (5L, "y", "B"),
      (6L, "x y z w", "B")).toDF("doc_id", "text", "source")
    val got = TextAnalysis.calibrateByGroup(df, "doc_id", "text", "source")
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), (r.getAs[String]("source"), r.getAs[Double]("pct"))))
      .toMap
    assert(got(1L) == (("A", 0.0)))
    assert(got(2L) == (("A", 0.5)))
    assert(got(3L) == (("A", 1.0)))
    assert(got(4L) == (("B", 0.0)) && got(5L) == (("B", 0.0))) // tied singles
    assert(got(6L) == (("B", 1.0)))
  }

  test("corpusRollup: CUBE cells, subtotals and grand total reconcile") {
    val sp = spark
    import sp.implicits._
    val df = Seq(
      (1L, "en", "web", "a b c"),
      (2L, "en", "book", "a b"),
      (3L, "de", "web", "x y z w")).toDF("doc_id", "lang", "source", "text")
    val got = TextAnalysis.corpusRollup(df, "text", Seq("lang", "source"))
      .collect()
      .map(r => ((r.getAs[String]("lang"), r.getAs[String]("source")),
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"))))
      .toMap
    assert(got(("en", "web")) == ((1L, 3L)))
    assert(got(("en", "ALL")) == ((2L, 5L)))
    assert(got(("ALL", "web")) == ((2L, 7L)))
    assert(got(("ALL", "ALL")) == ((3L, 9L)))
    assert(got.size == 8) // 3 cells + 2 lang + 2 source subtotals + grand total
  }

  test("filterFunnel: first failing stage charges the drop; later stages never see it") {
    val sp = spark
    import sp.implicits._
    import org.apache.spark.sql.functions.{col, length}
    val df = Seq(
      (1L, "good doc here", "en"),   // passes everything
      (2L, "", "en"),                // fails stage 1 (empty)
      (3L, "fine text too", "de"),   // fails stage 2 (lang)
      (4L, "x", "en"),               // fails stage 3 (too short) - NOT also charged to stage 1
      (5L, null.asInstanceOf[String], "en")) // null text: 3VL -> fails stage 1
      .toDF("doc_id", "text", "lang")
    val got = TextAnalysis.filterFunnel(df, "text", Seq(
      "nonempty" -> (length(col("text")) > 0),
      "lang_en" -> (col("lang") === "en"),
      "min_len" -> (length(col("text")) >= 5)))
      .orderBy(col("stage_idx")).collect()
      .map(r => (r.getAs[String]("stage"),
        (r.getAs[Long]("docs_in"), r.getAs[Long]("docs_out"), r.getAs[Long]("docs_dropped"),
          r.getAs[Long]("chars_out"))))
    assert(got(0) == (("nonempty", (5L, 3L, 2L, 27L)))) // 2 and null-5 drop; 13+13+1 chars flow on
    assert(got(1) == (("lang_en", (3L, 2L, 1L, 14L))))  // 3 drops; 13+1 chars
    assert(got(2) == (("min_len", (2L, 1L, 1L, 13L))))  // 4 drops; doc 1 survives
  }

  test("tfidfSimilar: shared rare terms outweigh shared boilerplate; df cap prunes stop-terms") {
    val sp = spark
    import sp.implicits._
    // 'common' is in every doc (df=4/4 > 50% cap -> pruned). Docs 1 and 2
    // share the rare pair (zeta, theta); doc 3 shares only 'mid' with them.
    val df = Seq(
      (1L, "common zeta theta mid"),
      (2L, "common zeta theta"),
      (3L, "common mid other thing"),
      (4L, "common unrelated words entirely"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.tfidfSimilar(df, "doc_id", "text", threshold = 0.0, maxDfPct = 50)
      .collect().map(r => ((r.getAs[Long]("d1"), r.getAs[Long]("d2")), r.getAs[Double]("sim")))
      .toMap
    assert(got.contains((1L, 2L)) && got((1L, 2L)) > 0.8) // rare-pair overlap dominates
    assert(!got.keySet.exists(p => p._1 == 4L || p._2 == 4L)) // only 'common' shared -> pruned away
    assert(got.get((1L, 3L)).forall(_ < got((1L, 2L)))) // boilerplate-ish 'mid' scores lower
  }

  test("boilerplateCoverage: common template grams flagged, unique content not") {
    val sp = spark
    import sp.implicits._
    // 'site nav here' opens 3 of 4 docs (75% > 60%); bodies are unique
    val df = Seq(
      (1L, "site nav here alpha beta gamma"),
      (2L, "site nav here delta epsilon zeta"),
      (3L, "site nav here eta theta iota"),
      (4L, "completely different text body now"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.boilerplateCoverage(df, "doc_id", "text", n = 3, minDfPct = 60)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        (r.getAs[Long]("n_grams"), r.getAs[Long]("n_boiler"), r.getAs[Double]("boiler_frac"))))
      .toMap
    // 6 tokens -> 4 trigrams; only 'site nav here' crosses the df bar
    assert(got(1L) == ((4L, 1L, 0.25)))
    assert(got(2L) == ((4L, 1L, 0.25)))
    assert(got(3L) == ((4L, 1L, 0.25)))
    assert(got(4L) == ((3L, 0L, 0.0))) // 5 tokens -> 3 trigrams, none common
  }

  test("ngramDiversity: repeated templates crater the ttr; short docs skipped") {
    val sp = spark
    import sp.implicits._
    val df = Seq(
      (1L, "spam", "a b a b a b"),    // grams: ab,ba,ab,ba,ab -> 5 total, 2 distinct
      (2L, "spam", "a b a b"),        // ab,ba,ab -> 3 total, same 2 distinct
      (3L, "fresh", "v w x y z"),     // 4 total, 4 distinct
      (4L, "fresh", "q"),             // < n tokens: skipped entirely
      (5L, "fresh", null.asInstanceOf[String]))
      .toDF("doc_id", "source", "text")
    val got = TextAnalysis.ngramDiversity(df, "source", "text", n = 2)
      .collect().map(r => (r.getAs[String]("source"),
        (r.getAs[Long]("n_grams"), r.getAs[Long]("n_distinct"), r.getAs[Double]("ttr")))).toMap
    assert(got("spam") == ((8L, 2L, 0.25)))
    assert(got("fresh") == ((4L, 4L, 1.0)))
    assert(got.size == 2)
  }

  test("cooccurrenceLift: independence gives lift 1, exclusion lifts below 1, affinity above") {
    val sp = spark
    import sp.implicits._
    // 'a b' always together (4 docs), 'c' in every doc, 'd' never with 'a'
    val df = Seq(
      (1L, "a b c"), (2L, "a b c"), (3L, "a b c"), (4L, "a b c"),
      (5L, "d c"), (6L, "d c"), (7L, "d c"), (8L, "d c"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.cooccurrenceLift(df, "doc_id", "text", minCount = 2L)
      .collect().map(r => ((r.getAs[String]("t1"), r.getAs[String]("t2")),
        (r.getAs[Long]("n_both"), r.getAs[Double]("lift")))).toMap
    assert(got(("a", "b")) == ((4L, 2.0)))  // 4*8/(4*4): perfect affinity doubles chance
    assert(got(("a", "c")) == ((4L, 1.0)))  // c is everywhere: independent
    assert(got(("c", "d")) == ((4L, 1.0)))
    assert(!got.contains(("a", "d")))       // never co-occur -> below minCount
  }

  test("tfidfSimilar and tfidfSimilarDense agree bit-for-bit on real documents") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val inv = TextAnalysis.tfidfSimilar(docs, "doc_id", "text", threshold = 0.8, maxDfPct = 78)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted
    val dense = TextAnalysis.tfidfSimilarDense(docs, "doc_id", "text", threshold = 0.8, maxDfPct = 78)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted
    assert(inv.nonEmpty, "fixture should produce pairs at 0.8")
    assert(inv.toSeq == dense.toSeq)
  }

  test("tfidfSimilar: threshold gates output") {
    val sp = spark
    import sp.implicits._
    val df = Seq((1L, "a b c"), (2L, "a b c"), (3L, "x y z"))
      .toDF("doc_id", "text")
    val all = TextAnalysis.tfidfSimilar(df, "doc_id", "text", threshold = 0.999, maxDfPct = 100)
      .collect().map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2")))
    assert(all.toSeq == Seq((1L, 2L))) // identical docs only; disjoint pair gated out
  }

  test("tokenDiversity: template spam craters the effective vocabulary") {
    val sp = spark
    import sp.implicits._
    val df = Seq(
      ("varied", "a b c d"), ("varied", "e f g h"),         // 8 tokens, all unique
      ("spam", "x x x x"), ("spam", "x x x y"))             // 7 of 8 tokens are 'x'
      .toDF("source", "text")
    val got = TextAnalysis.tokenDiversity(df, "source", "text").collect()
      .map(r => (r.getAs[String]("source"),
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_types"),
          r.getAs[Double]("simpson"), r.getAs[Double]("eff_types"))))
      .toMap
    assert(got("varied") == ((8L, 8L, 1.0, 8.0))) // all distinct: max diversity
    val (t, ty, simp, eff) = got("spam")
    assert(t == 8L && ty == 2L)
    assert(simp == round6(1.0 - 42.0 / 56.0)) // d = 7*6 + 0 = 42
    assert(eff == round6(64.0 / 50.0))        // sum c^2 = 49 + 1
  }

  private def round6(x: Double): Double = math.rint(x * 1e6) / 1e6

  test("readability: vowel-group syllables, sentence runs, fragment floor") {
    val sp = spark
    import sp.implicits._
    val df = Seq(
      // 4 words, 2 sentences ('.' and '!' runs), syllables: see/spot/run/go = 4
      (1L, "see spot run. go!"),
      // fragment without terminator: sentence count floors at 1;
      // 'rhythm' has no aeiouy vowel GROUP with y? y counts: rh-y-thm = 1
      (2L, "rhythm"),
      // '...' is ONE run, not three sentences
      (3L, "waiting... done."))
      .toDF("doc_id", "text")
    val got = TextAnalysis.readability(df, "doc_id", "text").collect()
      .map(r => (r.getAs[Long]("doc_id"),
        (r.getAs[Long]("n_words"), r.getAs[Long]("n_sents"), r.getAs[Long]("n_syll"),
          r.getAs[Double]("flesch"))))
      .toMap
    val (w1, s1, y1, f1) = got(1L)
    assert(w1 == 4L && s1 == 2L && y1 == 4L)
    assert(math.abs(f1 - (206.835 - 1.015 * 2.0 - 84.6 * 1.0)) < 1e-6)
    val (w2, s2, y2, _) = got(2L)
    assert(w2 == 1L && s2 == 1L && y2 == 1L)
    val (_, s3, y3, _) = got(3L)
    assert(s3 == 2L) // '...' and '.' -> two runs
    assert(y3 == 4L) // wai-ti-ng(ai,i) -> 'waiting' ai+i = 2, 'done' o+e = 2
  }

  test("labelingMatrix: coverage diagonal, agreements and conflicts; abstain excluded") {
    val sp = spark
    import sp.implicits._
    val rows = Seq(
      (1L, 1, 1),   // both fire, agree
      (2L, 1, -1),  // both fire, conflict
      (3L, 0, 1),   // lf1 abstains
      (4L, -1, 0))  // lf2 abstains
      .toDF("id", "v1", "v2")
    val got = TextAnalysis.labelingMatrix(rows,
      Seq("f1" -> org.apache.spark.sql.functions.col("v1"),
        "f2" -> org.apache.spark.sql.functions.col("v2")))
      .collect().map(r => (r.getAs[String]("lf_a"), r.getAs[String]("lf_b")) ->
        ((r.getAs[Long]("n_both"), r.getAs[Long]("n_agree"), r.getAs[Long]("n_conflict"))))
      .toMap
    assert(got(("f1", "f1")) == ((3L, 3L, 0L))) // diagonal = coverage
    assert(got(("f2", "f2")) == ((3L, 3L, 0L)))
    assert(got(("f1", "f2")) == ((2L, 1L, 1L)))
  }

  test("bpeLearn: greedy merges in frequency order with lexicographic ties") {
    val sp = spark
    import sp.implicits._
    val docs = Seq((1L, "aaab aaab ab")).toDF("doc_id", "text")
    // round 1: (a,a) count 4 beats (a,b) count 3; round 2: (a,b) count 3
    // beats (aa,a) count 2; round 3: only (aa,ab) remains; then exhausted
    val merges = TextAnalysis.bpeLearn(docs, "text", nMerges = 10)
    assert(merges == Seq(("a", "a"), ("a", "b"), ("aa", "ab")))
  }

  test("bpeLearn size gate: driver and distributed paths learn identical merges") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    // default gate routes to the collected driver loop; gate 0 forces the
    // distributed round loop — the physical path must never change the
    // learned vocabulary (count-desc, then UTF-8-byte-ascending ties)
    val driver = TextAnalysis.bpeLearn(docs, "text", nMerges = 12)
    val dist = TextAnalysis.bpeLearn(docs, "text", nMerges = 12, maxDriverVocab = 0L)
    assert(driver == dist, s"gate changed merges:\n driver=$driver\n dist=$dist")
  }

  test("bpeEncode: greedy left-to-right application of the learned merges") {
    val sp = spark
    import sp.implicits._
    val merges = Seq(("a", "a"), ("a", "b"), ("aa", "ab"))
    val c = org.apache.spark.sql.functions.col _
    val got = Seq((1L, "aaab ab aaa"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
      .select(c("doc_id"), TextAnalysis.bpeEncode(c("text"), merges).as("t"))
      .collect().map(r => r.getLong(0) -> Option(r.getSeq[String](1)).map(_.toList)).toMap
    // aaab -> aa,a,b -> aa,ab -> aaab; ab -> ab; aaa -> aa,a (greedy: first
    // pair merges, the lone tail 'a' stays)
    assert(got(1L) == Some(List("aaab", "ab", "aa", "a")))
    assert(got(2L).isEmpty) // null text stays null
  }

  test("kappaMatrix: perfect agreement scores 1, constant pair is undefined") {
    val sp = spark
    import sp.implicits._
    val c = org.apache.spark.sql.functions.col _
    val rows = Seq(
      (1L, 1, 1, 1, 1), (2L, -1, -1, 1, 1), (3L, 1, 1, 1, 1), (4L, -1, -1, 1, 1))
      .toDF("id", "v1", "v2", "v3", "v4")
    val got = TextAnalysis.kappaMatrix(rows,
      Seq("f1" -> c("v1"), "f2" -> c("v2"), "f3" -> c("v3"), "f4" -> c("v4")))
      .collect().map(r => (r.getAs[String]("lf_a"), r.getAs[String]("lf_b")) ->
        ((r.getAs[Long]("n_both"), Option(r.getAs[java.lang.Double]("kappa")))))
      .toMap
    // f1 == f2 exactly, balanced marginals -> kappa 1
    assert(got(("f1", "f2")) == ((4L, Some(java.lang.Double.valueOf(1.0)))))
    // one constant rater against a split one: pe = 0.5, po = 0.5 -> kappa 0
    // (a constant vote shows no skill beyond chance, the classic property)
    assert(got(("f1", "f3")) == ((4L, Some(java.lang.Double.valueOf(0.0)))))
    // BOTH constant: pe saturates at 1, kappa undefined -> null
    assert(got(("f3", "f4"))._2.isEmpty)
  }

  test("kappaMatrix: independent-looking votes are chance-corrected toward 0") {
    val sp = spark
    import sp.implicits._
    val c = org.apache.spark.sql.functions.col _
    // f1 splits half/half; f2 splits half/half orthogonally: po = 0.5 = pe
    val rows = Seq(
      (1L, 1, 1), (2L, 1, -1), (3L, -1, 1), (4L, -1, -1))
      .toDF("id", "v1", "v2")
    val got = TextAnalysis.kappaMatrix(rows, Seq("f1" -> c("v1"), "f2" -> c("v2")))
      .collect()(0)
    assert(got.getAs[Double]("po") == 0.5)
    assert(got.getAs[Double]("pe") == 0.5)
    assert(got.getAs[Double]("kappa") == 0.0)
  }

  test("tokenizerFertility: subword/word and char/subword ratios per language") {
    val sp = spark
    import sp.implicits._
    val rows = Seq(
      (1L, "hello world", "en"), // 2 words, 2 bpe, 11 chars
      (2L, "don't stop", "en"),  // 2 words, 4 bpe (don ' t stop), 10 chars
      (3L, "abc", "fr"),         // 1 word, 1 bpe, 3 chars
      (4L, null.asInstanceOf[String], "fr"), // excluded
      (5L, "x", null.asInstanceOf[String]))  // excluded
      .toDF("doc_id", "text", "lang")
    val got = TextAnalysis.tokenizerFertility(rows, "text",
      org.apache.spark.sql.functions.col("lang"))
      .collect().map(r => r.getAs[String]("lang") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_words"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("n_chars"), r.getAs[Double]("fertility"),
          r.getAs[Double]("chars_per_token")))).toMap
    assert(got("en") == ((2L, 4L, 6L, 21L, 1.5, 3.5)))
    assert(got("fr") == ((1L, 1L, 1L, 3L, 1.0, 3.0)))
    assert(got.size == 2)
  }

  test("textRank: hand-computed chunk graph — overlap edges, isolated chunk " +
      "keeps teleport mass, ties rank by chunk id") {
    val sp = spark
    import sp.implicits._
    // doc 1 at chunkTokens=4/overlap=0: chunks {a,b,c,d} {a,b,x,y} {p,q,r,s}
    // -> edge 0-1 (w=2), chunk 2 isolated. pr0 = 1e9 div 3 = 333333333,
    // tp = (1.5e8) div 3 = 50000000. Round: contrib over the w=2 edge is
    // ((333333333*85) div 100)*2 div 2 = 283333333 -> pr = 333333333
    // again (fixed point); the isolated chunk decays to tp.
    // doc 2: a single chunk -> pr = tp = 150000000.
    val df = Seq(
      (1L, "a b c d a b x y p q r s"),
      (2L, "z z z"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.textRank(df, "doc_id", "text",
        chunkTokens = 4, overlap = 0, iters = 5, topK = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == Set(
      (1L, 0L, 1L, 333333333L),
      (1L, 1L, 2L, 333333333L),
      (1L, 2L, 3L, 50000000L),
      (2L, 0L, 1L, 150000000L)))
  }

  test("textRank size gate: driver recurrence == distributed rounds") {
    val sp = spark
    import sp.implicits._
    // irregular overlap structure across three docs of different sizes
    val words = Seq("a", "b", "c", "d", "e", "f", "g", "h")
    val df = (1L to 3L).map { d =>
      val text = (0 until (8 * d).toInt)
        .map(i => words(((i * d) % 8).toInt)).mkString(" ")
      (d, text)
    }.toDF("doc_id", "text")
    def rows(gate: Long) =
      TextAnalysis.textRank(df, "doc_id", "text", chunkTokens = 4,
          overlap = 1, iters = 4, topK = 3, maxDriverEdges = gate)
        .orderBy("doc_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toList
    assert(rows(2000000L) == rows(0L))
  }
}
