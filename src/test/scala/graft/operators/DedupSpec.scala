package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DedupSpec extends SparkSpec {

  private def docs = {
    val sp = spark
    import sp.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
      (3L, "the quick brown fox jumps over a lazy dog"), // near dup
      (4L, "completely different words entirely here now")).toDF("doc_id", "text")
  }

  test("exact dedup groups identical texts under one representative") {
    val got = Dedup.exact(docs, "doc_id", "text").collect()
      .map(r => (r.getAs[Long]("rep_id"), r.getAs[Long]("n_dups"))).sortBy(_._1)
    assert(got.toSeq == Seq((1L, 2L), (3L, 1L), (4L, 1L)))
  }

  test("shingles/docShingles build distinct word n-grams") {
    val got = Dedup.docShingles(docs.where(col("doc_id") === 1), "doc_id", "text", 3)
      .collect().map(_.getAs[String]("shingle")).sorted
    assert(got.contains("the quick brown"))
    assert(got.contains("over the lazy"))
    assert(got.length == 7) // 9 tokens -> 7 trigrams, all distinct
  }

  test("ngramJaccard prefix-join and broadcast sweep agree (and find the dups)") {
    val a = Dedup.ngramJaccard(docs, "doc_id", "text", n = 2, threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(p => (p._1, p._2))
    val b = Dedup.ngramJaccardBroadcast(docs, "doc_id", "text", n = 2, threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(p => (p._1, p._2))
    assert(a.toSeq == b.toSeq)
    assert(a.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 1.0)) // exact dup pair
    assert(a.exists(p => p._1 == 1L && p._2 == 3L && p._3 > 0.5)) // near dup pair
    assert(!a.exists(p => p._2 == 4L))
    // block-partitioned sweep (the no-broadcast scale path) agrees too,
    // including blocks larger than the doc count (empty blocks)
    Seq(2, 7).foreach { blocks =>
      val c = Dedup.ngramJaccardBlocked(docs, "doc_id", "text", n = 2, threshold = 0.3, blocks)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(p => (p._1, p._2))
      assert(c.toSeq == a.toSeq, s"blocks=$blocks")
    }
  }

  test("property: blocked and broadcast Jaccard agree on random corpora") {
    val sp = spark
    import sp.implicits._
    (1 to 4).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta")
      val corpus = (0L until 40L).map { id =>
        (id, Seq.fill(3 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }.toDF("doc_id", "text")
      val t = 0.2 + 0.2 * rnd.nextDouble()
      val a = Dedup.ngramJaccardBroadcast(corpus, "doc_id", "text", n = 2, threshold = t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(p => (p._1, p._2))
      val b = Dedup.ngramJaccardBlocked(corpus, "doc_id", "text", n = 2, threshold = t, blocks = 1 + rnd.nextInt(6))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(p => (p._1, p._2))
      assert(a.toSeq == b.toSeq, s"seed=$seed t=$t")
    }
  }

  test("ngramJaccardBlocked unions rows sharing a doc id (collect_set parity)") {
    val sp = spark
    import sp.implicits._
    // doc 1 split across two rows: every variant must treat it as ONE set
    val split = Seq(
      (1L, "the quick brown fox"), (1L, "jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "completely different words here entirely")).toDF("doc_id", "text")
    val broadcastForm = Dedup.ngramJaccardBroadcast(split, "doc_id", "text", n = 2, threshold = 0.1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(p => (p._1, p._2))
    val blockedForm = Dedup.ngramJaccardBlocked(split, "doc_id", "text", n = 2, threshold = 0.1, blocks = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(p => (p._1, p._2))
    assert(blockedForm.toSeq == broadcastForm.toSeq)
    assert(blockedForm.exists(p => p._1 == 1L && p._2 == 2L)) // split doc still overlaps doc 2
  }

  test("minhash signatures identical for identical docs, close for near-dups") {
    val sig = Dedup.minhashSignature(docs, "doc_id", "text", n = 2, numPerm = 16)
      .collect().map(r => r.getAs[Long]("doc") -> (0 until 16).map(i => r.getAs[Long](s"mh$i")))
      .toMap
    assert(sig(1L) == sig(2L))
    val agree13 = (0 until 16).count(i => sig(1L)(i) == sig(3L)(i))
    val agree14 = (0 until 16).count(i => sig(1L)(i) == sig(4L)(i))
    assert(agree13 > agree14)
    assert(agree14 == 0)
  }

  test("minhashDedup surfaces exact + near dups via banded LSH") {
    val got = Dedup.minhashDedup(docs, "doc_id", "text", n = 2, numPerm = 16, bands = 4, threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((1L, 2L)))
    assert(!got.exists(p => p._2 == 4L || p._1 == 4L))
  }

  test("minhashEstimateAudit: exact dups estimate 1.0 with zero error; estimate is n_match/numPerm") {
    val got = Dedup.minhashEstimateAudit(docs, "doc_id", "text", n = 2, numPerm = 16, bands = 4)
      .collect()
      .map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2")) ->
        ((r.getAs[Long]("n_match"), r.getAs[Double]("est_jaccard"),
          r.getAs[Double]("jaccard"), r.getAs[Double]("abs_err"))))
      .toMap
    // docs 1 and 2 are identical: all positions agree, exact jaccard 1.0
    assert(got((1L, 2L)) == ((16L, 1.0, 1.0, 0.0)))
    // every candidate's estimate is the agreement fraction, err = |est - exact|
    got.values.foreach { case (m, est, jac, err) =>
      assert(est == m.toDouble / 16)
      assert(math.abs(err - math.abs(est - jac)) < 1e-9)
    }
  }

  test("pairAgreement: both / lexical_only / semantic_only classification") {
    val sp = spark
    import sp.implicits._
    val lex = Seq((1L, 2L, 0.8), (3L, 4L, 0.6)).toDF("d1", "d2", "jaccard")
    val sem = Seq((1L, 2L, 0.9), (5L, 6L, 0.5)).toDF("d1", "d2", "sim")
    val got = Dedup.pairAgreement(lex, sem)
      .collect().map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2")) -> r.getAs[String]("verdict"))
      .toMap
    assert(got == Map((1L, 2L) -> "both", (3L, 4L) -> "lexical_only", (5L, 6L) -> "semantic_only"))
  }

  test("stitchCandidates: tail==head seams pair up; self-pairs and hot seams excluded") {
    val sp = spark
    import sp.implicits._
    val seam = "page two continues the story right here"  // 7 tokens... pad to 8
    val s8 = seam + " now"
    val rows = Seq(
      (1L, "first part of the article ends with " + s8),
      (2L, s8 + " and the continuation carries on afterwards"),
      (3L, "unrelated document with nothing shared at all beyond length"))
      .toDF("doc_id", "text")
    val got = Dedup.stitchCandidates(rows, "doc_id", "text", k = 8)
      .collect().map(r => (r.getAs[Long]("prev_id"), r.getAs[Long]("next_id")))
    assert(got.toSeq == Seq((1L, 2L)))
  }

  test("lshRecallAudit: generous banding recovers every exact pair (recall 1)") {
    val got = Dedup.lshRecallAudit(docs, "doc_id", "text",
      n = 2, numPerm = 16, bands = 8, threshold = 0.3).collect()(0)
    assert(got.getAs[Long]("n_exact") >= 1L)
    assert(got.getAs[Long]("n_missed") == got.getAs[Long]("n_exact") - got.getAs[Long]("n_lsh"))
    // 8 bands of 2 rows on near-identical docs: nothing slips through
    assert(got.getAs[Double]("recall") == 1.0)
  }

  test("clusterProvenance: sources union, representative, and sizes per component") {
    val sp = spark
    import sp.implicits._
    val comps = Seq((1L, 1L), (2L, 1L), (5L, 1L), (7L, 7L), (8L, 7L))
      .toDF("doc", "component")
    val meta = Seq(
      (1L, "A", 100L), (2L, "B", 50L), (5L, "A", 25L),
      (7L, "C", 10L), (8L, "C", 20L), (99L, "Z", 1L)) // 99 not clustered
      .toDF("doc_id", "source", "n_chars")
    val got = Dedup.clusterProvenance(comps, meta, "doc_id", "source", "n_chars")
      .collect().map(r => r.getAs[Long]("component") ->
        ((r.getAs[Long]("n_members"), r.getAs[Long]("rep_id"), r.getAs[Long]("n_sources"),
          r.getAs[String]("sources"), r.getAs[Long]("total_chars")))).toMap
    assert(got(1L) == ((3L, 1L, 2L, "A,B", 175L)))
    assert(got(7L) == ((2L, 7L, 1L, "C", 30L)))
    assert(got.size == 2)
  }

  test("sortedNeighborhood: near-dups adjacent in key order pair; beyond-window docs never compared") {
    val sp = spark
    import sp.implicits._
    val rows = Seq(
      (1L, "Alpha report on spark shuffles and joins"),
      (2L, "alpha report on spark shuffles and joins!"), // same key after normalize
      (3L, "alpha report about completely different things entirely here"),
      (9L, "zulu text that sorts far away from the alphas"))
      .toDF("doc_id", "text")
    val got = Dedup.sortedNeighborhood(rows, "doc_id", "text", windowSize = 2, threshold = 0.5)
      .collect().map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2")) -> r.getAs[Double]("jaccard"))
      .toMap
    // windowSize 2: each doc only meets its immediate successor in key
    // order; (1,2) are adjacent (identical key, doc tie-break) and identical
    // token sets modulo punctuation tail
    assert(got.keySet == Set((1L, 2L)))
    assert(got((1L, 2L)) < 1.0) // 'joins' vs 'joins!' differ as tokens
    // a wider window reaches (2,3) but their Jaccard fails the threshold
    val wide = Dedup.sortedNeighborhood(rows, "doc_id", "text", windowSize = 4, threshold = 0.05)
      .collect().map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2"))).toSet
    assert(wide.contains((2L, 3L)))
  }

  test("cdcChunks: boundaries follow content; chunks cover the doc in order") {
    val sp = spark
    import sp.implicits._
    val body = (1 to 60).map(i => s"w${i * 7 % 97}").mkString(" ")
    val rows = Seq((1L, body)).toDF("doc_id", "text")
    val chunks = Dedup.cdcChunks(rows, "doc_id", "text", window = 4, divisor = 4)
      .orderBy(col("cidx")).collect()
    // chunks partition the token stream: concatenation reproduces the doc
    assert(chunks.map(_.getAs[String]("chunk")).mkString(" ") == body)
    assert(chunks.map(_.getAs[Long]("n_tokens")).sum == 60L)
    assert(chunks.length > 1) // divisor 4 over 56 cut candidates must cut somewhere
  }

  test("cdcDedup realigns after an insertion where fixed chunking loses everything") {
    val sp = spark
    import sp.implicits._
    val body = (1 to 60).map(i => s"w${i * 7 % 97}").mkString(" ")
    val rows = Seq((1L, body), (2L, "inserted " + body)).toDF("doc_id", "text")
    val cdc = Dedup.cdcDedup(rows, "doc_id", "text", window = 4, divisor = 4)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_chunks"), r.getAs[Long]("n_kept")))).toMap
    // doc 1 keeps everything; doc 2's post-realignment chunks dedupe away
    assert(cdc(1L)._1 == cdc(1L)._2)
    assert(cdc(2L)._2 < cdc(2L)._1, s"CDC failed to realign: ${cdc(2L)}")
    // fixed-width chunking on the same pair dedupes NOTHING for doc 2 —
    // every chunk shifted by one token
    val fixed = Dedup.chunkDedup(rows, "doc_id", "text", chunkTokens = 8)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_chunks"), r.getAs[Long]("n_kept")))).toMap
    assert(fixed(2L)._1 == fixed(2L)._2)
  }

  test("spanPairs: shared spans pair the docs; boilerplate above the degree cap mints no pairs") {
    val sp = spark
    import sp.implicits._
    val lifted = "alpha beta gamma delta epsilon zeta" // 6 tokens -> 3 spans of 4
    val boiler = "one two three four"                  // 4 tokens -> 1 span of 4
    val rows = (Seq(
      (1L, lifted + " unique tail of document number one"),
      (2L, lifted + " completely different continuation here too")) ++
      // the boilerplate span appears in 5 docs (> maxDocsPerSpan = 4)
      (10L to 14L).map(i => (i, boiler + s" filler body $i x y z")))
      .toDF("doc_id", "text")
    val got = Dedup.spanPairs(rows, "doc_id", "text", k = 4, maxDocsPerSpan = 4, minShared = 2)
      .collect()
      .map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2")) ->
        ((r.getAs[Long]("n_shared"), r.getAs[Double]("overlap"))))
      .toMap
    // docs 1 and 2 share the 3 spans fully inside `lifted`; doc 1 has
    // 12 tokens -> 9 spans, doc 2 has 11 -> 8, so overlap = 3/8
    assert(got.keySet == Set((1L, 2L)))
    assert(got((1L, 2L)) == ((3L, 0.375)))
  }

  test("incrementalMinhash: new docs near-dup of the existing corpus are dropped") {
    val sp = spark
    import sp.implicits._
    val existing = Seq(
      (2L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (4L, "completely unrelated content about spark physical plans and shuffles"))
      .toDF("doc_id", "text")
    val shard = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank"), // exact dup of 2
      (3L, "the quick brown fox jumps over the lazy dog near the river"),      // near dup of 2
      (5L, "a brand new document sharing nothing with the existing corpus"),   // novel
      (7L, null.asInstanceOf[String]))                                         // null text survives
      .toDF("doc_id", "text")
    val got = Dedup.incrementalMinhash(shard, existing, "doc_id", "text",
      n = 2, numPerm = 16, bands = 4, threshold = 0.5)
      .collect().map(_.getAs[Long]("doc_id")).sorted
    assert(got.toSeq == Seq(5L, 7L))
    // the existing corpus is never deduped against itself: an exact dup
    // PAIR inside `existing` must not affect the shard's survivors
    val got2 = Dedup.incrementalMinhash(shard,
      existing.unionByName(Seq((6L, "completely unrelated content about spark physical plans and shuffles"))
        .toDF("doc_id", "text")),
      "doc_id", "text", n = 2, numPerm = 16, bands = 4, threshold = 0.5)
      .collect().map(_.getAs[Long]("doc_id")).sorted
    assert(got2.toSeq == Seq(5L, 7L))
  }

  test("incrementalMinhash/minhashDedup: duplicate-id rows merge into ONE shingle set") {
    val sp = spark
    import sp.implicits._
    // doc 1 appears twice; its bigram shingles {"x y","y z"} vs doc 9's
    // {"x y","y z","z w"}: true distinct-set Jaccard = 2/3 — double-counted
    // shingles would read 4/(4+3-4) = 4/3 and drop doc 1 at ANY threshold
    val shard = Seq((1L, "x y z"), (1L, "x y z")).toDF("doc_id", "text")
    val corpus = Seq((9L, "x y z w")).toDF("doc_id", "text")
    val survivors = Dedup.incrementalMinhash(shard, corpus, "doc_id", "text",
      n = 2, numPerm = 16, bands = 4, threshold = 0.75)
      .collect().map(_.getAs[Long]("doc_id")).distinct
    assert(survivors.toSeq == Seq(1L)) // 2/3 < 0.75: must survive
    val pairs = Dedup.minhashDedup(
      shard.unionByName(corpus), "doc_id", "text",
      n = 2, numPerm = 16, bands = 4, threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Double]("jaccard")))
    assert(pairs.toSeq == Seq((1L, 9L, 0.666667)))
  }

  test("simhash: identical docs equal, near-dups within small hamming distance") {
    val sig = Dedup.simhash(docs, "doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc") -> r.getAs[Long]("simhash")).toMap
    assert(sig(1L) == sig(2L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sig(1L), sig(3L)) < ham(sig(1L), sig(4L)))
    val pairs = Dedup.simhashDedup(docs, "doc_id", "text", prefixBits = 8, maxHamming = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
  }

  test("connectedComponents merges transitive pairs; survivors keep one rep per cluster") {
    val sp = spark
    import sp.implicits._
    // {1,2,3} via (1,2)(2,3); {7,9}; a 12-node chain 100..111 (worst-case
    // diameter for hash-min: the min label must walk the whole chain)
    val chain = (100L until 111L).map(i => (i, i + 1))
    val pairs = (Seq((1L, 2L), (2L, 3L), (7L, 9L)) ++ chain).toDF("d1", "d2")
    val comp = Dedup.connectedComponents(pairs, "d1", "d2")
    val got = comp.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // both physical paths must produce the identical labeling
    val gotDist = Dedup.connectedComponentsDistributed(pairs, "d1", "d2")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == gotDist)
    assert(got(1L) == 1L && got(2L) == 1L && got(3L) == 1L)
    assert(got(7L) == 7L && got(9L) == 7L)
    assert((100L to 111L).forall(got(_) == 100L))
    // survivors: reps + never-paired docs survive, duplicates drop
    val docs = (0L until 10L).map(i => (i, s"t$i")).toDF("doc_id", "text")
    val surv = Dedup.clusterSurvivors(docs, "doc_id", comp)
      .collect().map(_.getLong(0)).sorted
    assert(surv.toSeq == Seq(0L, 1L, 4L, 5L, 6L, 7L, 8L)) // 2,3,9 dropped
    // a docs frame whose id column is itself named "doc" must not collide
    // with the components frame's "doc" column
    val docsNamedDoc = (0L until 5L).map(i => (i, s"t$i")).toDF("doc", "text")
    val surv2 = Dedup.clusterSurvivors(docsNamedDoc, "doc", comp)
      .collect().map(_.getLong(0)).sorted
    assert(surv2.toSeq == Seq(0L, 1L, 4L))
    // convergence guard (distributed path — the driver union-find needs no
    // rounds): a long chain with too few rounds throws, never returns
    // half-propagated labels; the size gate routes there too
    intercept[IllegalStateException] {
      Dedup.connectedComponentsDistributed(chain.toDF("d1", "d2"), "d1", "d2", maxIters = 3)
    }
    intercept[IllegalStateException] {
      Dedup.connectedComponents(chain.toDF("d1", "d2"), "d1", "d2", maxIters = 3,
        maxDriverPairs = 0L)
    }
  }

  test("ngramContainment: short doc contained in a long container, not vice versa") {
    val sp = spark
    import sp.implicits._
    val df = Seq(
      (1L, "the quick brown fox jumps"),
      (2L, "intro words then the quick brown fox jumps and a long tail of extra content here"),
      (3L, "totally unrelated text again")).toDF("doc_id", "text")
    val got = Dedup.ngramContainment(df, "doc_id", "text", n = 2, threshold = 0.9)
      .collect().map(r => (r.getAs[Long]("src"), r.getAs[Long]("dst"),
        r.getAs[Double]("containment")))
    // doc1's 4 bigrams all appear in doc2 -> containment 1.0 one way only
    assert(got.toSeq == Seq((1L, 2L, 1.0)))
  }

  test("ngramContainment blocked sweep and inverted index agree (incl. both-direction pairs)") {
    val sp = spark
    import sp.implicits._
    val rng = new scala.util.Random(11)
    val words = Seq("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta")
    val df = ((1L to 40L).map { i =>
      val base = Seq.fill(6 + rng.nextInt(8))(words(rng.nextInt(words.length)))
      (i, base.mkString(" "))
    } :+ (1L, "alpha beta gamma")) // duplicate id: both variants must UNION its sets
      .toDF("doc_id", "text")
    def norm(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => (r.getAs[Long]("src"), r.getAs[Long]("dst"), r.getAs[Double]("containment")))
      .sortBy(p => (p._1, p._2)).toSeq
    val blocked = norm(Dedup.ngramContainment(df, "doc_id", "text", n = 2, threshold = 0.5, blocks = 4))
    val index = norm(Dedup.ngramContainmentIndex(df, "doc_id", "text", n = 2, threshold = 0.5))
    assert(blocked == index)
    assert(blocked.nonEmpty) // small vocab guarantees overlaps
    // exact dups (if any same text) give 1.0 both ways; at minimum the
    // direction multiset must contain a pair and its size asymmetry
    assert(blocked.forall(p => p._3 >= 0.5 && p._3 <= 1.0))
  }

  test("incrementalExact: new-shard rows absent from the existing corpus") {
    val sp = spark
    import sp.implicits._
    val existing = Seq((1L, "alpha beta"), (2L, "gamma delta"), (3L, "epsilon zeta"))
      .toDF("doc_id", "text")
    val shard = Seq(
      (10L, "gamma delta"), // dup of 2
      (11L, "brand new text"),
      (12L, "another novel doc"),
      (13L, "alpha beta")) // dup of 1
      .toDF("doc_id", "text")
    val got = Dedup.incrementalExact(shard, existing, "doc_id", "text")
      .collect().map(_.getAs[Long]("doc_id")).sorted
    assert(got.toSeq == Seq(11L, 12L))
  }

  test("incrementalExactBloom: identical output, even at collision-forcing fpp") {
    val sp = spark
    import sp.implicits._
    val existing = (1L to 200L).map(i => (i, s"existing doc number $i")).toDF("doc_id", "text")
    val shard = ((1L to 50L).map(i => (1000L + i, s"existing doc number $i")) ++ // dups
      (1L to 50L).map(i => (2000L + i, s"novel doc number $i"))).toDF("doc_id", "text")
    val exact = Dedup.incrementalExact(shard, existing, "doc_id", "text")
      .collect().map(_.getAs[Long]("doc_id")).sorted.toSeq
    assert(exact == (2001L to 2050L))
    // tight filter AND a saturated one (fpp 0.5 forces false positives
    // through the verify join) must both reproduce the exact result
    for (fpp <- Seq(0.01, 0.5)) {
      val got = Dedup.incrementalExactBloom(shard, existing, "doc_id", "text",
        expectedItems = 200, fpp = fpp)
        .collect().map(_.getAs[Long]("doc_id")).sorted.toSeq
      assert(got == exact, s"fpp=$fpp")
    }
  }

  test("repeatedSpans: cross-doc span coverage unions overlaps; within-doc repeats don't count") {
    val sp = spark
    import sp.implicits._
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
      (3L, "the quick brown fox jumps over a lazy dog"), // shares a 6-token prefix
      (4L, "completely different words entirely here now"),
      (5L, "x y z x y z"), // span repeats only WITHIN the doc
      (6L, "too short"), // < k tokens: zero spans
      (7L, null.asInstanceOf[String])) // null text: excluded
      .toDF("doc_id", "text")
    val got = Dedup.repeatedSpans(df, "doc_id", "text", k = 3)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), (r.getAs[Long]("n_tokens"),
        r.getAs[Long]("n_spans"), r.getAs[Long]("n_dup_spans"),
        r.getAs[Long]("dup_tokens"), r.getAs[Double]("dup_frac"))))
      .toMap
    // docs 1/2: every 3-gram duplicated, full coverage
    assert(got(1L) == ((9L, 7L, 7L, 9L, 1.0)))
    assert(got(2L) == ((9L, 7L, 7L, 9L, 1.0)))
    // doc 3: spans at pos 0..3 match doc 1's prefix -> positions 0..5 covered
    assert(got(3L) == ((9L, 7L, 4L, 6L, 0.666667)))
    assert(got(4L) == ((6L, 4L, 0L, 0L, 0.0)))
    // "x y z" occurs twice in doc 5 but in no other doc: not a duplicate
    assert(got(5L) == ((6L, 4L, 0L, 0L, 0.0)))
    assert(got(6L) == ((2L, 0L, 0L, 0L, 0.0)))
    assert(!got.contains(7L))
  }

  test("chunkDedup: first occurrence survives, documents reassemble in chunk order") {
    val sp = spark
    import sp.implicits._
    // 2-token chunks: doc 1 = [a b][c d], doc 2 repeats [a b] then adds
    // [e f]; doc 3 is entirely made of already-seen chunks
    val df = Seq(
      (1L, "a b c d"),
      (2L, "a b e f"),
      (3L, "a b c d")).toDF("doc_id", "text")
    val got = Dedup.chunkDedup(df, "doc_id", "text", chunkTokens = 2).collect()
      .map(r => (r.getAs[Long]("doc_id"),
        (r.getAs[Long]("n_chunks"), r.getAs[Long]("n_kept"), r.getAs[String]("text_dedup"))))
      .toMap
    assert(got(1L) == ((2L, 2L, "a b c d"))) // first occurrence of both chunks
    assert(got(2L) == ((2L, 1L, "e f"))) // [a b] already seen in doc 1
    assert(got(3L) == ((2L, 0L, ""))) // fully duplicated, kept as empty
  }

  test("chunkDedup: each distinct chunk survives exactly once, corpus-wide") {
    val sp = spark
    import sp.implicits._
    val df = Seq(
      (10L, "w x y z p q"),
      (11L, "w x y z r s"),
      (12L, "p q r s w x")).toDF("doc_id", "text")
    val out = Dedup.chunkDedup(df, "doc_id", "text", chunkTokens = 2)
    val keptChunks = out.collect().flatMap { r =>
      val t = r.getAs[String]("text_dedup")
      if (t.isEmpty) Array.empty[String]
      else t.split(" ").grouped(2).map(_.mkString(" ")).toArray
    }
    // survivor multiset == distinct chunk set (no chunk kept twice or lost)
    assert(keptChunks.sorted.toSeq == keptChunks.distinct.sorted.toSeq)
    val allChunks = df.collect().flatMap(_.getString(1).split(" ").grouped(2).map(_.mkString(" ")))
    assert(keptChunks.toSet == allChunks.toSet)
  }

  test("editVerify: exact dup scores dist 0 / sim 1; near dup gets its true distance") {
    val got = Dedup.editVerify(docs, "doc_id", "text",
      n = 2, numPerm = 16, bands = 4, jaccardThreshold = 0.3).collect()
      .map(r => ((r.getAs[Long]("d1"), r.getAs[Long]("d2")),
        (r.getAs[Long]("edit_dist"), r.getAs[Double]("edit_sim"))))
      .toMap
    assert(got((1L, 2L)) == ((0L, 1.0))) // identical texts
    // docs 1/3 ("the lazy" -> "a lazy"): levenshtein 3, normalized by the
    // longer length 43, floor-quantized
    got.get((1L, 3L)).foreach { case (d, sim) =>
      assert(d == 3L)
      assert(sim == math.floor((1.0 - 3.0 / 43.0) * 1e6) / 1e6)
    }
    assert(!got.keySet.exists(p => p._1 == 4L || p._2 == 4L)) // no false pair
  }

  test("editVerify: minSim gate drops word-soup pairs that shingles accept") {
    val sp = spark
    import sp.implicits._
    // same bag of bigrams base, heavy reordering: Jaccard-high, edit-low
    val df = Seq(
      (1L, "alpha beta gamma delta alpha beta gamma delta"),
      (2L, "gamma delta alpha beta gamma delta alpha beta")).toDF("doc_id", "text")
    val all = Dedup.editVerify(df, "doc_id", "text", n = 2, numPerm = 16, bands = 4,
      jaccardThreshold = 0.3, minSim = 0.0).collect()
    val gated = Dedup.editVerify(df, "doc_id", "text", n = 2, numPerm = 16, bands = 4,
      jaccardThreshold = 0.3, minSim = 0.95).collect()
    assert(all.nonEmpty) // the candidate pair exists and is scored
    assert(all.forall(_.getAs[Double]("edit_sim") < 0.95)) // but reordering cost shows
    assert(gated.isEmpty) // so the edit gate rejects it
  }

  test("clusterBestSurvivors: highest score wins, ties to smaller id, member counts right") {
    val sp = spark
    import sp.implicits._
    // component 1: docs 1,2,3 (3 wins on score); component 10: 10,11 tie -> 10
    val comps = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L))
      .toDF("doc", "component")
    val scored = Seq((1L, 0.5), (2L, 0.7), (3L, 0.9), (10L, 0.4), (11L, 0.4))
      .toDF("doc_id", "quality")
    val got = Dedup.clusterBestSurvivors(comps, scored, "doc_id", "quality")
      .collect().map(r => (r.getAs[Long]("component"),
        (r.getAs[Long]("rep_id"), r.getAs[Double]("best_score"), r.getAs[Long]("n_members"))))
      .toMap
    assert(got(1L) == ((3L, 0.9, 3L)))
    assert(got(10L) == ((10L, 0.4, 2L))) // score tie -> smaller id
    assert(got.size == 2)
  }

  test("snapshotDiff: added/removed/changed classified, unchanged suppressed") {
    val sp = spark
    import sp.implicits._
    val oldS = Seq((1L, "same"), (2L, "will change"), (3L, "will vanish")).toDF("doc_id", "text")
    val newS = Seq((1L, "same"), (2L, "changed!"), (4L, "brand new")).toDF("doc_id", "text")
    val got = Dedup.snapshotDiff(oldS, newS, "doc_id", "text")
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("status"))).toMap
    assert(got == Map(2L -> "changed", 3L -> "removed", 4L -> "added")) // 1 suppressed
  }

  test("leakageMatrix: pair orientation normalizes, counts accumulate per source pair") {
    val sp = spark
    import sp.implicits._
    val docs = Seq((1L, "A"), (2L, "B"), (3L, "A"), (4L, "B"), (5L, "C"))
      .toDF("doc_id", "source")
    // (1,2): A-B; (4,3): B-A (reversed orientation); (1,3): A-A
    val pairs = Seq((1L, 2L), (4L, 3L), (1L, 3L)).toDF("d1", "d2")
    val got = Dedup.leakageMatrix(pairs, docs, "doc_id", "source")
      .collect().map(r => ((r.getAs[String]("g1"), r.getAs[String]("g2")), r.getAs[Long]("n_pairs")))
      .toMap
    assert(got == Map(("A", "B") -> 2L, ("A", "A") -> 1L)) // B-A folded into A-B; C absent
  }

  test("minhashSignatureCols (per-row, map-only) equals the exploded aggregation signature") {
    val sp = spark
    import sp.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "a b a b a b a b"), // duplicate shingles must not change a min
      (3L, "short"),
      (4L, "")).toDF("doc_id", "text")
    val agg = Dedup.minhashSignature(docs, "doc_id", "text", n = 2, numPerm = 8)
      .collect().map(r => r.getLong(0) -> (1 to 8).map(r.getLong).toSeq).toMap
    val perRow = docs
      .select(org.apache.spark.sql.functions.col("doc_id") +:
        Dedup.minhashSignatureCols(org.apache.spark.sql.functions.col("text"), 2, 8): _*)
      .collect().map(r => r.getLong(0) -> (1 to 8).map(r.getLong).toSeq).toMap
    assert(perRow.keySet == agg.keySet)
    agg.keySet.foreach(k => assert(perRow(k) == agg(k), s"doc $k"))
  }

  test("hammingPairs: low-bit bucket gate, Hamming cap, sign-safe on bit 63") {
    val sp = spark
    import sp.implicits._
    // bucket = sig & 0xF (prefixBits = 4). Rows 1/2 share bucket 5 and
    // differ in 2 high bits (one of them bit 63 -> negative long); row 3
    // shares the bucket but is 20+ bits away; row 4 is 1 bit from row 1 but
    // in ANOTHER bucket -> never compared (the documented LSH miss).
    val sig = Seq(
      (1L, (0x5L | (1L << 63)) ^ 0L),
      (2L, (0x5L | (1L << 63)) ^ ((1L << 40) | (1L << 62))),
      (3L, 0x5L | 0xFFFFF00L),
      (4L, (0x5L | (1L << 63)) ^ 0x1L))
      .toDF("id", "sig")
    val got = Dedup.hammingPairs(sig, "id", "sig", prefixBits = 4, maxHamming = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 2L, 2L)))
  }
}
