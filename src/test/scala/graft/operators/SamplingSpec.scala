package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SamplingSpec extends SparkSpec {

  private def docs = {
    val sp = spark
    import sp.implicits._
    (0L until 200L).map(i => (i, if (i % 3 == 0) "en" else if (i % 3 == 1) "fr" else "de",
      s"src${i % 5}")).toDF("doc_id", "lang", "source")
  }

  test("splitAssign is exhaustive, deterministic, and stable under corpus growth") {
    val full = Sampling.splitAssign(docs, "doc_id").select(col("doc_id"), col("split"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(full.values.toSet.subsetOf(Set("train", "val", "test")))
    // roughly 80/10/10 (hash buckets, not exact)
    val train = full.values.count(_ == "train")
    assert(train > 120 && train < 200, s"train=$train of 200")
    // stability: assigning a PREFIX of the corpus gives identical labels —
    // growing the corpus never moves an existing doc between splits
    val prefix = Sampling.splitAssign(docs.where(col("doc_id") < 50), "doc_id")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    prefix.foreach { case (id, s) => assert(full(id) == s) }
  }

  test("splitAssign rejects percentages that exceed 100") {
    intercept[IllegalArgumentException] {
      Sampling.splitAssign(docs, "doc_id", trainPct = 80, valPct = 30)
    }
  }

  test("sampleStratified applies per-stratum rates; different salts draw independent samples") {
    val kept = Sampling.sampleStratified(docs, "doc_id", "lang",
      Map("en" -> 1.0, "fr" -> 0.0), defaultRate = 0.5)
    val byLang = kept.groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang.getOrElse("en", 0L) == 67L) // rate 1.0: all 67 en docs
    assert(byLang.getOrElse("fr", 0L) == 0L) // rate 0.0: none
    val de = byLang.getOrElse("de", 0L)
    assert(de > 10 && de < 56, s"de=$de of 66 at rate 0.5") // hash-approximate
    // a different salt keeps ~the same COUNT but a different membership
    val a = Sampling.sampleStratified(docs, "doc_id", "lang", Map(), 0.5, salt = "s1")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val b = Sampling.sampleStratified(docs, "doc_id", "lang", Map(), 0.5, salt = "s2")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(a != b)
  }

  test("perGroupCap keeps at most cap rows per group, deterministically") {
    val capped = Sampling.perGroupCap(docs, "doc_id", "source", cap = 7)
    val counts = capped.groupBy(col("source")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.size == 5 && counts.values.forall(_ == 7L)) // 40 docs/source -> 7
    assert(capped.agg(max(col("cap_rank"))).collect()(0).getLong(0) == 7L)
    // deterministic: same draw twice
    val again = Sampling.perGroupCap(docs, "doc_id", "source", cap = 7)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(again == capped.select(col("doc_id")).collect().map(_.getLong(0)).toSet)
    // a group smaller than the cap survives whole
    val tiny = Sampling.perGroupCap(docs.where(col("doc_id") < 3), "doc_id", "source", cap = 7)
    assert(tiny.count() == 3)
  }

  test("packSequences: concat-and-chunk bins fill exactly and offsets chain per shard") {
    val sp = spark
    import sp.implicits._
    val df = (0L until 100L).map(i => (i, 10L + i % 7)).toDF("doc_id", "n_toks")
    val got = Sampling.packSequences(df, "doc_id", col("n_toks"), seqLen = 64, shards = 4)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("shard"),
        r.getAs[Long]("n_tokens"), r.getAs[Long]("bin"), r.getAs[Long]("tok_offset")))
    assert(got.length == 100)
    // within each shard, in hash order, each doc starts exactly where the
    // previous ended: bin*64 + tok_offset is the running token sum
    got.groupBy(_._2).foreach { case (_, rows) =>
      val inOrder = rows.sortBy(r => r._4 * 64 + r._5) // position order
      var cum = 0L
      inOrder.foreach { case (_, _, n, bin, off) =>
        assert(bin == cum / 64 && off == cum % 64)
        cum += n
      }
    }
    // shards genuinely partition the corpus (all 4 in use, ids in range)
    assert(got.map(_._2).distinct.sorted.toSeq == Seq(0L, 1L, 2L, 3L))
  }

  test("perGroupTokenCap: crossing row kept, then the group stops; order is the hash draw") {
    val sp = spark
    import sp.implicits._
    val df = ((1L to 10L).map(i => (i, "a", 40L)) ++ // group a: 10 x 40 tokens
      Seq((100L, "b", 500L), (101L, "b", 1L))) // group b: first draw may blow the budget
      .toDF("doc_id", "source", "n_tok")
    val got = Sampling.perGroupTokenCap(df, "doc_id", "source", col("n_tok"), budget = 100)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"), r.getAs[Long]("cum_tokens")))
    val a = got.filter(_._2 == "a").sortBy(_._3)
    // 40+40 < 100, third row crosses (cum 120) and is kept, fourth is not
    assert(a.map(_._3).toSeq == Seq(40L, 80L, 120L))
    val b = got.filter(_._2 == "b").sortBy(_._3).map(_._3).toSeq
    // whichever of the two b rows the hash draws first, the crossing row
    // stays: 500-first keeps only it; 1-first keeps both (1, then 501)
    assert(b == Seq(500L) || b == Seq(1L, 501L), b.toString)
  }

  test("mixtureWeights: alpha=0.5 temperature scaling, null text drops from token sums") {
    val sp = spark
    import sp.implicits._
    val df = Seq(
      (1L, "a", "w x"), // 2 tokens
      (2L, "a", "y z"), // 2 tokens -> a: 4 tokens, sqrt = 2
      (3L, "a", null.asInstanceOf[String]), // counted as a doc, no tokens
      (4L, "b", "t1 t2 t3 t4 t5 t6 t7 t8 t9")) // b: 9 tokens, sqrt = 3
      .toDF("doc_id", "source", "text")
    val got = Sampling.mixtureWeights(df, "source",
      size(split(col("text"), " ")), alpha = 0.5, budgetTokens = 1000L)
      .collect()
      .map(r => (r.getAs[String]("source"), (r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_tokens"), r.getAs[Double]("weight"),
        r.getAs[Double]("target_tokens"))))
      .toMap
    assert(got("a") == ((3L, 4L, 0.4, 400.0)))
    assert(got("b") == ((1L, 9L, 0.6, 600.0)))
  }

  test("weightedSample: max weight always kept, nonpositive/null never, draw is replay-stable") {
    val sp = spark
    import sp.implicits._
    val df = ((0L until 200L).map(i => (i, Some(((i % 10) + 1).toDouble))) ++
      Seq((900L, Some(0.0)), (901L, Some(-3.0)), (902L, Option.empty[Double])))
      .toDF("doc_id", "w")
    val kept = Sampling.weightedSample(df, "doc_id", "w").collect()
      .map(_.getAs[Long]("doc_id")).toSet
    // every max-weight row (w = 10 -> threshold 1e6 > any bucket) is kept
    val maxIds = (0L until 200L).filter(i => i % 10 == 9).toSet
    assert(maxIds.subsetOf(kept))
    assert(!kept.contains(900L) && !kept.contains(901L) && !kept.contains(902L))
    // the draw leans proportional: low weights keep fewer than high weights
    val lowKept = (0L until 200L).count(i => i % 10 <= 2 && kept(i))
    val highKept = (0L until 200L).count(i => i % 10 >= 7 && kept(i))
    assert(lowKept < highKept)
    // replay stability: same salt, same draw
    val again = Sampling.weightedSample(df, "doc_id", "w").collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(again == kept)
  }

  test("weightedSample: an all-negative weight column keeps nothing") {
    val sp = spark
    import sp.implicits._
    // neg/neg made w/__wmax positive before the normalizer was guarded,
    // passing every row the contract says must never pass
    val df = (0L until 50L).map(i => (i, -1.0 - (i % 5))).toDF("doc_id", "w")
    assert(Sampling.weightedSample(df, "doc_id", "w").count() == 0L)
  }

  test("unimaxAllocate: small sources saturate at maxEpochs, the rest share equally") {
    val sp = spark
    import sp.implicits._
    // tokens per source: a=10, b=100, c=100; caps at 2 epochs: 20, 200, 200.
    // budget 120: a is constrained (20*3=60 <= 120) -> full 20 (2 epochs);
    // b: 200*2=400 > 100 remaining -> unconstrained; b,c share (120-20)/2=50
    val docs = Seq(("a", 10L), ("b", 40L), ("b", 60L), ("c", 100L))
      .toDF("source", "n_tok")
    val got = Sampling.unimaxAllocate(docs, "source", col("n_tok"),
      budgetTokens = 120L, maxEpochs = 2L)
      .collect()
      .map(r => (r.getAs[String]("source"),
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("cap"),
          r.getAs[Double]("alloc_tokens"), r.getAs[Double]("epochs"))))
      .toMap
    assert(got("a") == ((10L, 20L, 20.0, 2.0)))
    assert(got("b") == ((100L, 200L, 50.0, 0.5)))
    assert(got("c") == ((100L, 200L, 50.0, 0.5)))
    // the allocation exactly exhausts the budget
    assert(got.values.map(_._3).sum == 120.0)
  }

  test("paretoFront: strictly-dominated rows drop; ties and incomparables survive") {
    val sp = spark
    import sp.implicits._
    val rows = Seq(
      // group g: (10, 5.0) dominated by (20, 6.0); (30, 4.0) incomparable
      ("g", 1L, 10L, 5.0), ("g", 2L, 20L, 6.0), ("g", 3L, 30L, 4.0),
      // equal y, lower x: NOT strictly dominated (needs strict in BOTH)
      ("g", 4L, 15L, 6.0),
      // duplicate point: both stay (neither strictly beats the other)
      ("g", 5L, 30L, 4.0),
      // other group: its own front; doc 7's y is nulled below and dropped
      ("h", 6L, 1L, 1.0), ("h", 7L, 2L, 0.0))
      .toDF("source", "doc_id", "x", "y")
      .withColumn("y", when(col("doc_id") === 7L, lit(null)).otherwise(col("y")))
    val kept = Sampling.paretoFront(rows, "source", "x", "y")
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(kept == Set(2L, 3L, 4L, 5L, 6L))
  }

  test("unimaxAllocate: budget beyond total capacity caps everyone at maxEpochs") {
    val sp = spark
    import sp.implicits._
    val docs = Seq(("a", 10L), ("b", 30L)).toDF("source", "n_tok")
    val got = Sampling.unimaxAllocate(docs, "source", col("n_tok"),
      budgetTokens = 1000L, maxEpochs = 3L)
      .collect()
      .map(r => (r.getAs[String]("source"),
        (r.getAs[Double]("alloc_tokens"), r.getAs[Double]("epochs")))).toMap
    assert(got("a") == ((30.0, 3.0)))
    assert(got("b") == ((90.0, 3.0)))
  }

  test("cvFoldReport: shares sum to 1 per fold; assignment is stable under corpus growth") {
    val sp = spark
    import sp.implicits._
    val rows = (0L until 200L).map(i => (i, (i % 3).toInt)).toDF("id", "y")
    val rep = Sampling.cvFoldReport(rows, "id", "y", k = 4)
      .collect().map(r => (r.getAs[Long]("fold"), r.getAs[Long]("label")) ->
        ((r.getAs[Long]("n"), r.getAs[Double]("share"))))
    val byFold = rep.groupBy(_._1._1)
    byFold.values.foreach { cells =>
      assert(math.abs(cells.map(_._2._2).sum - 1.0) < 1e-4) // shares sum to ~1
    }
    assert(byFold.keySet == Set(0L, 1L, 2L, 3L))
    // stability: folds of the first 100 ids are unchanged by adding 100 more
    val small = Sampling.cvFoldReport(rows.where(col("id") < 100), "id", "y", k = 4)
    val fullAssign = rows.select(col("id"),
      Sampling.hashBucket(col("id"), "graft", 4L).as("f"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val smallAssign = rows.where(col("id") < 100).select(col("id"),
      Sampling.hashBucket(col("id"), "graft", 4L).as("f"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(smallAssign.forall { case (k2, v) => fullAssign(k2) == v })
    assert(small.count() == 12L || small.count() > 0L) // report materializes
  }

  test("rendezvousShard: total assignment; adding a shard only moves keys TO the new shard") {
    val sp = spark
    import sp.implicits._
    val rows = (0L until 500L).toDF("doc_id")
    val before = Sampling.rendezvousShard(rows, "doc_id", Seq("s0", "s1", "s2"), "b")
    val both = Sampling.rendezvousShard(before, "doc_id", Seq("s0", "s1", "s2", "s3"), "a")
      .collect().map(r => (r.getAs[String]("b"), r.getAs[String]("a")))
    assert(both.forall { case (b, a) => a == b || a == "s3" }) // minimal movement
    val moved = both.count { case (b, a) => a != b }
    // ~1/4 of keys move; modulo sharding would move ~3/4
    assert(moved > 50 && moved < 250, s"moved=$moved")
    // every shard got traffic
    assert(both.map(_._2).distinct.length == 4)
  }

  test("packingEfficiency: integer ceilings and fill ratios per candidate length") {
    val sp = spark
    import sp.implicits._
    // token counts 10, 25, 7 -> total 42
    val rows = Seq(10L, 25L, 7L).toDF("n_tok")
    val got = Sampling.packingEfficiency(rows, col("n_tok"), Seq(8, 16))
      .collect().map(r => r.getAs[Long]("seq_len") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("total_tokens"),
          r.getAs[Long]("packed_seqs"), r.getAs[Long]("padded_seqs"),
          r.getAs[Double]("packed_fill"), r.getAs[Double]("padded_fill")))).toMap
    // L=8: packed ceil(42/8)=6, padded ceil(10/8)+ceil(25/8)+ceil(7/8)=2+4+1=7
    assert(got(8L) == ((3L, 42L, 6L, 7L, 0.875, 0.75)))
    // L=16: packed ceil(42/16)=3, padded 1+2+1=4
    assert(got(16L) == ((3L, 42L, 3L, 4L, 0.875, 0.65625)))
  }

  test("purgedTemporalSplit: embargo band isolates train from test") {
    val sp = spark
    import sp.implicits._
    val df = (0L until 100L).map(t => Tuple1(t * 10L)).toDF("t")
    val got = Sampling.purgedTemporalSplit(df, "t", tSplit = 600L, embargoUs = 100L)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got("train") == ((50L, 0L, 490L)))   // t < 500
    assert(got("embargo") == ((10L, 500L, 590L)))
    assert(got("test") == ((40L, 600L, 990L)))
    // the audit invariant: train ends a full embargo before test begins
    assert(got("train")._3 < got("test")._2 - 100L + 10L)
  }

  test("curriculumSchedule: quartile stages partition by difficulty, deterministic ord") {
    val sp = spark
    import sp.implicits._
    val df = (0L until 100L).map(i => (i, i.toDouble)).toDF("doc_id", "d")
    val got = Sampling.curriculumSchedule(df, "doc_id", col("d"), stages = 4)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("difficulty"),
        r.getAs[Int]("stage"), r.getAs[String]("ord")))
    assert(got.length == 100)
    val byStage = got.groupBy(_._3).view.mapValues(_.map(_._2)).toMap
    assert(byStage.keySet == Set(1, 2, 3, 4))
    // stages are difficulty-ordered: every stage-i max <= stage-(i+1) min
    (1 to 3).foreach { i =>
      assert(byStage(i).max <= byStage(i + 1).min, s"stage $i overlaps ${i + 1}")
    }
    // uniform data → balanced quartiles (interpolated thresholds at 24.75,
    // 49.5, 74.25: 25 values per stage)
    assert(byStage.values.forall(_.length == 25), byStage.view.mapValues(_.length).toMap)
    // ord is the salted md5 — stable across runs
    val again = Sampling.curriculumSchedule(df, "doc_id", col("d"), stages = 4)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("ord"))).toMap
    got.foreach { case (id, _, _, ord) => assert(again(id) == ord) }
    intercept[IllegalArgumentException] {
      Sampling.curriculumSchedule(df, "doc_id", col("d"), stages = 1)
    }
  }
}
