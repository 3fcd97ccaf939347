package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.TimeSeries
import graft.store.SampleStore
import Downsampler.{PvConfig, RawSample}

/** Composability of the (now fully lazy) chunked operators with Structured
  * Streaming, and the ingest topology against a FILE-based streaming
  * source — the round-2 eager-collect forms could not run inside
  * `foreachBatch` without firing driver jobs at plan-construction time.
  */
class StreamingComposeSpec extends SparkSpec {

  private val S = 1000000L

  test("locfAlignChunked composes inside foreachBatch (lazy plan, per-batch alignment)") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    graft.Engine.tune(sp)

    val rows = for {
      i <- 0 until 120
      k <- Seq("a", "b")
    } yield (k, (i * 2 + (if (k == "b") 1 else 0)) * S, i * 1.0 + (if (k == "b") 100 else 0))

    val input = MemoryStream[(String, Long, Double)]
    val out = scala.collection.mutable.ArrayBuffer[(Long, Double, Double)]()
    val q = input.toDS().toDF("key", "tsUs", "value")
      .writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // the operator is a pure lazy plan, so building it per micro-batch
        // is cheap and it executes as part of THIS batch's job
        val aligned = TimeSeries.locfAlignChunked(
          batch, "key", "tsUs", "value", Seq("a", "b"),
          t0 = 0L, t1 = Long.MaxValue, chunkUs = 30 * S)
        out.synchronized {
          out ++= aligned.collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
        }
        ()
      }
      .start()
    try {
      input.addData(rows.take(100))
      q.processAllAvailable()
      input.addData(rows.drop(100))
      q.processAllAvailable()
    } finally q.stop()

    // per-batch alignment == batch-wise locfAlign over each delivered chunk
    val expected = Seq(rows.take(100), rows.drop(100)).flatMap { part =>
      TimeSeries.locfAlign(
        part.toDF("key", "tsUs", "value"), "key", "tsUs", "value", Seq("a", "b"),
        t0 = 0L, t1 = Long.MaxValue)
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    }
    assert(out.sortBy(_._1).toSeq == expected.sortBy(_._1).toSeq)
  }

  test("windowed counts: the A3 batch plan and a watermarked streaming agg agree") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val day = 86400L * S
    // 300 hourly events over ~12.5 days, three event types
    val rows = (0 until 300).map(i => (s"t${i % 3}", i.toLong * 3600L * S, i * 0.5))
    def agg(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      df.groupBy(window(timestamp_micros(col("tsUs")), "1 day").as("w"), col("typ"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 3).as("sum_value"))
        .select(expr("unix_micros(w.start)").as("day_us"), col("typ"),
          col("n"), col("sum_value"))
    val input = MemoryStream[(String, Long, Double)]
    val q = input.toDS().toDF("typ", "tsUs", "value")
      .withColumn("ts", timestamp_micros(col("tsUs")))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 day").as("w"), col("typ"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 3).as("sum_value"))
      .select(expr("unix_micros(w.start)").as("day_us"), col("typ"),
        col("n"), col("sum_value"))
      .writeStream.outputMode("append").format("memory").queryName("wc_stream")
      .start()
    try {
      rows.grouped(60).foreach { g => input.addData(g); q.processAllAvailable() }
      // a far-future sentinel advances the watermark past every real window
      input.addData(Seq(("zz", rows.map(_._2).max + 10 * day, 0.0)))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = sp.table("wc_stream").where(col("typ") =!= "zz").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val batch = agg(rows.toDF("typ", "tsUs", "value")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("sessionization: streaming session_window rollup equals the batch lag/cumsum form") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val gapUs = 600L * S // 10 min idle timeout
    // three users, bursts separated by > gap; minute-spaced events inside
    val rows = for {
      u <- 0 until 3
      burst <- 0 until 4
      i <- 0 until 5
    } yield (s"u$u", (burst.toLong * 3600L + u * 7L + i * 60L) * S)
    val input = MemoryStream[(String, Long)]
    val q = input.toDS().toDF("k", "tsUs")
      .withColumn("ts", timestamp_micros(col("tsUs")))
      .withWatermark("ts", "1 minute")
      .groupBy(session_window(col("ts"), "10 minutes").as("w"), col("k"))
      .agg(count(lit(1)).as("n_events"), expr("min(tsUs)").as("start_us"),
        expr("max(tsUs)").as("end_us"))
      .select(col("k"), col("start_us"), col("end_us"), col("n_events"))
      .writeStream.outputMode("append").format("memory").queryName("sess_stream")
      .start()
    try {
      // feed in event-time order: the watermark advances with each batch,
      // so out-of-order feeding would drop whole keys as late data
      rows.sortBy(_._2).grouped(20).foreach { g => input.addData(g); q.processAllAvailable() }
      input.addData(Seq(("zz", rows.map(_._2).max + 100L * 3600L * S)))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = sp.table("sess_stream").where(col("k") =!= "zz").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // batch twin: identical idle-gap definition, identical rollup
    val batch = graft.operators.TimeSeries
      .sessionStats(rows.toDF("k", "tsUs"), "k", "tsUs", gapUs)
      .select(col("k"), col("start_us"), col("end_us"), col("n_events")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(streamed == batch && streamed.size >= 12) // >= 4 sessions x 3 users
  }

  test("streaming dedup: dropDuplicatesWithinWatermark equals batch distinct for in-delay duplicates") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    // T7's streaming face: exactly-once on (key, ts) against redelivery.
    // Duplicates arrive in the SAME and in ADJACENT batches, always inside
    // the 1 h watermark delay, so state still holds the first copy and the
    // streaming result must equal the batch distinct.
    // start a day past the epoch: the initial watermark is 0, and an event
    // AT the watermark is treated as late by the dedup state store
    val base = (0 until 120).map(i => (s"k${i % 4}", (86400L + i * 600L) * S, i * 1.5))
    val withDups = base ++ base.filter(_._2 % (1800L * S) == 0) // re-deliver every 3rd
    val input = MemoryStream[(String, Long, Double)]
    val q = input.toDS().toDF("k", "tsUs", "value")
      .withColumn("ts", timestamp_micros(col("tsUs")))
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("k", "tsUs")
      .select(col("k"), col("tsUs"), col("value"))
      .writeStream.outputMode("append").format("memory").queryName("dedup_stream")
      .start()
    try {
      // adjacent-batch duplicates: feed in overlapping chunks of the
      // time-ordered doubled list
      withDups.sortBy(_._2).grouped(40).foreach { g => input.addData(g); q.processAllAvailable() }
      input.addData(Seq(("zz", withDups.map(_._2).max + 86400L * 1000L * S, 0.0)))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = sp.table("dedup_stream").where(col("k") =!= "zz").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val batch = withDups.toDF("k", "tsUs", "value").dropDuplicates("k", "tsUs")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(streamed == batch)
    assert(streamed.size == base.size) // every duplicate dropped, nothing lost
  }

  test("streaming LSH candidates across batches equal the batch band join") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    // three doc families: near-dups sharing most shingles, plus singletons
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again today"),
      (3L, "completely different text about spark query plans and shuffles"),
      (4L, "completely different text about spark query plans and shuffles here"),
      (5L, "a lone unrelated document with nothing shared at all in it"),
      (6L, "the quick brown fox jumps over the lazy dog again and again"),
      (7L, null.asInstanceOf[String]))
    val input = MemoryStream[(Long, String)]
    val q = DocStream.lshCandidatePairs(
      input.toDS().toDF("doc_id", "text"), "doc_id", "text",
      n = 2, numPerm = 16, bands = 8)
      .writeStream.outputMode("append").format("memory").queryName("lsh_stream")
      .start()
    try {
      // the colliding families are split ACROSS batches: 1,3,5 then 2,4,7 then 6
      input.addData(Seq(docs(0), docs(2), docs(4)))
      q.processAllAvailable()
      input.addData(Seq(docs(1), docs(3), docs(6)))
      q.processAllAvailable()
      input.addData(Seq(docs(5)))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = sp.table("lsh_stream").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = graft.operators.Dedup.lshCandidates(
      docs.toDF("doc_id", "text"), "doc_id", "text", n = 2, numPerm = 16, bands = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == batch)
    assert(streamed.contains((1L, 2L)) && streamed.contains((3L, 4L))) // the families
    assert(streamed.contains((1L, 6L)) && streamed.contains((2L, 6L))) // exact dup pair
    assert(!streamed.exists { case (a, b) => a == 5L || b == 5L || a == 7L || b == 7L })
  }

  test("streaming LSH candidates: a hot bucket stops accumulating at maxBucket") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    // 8 identical docs all but guarantee one shared bucket per band; cap 3
    // means pairs only form among the first 3 arrivals: 3 choose 2 per the
    // set, not 8 choose 2
    val docs = (1L to 8L).map(i => (i, "same boilerplate text repeated on every page of the crawl"))
    val input = MemoryStream[(Long, String)]
    val q = DocStream.lshCandidatePairs(
      input.toDS().toDF("doc_id", "text"), "doc_id", "text",
      n = 2, numPerm = 16, bands = 8, maxBucket = 3)
      .writeStream.outputMode("append").format("memory").queryName("lsh_capped")
      .start()
    try {
      input.addData(docs.take(4)); q.processAllAvailable()
      input.addData(docs.drop(4)); q.processAllAvailable()
    } finally q.stop()
    val streamed = sp.table("lsh_capped").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("ewma: the streaming flatMapGroupsWithState fold equals the batch secondary-sort fold") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    // three keys, jittered values; includes a same-instant duplicate pair
    // (the streaming in-batch max-first rule matches the batch max dedupe)
    val rows = (0 until 90).map { i =>
      Smoothing.Point(s"p${i % 3}", (1000L + i * 7L) * S, (i * 37 % 11) + i * 0.25)
    } :+ Smoothing.Point("p0", (1000L + 3L * 7L) * S, -5.0) // dup instant, smaller value
    val input = MemoryStream[Smoothing.Point]
    val q = Smoothing.streaming(input.toDS(), alpha = 0.25)
      .writeStream.outputMode("append").format("memory").queryName("ewma_stream")
      .start()
    try {
      // per-key time-monotone delivery across batches (the documented
      // contract); the duplicate travels in the same batch as its peer
      rows.sortBy(_.tsUs).grouped(25).foreach { g => input.addData(g); q.processAllAvailable() }
    } finally q.stop()
    val streamed = sp.table("ewma_stream").collect()
      .map(r => ((r.getString(0), r.getLong(1)), (r.getDouble(2), r.getDouble(3)))).toMap
    val batch = TimeSeries.ewma(
      rows.toDF("pvname", "tsUs", "value"), "pvname", "tsUs", "value", alpha = 0.25)
      .collect()
      .map(r => ((r.getString(0), r.getLong(1)), (r.getDouble(2), r.getDouble(3)))).toMap
    assert(streamed == batch) // bit-identical fold, dedupe included
    assert(streamed.size == 90) // the dup instant collapsed
  }

  test("cusum: the streaming control chart equals the batch fold bit-for-bit") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    // drifting series so both accumulators engage and alarms fire
    val rows = (0 until 80).map { i =>
      Smoothing.Point(s"p${i % 2}", (500L + i * 3L) * S,
        10.0 + (if (i % 2 == 0) i * 0.4 else -i * 0.3) + (i * 13 % 7))
    }
    val input = MemoryStream[Smoothing.Point]
    val q = Smoothing.cusumStreaming(input.toDS(), target = 12.0, slack = 1.0, h = 20.0)
      .writeStream.outputMode("append").format("memory").queryName("cusum_stream")
      .start()
    try {
      rows.sortBy(_.tsUs).grouped(30).foreach { g => input.addData(g); q.processAllAvailable() }
    } finally q.stop()
    val streamed = sp.table("cusum_stream").collect()
      .map(r => ((r.getString(0), r.getLong(1)),
        (r.getDouble(3), r.getDouble(4), r.getBoolean(5)))).toMap
    val batch = graft.operators.TimeSeries.cusum(
      rows.toDF("pvname", "tsUs", "value"), "pvname", "tsUs", "value",
      target = 12.0, slack = 1.0, h = 20.0)
      .collect()
      .map(r => ((r.getString(0), r.getLong(1)),
        (r.getDouble(3), r.getDouble(4), r.getBoolean(5)))).toMap
    assert(streamed == batch)
    assert(streamed.size == 80 && streamed.values.exists(_._3)) // alarms did fire
  }

  test("transitions: the streaming last-event pairing equals the batch lag matrix, across batch splits") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    // 6 users cycling 4 event types; pairs split across micro-batches so
    // the cross-batch state carries the previous event type
    val types = Array("view", "click", "purchase", "error")
    val rows = (0 until 120).map { i =>
      Transitions.Event((i % 6).toLong, (100L + i * 5L) * S, i.toLong, types(i * 7 % 4))
    }
    val input = MemoryStream[Transitions.Event]
    val q = Transitions.streaming(input.toDS())
      .writeStream.outputMode("append").format("memory").queryName("trans_stream")
      .start()
    try {
      rows.sortBy(_.tsUs).grouped(17).foreach { g => input.addData(g); q.processAllAvailable() }
    } finally q.stop()
    val streamed = sp.table("trans_stream").collect()
      .map(r => (r.getString(2), r.getString(3)))
      .groupBy(identity).map { case (k, v) => (k, v.length.toLong) }
    val batch = graft.operators.EventAnalytics.transitionMatrix(
      rows.toDF("user_id", "ts", "event_id", "event_type"),
      "user_id", "ts", "event_id", "event_type")
      .collect()
      .map(r => ((r.getAs[String]("prev_type"), r.getAs[String]("next_type")),
        r.getAs[Long]("n"))).toMap
    assert(streamed == batch) // same pair multiset, state survives batch cuts
    assert(streamed.values.sum == 120L - 6L) // one pair per event after each user's first
  }

  test("holt: the streaming level+trend tracker equals the batch fold bit-for-bit") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    // ramp + noise so level and trend both move; a duplicate instant checks
    // the max-dedupe convention matches the batch twin
    val rows = (0 until 90).map { i =>
      Smoothing.Point(s"p${i % 3}", (100L + i * 2L) * S,
        5.0 + 0.7 * i + (i * 11 % 5))
    } :+ Smoothing.Point("p0", 100L * S, -1.0) // same instant as i=0, smaller
    val input = MemoryStream[Smoothing.Point]
    val q = Smoothing.holtStreaming(input.toDS(), alpha = 0.5, beta = 0.25)
      .writeStream.outputMode("append").format("memory").queryName("holt_stream")
      .start()
    try {
      rows.sortBy(_.tsUs).grouped(35).foreach { g => input.addData(g); q.processAllAvailable() }
    } finally q.stop()
    val streamed = sp.table("holt_stream").collect()
      .map(r => ((r.getString(0), r.getLong(1)),
        (r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    val batch = TimeSeries.holt(
      rows.toDF("pvname", "tsUs", "value"), "pvname", "tsUs", "value",
      alpha = 0.5, beta = 0.25)
      .collect()
      .map(r => ((r.getString(0), r.getLong(1)),
        (r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(streamed == batch) // bit-identical fold, dedupe included
    assert(streamed.size == 90) // the duplicate instant collapsed
  }

  test("throttle: the streaming rate cap equals the batch row_number cap, across batch splits") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    // 3 keys x 40 events, 10s apart, 60s windows (6 events/window), cap 4;
    // batch boundary at 25 deliberately splits windows mid-quota
    val rows = for { k <- 0 until 3; i <- 0 until 40 } yield
      Smoothing.Point(s"p$k", (i * 10L + k) * 1000000L, (i * 7 % 5).toDouble)
    val input = MemoryStream[Smoothing.Point]
    val q = Throttle.streaming(input.toDS(), windowUs = 60L * 1000000L, perWindow = 4)
      .writeStream.outputMode("append").format("memory").queryName("throttle_stream")
      .start()
    try {
      rows.sortBy(_.tsUs).grouped(25).foreach { g => input.addData(g); q.processAllAvailable() }
    } finally q.stop()
    val streamed = sp.table("throttle_stream").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val batch = graft.operators.TimeSeries.throttle(
      rows.toDF("pvname", "tsUs", "value"), "pvname", "tsUs", "value",
      windowUs = 60L * 1000000L, perWindow = 4)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamed == batch) // the cap holds across the batch boundary
    assert(streamed.size == 3 * 7 * 4) // 7 windows/key, 4 survivors each
  }

  test("curation ops (sample/split/PII) attach directly to a streaming frame (stateless append mode)") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    graft.Engine.tune(sp)
    import graft.operators.{Sampling, TextAnalysis}

    val docs = (0L until 300L).map(i =>
      (i, if (i % 2 == 0) "en" else "de", s"doc $i mail u$i@ex.org body"))
    def curate(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      TextAnalysis.piiRedact(
        Sampling.splitAssign(
          Sampling.sampleStratified(df, "doc_id", "lang", Map("en" -> 0.8), 0.3),
          "doc_id").where(col("split") === "train"),
        "doc_id", "text")

    val input = MemoryStream[(Long, String, String)]
    val got = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    // the whole pipeline is stateless/map-only, so it attaches DIRECTLY to
    // the streaming frame before the sink (append mode, no watermark; the
    // foreachBatch below is only the collection sink, not the transform)
    val q = curate(input.toDS().toDF("doc_id", "lang", "text"))
      .select(col("doc_id"), col("n_email"))
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        got.synchronized { got ++= b.collect().map(r => (r.getLong(0), r.getLong(1))) }
        ()
      }.start()
    try {
      input.addData(docs.take(150))
      q.processAllAvailable()
      input.addData(docs.drop(150))
      q.processAllAvailable()
    } finally q.stop()

    val batch = curate(docs.toDF("doc_id", "lang", "text"))
      .select(col("doc_id"), col("n_email"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.sorted.toSeq == batch.sorted.toSeq && got.forall(_._2 == 1L))
  }

  test("checkpointed restart resumes downsampler state and does not double-write (T7/exactly-once)") {
    val sp = spark
    import sp.implicits._
    graft.Engine.tune(sp)

    val srcDir = Files.createTempDirectory("graft_restart_src").toString
    val storeDir = Files.createTempDirectory("graft_restart_store").toString
    val ckptDir = Files.createTempDirectory("graft_restart_ckpt").toString
    val cfg = Map("RST:a.VAL" -> PvConfig("double", 15 * S, 0.5))
    val all = (0 until 60).map(i => RawSample("RST:a.VAL", i * 10 * S, s"$i.0", s"$i.0"))

    def source = sp.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[RawSample]].schema)
      .parquet(s"$srcDir/*")
      .as[RawSample]
    def run(): Unit = {
      val q = Ingest.archiveTo(source, storeDir, runWidthUs = 300 * S, configs = cfg,
        checkpoint = Some(ckptDir), triggerMs = 50L, limboTimeoutMs = 0L)
      try q.processAllAvailable() finally q.stop()
    }

    all.take(30).toDS().coalesce(1).write.parquet(s"$srcDir/part1")
    run() // first life: consumes part1, checkpoints offsets + downsampler state
    all.drop(30).toDS().coalesce(1).write.parquet(s"$srcDir/part2")
    run() // restart: must resume state (not re-emit part1) and only append part2

    val stored = SampleStore.read(sp, storeDir)
      .select("pvname", "tsUs").collect().map(r => (r.getString(0), r.getLong(1))).sorted
    val expected = Downsampler.replayKey(all, cfg("RST:a.VAL")).map(s => (s.pvname, s.tsUs)).sorted
    // the stream cannot flush the final trailing limbo (no later arrival)
    assert(stored.toSeq == expected.toSeq || stored.toSeq == expected.dropRight(1).toSeq,
      s"stored=${stored.length} expected=${expected.length}")
    // no duplicates of any (pv, ts): a replayed batch would show here
    assert(stored.distinct.length == stored.length)
  }

  test("ingest topology runs from a file-based streaming source (S1 beyond MemoryStream)") {
    val sp = spark
    import sp.implicits._
    graft.Engine.tune(sp)

    val srcDir = Files.createTempDirectory("graft_stream_src").toString
    val storeDir = Files.createTempDirectory("graft_stream_store").toString

    // first file lands before the stream starts; the stream discovers it
    (0 until 40).map(i => RawSample("FSS:a.VAL", i * 10 * S, s"$i.0", s"$i.0"))
      .toDS().coalesce(1).write.parquet(s"$srcDir/batch0")

    val source = sp.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[RawSample]].schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$srcDir/*")
      .as[RawSample]
    val q = Ingest.archiveTo(source, storeDir, runWidthUs = 200 * S,
      configs = Map("FSS:a.VAL" -> PvConfig("double", 15 * S, 0.5)),
      triggerMs = 50L, limboTimeoutMs = 0L)
    try q.processAllAvailable() finally q.stop()

    val stored = SampleStore.read(sp, storeDir)
      .select("pvname", "tsUs").collect().map(r => (r.getString(0), r.getLong(1)))
    val expected = Downsampler.replayKey(
      (0 until 40).map(i => RawSample("FSS:a.VAL", i * 10 * S, s"$i.0", s"$i.0")),
      PvConfig("double", 15 * S, 0.5)).map(s => (s.pvname, s.tsUs))
    // the stream (no end-of-history flush until next arrival) may hold the
    // final limbo; everything else must match the batch replay exactly
    assert(stored.sorted.toSeq == expected.sorted.toSeq ||
      stored.sorted.toSeq == expected.sorted.dropRight(1).toSeq)
  }

  test("stream-stream interval join equals the batch join (watermarked state, bounded)") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val min = 60L * S
    // impressions every 10 min for 3 users over 2 h; conversions at +5 min
    // (inside the 30-min attribution window), +45 min (outside), and one
    // for an unknown user (no match)
    val day0 = 86400L * S // start off epoch 0: ts=0 sits exactly on the
    // initial watermark and eviction boundaries — a degenerate fixture, not
    // a case a real deployment's clock ever produces
    val imprRows = for { u <- 0 until 3; i <- 0 until 12 }
      yield (s"u$u", day0 + (i.toLong * 10L + u) * min)
    val convRows =
      imprRows.filter(t => (t._2 - day0) % (20L * min) == 0)
        .map { case (k, t) => (k, t + 5L * min) } ++
        imprRows.filter(t => (t._2 - day0) % (30L * min) == 0)
          .map { case (k, t) => (k, t + 45L * min) } ++
        Seq(("ghost", day0 + 30L * min))
    def batchJoin(a: org.apache.spark.sql.DataFrame,
        b: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      a.join(b, expr(s"k = k2 AND bUs >= aUs AND bUs <= aUs + ${30L * min}"))
        .select(col("k"), col("aUs"), col("bUs"))

    val impr = MemoryStream[(String, Long)]
    val conv = MemoryStream[(String, Long)]
    // the watermark delay exceeds the fixture's whole span: the two sources
    // may be drained in separate micro-batches in either order, and a
    // tighter delay would let one side's batch mark the other side's
    // still-queued rows late (a real 24/7 deployment tunes this to its
    // actual disorder bound; the fixture just needs determinism)
    val a = impr.toDS().toDF("k", "aUs")
      .withColumn("tsa", timestamp_micros(col("aUs"))).withWatermark("tsa", "4 hours")
    val b = conv.toDS().toDF("k2", "bUs")
      .withColumn("tsb", timestamp_micros(col("bUs"))).withWatermark("tsb", "4 hours")
    // the time bound rides on the EVENT-TIME columns, so the join state on
    // both sides is watermark-bounded (old impressions age out instead of
    // accumulating forever — the property that makes this runnable 24/7)
    val q = a.join(b,
        expr("k = k2 AND tsb >= tsa AND tsb <= tsa + interval 30 minutes"))
      .select(col("k"), col("aUs"), col("bUs"))
      .writeStream.outputMode("append").format("memory").queryName("ssj_stream")
      .start()
    try {
      // interleave both streams in event-time order, two batches each
      impr.addData(imprRows.take(18)); conv.addData(convRows.take(10))
      q.processAllAvailable()
      impr.addData(imprRows.drop(18)); conv.addData(convRows.drop(10))
      q.processAllAvailable()
    } finally q.stop()

    val streamed = sp.table("ssj_stream").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val expected = batchJoin(imprRows.toDF("k", "aUs"), convRows.toDF("k2", "bUs"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == expected && streamed.nonEmpty)
    // the out-of-window (+45 min) and unknown-user conversions never match
    assert(!streamed.exists(_._1 == "ghost"))
  }

  test("filter funnel: the live complete-mode dashboard equals the batch report") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    graft.Engine.tune(sp)
    import graft.operators.TextAnalysis

    val docs = (0L until 200L).map { i =>
      val text = if (i % 7 == 0) "" else ("w " * (20 + (i % 30)).toInt).trim
      (i, if (i % 3 == 0) "de" else "en", text)
    }
    def stages = Seq(
      "nonempty" -> (length(col("text")) > 0),
      "lang_en" -> (col("lang") === "en"),
      "min_tokens" -> (size(split(col("text"), " ")) >= 25))

    val input = MemoryStream[(Long, String, String)]
    // the funnel is ONE combinable aggregation, so it attaches directly to
    // the stream in complete mode - a live attrition dashboard that
    // re-emits the whole (stage-count-bounded) report each micro-batch
    val q = TextAnalysis.filterFunnel(input.toDS().toDF("doc_id", "lang", "text"), "text", stages)
      .writeStream.outputMode("complete").format("memory").queryName("funnel_stream")
      .start()
    try {
      input.addData(docs.take(120))
      q.processAllAvailable()
      input.addData(docs.drop(120))
      q.processAllAvailable()
    } finally q.stop()

    val streamed = sp.table("funnel_stream").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .sortBy(_._1)
    val batch = TextAnalysis.filterFunnel(docs.toDF("doc_id", "lang", "text"), "text", stages)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .sortBy(_._1)
    assert(streamed.toSeq == batch.toSeq)
    assert(batch.head._3 == 200L) // every delivered doc entered stage 1
  }

  test("streaming Misra-Gries heavy hitters honor the n/m frequency contract across batches") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx0 = sp.sqlContext
    // zipf-ish stream: 'hot' dominates, a mid tier follows, a long tail of
    // singletons pressures the m counters
    val toks = (Seq.fill(120)("hot") ++ Seq.fill(40)("warm") ++ Seq.fill(30)("mild") ++
      (0 until 110).map(i => s"tail$i"))
    val shuffled = new scala.util.Random(11).shuffle(toks)
      .map(t => HeavyHitters.Tok(math.floorMod(t.hashCode, 4), t))
    val input = MemoryStream[HeavyHitters.Tok]
    val q = HeavyHitters.streaming(input.toDS(), m = 8)
      .writeStream.outputMode("update").format("memory").queryName("hh")
      .start()
    try {
      val (a, b) = shuffled.splitAt(shuffled.length / 2)
      input.addData(a)
      q.processAllAvailable()
      input.addData(b)
      q.processAllAvailable()
    } finally q.stop()
    // latest summary per bucket
    val latest = sp.table("hh").as[HeavyHitters.Summary].collect()
      .groupBy(_.bucket).map { case (_, ss) => ss.maxBy(_.processed) }
    val est = latest.flatMap(s => s.tokens.zip(s.counts)).toMap
    val truth = toks.groupBy(identity).view.mapValues(_.length.toLong).toMap
    latest.foreach { s =>
      assert(s.tokens.length <= 8) // bounded state
      // per-bucket guarantee: count > processed/m  ==> present
      val bucketTruth = truth.filter { case (t, _) => math.floorMod(t.hashCode, 4) == s.bucket }
      bucketTruth.foreach { case (t, c) =>
        if (c > s.processed / 8) assert(s.tokens.contains(t), s"missing heavy hitter $t")
      }
      // estimates never exceed the true count and undershoot by <= n/m
      s.tokens.zip(s.counts).foreach { case (t, e) =>
        assert(e <= bucketTruth(t))
        assert(e >= bucketTruth(t) - s.processed / 8)
      }
    }
    // the dominant token survives with a near-exact estimate
    assert(est.contains("hot") && est("hot") >= 120L - 300L / 8)
  }

  test("alert delivery: one mail per debounced ok->alarm edge, across a 3-batch split") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val hour = 3600L * S
    val configs = Map(
      1L -> Alerts.AlertConfig(1L, "A:vac.VAL", "Vacuum hi", "gt", "10",
        timeoutUs = hour / 2, active = true),
      2L -> Alerts.AlertConfig(2L, "B:idle.VAL", "Inactive", "gt", "0",
        timeoutUs = 0L, active = false),       // inactive: no events at all
      3L -> Alerts.AlertConfig(3L, "C:nomail.VAL", "No recipient", "gt", "0",
        timeoutUs = 0L, active = true))        // fires, but mailto is empty
    val mails = scala.collection.mutable.ArrayBuffer[Alerts.Mail]()
    val input = MemoryStream[Alerts.Observation]
    val q = Alerts.deliverStream(
      input.toDS(), configs,
      mailTo = Map(1L -> "ops@example.org\r\n", 3L -> ""),
      templates = Map(1L -> "%PV% is %VALUE% (%COMP% %TRIP%), ref=%PV(OTHER:ref)%"),
      lookup = Map("OTHER:ref" -> "42").get,
      send = m => mails.synchronized { mails += m },
      plotBaseUrl = "http://arch", triggerMs = 50L)
    try {
      def o(id: Long, tSec: Long, v: String) = Alerts.Observation(id, tSec * S, v)
      // batch 1: ok, then the first ok->alarm edge -> mail #1 at t=60
      input.addData(Seq(o(1, 0, "5"), o(1, 60, "15"), o(3, 10, "7")))
      q.processAllAvailable()
      // batch 2: stay-alarm (no mail), alarm->ok (no mail), then a second
      // edge INSIDE the debounce window (no mail; doc/alerts.rst:42-48)
      input.addData(Seq(o(1, 120, "20"), o(1, 180, "5"), o(1, 240, "15")))
      q.processAllAvailable()
      // batch 3: ok again, then an edge past the timeout -> mail #2
      input.addData(Seq(o(1, 2000, "5"), o(1, 2100, "30"), o(3, 2100, "9")))
      q.processAllAvailable()
    } finally q.stop()

    // exactly the two debounced edges delivered, none for the inactive or
    // recipient-less alerts, state carried across the batch cuts
    assert(mails.map(m => (m.alertId, m.tsUs / S)).toSeq == Seq((1L, 60L), (1L, 2100L)))
    val m1 = mails.head
    assert(m1.mailTo == "ops@example.org") // CR/LF stripped (cache.py:646)
    assert(m1.subject == "[Epics Alert] Vacuum hi")
    assert(m1.body.contains("A:vac.VAL is 15 (greater than 10), ref=42"))
    assert(m1.body.endsWith("See http://arch/plot/1days/now/A:vac.VAL"))
  }

  test("streaming funnel state fold == batch funnel counts and latencies across a batch split") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val M = 60000000L
    val steps = Seq("view", "click", "purchase")
    val horizon = 30L * M
    // 40 users with varied paths: full conversions, horizon misses,
    // out-of-order steps, repeat events
    val events = (0L until 40L).flatMap { u =>
      val base = u * M
      u % 4 match {
        case 0 => Seq( // full conversion
          FunnelStream.Event(u, base, 1, "view"),
          FunnelStream.Event(u, base + 2 * M, 2, "click"),
          FunnelStream.Event(u, base + 3 * M, 3, "click"), // later repeat: ignored
          FunnelStream.Event(u, base + 5 * M, 4, "purchase"))
        case 1 => Seq( // click beyond the horizon
          FunnelStream.Event(u, base, 1, "view"),
          FunnelStream.Event(u, base + horizon + M, 2, "click"))
        case 2 => Seq( // purchase before click: stalls at stage 1
          FunnelStream.Event(u, base, 1, "view"),
          FunnelStream.Event(u, base + M, 2, "purchase"))
        case _ => Seq( // click-first: no view, nothing completes
          FunnelStream.Event(u, base, 1, "click"),
          FunnelStream.Event(u, base + M, 2, "view"),
          FunnelStream.Event(u, base + 2 * M, 3, "click"))
      }
    }.sortBy(e => (e.tsUs, e.userId)) // event-time order across the stream
    val input = MemoryStream[FunnelStream.Event]
    val q = FunnelStream.streaming(input.toDS(), steps, horizon)
      .writeStream.outputMode("append").format("memory").queryName("funnel_fold")
      .start()
    try {
      val (first, rest) = events.splitAt(events.length / 2)
      input.addData(first)
      q.processAllAvailable()
      input.addData(rest)
      q.processAllAvailable()
    } finally q.stop()
    val comps = sp.table("funnel_fold").as[FunnelStream.Completion].collect()
    // exactly-once per (user, stage) even across the split
    assert(comps.groupBy(c => (c.userId, c.stage)).forall(_._2.length == 1))
    val batchDf = events.toSeq.toDF("user_id", "ts", "tie", "event_type")
    val batchCounts = graft.operators.EventAnalytics.funnel(
      batchDf, "user_id", "ts", "event_type", steps, horizon)
      .collect().map(r => r.getAs[Long]("stage") -> r.getAs[Long]("n_users")).toMap
    val streamCounts = comps.groupBy(_.stage.toLong).view.mapValues(_.length.toLong).toMap
    assert(streamCounts == batchCounts.filter(_._2 > 0L))
    // per-transition latencies derived from the streamed completions match
    // the batch funnelLatency report exactly
    val batchLat = graft.operators.EventAnalytics.funnelLatency(
      batchDf, "user_id", "ts", "event_type", steps, horizon)
      .collect().map(r => r.getAs[Long]("stage") ->
        ((r.getAs[Long]("n_conv"), r.getAs[Long]("min_us"), r.getAs[Long]("max_us")))).toMap
    val byUser = comps.groupBy(_.userId)
    (2 to steps.length).foreach { stage =>
      val lats = byUser.values.toSeq
        .flatMap { cs =>
          val m = cs.map(c => c.stage -> c.tsUs).toMap
          for (a <- m.get(stage - 1); b <- m.get(stage)) yield b - a
        }
      val (n, lo, hi) = batchLat(stage.toLong)
      assert(lats.length.toLong == n, s"stage $stage")
      if (n > 0) {
        assert(lats.min == lo, s"stage $stage min")
        assert(lats.max == hi, s"stage $stage max")
      }
    }
  }
}
