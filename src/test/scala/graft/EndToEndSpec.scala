package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.Downsampler.RawSample

/** Whole-system seam test: streaming ingest → partitioned sample store →
  * archive query → versioned table commit/time-travel → plain SQL with the
  * native function pack. Each hop's row accounting must reconcile — this is
  * the "could a user actually wire these pieces together" check the
  * per-operator specs can't give.
  */
class EndToEndSpec extends SparkSpec {

  test("ingest -> store -> query -> versioned commit -> SQL, counts reconcile") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    val storeDir = java.nio.file.Files.createTempDirectory("graft_e2e_store").toString
    val tableDir = java.nio.file.Files.createTempDirectory("graft_e2e_table").toString
    val runWidth = 30L * 86400000000L

    // 1) stream 3 PVs, 40 samples each, 10 s apart (past the deadtime so
    //    every sample lands), through the REAL stateful ingest topology
    val input = MemoryStream[RawSample]
    input.addData((0 until 120).map { i =>
      val v = s"${i % 7}.5"
      RawSample(s"E2E:pv${i % 3}", 1700000000000000L + (i / 3).toLong * 10000000L, v, v)
    })
    val q = streaming.Ingest.archiveTo(input.toDS(), storeDir, runWidth,
      triggerMs = 100L, limboTimeoutMs = 0L)
    try q.processAllAvailable() finally q.stop()

    // 2) store scan prunes to one PV; the archive facade reads it back
    val pv0 = store.SampleStore.scanPv(sp, storeDir, "E2E:pv0",
      1700000000000000L, 1700000000000000L + 400L * 10000000L, runWidth)
    val nPv0 = pv0.count()
    assert(nPv0 == 40L, s"expected 40 ingested rows for pv0, got $nPv0")

    // 3) commit the scan to a versioned table, append a second slice,
    //    then time-travel back
    val v1 = store.Versioned.commit(
      pv0.select(col("pvname"), col("tsUs"), col("value")), tableDir)
    val pv1 = store.SampleStore.scanPv(sp, storeDir, "E2E:pv1",
      1700000000000000L, 1700000000000000L + 400L * 10000000L, runWidth)
    val v2 = store.Versioned.commit(
      pv1.select(col("pvname"), col("tsUs"), col("value")), tableDir)
    assert(v1 == 1L && v2 == 2L)
    assert(store.Versioned.read(sp, tableDir, Some(1L)).count() == 40L)
    assert(store.Versioned.read(sp, tableDir).count() == 80L)

    // 4) plain SQL over the committed snapshot with the native formatter
    store.Versioned.read(sp, tableDir).createOrReplaceTempView("e2e_samples")
    Engine.registerFunctions(sp)
    val rows = sp.sql(
      """SELECT pvname, count(*) AS n,
        |  graft_hformat(avg(CAST(value AS DOUBLE)), 4) AS avg_fmt
        |FROM e2e_samples GROUP BY pvname ORDER BY pvname""".stripMargin)
      .collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("E2E:pv0", "E2E:pv1"))
    assert(rows.forall(_.getLong(1) == 40L))
    assert(rows.forall(r => r.getString(2).nonEmpty))
  }
}
