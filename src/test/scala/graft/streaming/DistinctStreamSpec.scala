package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.operators.Sketches

class DistinctStreamSpec extends SparkSpec {

  test("streaming HLL across batch splits == batch hllAudit estimate") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    val evs = (0 until 3000).map { i =>
      DistinctStream.KeyedEvent("g" + (i % 2), "k" + (i % (if (i % 2 == 0) 700 else 45)))
    }
    val input = MemoryStream[DistinctStream.KeyedEvent]
    val q = DistinctStream.streaming(input.toDS(), p = 8)
      .writeStream.format("memory").queryName("hll_stream")
      .outputMode("update").start()
    try {
      // three batch splits: state must carry registers across them
      evs.grouped(1000).foreach { c => input.addData(c); q.processAllAvailable() }
      // memory sink in update mode appends updates; take the LAST per group
      val latest = sp.table("hll_stream").collect().zipWithIndex
        .map { case (r, i) => (r.getString(0), r.getDouble(1), i) }
        .groupBy(_._1).map { case (g, rows) => g -> rows.maxBy(_._3)._2 }
      val batch = Sketches.hllAudit(
        evs.toDF("g", "k"), "g", "k", p = 8).collect()
        .map(r => r.getString(0) -> r.getDouble(2)).toMap
      assert(latest == batch, s"streamed $latest vs batch $batch")
      assert(latest.keySet == Set("g0", "g1"))
    } finally q.stop()
  }

  test("register update matches the batch bucket/rank arithmetic by construction") {
    // one key: its register must be the batch-side (bucket, rank) exactly
    val regs = new Array[Byte](256)
    DistinctStream.update(regs, "probe", 8)
    assert(regs.count(_ != 0) == 1)
    val sp = spark
    import sp.implicits._
    val one = Sketches.hllAudit(Seq(("g", "probe")).toDF("g", "k"), "g", "k", 8)
      .collect().head
    // a single key: linear counting gives 256*ln(256/255)
    val expect = BigDecimal(256.0 * math.log(256.0 / 255.0))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(one.getDouble(2) == expect)
    assert(DistinctStream.estimate(regs, 8) == expect)
  }

  test("streaming estimate matches batch when a register saturates") {
    // "4147901" hashes to d0000000…: all 24 rest bits zero, rank 25 — the
    // saturated-register path must contribute 2^0, not 1L << -1
    val sp = spark
    import sp.implicits._
    val keys = (0 until 10000).map(_.toString) :+ "4147901"
    val regs = new Array[Byte](256)
    keys.foreach(k => DistinctStream.update(regs, k, 8))
    assert(regs.forall(_ > 0), "expected every bucket occupied")
    assert(regs.max == 25, "expected a saturated register in the fixture")
    val streamed = DistinctStream.estimate(regs, 8)
    val batch = Sketches.hllAudit(keys.map(("g", _)).toDF("g", "k"), "g", "k", 8)
      .collect().head.getDouble(2)
    assert(streamed == batch, s"streamed $streamed vs batch $batch")
    assert(streamed > 0.0 && math.abs(streamed - 10001.0) / 10001.0 < 0.25)
  }
}
