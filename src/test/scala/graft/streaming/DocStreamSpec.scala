package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

class DocStreamSpec extends SparkSpec {

  test("streaming exact dedup: first arrival wins within the watermark horizon") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    val input = MemoryStream[(Long, String, Timestamp)]
    val deduped = DocStream.dedupedDocs(
      input.toDF().toDF("doc_id", "text", "ts"), "text", "ts", "10 minutes")
    val q = deduped.writeStream.format("memory").queryName("doc_dedup")
      .outputMode("append").start()
    try {
      def t(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
      // batch 1: one in-batch duplicate pair + a null-text doc
      input.addData((1L, "alpha", t(0)), (2L, "beta", t(1)), (3L, "alpha", t(2)),
        (6L, null, t(2)))
      q.processAllAvailable()
      // batch 2: cross-batch duplicate + a novel doc + another null-text doc
      input.addData((4L, "beta", t(3)), (5L, "gamma", t(4)), (7L, null, t(4)))
      q.processAllAvailable()
      val got = sp.table("doc_dedup").collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text"))).sortBy(_._1)
      // null-text docs are distinct (not duplicates of each other): both kept
      assert(got.map(_._1).toSeq == Seq(1L, 2L, 5L, 6L, 7L), got.mkString(", "))
      assert(got.collect { case (_, s) if s != null => s }.sorted.toSeq ==
        Seq("alpha", "beta", "gamma"))
    } finally q.stop()
  }
}
