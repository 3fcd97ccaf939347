package graft.store

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.PvFunctions

class SampleStoreSpec extends SparkSpec {

  private val S = 1000000L
  private val runWidth = 100 * S

  test("normalize adds dvalue/cvalue duals, bucket, run") {
    val sp = spark
    import sp.implicits._
    val raw = Seq(
      ("XX:m1.VAL", 10 * S, "1.25", "1.25"),
      ("XX:m1.VAL", 150 * S, "b'2.5'", "2.5"),
      ("XX:s1.VAL", 20 * S, "Open; drop table", "Open"))
      .toDF("pvname", "tsUs", "value", "cvalue")
    val n = SampleStore.normalize(raw, runWidth).collect().map(r =>
      (r.getAs[String]("pvname"), r.getAs[String]("value"), r.getAs[Any]("dvalue"),
        r.getAs[Int]("bucket"), r.getAs[Long]("run"))).toSeq
    assert(n.contains(("XX:m1.VAL", "1.25", 1.25, PvFunctions.hashname("XX:m1.VAL"), 0L)))
    assert(n.contains(("XX:m1.VAL", "b'2.5'", 2.5, PvFunctions.hashname("XX:m1.VAL"), 1L)))
    // injection guard strips from ';', dvalue null for non-numeric
    assert(n.contains(("XX:s1.VAL", "Open", null, PvFunctions.hashname("XX:s1.VAL"), 0L)))
  }

  test("write/scan roundtrip with run+bucket pruning in the plan") {
    val sp = spark
    import sp.implicits._
    val dir = Files.createTempDirectory("graft_store").toString
    val raw = (0 until 500).map { i =>
      val pv = s"T:pv${i % 5}.VAL"
      (pv, i * 10 * S, (i * 1.5).toString, (i * 1.5).toString)
    }.toDF("pvname", "tsUs", "value", "cvalue")
    SampleStore.write(SampleStore.normalize(raw, runWidth), dir)

    val got = SampleStore.scanPv(sp, dir, "T:pv2.VAL", 1000 * S, 3000 * S, runWidth)
    val rows = got.orderBy("tsUs").collect()
    val want = (0 until 500)
      .filter(i => i % 5 == 2 && i * 10 * S >= 1000 * S && i * 10 * S < 3000 * S)
    assert(rows.length == want.size)
    assert(rows.map(_.getAs[Long]("tsUs")).toSeq == want.map(_ * 10 * S))

    // partition pruning must reach the scan: only the pv's bucket + the
    // overlapping runs appear in the file listing
    val plan = got.queryExecution.executedPlan.toString
    val b = PvFunctions.hashname("T:pv2.VAL")
    assert(plan.contains(s"bucket#") || plan.contains("PartitionFilters"))
    val scanned = got.select(input_file_name()).distinct().collect().map(_.getString(0))
    assert(scanned.nonEmpty && scanned.forall(_.contains(s"bucket=$b")))
    assert(scanned.forall(f => (10 to 29).exists(r => f.contains(s"run=$r"))))
  }
}
