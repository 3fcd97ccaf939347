package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Approximate twins of the exact operators — the mode a 100 TB
  * deployment actually runs when exactness isn't contractual: HLL++
  * distinct counts and count-min frequency sketches are mergeable
  * (map-side partials combine associatively), so their cost is one
  * map-side pass + tiny sketch merges where the exact forms shuffle
  * value sets. They cannot be DuckDB-oracled (estimates are
  * implementation-defined), so these specs gate them against the exact
  * answers with their published error bounds instead.
  */
class ApproxSpec extends SparkSpec {

  private lazy val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")

  test("approx_count_distinct tracks exact distinct users within the configured rsd") {
    val rsd = 0.05
    val exact = events.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val approx = events.groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), rsd).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, n) =>
      val err = math.abs(approx(k) - n).toDouble / n
      // 4x the rsd: a deterministic gate far outside plausible HLL++ noise
      assert(err <= 4 * rsd, s"$k: approx ${approx(k)} vs exact $n (err $err)")
    }
  }

  test("count-min sketch overestimates-only within eps * stream size") {
    val eps = 0.005
    val conf = 0.99
    val sketch = events.stat.countMinSketch(col("user_id"), eps, conf, 42)
    val exact = events.groupBy(col("user_id")).count()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val total = exact.map(_._2).sum
    exact.foreach { case (u, n) =>
      val est = sketch.estimateCount(u)
      assert(est >= n, s"user $u: CMS must never underestimate ($est < $n)")
      assert(est <= n + (eps * total).toLong + 1,
        s"user $u: est $est vs exact $n over budget")
    }
  }

  test("HLL++ partials merged across shards equal the single-pass estimate (mergeability)") {
    val whole = events.agg(approx_count_distinct(col("user_id"), 0.02).as("n"))
      .collect().head.getLong(0)
    // same aggregate over a differently-partitioned input: the sketch merge
    // must be partition-invariant (associative/commutative partials)
    val reshuffled = events.repartition(13, col("event_id"))
      .agg(approx_count_distinct(col("user_id"), 0.02).as("n"))
      .collect().head.getLong(0)
    assert(whole == reshuffled, s"$whole vs $reshuffled")
  }

  test("approx_percentile stays within its rank accuracy of the exact percentiles (A5 twin)") {
    val acc = 1000 // rank error <= n / acc
    val ps = Seq(0.25, 0.5, 0.9, 0.99)
    val sorted = events.select(col("value").cast("double")).where(col("value").isNotNull)
      .collect().map(_.getDouble(0)).sorted
    val n = sorted.length
    val approx = events.agg(expr(
      s"approx_percentile(value, array(${ps.mkString("D, ")}D), $acc)").as("q"))
      .collect().head.getSeq[Double](0)
    ps.zip(approx).foreach { case (p, est) =>
      // the GK guarantee is on RANK, not value: the estimate must sit at a
      // rank within n/acc (+1 slack) of the target rank
      val lo = math.max(0, (p * n).toInt - n / acc - 1)
      val hi = math.min(n - 1, (p * n).toInt + n / acc + 1)
      assert(est >= sorted(lo) && est <= sorted(hi),
        s"p$p: $est outside value band [${sorted(lo)}, ${sorted(hi)}]")
    }
    // partition-invariant merge, like the HLL++ gate above
    val reshuffled = events.repartition(13, col("event_id")).agg(expr(
      s"approx_percentile(value, array(${ps.mkString("D, ")}D), $acc)").as("q"))
      .collect().head.getSeq[Double](0)
    assert(reshuffled.length == ps.length)
  }
}
