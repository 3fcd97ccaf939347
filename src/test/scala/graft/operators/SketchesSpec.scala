package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {

  test("bloom: no false negatives ever; a small filter admits false positives") {
    val sp = spark
    import sp.implicits._
    val build = (0L until 200L).map(i => i * 7L).toDF("k")
    val probe = (0L until 2000L).toDF("k")
    val pruned = Sketches.bloomSemiJoin(probe, build, "k", "k",
      mBits = 4096, kHashes = 3).as[Long].collect().toSet
    val truth = (0L until 2000L).filter(i => i % 7 == 0 && i / 7 < 200).toSet
    assert(truth.subsetOf(pruned), "bloom dropped a true member")
    // 600 set bits in 4096 → some false positives are expected; all of them
    // must still be a small minority of the non-members
    val fp = pruned -- truth
    assert(fp.size < 400, s"implausible false-positive count ${fp.size}")
  }

  test("bloom audit reconciles: n_pass - n_match = n_false_pos, fp within bound") {
    val sp = spark
    import sp.implicits._
    val build = (0L until 100L).map(i => i * 3L).toDF("k")
    val probe = (0L until 1000L).toDF("k")
    val r = Sketches.bloomAudit(probe, build, "k", "k", mBits = 1 << 16, kHashes = 3)
      .collect().head
    val (nProbe, nPass, nMatch, nFp, fpRate) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
    assert(nProbe == 1000L)
    assert(nMatch == 100L) // multiples of 3 below 300
    assert(nPass >= nMatch)
    assert(nFp == nPass - nMatch)
    assert(math.abs(fpRate - nFp.toDouble / (nProbe - nMatch)) < 1e-6)
    // 300 bits set in 65536: fp rate should be far below 1%
    assert(fpRate < 0.01, s"fp_rate $fpRate too high for this load factor")
  }

  test("hll audit: estimate within the expected error band, exact is exact") {
    val sp = spark
    import sp.implicits._
    val df = (0 until 20000).map { i =>
      ("g" + (i % 2), ((i / 2) % (if (i % 2 == 0) 5000 else 300)).toLong)
    }.toDF("g", "k")
    val got = Sketches.hllAudit(df, "g", "k", p = 8).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got("g0")._1 == 5000L)
    assert(got("g1")._1 == 300L)
    // m=256 → standard error 1.04/sqrt(256) = 6.5%; allow 3 sigma
    got.values.foreach { case (exact, est, relErr) =>
      assert(math.abs(est - exact) / exact < 0.20, s"estimate $est vs $exact")
      assert(relErr == BigDecimal(math.abs(est - exact) / exact)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
  }

  test("hll audit survives a saturated register (all-zero rest bits)") {
    val sp = spark
    import sp.implicits._
    // md5("4147901") = d0000000… — the low 24 rest bits are all zero, so its
    // register rank saturates at restBits+1 = 25. At the old 2^restBits
    // harmonic scale that register's term was shiftleft(1L, -1) =
    // Long.MIN_VALUE (Java shifts reduce mod 64), sign-flipping the sum;
    // with 5000+ distinct keys every bucket is occupied, so the
    // linear-counting fallback can't mask it and the estimate went negative.
    val df = ((0 until 10000).map(i => ("g", i.toLong)) :+ (("g", 4147901L)))
      .toDF("g", "k")
    val r = Sketches.hllAudit(df, "g", "k", p = 8).collect().head
    val (exact, est) = (r.getLong(1), r.getDouble(2))
    assert(exact == 10001L)
    assert(est > 0.0, s"saturated register corrupted the harmonic sum: $est")
    assert(math.abs(est - exact) / exact < 0.25, s"estimate $est vs $exact")
  }

  test("hdr quantiles: bucket upper bound brackets the exact rank statistic") {
    val sp = spark
    import sp.implicits._
    val df = (1 to 1000).map(v => ("a", v.toLong)).toDF("g", "v")
    val got = Sketches.hdrQuantiles(df, "g", "v", Seq(0.5, 0.99)).collect()
      .map(r => r.getDouble(1) -> ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val (n50, est50, ex50) = got(0.5)
    val (n99, est99, ex99) = got(0.99)
    assert(n50 == 1000L && n99 == 1000L)
    assert(ex50 == 500L && ex99 == 990L)
    // est is the upper bound of the bucket holding the rank statistic:
    // 500 lives in [256,511] → 511; 990 in [512,1023] → 1023
    assert(est50 == 511L)
    assert(est99 == 1023L)
    // the defining guarantee: exact ≤ est_hi < 2·exact
    assert(ex50 <= est50 && est50 < 2 * ex50)
    assert(ex99 <= est99 && est99 < 2 * ex99)
  }

  test("hllSlidingDistinct: merged-register estimate tracks the exact window union") {
    val sp = spark
    import sp.implicits._
    val dayUs = 86400000000L
    // 10 days; day d has users [100*d, 100*d+400) -> any 7-day window union
    // is 400 + 600 = overlapping ranges: window [d, d+6] covers users
    // [100*d, 100*(d+6)+400) = 1000 distinct
    val rows = for (d <- 0 until 10; u <- 0 until 400)
      yield (d * dayUs + u, (100 * d + u).toLong)
    val got = Sketches.hllSlidingDistinct(rows.toDF("t", "u"), "t", "u", 7)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // day 9's trailing window [3..9] is fully populated: exact = 100*3..100*9+400 = 1000
    assert(got(9L)._1 == 1000L)
    got.values.foreach { case (exact, est) =>
      assert(math.abs(est - exact) / exact < 0.20, s"estimate $est vs $exact")
    }
    // monotone ramp-up at the head: day 0 window covers only day 0
    assert(got(0L)._1 == 400L)
  }

  test("hllOverlap: inclusion-exclusion tracks the exact intersections") {
    val sp = spark
    import sp.implicits._
    // A = 0..999, B = 500..1499 (overlap 500), C = 2000..2099 (disjoint)
    val rows = (0 until 1000).map(i => ("A", i.toLong)) ++
      (500 until 1500).map(i => ("B", i.toLong)) ++
      (2000 until 2100).map(i => ("C", i.toLong))
    val got = Sketches.hllOverlap(rows.toDF("g", "k"), "g", "k", p = 8)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got.keySet == Set(("A", "B"), ("A", "C"), ("B", "C")))
    assert(got(("A", "B"))._1 == 500L)
    assert(got(("A", "C"))._1 == 0L && got(("B", "C"))._1 == 0L)
    // intersection estimates carry union-level error: generous band
    assert(math.abs(got(("A", "B"))._2 - 500.0) < 250.0, got.toString)
    assert(math.abs(got(("A", "C"))._2) < 200.0)
  }
}
