package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FixedPointSpec extends SparkSpec {

  test("sum/mean are exact on their grid and independent of partitioning") {
    val sp = spark
    import sp.implicits._
    // 0.01 is not binary-exact: a plain double sum of 10k cents drifts with
    // order; the fixed-point sum must be the exact rational every time
    val df = (1 to 10000).map(i => (i % 7).toDouble * 0.01).toDF("v")
    def run(parts: Int): (Double, Double) = {
      val r = df.repartition(parts)
        .agg(FixedPoint.sum(col("v"), 100.0, 2).as("s"),
          FixedPoint.mean(col("v"), 100.0, 6).as("m"))
        .collect().head
      (r.getDouble(0), r.getDouble(1))
    }
    val (s1, m1) = run(1)
    val (s32, m32) = run(32)
    assert(s1 == s32 && m1 == m32)
    // exact value: sum of (i % 7)*0.01 over 1..10000
    val cents = (1 to 10000).map(_ % 7).sum
    assert(s1 == BigDecimal(cents)./(100).setScale(2).toDouble)
    assert(m1 == (BigDecimal(cents) / (100.0 * 10000))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("q quantizes half-away-from-zero like both engines' round()") {
    val sp = spark
    import sp.implicits._
    val got = Seq(0.015, -0.015, 0.024999, -0.024999)
      .toDF("v").select(FixedPoint.q(col("v"), 100.0).as("q"))
      .collect().map(_.getLong(0)).toSeq
    // 1.5 → 2, -1.5 → -2 (HALF_UP away from zero); 2.4999 truncates to 2
    assert(got == Seq(2L, -2L, 2L, -2L))
  }

  test("all-null groups and empty frames return NULL sums/means, not a crash") {
    val sp = spark
    import sp.implicits._
    // the overflow guard's bound is NULL over zero non-null addends
    // (max over empty = NULL) and assert_true throws on NULL — the guard
    // must be vacuously true there so the agg returns SQL's NULL (r8
    // ADVICE, medium)
    val rows = Seq((1, None: Option[Double]), (1, None), (2, Some(2.0)))
      .toDF("k", "v")
      .groupBy(col("k"))
      .agg(FixedPoint.sum(col("v"), 100.0, 2).as("s"),
        FixedPoint.mean6(col("v")).as("m"))
      .orderBy(col("k")).collect()
    assert(rows(0).isNullAt(1) && rows(0).isNullAt(2))
    assert(rows(1).getDouble(1) == 2.0 && rows(1).getDouble(2) == 2.0)
    val empty = Seq.empty[Double].toDF("v")
      .agg(FixedPoint.sum(col("v"), 100.0, 2).as("s"),
        FixedPoint.mean(col("v"), 100.0, 6).as("m")).collect()
    assert(empty.length == 1 && empty(0).isNullAt(0) && empty(0).isNullAt(1))
  }

  test("null values are excluded from the mean denominator (avg semantics)") {
    val sp = spark
    import sp.implicits._
    val got = Seq(Some(1.0), None, Some(3.0)).toDF("v")
      .agg(FixedPoint.mean6(col("v")).as("m"),
        FixedPoint.mean(col("v"), 100.0, 6).as("m2"))
      .collect().head
    // avg(1, 3) = 2, NOT sum/3 (the r7 advisor: count(*) denominators made
    // a null-bearing column's mean silently wrong)
    assert(got.getDouble(0) == 2.0 && got.getDouble(1) == 2.0)
  }

  test("sums past the BIGINT grid fail loudly instead of wrapping") {
    val sp = spark
    import sp.implicits._
    // loud = either the FixedPoint guard (non-ANSI sessions, where
    // sum(long)/cast would silently wrap) or Spark's own ANSI overflow
    // error (ANSI is the Spark 4 default and fails at the cast/multiply) —
    // what must NEVER happen is a wrong number with rc 0
    def loud(t: Throwable): Boolean = {
      def msgs(x: Throwable): Seq[String] =
        if (x == null) Nil else String.valueOf(x.getMessage) +: msgs(x.getCause)
      msgs(t).exists(m => m.contains("FixedPoint overflow") ||
        m.contains("covarianceMatrix overflow") || m.toLowerCase.contains("overflow"))
    }
    // 10 addends of ~9.2e17 on the 1e-6 grid: max|q|*n = 9.2e24 >> 2^63
    val df = (1 to 10).map(_ => 9.2e17).toDF("v")
    val e = intercept[Exception] {
      df.agg(FixedPoint.sum(col("v"), 1e6, 6)).collect()
    }
    assert(loud(e), e.getMessage)
    // covarianceMatrix: vectors far off the documented quantum bound
    val vecs = (1L to 50L).map(i => (i, Array.fill(2)(3.1e8))).toDF("id", "vec")
    val e2 = intercept[Exception] {
      Similarity.covarianceMatrix(vecs, "vec").collect()
    }
    assert(loud(e2), e2.getMessage)
    // and the guard is value-transparent below the bound
    val ok = Seq(1.25, 2.5).toDF("v")
      .agg(FixedPoint.sum(col("v"), 100.0, 2)).collect().head.getDouble(0)
    assert(ok == 3.75)
  }

  test("mean6 matches the long-standing TimeSeries bucket-mean contract") {
    val sp = spark
    import sp.implicits._
    val vals = Seq(1.0000005, 2.0000004, 3.25)
    val got = vals.toDF("v").agg(FixedPoint.mean6(col("v")).as("m"))
      .collect().head.getDouble(0)
    val q = vals.map(v => math.round(v * 1e6))
    assert(got == BigDecimal(q.sum)./(BigDecimal(3) * 1000000)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }
}
