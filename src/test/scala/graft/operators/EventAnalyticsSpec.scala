package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class EventAnalyticsSpec extends SparkSpec {

  private val M = 60000000L // one minute in micros

  test("funnel: steps must happen in order and within the horizon") {
    val sp = spark
    import sp.implicits._
    val rows = Seq(
      // u1 converts fully: view @0, click @1m, purchase @2m
      (1L, 0L * M, "view"), (1L, 1L * M, "click"), (1L, 2L * M, "purchase"),
      // u2's click precedes its first view -> stage 2 not reached
      (2L, 5L * M, "click"), (2L, 6L * M, "view"),
      // u3 clicks too late (beyond the 10-minute horizon)
      (3L, 0L * M, "view"), (3L, 11L * M, "click"),
      // u4 views only
      (4L, 0L * M, "view"),
      // u5 purchases without any view: no stage at all
      (5L, 0L * M, "purchase"))
      .toDF("user_id", "ts", "event_type")
    val got = EventAnalytics.funnel(rows, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"), horizonUs = 10L * M)
      .collect()
      .map(r => (r.getAs[Long]("stage"),
        (r.getAs[String]("step"), r.getAs[Long]("n_users"),
          r.getAs[Double]("conv_from_prev"), r.getAs[Double]("conv_overall"))))
      .toMap
    assert(got(1L) == (("view", 4L, 1.0, 1.0)))
    assert(got(2L) == (("click", 1L, 0.25, 0.25))) // only u1
    assert(got(3L) == (("purchase", 1L, 1.0, 0.25)))
  }

  test("funnel: completion time is the FIRST qualifying event (first-touch)") {
    val sp = spark
    import sp.implicits._
    // two views: the funnel anchors on the FIRST (t=0), so the click at
    // t=15m is outside ITS horizon even though the second view is closer
    val rows = Seq(
      (1L, 0L * M, "view"), (1L, 12L * M, "view"), (1L, 15L * M, "click"))
      .toDF("user_id", "ts", "event_type")
    val got = EventAnalytics.funnel(rows, "user_id", "ts", "event_type",
      Seq("view", "click"), horizonUs = 10L * M)
      .collect().map(r => (r.getAs[Long]("stage"), r.getAs[Long]("n_users"))).toMap
    assert(got == Map(1L -> 1L, 2L -> 0L))
  }

  test("retention: cohorts by first day, distinct daily activity, offset cap") {
    val sp = spark
    import sp.implicits._
    val D = 86400000000L
    val rows = Seq(
      // cohort day 0: u1 active d0,d1,d3; u2 active d0,d1 (twice on d1)
      (1L, 0L), (1L, D + 1L), (1L, 3L * D),
      (2L, 5L), (2L, D + 2L), (2L, D + 3L),
      // cohort day 2: u3 active d2 only
      (3L, 2L * D))
      .toDF("user_id", "ts")
    val got = EventAnalytics.retention(rows, "user_id", "ts", maxDays = 2)
      .collect()
      .map(r => ((r.getAs[Long]("cohort_day"), r.getAs[Long]("k")),
        (r.getAs[Long]("cohort_size"), r.getAs[Long]("n_active"), r.getAs[Double]("retention"))))
      .toMap
    assert(got((0L, 0L)) == ((2L, 2L, 1.0)))
    assert(got((0L, 1L)) == ((2L, 2L, 1.0))) // u2's double activity counts once
    assert(!got.contains((0L, 3L))) // beyond maxDays
    assert(!got.contains((0L, 2L))) // empty cell: no row, not a zero row
    assert(got((2L, 0L)) == ((1L, 1L, 1.0)))
    assert(got.size == 3)
  }

  test("userSequences: time-ordered, tie-broken, truncated; nulls excluded from the stream") {
    val sp = spark
    import sp.implicits._
    val rows = Seq(
      (1L, 30L, 1L, "c"), (1L, 10L, 2L, "a"), (1L, 20L, 3L, "b"),
      (1L, 10L, 1L, "z"), // same ts as 'a' -> event_id 1 < 2 orders it first
      (2L, 5L, 1L, "x"), (2L, 6L, 2L, "y"),
      (3L, 7L, 1L, null.asInstanceOf[String])) // null token: user 3 vanishes
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = EventAnalytics.userSequences(rows, "user_id", "ts", "event_id", "event_type", maxLen = 3)
      .collect().map(r => (r.getAs[Long]("user_id"),
        (r.getAs[Long]("n_events"), r.getAs[String]("seq")))).toMap
    assert(got(1L) == ((4L, "z a b"))) // 4 events counted, maxLen=3 truncates 'c'
    assert(got(2L) == ((2L, "x y")))
    assert(!got.contains(3L))
  }

  test("transitionMatrix: per-user consecutive pairs, per-source normalization, tie order") {
    val sp = spark
    import sp.implicits._
    val rows = Seq(
      // u1: a -> b -> a  (pairs: a->b, b->a)
      (Some(1L), 10L, 1L, "a"), (Some(1L), 20L, 2L, "b"), (Some(1L), 30L, 3L, "a"),
      // u2: a -> a at EQUAL ts: event_id breaks the tie (4 before 5), then -> c
      (Some(2L), 10L, 4L, "a"), (Some(2L), 10L, 5L, "a"), (Some(2L), 40L, 6L, "c"),
      // u3: single event -> contributes no pair; null user dropped
      (Some(3L), 1L, 7L, "b"), (Option.empty[Long], 2L, 8L, "a"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = EventAnalytics.transitionMatrix(rows, "user_id", "ts", "event_id", "event_type")
      .collect()
      .map(r => ((r.getAs[String]("prev_type"), r.getAs[String]("next_type")),
        (r.getAs[Long]("n"), r.getAs[Double]("prob"))))
      .toMap
    // from 'a': a->b (u1), a->a (u2 tie pair), a->c (u2) — each 1/3
    assert(got((("a", "b"))) == ((1L, 0.333333)))
    assert(got((("a", "a"))) == ((1L, 0.333333)))
    assert(got((("a", "c"))) == ((1L, 0.333333)))
    assert(got((("b", "a"))) == ((1L, 1.0)))
    assert(got.size == 4) // u3's lone event and the null user emit nothing
  }

  test("topPaths: windows never cross users; short histories emit nothing") {
    val sp = spark
    import sp.implicits._
    val rows = Seq(
      // u1: a b c d -> paths a->b->c, b->c->d
      (1L, 10L, 1L, "a"), (1L, 20L, 2L, "b"), (1L, 30L, 3L, "c"), (1L, 40L, 4L, "d"),
      // u2: a b c -> a->b->c again (count 2)
      (2L, 10L, 5L, "a"), (2L, 20L, 6L, "b"), (2L, 30L, 7L, "c"),
      // u3: only two events -> no length-3 window
      (3L, 10L, 8L, "x"), (3L, 20L, 9L, "y"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = EventAnalytics.topPaths(rows, "user_id", "ts", "event_id", "event_type",
      n = 3, k = 10)
      .collect().map(r => (r.getAs[String]("path"), r.getAs[Long]("n")))
    assert(got.head == (("a->b->c", 2L))) // most frequent first
    assert(got.toMap == Map("a->b->c" -> 2L, "b->c->d" -> 1L))
  }

  test("activeUsers: rolling 7-day reach counts each user once per window") {
    val sp = spark
    import sp.implicits._
    val day = 86400000000L
    val rows = Seq(
      (1L, 0L * day), (1L, 0L * day + 5L), // same user+day twice: one DAU
      (2L, 0L * day),
      (1L, 3L * day), // re-activity inside the 7-day window of day 0
      (3L, 10L * day)) // isolated late user
      .toDF("user_id", "ts")
    val got = EventAnalytics.activeUsers(rows, "user_id", "ts")
      .collect()
      .map(r => (r.getAs[Long]("day"),
        (r.getAs[Long]("dau"), r.getAs[Long]("wau"), r.getAs[Double]("stickiness"))))
      .toMap
    assert(got(0L) == ((2L, 2L, 1.0)))
    // day 3: u1 active; window [−3..3] covers u1 (twice — counted once) and u2
    assert(got(3L) == ((1L, 2L, 0.5)))
    assert(got(10L) == ((1L, 1L, 1.0))) // day 3's coverage ends at day 9
    assert(got.size == 3) // only days with activity are reported
  }

  test("funnelLatency: first-touch deltas per transition, exact percentiles") {
    val sp = spark
    import sp.implicits._
    val rows = Seq(
      // u1: view@0, click@2m (and a later click@5m that must NOT count)
      (1L, 0L * M, "view"), (1L, 2L * M, "click"), (1L, 5L * M, "click"),
      (1L, 3L * M, "purchase"), // 1m after first click
      // u2: view@0, click@4m
      (2L, 0L * M, "view"), (2L, 4L * M, "click"),
      // u3: view@0, click@6m
      (3L, 0L * M, "view"), (3L, 6L * M, "click"),
      // u4: click with no prior view — no transition
      (4L, 1L * M, "click"))
      .toDF("user_id", "ts", "event_type")
    val got = EventAnalytics.funnelLatency(rows, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"), horizonUs = 10L * M)
      .collect()
      .map(r => r.getAs[Long]("stage") ->
        ((r.getAs[String]("step"), r.getAs[Long]("n_conv"), r.getAs[Long]("min_us"),
          r.getAs[Double]("p50_us"), r.getAs[Double]("p90_us"), r.getAs[Long]("max_us"))))
      .toMap
    // view->click latencies: 2m, 4m, 6m -> p50 = 4m, p90 interpolates 4m..6m at 0.8
    assert(got(2L) == (("click", 3L, 2L * M, 4.0 * M, (4.0 + 1.6) * M, 6L * M)))
    // click->purchase: only u1, 1m
    assert(got(3L) == (("purchase", 1L, 1L * M, 1.0 * M, 1.0 * M, 1L * M)))
  }

  test("rfm: integer-rank quintiles, 5 = best on every axis") {
    val sp = spark
    import sp.implicits._
    val D = 86400000000L
    // five users with strictly ordered recency, frequency, and spend
    val rows = (1 to 5).flatMap { u =>
      (0 until u).map(i => (u.toLong, (u.toLong * 10 + i) * D, "purchase", u * 100.0))
    }.toDF("user_id", "ts", "event_type", "value")
    val now = 100L * D
    val got = EventAnalytics.rfm(rows, "user_id", "ts", "event_type",
      "purchase", "value", nowUs = now)
      .collect().map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("recency_days"), r.getAs[Long]("frequency"),
          r.getAs[Long]("r_score"), r.getAs[Long]("f_score"), r.getAs[Long]("m_score"),
          r.getAs[Long]("rfm")))).toMap
    // user 5 is most recent (last event at day 54), most frequent, top spend
    assert(got(5L)._3 == 5L && got(5L)._4 == 5L && got(5L)._5 == 5L)
    assert(got(5L)._6 == 555L)
    // user 1 is the worst on every axis
    assert(got(1L)._3 == 1L && got(1L)._4 == 1L && got(1L)._5 == 1L)
    assert(got(1L)._6 == 111L)
    // recency math: user 1's only purchase at day 10 -> 90 days ago
    assert(got(1L)._1 == 90L)
    // frequency: user u purchased u times
    (1 to 5).foreach(u => assert(got(u.toLong)._2 == u.toLong))
  }

  test("attribution: U-shaped weights — solo touch 1.0, pair 0.5/0.5, middles share 0.2") {
    val sp = spark
    import sp.implicits._
    val rows = Seq(
      // u1: 4 touches then purchase -> 0.4, 0.1, 0.1, 0.4
      (1L, 0L * M, 1L, "view"), (1L, 1L * M, 2L, "click"), (1L, 2L * M, 3L, "click"),
      (1L, 3L * M, 4L, "view"), (1L, 4L * M, 5L, "purchase"),
      // u2: single view then purchase -> 1.0
      (2L, 0L * M, 1L, "view"), (2L, 1L * M, 2L, "purchase"),
      // u3: touch AFTER purchase never credited
      (3L, 5L * M, 1L, "purchase"), (3L, 6L * M, 2L, "click"),
      // u4: touch outside the lookback window
      (4L, 0L * M, 1L, "view"), (4L, 100L * M, 2L, "purchase"))
      .toDF("user_id", "ts", "tie", "event_type")
    val got = EventAnalytics.attribution(rows, "user_id", "ts", "tie", "event_type",
      "purchase", Seq("view", "click"), lookbackUs = 10L * M)
      .collect().map(r => r.getAs[String]("channel") ->
        ((r.getAs[Long]("n_touches"), r.getAs[Double]("credit")))).toMap
    // u1: views get 0.4 (first) + 0.4 (last) = 0.8, clicks 0.1 + 0.1 = 0.2
    // u2: view 1.0. totals: view 1.8 over 3 touches, click 0.2 over 2
    assert(got("view") == ((3L, 1.8)))
    assert(got("click") == ((2L, 0.2)))
    // credit mass equals attributed conversions (u1 + u2)
    assert(math.abs(got.values.map(_._2).sum - 2.0) < 1e-9)
  }

  test("mergeRollup: prior + delta equals the from-scratch rollup") {
    val sp = spark
    import sp.implicits._
    val all = Seq(
      (1L * M, "a", 1.0), (2L * M, "a", 2.0), (3L * M, "b", 3.0),
      (100L * M, "a", 4.0), (200L * M, "b", 5.0))
      .toDF("ts", "event_type", "value")
    val prior = EventAnalytics.dailyRollup(all.where(col("ts") < 50L * M), "ts", "event_type", "value")
    val delta = EventAnalytics.dailyRollup(all.where(col("ts") >= 50L * M), "ts", "event_type", "value")
    // sum_value is DECIMAL now — the merge invariant is exact, so compare
    // the decimals themselves, not a double projection
    val merged = EventAnalytics.mergeRollup(prior, delta, Seq("day", "event_type"))
      .collect().map(r => (r.getAs[Long]("day"), r.getAs[String]("event_type")) ->
        ((r.getAs[Long]("n"), r.getAs[java.math.BigDecimal]("sum_value")))).toMap
    val full = EventAnalytics.dailyRollup(all, "ts", "event_type", "value")
      .collect().map(r => (r.getAs[Long]("day"), r.getAs[String]("event_type")) ->
        ((r.getAs[Long]("n"), r.getAs[java.math.BigDecimal]("sum_value")))).toMap
    assert(merged.keySet == full.keySet)
    merged.foreach { case (k, (n, sv)) =>
      assert(n == full(k)._1)
      assert(sv.compareTo(full(k)._2) == 0, s"$k: $sv vs ${full(k)._2}")
    }
    // keys present only in one side survive the full-outer merge
    assert(merged.keySet == full.keySet)
  }

  test("funnelLatency: an empty transition reports n_conv=0 with null stats") {
    val sp = spark
    import sp.implicits._
    val rows = Seq((1L, 0L * M, "view")).toDF("user_id", "ts", "event_type")
    val got = EventAnalytics.funnelLatency(rows, "user_id", "ts", "event_type",
      Seq("view", "click"), horizonUs = 10L * M).collect()
    assert(got.length == 1)
    assert(got(0).getAs[Long]("n_conv") == 0L)
    assert(got(0).isNullAt(got(0).fieldIndex("p50_us")))
  }

  test("trendingTopK: bucketed half-life decay, exact dyadic scores") {
    val sp = spark
    import sp.implicits._
    val H = 1000000L // half-life: 1 s in micros
    // anchor t=10s. a: events at ages 0,1,2 half-lives -> 1 + 0.5 + 0.25
    // b: ages 3,3,~2.999,~2.0 -> 0.125+0.125+0.25+0.25 = 0.75; c: ancient -> 0
    val rows = Seq(
      ("a", 10000000L), ("a", 9000000L), ("a", 8000000L),
      ("b", 7000000L), ("b", 7000000L), ("b", 7000001L), ("b", 7999999L),
      ("c", 10000000L - 50 * H))
    val got = EventAnalytics.trendingTopK(rows.toDF("k", "t"), "k", "t", H, 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.toList == List(("a", 3L, 1.75), ("b", 4L, 0.75), ("c", 1L, 0.0)))
  }

  test("abTest: hand-computed pooled two-proportion z") {
    val sp = spark
    import sp.implicits._
    import org.apache.spark.sql.functions.{col, when, pmod, lit}
    // variant A: users 0,2,4,6 (4 users, 2 convert); B: 1,3,5 (3 users, 0)
    val rows = Seq(
      (0L, "view"), (0L, "purchase"), (2L, "purchase"), (4L, "view"),
      (6L, "view"), (1L, "view"), (3L, "click"), (5L, "view"),
      (2L, "purchase")) // duplicate conversion: counted once
    val df = rows.toDF("user_id", "event_type")
    val got = EventAnalytics.abTest(df, "user_id",
      when(pmod(col("user_id"), lit(2)) === 0, "A").otherwise("B"),
      "event_type", "purchase").collect().head
    assert((got.getString(0), got.getString(1)) == (("A", "B")))
    assert((got.getLong(2), got.getLong(3), got.getLong(4), got.getLong(5)) ==
      ((4L, 2L, 3L, 0L)))
    val p = 2.0 / 7.0
    val z = (0.5 - 0.0) / math.sqrt(p * (1 - p) * (1.0 / 4 + 1.0 / 3))
    assert(math.abs(got.getDouble(6) - BigDecimal(z).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9, got.toString)
  }

  test("abTest: degenerate pools (all or none convert) yield a null z") {
    val sp = spark
    import sp.implicits._
    import org.apache.spark.sql.functions.{col, when, pmod, lit}
    val all = Seq((0L, "purchase"), (1L, "purchase")).toDF("user_id", "event_type")
    val r = EventAnalytics.abTest(all, "user_id",
      when(pmod(col("user_id"), lit(2)) === 0, "A").otherwise("B"),
      "event_type", "purchase").collect().head
    assert(r.isNullAt(6), r.toString)
  }

  test("churnLabels: strict pre-cutoff features, future-window label, population gate") {
    val sp = spark
    import sp.implicits._
    val D = 86400000000L
    val cut = 100L * D
    val rows = Seq(
      (1L, cut - 2 * D), (1L, cut - D / 2), (1L, cut + D),   // active, returns -> label 1
      (2L, cut - 3 * D),                                      // active, silent -> label 0
      (3L, cut - 30 * D),                                     // outside feature window: dropped
      (4L, cut + 2 * D),                                      // only post-cutoff: dropped (n_7d=0)
      (5L, cut - D), (5L, cut + 10 * D))                    // return outside label window -> 0
    val got = EventAnalytics.churnLabels(rows.toDF("u", "t"), "u", "t",
      cutoffUs = cut, labelUs = 7 * D)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got.keySet == Set(1L, 2L, 5L), got.toString)
    assert(got(1L) == ((2L, 1L, D / 2, 1L)))
    assert(got(2L) == ((1L, 0L, 3 * D, 0L)))
    assert(got(5L) == ((1L, 1L, D, 0L))) // t = cut+10D is outside the label window
  }

  test("transitionLatency: hand gaps per transition pair") {
    val sp = spark
    import sp.implicits._
    // user 1: a@0 -> b@10 -> a@40; user 2: a@0 -> b@30
    val rows = Seq((1L, 0L, 1L, "a"), (1L, 10L, 2L, "b"), (1L, 40L, 3L, "a"),
      (2L, 0L, 4L, "a"), (2L, 30L, 5L, "b"))
    val got = EventAnalytics.transitionLatency(
      rows.toDF("u", "t", "id", "et"), "u", "t", "id", "et")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getLong(5))).toList
    // a->b gaps {10, 30} us: p50 = 20 us = 0.00002 s -> rounds to 0.0 at
    // 3 dp; check max instead and the count/row shape
    assert(got == List(("a", "b", 2L, 0.0, 30L), ("b", "a", 1L, 0.0, 30L)),
      got.toString)
  }
}
