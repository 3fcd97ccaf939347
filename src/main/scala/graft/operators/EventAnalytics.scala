package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-event analytics over the monitor/event stream — the funnel and
  * cohort-retention rollups every product-analytics warehouse runs, here as
  * pure aggregation plans (no sessionizing window over the raw stream, no
  * driver-side event loops).
  */
object EventAnalytics {

  private def quantize6(c: Column): Column = floor(c * 1000000.0) / 1000000.0

  /** Ordered conversion funnel: for each user, step `i+1` counts only if it
    * happens strictly AFTER the user's step-`i` completion time and within
    * `horizonUs` of it (the classic windowed funnel — out-of-order or stale
    * conversions don't count). Completion time of a step is the EARLIEST
    * qualifying event, matching the standard "first touch" funnel
    * definition.
    *
    * Output: one row per step —
    * `(stage, step, n_users, conv_from_prev, conv_overall)` with the
    * conversion ratios floor-quantized to 6 places (ratios of two
    * engine-exact longs).
    *
    * Plan shape: one key-grouped min-aggregation per step (map-side
    * combinable) joined to the previous step's per-user completion frame on
    * the user key — `steps.length` small hash joins, each keyed and
    * skew-free; the final assembly is a `steps.length`-row frame (window
    * over 3 rows, control-plane sized). At 100 TB the per-step frames are
    * one row per converting user — the natural shrink point of the
    * pipeline; nothing re-scans the corpus per step pair.
    */
  def funnel(df: DataFrame, user: String, ts: String, eventType: String,
      steps: Seq[String], horizonUs: Long): DataFrame = {
    val completions = completionFrames(df, user, ts, eventType, steps, horizonUs)
    val counts = completions.zip(steps).zipWithIndex.map { case ((doneDf, step), i) =>
      doneDf.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1).cast("long").as("stage"), lit(step).as("step"), col("n_users"))
    }.reduce(_.unionByName(_))
    val w = Window.orderBy(col("stage")) // steps.length rows — control plane
    counts
      .withColumn("__prev", lag(col("n_users"), 1).over(w))
      .withColumn("__first", first(col("n_users")).over(w))
      .select(col("stage"), col("step"), col("n_users"),
        when(col("__prev").isNull, lit(1.0))
          .otherwise(quantize6(col("n_users") / col("__prev"))).as("conv_from_prev"),
        quantize6(col("n_users") / col("__first")).as("conv_overall"))
  }

  /** Per-user first-touch completion time of each successive funnel step
    * (the [[funnel]] recurrence): step `i+1` counts only strictly after the
    * user's step-`i` completion and within `horizonUs` of it. One keyed
    * min-agg + one keyed join per step; each frame is one row per
    * converting user.
    */
  private def completionFrames(df: DataFrame, user: String, ts: String,
      eventType: String, steps: Seq[String], horizonUs: Long): List[DataFrame] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(horizonUs > 0, s"horizonUs must be positive, got $horizonUs")
    val base = df.where(col(user).isNotNull)
      .select(col(user).as("__u"), col(ts).as("__ts"), col(eventType).as("__et"))
    steps.zipWithIndex.foldLeft(List.empty[DataFrame]) {
      case (acc, (step, i)) =>
        val hits = base.where(col("__et") === step)
        val done =
          if (i == 0) hits.groupBy(col("__u")).agg(min(col("__ts")).as("__t"))
          else {
            val prev = acc.head.select(col("__u"), col("__t").as("__tp"))
            hits.join(prev, Seq("__u"))
              .where(col("__ts") > col("__tp") && col("__ts") <= col("__tp") + horizonUs)
              .groupBy(col("__u")).agg(min(col("__ts")).as("__t"))
          }
        done :: acc
    }.reverse
  }

  /** RFM (recency / frequency / monetary) quintile scoring over conversion
    * events — the segmentation backbone of retention analytics. Scores are
    * EXACT equi-depth quintiles from integer rank arithmetic:
    * `score = 5 − ((rank−1)·5) div n` with rank ordered (metric, user), so
    * both engines bucket identically with no percentile interpolation;
    * the monetary metric is rounded to 6 places BEFORE ranking (the
    * q_quality_buckets convention for float sort keys). 5 = best (most
    * recent / most frequent / highest spend).
    *
    * Plan shape: one keyed per-user aggregate, then three DISTRIBUTED
    * global ranks via [[graft.operators.TimeSeries.rowNumberRanged]] —
    * range-partitioned, per-partition windows, explode/groupBy prefix
    * offsets — and a 1-row count broadcast. Users scale with the corpus,
    * so the users-sized frame never passes through a single-task window
    * (r9 verdict ask #2; the previous shape was three global rank windows).
    */
  def rfm(df: DataFrame, user: String, ts: String, eventType: String,
      conversion: String, value: String, nowUs: Long): DataFrame = {
    val per = df.where(col(user).isNotNull && col(eventType) === conversion)
      .groupBy(col(user).as("user_id"))
      .agg(
        max(col(ts)).as("__last"),
        count(lit(1)).as("frequency"),
        FixedPoint.sum(coalesce(col(value), lit(0.0)), 1e6, 6).as("monetary"))
      .select(col("user_id"),
        expr(s"(${nowUs}L - __last) div 86400000000").as("recency_days"),
        col("frequency"), col("monetary"))
    val n1 = per.agg(count(lit(1)).as("__n"))
    val nParts = df.sparkSession.sessionState.conf.numShufflePartitions
    val ranked = Seq[(String, Seq[Column])](
      ("__rr", Seq(col("recency_days"), col("user_id"))),
      ("__rf", Seq(col("frequency").desc, col("user_id"))),
      ("__rm", Seq(col("monetary").desc, col("user_id"))))
      .foldLeft(per) { case (acc, (out, keys)) =>
        TimeSeries.rowNumberRanged(acc, out, nParts, keys: _*)
      }
    ranked
      .crossJoin(broadcast(n1))
      .select(col("user_id"), col("recency_days"), col("frequency"), col("monetary"),
        expr("5 - ((__rr - 1) * 5) div __n").as("r_score"),
        expr("5 - ((__rf - 1) * 5) div __n").as("f_score"),
        expr("5 - ((__rm - 1) * 5) div __n").as("m_score"))
      .withColumn("rfm",
        col("r_score") * 100L + col("f_score") * 10L + col("m_score"))
  }

  /** U-shaped (positional) multi-touch attribution: every conversion event
    * spreads one unit of credit over the user's touch events in the
    * `lookbackUs` window strictly before it — 40% to the first touch, 40%
    * to the last, the middle 20% split evenly (n=1 → 100%, n=2 → 50/50):
    * the standard position-based model between last-touch and linear.
    * Summed per channel, total credit equals the attributed-conversion
    * count exactly (each conversion's weights sum to 1 by construction).
    *
    * Plan shape: one keyed join (touches × conversions per user, bounded
    * by the lookback window), two per-conversion window functions over the
    * conversion's own touch list, one final channel aggregate. Credits are
    * exact small rationals; only the final per-channel sum is rounded.
    */
  def attribution(df: DataFrame, user: String, ts: String, tieBreak: String,
      eventType: String, conversion: String, touches: Seq[String],
      lookbackUs: Long): DataFrame = {
    require(touches.nonEmpty, "need at least one touch type")
    require(lookbackUs > 0, s"lookbackUs must be positive, got $lookbackUs")
    val base = df.where(col(user).isNotNull)
      .select(col(user).as("__u"), col(ts).as("__ts"), col(tieBreak).as("__tb"),
        col(eventType).as("__et"))
    val convs = base.where(col("__et") === conversion)
      .select(col("__u"), col("__ts").as("__cts"), col("__tb").as("__cid"))
    val tch = base.where(col("__et").isin(touches.map(_.asInstanceOf[Any]): _*))
    val paired = tch.join(convs, Seq("__u"))
      .where(col("__ts") < col("__cts") && col("__ts") >= col("__cts") - lookbackUs)
    val wAsc = Window.partitionBy(col("__u"), col("__cts"), col("__cid"))
      .orderBy(col("__ts"), col("__tb"))
    val wAll = Window.partitionBy(col("__u"), col("__cts"), col("__cid"))
    val credit = when(col("__n") === 1, lit(1.0))
      .when(col("__rn") === 1 || col("__rn") === col("__n"),
        when(col("__n") === 2, lit(0.5)).otherwise(lit(0.4)))
      .otherwise(lit(0.2) / (col("__n") - 2))
    paired
      .withColumn("__rn", row_number().over(wAsc))
      .withColumn("__n", count(lit(1)).over(wAll))
      .groupBy(col("__et").as("channel"))
      // fractional U-shape shares (0.2/(n−2)) aren't binary-exact: quantize
      // each touch's credit to the 1e-6 grid before the channel sum
      .agg(count(lit(1)).as("n_touches"), FixedPoint.sum(credit, 1e6, 6).as("credit"))
  }

  /** Incremental rollup maintenance: merge a PRIOR aggregate table with the
    * aggregate of a NEW delta — the pattern that keeps a 100 TB daily
    * rollup current without rescanning history (only the delta is read;
    * the prior table is itself the output of an earlier run). Counts and
    * sums are mergeable partials, so `merged(prior, agg(delta)) ==
    * agg(full)` exactly for counts and to float-roundoff for sums.
    *
    * Both inputs carry `(keys..., n, sum_value)`; the merge is ONE
    * full-outer join on the key columns + coalesced additions — work is
    * bounded by touched keys, never history size.
    */
  def mergeRollup(prior: DataFrame, delta: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "mergeRollup needs at least one key column")
    val p = prior.select((keys.map(col) :+ col("n").as("__np") :+ col("sum_value").as("__sp")): _*)
    val d = delta.select((keys.map(col) :+ col("n").as("__nd") :+ col("sum_value").as("__sd")): _*)
    val zero = lit(0).cast("decimal(28,6)")
    p.join(d, keys, "full_outer")
      .select((keys.map(col) :+
        (coalesce(col("__np"), lit(0L)) + coalesce(col("__nd"), lit(0L))).as("n") :+
        (coalesce(col("__sp"), zero) + coalesce(col("__sd"), zero)).as("sum_value")): _*)
  }

  /** The daily rollup [[mergeRollup]] maintains: `(day, event_type, n,
    * sum_value)` per cell, day = epoch-day of the event-time micros.
    * `sum_value` is a DECIMAL(38,6): decimal sums are EXACT, so partial-agg
    * order, the prior/delta split point, and merge associativity all
    * cannot move the value — the invariant `merge(prior, delta) ==
    * from-scratch` holds bit-for-bit, not just to float tolerance.
    */
  def dailyRollup(df: DataFrame, ts: String, eventType: String, value: String): DataFrame =
    df.where(col(eventType).isNotNull)
      .groupBy(expr(s"$ts div 86400000000").as("day"), col(eventType).as("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(coalesce(col(value), lit(0.0)).cast("decimal(28,6)")).as("sum_value"))

  /** Time-to-convert distribution per funnel transition: over the users who
    * completed step `i+1`, the latency `t_{i+1} − t_i` from their step-`i`
    * completion (both first-touch times from the [[funnel]] recurrence, so
    * every latency is in `(0, horizonUs]` by construction).
    *
    * Output: one row per transition —
    * `(stage, step, n_conv, min_us, p50_us, p90_us, max_us)` — exact
    * integer micros for min/max, exact interpolated percentiles
    * (`percentile` == DuckDB `quantile_cont`) rounded to 6 places.
    *
    * Plan shape: the step-completion frames are one row per converting user
    * (the funnel's natural shrink point); each transition is ONE keyed join
    * of two such frames + one combinable aggregate. Nothing re-scans the
    * corpus per transition.
    */
  def funnelLatency(df: DataFrame, user: String, ts: String, eventType: String,
      steps: Seq[String], horizonUs: Long): DataFrame = {
    require(steps.length >= 2, "funnelLatency needs at least two steps")
    val completions = completionFrames(df, user, ts, eventType, steps, horizonUs)
    completions.sliding(2).toList.zipWithIndex.map {
      case (List(prevDf, curDf), i) =>
        val prev = prevDf.select(col("__u"), col("__t").as("__tp"))
        curDf.join(prev, Seq("__u"))
          .select((col("__t") - col("__tp")).as("__lat"))
          .agg(
            count(lit(1)).as("n_conv"),
            min(col("__lat")).as("min_us"),
            round(expr("percentile(__lat, 0.5)"), 6).as("p50_us"),
            round(expr("percentile(__lat, 0.9)"), 6).as("p90_us"),
            max(col("__lat")).as("max_us"))
          .select(lit(i + 2).cast("long").as("stage"),
            lit(steps(i + 1)).as("step"),
            col("n_conv"), col("min_us"), col("p50_us"), col("p90_us"),
            col("max_us"))
      case other => sys.error(s"unreachable sliding window: $other")
    }.reduce(_.unionByName(_))
  }

  /** Day-granularity cohort retention: users cohort by their FIRST-ever
    * activity day; `retention` at offset `k` is the fraction of the cohort
    * active (any event) exactly `k` days after its cohort day, `0 <= k <=
    * maxDays`. Day buckets are epoch-day integers of the event-time micros
    * (pure integer arithmetic — engine-exact).
    *
    * Output: `(cohort_day, k, cohort_size, n_active, retention)`, one row
    * per non-empty (cohort, offset) cell, retention floor-quantized.
    *
    * Plan shape: ONE map-side-combinable min-agg for cohort assignment, one
    * distinct over (user, day) — both keyed by user — then a count per
    * (cohort, k): every shuffle is on the user or the (cohort, k) cell, the
    * output is bounded by cohorts × maxDays, and no window touches
    * data-sized frames. The cohort dimension joins back broadcast-sized.
    */
  def retention(df: DataFrame, user: String, ts: String, maxDays: Int): DataFrame = {
    require(maxDays >= 0, s"maxDays must be >= 0, got $maxDays")
    val dayUs = 86400000000L
    val base = df.where(col(user).isNotNull)
      .select(col(user).as("__u"), expr(s"$ts DIV ${dayUs}L").as("__day"))
    val cohorts = base.groupBy(col("__u")).agg(min(col("__day")).as("__cohort"))
    val sizes = cohorts.groupBy(col("__cohort")).agg(count(lit(1)).as("cohort_size"))
    val active = base.distinct()
      .join(cohorts, Seq("__u"))
      .withColumn("__k", col("__day") - col("__cohort"))
      .where(col("__k") <= maxDays)
      .groupBy(col("__cohort"), col("__k"))
      .agg(count(lit(1)).as("n_active"))
    active.join(sizes, Seq("__cohort"))
      .select(col("__cohort").as("cohort_day"), col("__k").as("k"),
        col("cohort_size"), col("n_active"),
        quantize6(col("n_active") / col("cohort_size")).as("retention"))
  }

  /** Behavior-sequence corpus builder: per user, the time-ordered token
    * stream of their events, truncated to `maxLen` tokens and rendered as a
    * space-joined document — the events→text bridge that lets every
    * text-side operator (dedup, packing, n-gram stats, sequence-model
    * pretraining) run over interaction logs, the standard recipe for
    * recommender/behavior-LM training data.
    *
    * One user-keyed aggregation: `collect_list` of (ts, tieBreak, token)
    * structs combines map-side, `sort_array` orders each user's bounded
    * list once (no global window), and the projection slices + joins —
    * all codegen. Per-user state is that user's own event count; users
    * with pathological volumes should be pre-throttled
    * ([[TimeSeries.throttle]]) — the same cap a training pipeline wants
    * anyway. Ordering is total because (`ts`, `tieBreak`) is unique per
    * user, so the rendered sequence is deterministic in both engines.
    */
  def userSequences(df: DataFrame, user: String, ts: String, tieBreak: String,
      token: String, maxLen: Int): DataFrame = {
    require(maxLen >= 1, s"maxLen must be >= 1, got $maxLen")
    df.where(col(user).isNotNull && col(ts).isNotNull && col(token).isNotNull)
      .groupBy(col(user))
      .agg(
        count(lit(1)).as("n_events"),
        sort_array(collect_list(struct(col(ts), col(tieBreak), col(token).as("__tok"))))
          .as("__evs"))
      .select(
        col(user),
        col("n_events"),
        concat_ws(" ", slice(transform(col("__evs"), e => e.getField("__tok")), 1, maxLen))
          .as("seq"))
  }

  /** First-order Markov transition matrix over per-user event streams: for
    * each consecutive pair of events of one user (time order, `tieBreak`
    * breaking equal timestamps deterministically), count the
    * `(prev_type, next_type)` transition and normalize per source state —
    * the "what do users do next" matrix behind next-event prediction and
    * behavior-sequence QA.
    *
    * Output: `(prev_type, next_type, n, prob)`, `prob = n / Σ_next n`
    * floor-quantized to 6 places (a ratio of two engine-exact longs).
    *
    * Plan shape: ONE user-keyed window (`lag` over the per-user sort — the
    * shuffle is on the user key, skew bounded by the busiest user, the same
    * partitioning every per-user operator here uses) feeding ONE map-side
    * combinable count over `(prev, next)`. The normalizing totals come from
    * a window over the PAIR table, which is bounded by `|types|²` rows —
    * control-plane sized at any corpus scale.
    */
  def transitionMatrix(df: DataFrame, user: String, ts: String, tieBreak: String,
      eventType: String): DataFrame = {
    val w = Window.partitionBy(col("__u")).orderBy(col("__ts"), col("__tb"))
    val pairs = df.where(col(user).isNotNull && col(ts).isNotNull)
      .select(col(user).as("__u"), col(ts).as("__ts"), col(tieBreak).as("__tb"),
        col(eventType).as("next_type"))
      .withColumn("prev_type", lag(col("next_type"), 1).over(w))
      .where(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("next_type"))
      .agg(count(lit(1)).as("n"))
    // |types|²-bounded frame: the normalizing window is control-plane sized
    val wt = Window.partitionBy(col("prev_type"))
    pairs
      .withColumn("prob", quantize6(col("n") / sum(col("n")).over(wt)))
      .select(col("prev_type"), col("next_type"), col("n"), col("prob"))
  }

  /** Top event PATHS — the most common length-`n` consecutive event-type
    * runs across all users, the order-(n−1) extension of
    * [[transitionMatrix]] ("view→click→purchase happens 4× more than
    * view→click→error"). Paths never cross user boundaries; each window of
    * `n` consecutive events of one user contributes one path.
    *
    * Plan shape: ONE user-keyed window produces the n−1 lag columns
    * (same shuffle and sort as [[transitionMatrix]]), ONE map-side
    * combinable count collapses to the paths-bounded table (≤ |types|ⁿ
    * rows), and the top-k is a `TakeOrderedAndProject` — no global sort.
    * Deterministic order: (count desc, path).
    */
  def topPaths(df: DataFrame, user: String, ts: String, tieBreak: String,
      eventType: String, n: Int = 3, k: Int = 20): DataFrame = {
    require(n >= 2, s"path length must be >= 2, got $n")
    require(k >= 1, s"k must be >= 1, got $k")
    val w = Window.partitionBy(col("__u")).orderBy(col("__ts"), col("__tb"))
    val base = df.where(col(user).isNotNull && col(ts).isNotNull)
      .select(col(user).as("__u"), col(ts).as("__ts"), col(tieBreak).as("__tb"),
        col(eventType).as("__t0"))
    val lagged = (1 until n).foldLeft(base) { (acc, i) =>
      acc.withColumn(s"__t$i", lag(col("__t0"), i).over(w))
    }
    val steps = (n - 1) to 0 by -1 // oldest first
    lagged
      .where(col(s"__t${n - 1}").isNotNull) // full windows only
      .select(concat_ws("->", steps.map(i => col(s"__t$i")): _*).as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path"))
      .limit(k)
  }

  /** Daily active users with a trailing-7-day rolling reach: for every day
    * with any activity, `dau` = distinct users that day, `wau` = distinct
    * users over that day and the 6 preceding days, `stickiness` =
    * `dau / wau` (the DAU/WAU engagement ratio) floor-quantized. Day
    * buckets are epoch-day integers of the event-time micros.
    *
    * Plan shape: rolling DISTINCT does not distribute as a window — instead
    * each distinct `(user, day)` activity row fans out to the 7 future days
    * it covers (a map-only `sequence` explode, constant ×7), and one
    * distinct + count per covered day yields the rolling reach. Every
    * shuffle is keyed by `(user, day)` or by the day cell; output is
    * bounded by the day span. This is the scale-safe shape: no
    * re-aggregation of 7-day windows per day, no driver loop, and the ×7
    * fan-out happens AFTER the `(user, day)` dedup has already collapsed
    * the corpus to its per-day user sets.
    */
  def activeUsers(df: DataFrame, user: String, ts: String): DataFrame = {
    val dayUs = 86400000000L
    val ud = df.where(col(user).isNotNull)
      .select(col(user).as("__u"), expr(s"$ts DIV ${dayUs}L").as("__day"))
      .distinct()
    val dau = ud.groupBy(col("__day")).agg(count(lit(1)).as("dau"))
    val wau = ud
      .select(col("__u"), explode(sequence(col("__day"), col("__day") + lit(6L))).as("__cover"))
      .distinct()
      .groupBy(col("__cover")).agg(count(lit(1)).as("wau"))
    dau.join(wau, col("__day") === col("__cover"))
      .select(col("__day").as("day"), col("dau"), col("wau"),
        quantize6(col("dau") / col("wau")).as("stickiness"))
  }

  /** Exponentially time-decayed heavy hitters — the "trending now" ranking:
    * each event contributes `2^(−age/halfLife)` anchored at the stream's
    * max timestamp, so a key's score halves every `halfLife` with no
    * windowed re-scan, and a decayed sum is STILL a plain sum of per-event
    * terms — map-side combinable, mergeable across shards and days.
    *
    * Determinism: the decay exponent is the INTEGER halfLife count
    * `d = min(⌊age/halfLife⌋, 40)` (bucketed decay, the common production
    * form), each term is the exact BIGINT `2^(40−d)`, and the per-key sum
    * is integer arithmetic — no floating summation-order hazard anywhere;
    * the single scale-back division happens once per OUTPUT row. Events
    * older than 40 half-lives contribute 0 (they'd be below 1e-12 anyway).
    *
    * Output: top `k` keys by `(score DESC, key)` as `(key, n, score)`.
    */
  def trendingTopK(df: DataFrame, key: String, ts: String, halfLifeUs: Long,
      k: Int): DataFrame = {
    require(halfLifeUs > 0, s"halfLifeUs must be positive, got $halfLifeUs")
    require(k > 0, s"k must be positive, got $k")
    val base = df.where(col(key).isNotNull && col(ts).isNotNull)
      .select(col(key).as("__k"), col(ts).cast("long").as("__t"))
    val tRef = base.agg(max(col("__t")).as("__tmax")) // 1 row
    base.crossJoin(broadcast(tRef))
      .select(col("__k"),
        least(floor((col("__tmax") - col("__t")) / lit(halfLifeUs.toDouble)),
          lit(40.0)).cast("int").as("__d"))
      .groupBy(col("__k"))
      .agg(count(lit(1)).as("n"),
        sum(call_function("shiftleft", lit(1L), lit(40) - col("__d"))).as("__s"))
      .select(col("__k").as(key), col("n"),
        round(col("__s") / lit(1099511627776.0), 6).as("score")) // 2^40
      .orderBy(col("score").desc, col(key))
      .limit(k)
  }

  /** Two-proportion A/B test on a conversion event: per variant, exposed
    * users and converters; across variants, the pooled two-proportion
    * z-statistic — the standard experiment readout (|z| ≥ 1.96 ⇒ p < .05
    * two-sided). Everything is closed-form arithmetic over four exact
    * integers, so any engine reproduces it; the z row is emitted per
    * variant pair (A = lexicographically smaller).
    *
    * Plan shape: one distinct user-variant frame, one conversion
    * semi-aggregation, one variants-sized join — the raw stream is
    * scanned once.
    *
    * Output: `(variant_a, variant_b, users_a, conv_a, users_b, conv_b, z)`.
    */
  def abTest(df: DataFrame, user: String, variant: Column, eventType: String,
      convEvent: String): DataFrame = {
    val base = df.where(col(user).isNotNull)
      .select(col(user).as("__u"), variant.cast("string").as("__v"),
        col(eventType).as("__e"))
    val users = base.select(col("__u"), col("__v")).distinct()
    val conv = base.where(col("__e") === convEvent)
      .select(col("__u"), col("__v")).distinct()
      .withColumn("__c", lit(1L))
    val per = users.join(conv, Seq("__u", "__v"), "left")
      .groupBy(col("__v"))
      .agg(count(lit(1)).as("__n"), sum(coalesce(col("__c"), lit(0L))).as("__k"))
    val a = per.select(col("__v").as("variant_a"), col("__n").as("users_a"),
      col("__k").as("conv_a"))
    val b = per.select(col("__v").as("variant_b"), col("__n").as("users_b"),
      col("__k").as("conv_b"))
    val pPool = (col("conv_a") + col("conv_b")) /
      (col("users_a") + col("users_b"))
    val varTerm = pPool * (lit(1.0) - pPool) *
      (lit(1.0) / col("users_a") + lit(1.0) / col("users_b"))
    a.join(b, col("variant_a") < col("variant_b"))
      .select(col("variant_a"), col("variant_b"), col("users_a"), col("conv_a"),
        col("users_b"), col("conv_b"),
        // degenerate pools (everyone or no one converts) have zero variance
        // — the test is undefined there, not infinite
        when(varTerm > 0.0,
          round((col("conv_a") / col("users_a") -
            col("conv_b") / col("users_b")) / sqrt(varTerm), 6)).as("z"))
      .orderBy(col("variant_a"), col("variant_b"))
  }

  /** Leakage-safe churn-model dataset builder: for every user active in the
    * feature window before `cutoffUs`, trailing-activity features computed
    * STRICTLY before the cutoff and a binary label from the
    * `[cutoffUs, cutoffUs + labelUs)` future window — the temporal
    * discipline that makes the dataset trainable (any feature touching the
    * label window would leak the answer; the split is one predicate, so
    * the guarantee is auditable in the plan). One conditional-aggregation
    * pass over the stream; no window functions.
    *
    * Output: `(user_id, n_7d, n_1d, recency_us, label)` —
    * counts in the trailing 7-day / 1-day feature windows, microseconds
    * since the user's last pre-cutoff event, and 1 if the user appears in
    * the label window.
    */
  def churnLabels(df: DataFrame, user: String, ts: String, cutoffUs: Long,
      labelUs: Long): DataFrame = {
    require(labelUs > 0, s"labelUs must be positive, got $labelUs")
    val day = 86400000000L
    df.where(col(user).isNotNull && col(ts).isNotNull &&
        col(ts) < cutoffUs + labelUs)
      .groupBy(col(user).as("user_id"))
      .agg(
        sum(when(col(ts) >= cutoffUs - 7 * day && col(ts) < cutoffUs, 1L)
          .otherwise(0L)).as("n_7d"),
        sum(when(col(ts) >= cutoffUs - day && col(ts) < cutoffUs, 1L)
          .otherwise(0L)).as("n_1d"),
        max(when(col(ts) < cutoffUs, col(ts))).as("__last"),
        max(when(col(ts) >= cutoffUs, 1L).otherwise(0L)).as("label"))
      .where(col("n_7d") > 0L) // population: users active in the feature window
      .select(col("user_id"), col("n_7d"), col("n_1d"),
        (lit(cutoffUs) - col("__last")).as("recency_us"), col("label"))
      .orderBy(col("user_id"))
  }

  /** Dwell-time profile of every adjacent event-type transition: for each
    * (from → to) pair of consecutive events on the same user, the count and
    * the exact interpolated p50/p90 of the time gap IN SECONDS (3 dp —
    * micros-magnitude doubles carry ~1e-5 ulps, so a 6-dp micros round
    * would sit below double precision and engines' interpolation ulps
    * would show; seconds at 3 dp leaves 8 orders of headroom) — the
    * latency texture
    * behind [[transitionMatrix]]'s raw counts (where do users stall?).
    * One per-user lag window + one combinable aggregate per pair; gaps are
    * exact integer micros, so only the interpolated percentiles round.
    *
    * Output: `(from_type, to_type, n, p50_s, p90_s, max_us)` ordered.
    */
  def transitionLatency(df: DataFrame, user: String, ts: String,
      tieBreak: String, eventType: String): DataFrame = {
    val w = Window.partitionBy(col("__u")).orderBy(col("__ts"), col("__tb"))
    df.where(col(user).isNotNull && col(ts).isNotNull)
      .select(col(user).as("__u"), col(ts).as("__ts"),
        col(tieBreak).as("__tb"), col(eventType).as("__et"))
      .withColumn("__pt", lag(col("__ts"), 1).over(w))
      .withColumn("__pe", lag(col("__et"), 1).over(w))
      .where(col("__pe").isNotNull)
      .withColumn("__gap", (col("__ts") - col("__pt")).cast("double"))
      .groupBy(col("__pe").as("from_type"), col("__et").as("to_type"))
      .agg(count(lit(1)).as("n"),
        round(expr("percentile(__gap, 0.5)") / 1000000.0, 3).as("p50_s"),
        round(expr("percentile(__gap, 0.9)") / 1000000.0, 3).as("p90_s"),
        max(col("__gap")).cast("long").as("max_us"))
      .orderBy(col("from_type"), col("to_type"))
  }
}
