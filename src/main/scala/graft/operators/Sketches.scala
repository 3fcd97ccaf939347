package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bounded-state sketch operators for the scans that cannot afford exact
  * state at 100 TB: a deterministic Bloom runtime filter (the semi-join
  * reduction that prunes a fact scan before it shuffles), a HyperLogLog
  * distinct-count audit, and relative-error log-bucket quantiles. Everything
  * here follows the [[Skew.countMinAudit]] portability contract: keys enter
  * through the md5-prefix integer hash, the hash family is seeded universal
  * `((a·x + b) mod P) mod m` arithmetic over BIGINTs, and every sketch is
  * MERGEABLE (bit-ors / maxes / sums over a bounded cell table), so each
  * build is one map-side-combinable aggregation with `O(sketch)` output at
  * any input size.
  */
object Sketches {

  private val P = 2147483647L // 2^31 - 1, Mersenne prime

  /** Seeded universal-hash constants, shared with the oracle mirrors. */
  private[graft] def hashConsts(k: Int, seed: Long): (Array[Long], Array[Long]) = {
    val rnd = new scala.util.Random(seed)
    val as = Array.fill(k)(1L + (rnd.nextLong().abs % (P - 1)))
    val bs = Array.fill(k)(rnd.nextLong().abs % P)
    (as, bs)
  }

  /** 32-bit integer image of any key via its md5-prefix (string form), the
    * engine-portable hash every sketch here keys on. */
  private def keyHash(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 8), 16, 10).cast("long")

  /** Build a Bloom filter over `build`'s `key` column and return its bit
    * words — the exact artifact Spark's own runtime row-level filtering
    * broadcasts (InjectRuntimeFilter), built deterministically so an
    * external engine can replay membership bit-for-bit: position `i` of key
    * `x` is `((aᵢ·x + bᵢ) mod P) mod mBits` with seeded aᵢ, bᵢ.
    *
    * Plan shape: distinct build keys → `kHashes` positions each → one
    * bit_or aggregation over `mBits / 64` words. The driver collect is the
    * WORD TABLE, not data — `mBits = 2²⁰` is 16 Ki longs (128 KiB),
    * control-plane-sized by construction, the same bounded-collect contract
    * as a broadcast-join build side.
    */
  def bloomBuild(build: DataFrame, key: String, mBits: Int, kHashes: Int,
      seed: Long = 42L): Array[Long] = {
    require(mBits >= 64 && mBits % 64 == 0, s"mBits must be a positive multiple of 64, got $mBits")
    require(kHashes >= 1, s"kHashes must be >= 1, got $kHashes")
    val (as, bs) = hashConsts(kHashes, seed)
    val positions = array((0 until kHashes).map { i =>
      pmod(lit(as(i)) * col("__x") + lit(bs(i)), lit(P)) % mBits
    }: _*)
    val words = build.where(col(key).isNotNull)
      .select(keyHash(col(key)).as("__x")).distinct()
      .select(explode(positions).as("__pos")).distinct()
      .groupBy((col("__pos") / 64).cast("long").as("__w"))
      .agg(bit_or(call_function("shiftleft", lit(1L),
        (col("__pos") % 64).cast("int"))).as("__bits"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    Array.tabulate(mBits / 64)(w => words.getOrElse(w.toLong, 0L))
  }

  /** The probe-side membership predicate for a [[bloomBuild]] filter: pure
    * codegen'd bit arithmetic against the broadcast word array (no UDF, no
    * join, no shuffle) — `AND` over the key's `kHashes` bit probes.
    * Arithmetic-shift pitfalls avoided via `shiftrightunsigned` (bit 63 of
    * a word is a sign bit in Java longs).
    */
  def bloomMightContain(key: Column, words: Array[Long], kHashes: Int,
      seed: Long = 42L): Column = {
    val mBits = words.length * 64
    val (as, bs) = hashConsts(kHashes, seed)
    val wordsCol = lit(words)
    val x = keyHash(key)
    (0 until kHashes).map { i =>
      val pos = pmod(lit(as(i)) * x + lit(bs(i)), lit(P)) % mBits
      val word = element_at(wordsCol, (pos / 64).cast("int") + 1)
      call_function("shiftrightunsigned", word, (pos % 64).cast("int"))
        .bitwiseAND(1L) === 1L
    }.reduce(_ && _)
  }

  /** Prune `probe` to the rows whose `probeKey` might appear in
    * `build.buildKey` — the semi-join reduction a 100 TB fact scan wants
    * BEFORE its shuffle: the build side collapses to `mBits` bits on the
    * driver and the probe side is filtered by a map-only broadcast
    * predicate, so rows that cannot join never enter the exchange. False
    * positives pass (by design — the join after the filter stays correct),
    * false negatives cannot happen.
    */
  def bloomSemiJoin(probe: DataFrame, build: DataFrame, probeKey: String,
      buildKey: String, mBits: Int = 1 << 20, kHashes: Int = 3,
      seed: Long = 42L): DataFrame = {
    val words = bloomBuild(build, buildKey, mBits, kHashes, seed)
    probe.where(col(probeKey).isNotNull &&
      bloomMightContain(col(probeKey), words, kHashes, seed))
  }

  /** Bloom pruning audit: how many probe rows the filter passes vs how many
    * truly join — the "is `mBits` big enough" tuning row. `fp_rate` is
    * false positives over the rows the filter was ALLOWED to drop
    * (non-matching rows), the standard Bloom error definition.
    *
    * Output: one row `(n_probe, n_pass, n_match, n_false_pos, fp_rate)`.
    */
  def bloomAudit(probe: DataFrame, build: DataFrame, probeKey: String,
      buildKey: String, mBits: Int, kHashes: Int, seed: Long = 42L): DataFrame = {
    val words = bloomBuild(build, buildKey, mBits, kHashes, seed)
    val keys = build.where(col(buildKey).isNotNull)
      .select(col(buildKey).as("__bk")).distinct()
    probe.where(col(probeKey).isNotNull)
      .withColumn("__pass",
        when(bloomMightContain(col(probeKey), words, kHashes, seed), 1L).otherwise(0L))
      .join(broadcast(keys.withColumn("__m", lit(1L))),
        col(probeKey) === col("__bk"), "left")
      .agg(
        count(lit(1)).as("n_probe"),
        sum(col("__pass")).as("n_pass"),
        sum(coalesce(col("__m"), lit(0L))).as("n_match"))
      .select(col("n_probe"), col("n_pass"), col("n_match"),
        (col("n_pass") - col("n_match")).as("n_false_pos"),
        when(col("n_probe") === col("n_match"), lit(0.0)).otherwise(
          round((col("n_pass") - col("n_match")) /
            (col("n_probe") - col("n_match")).cast("double"), 6)).as("fp_rate"))
  }


  /** The HLL bias-corrected estimate from a group's scaled harmonic sum
    * `s` (present-register BIGINT 2^(restBits+1−M) contributions) and
    * present register count `nb` — shared by every HLL face so the
    * arithmetic is ONE expression tree everywhere (audit, sliding merge,
    * overlap).
    *
    * The scale is 2^(restBits+1), NOT 2^restBits: register ranks run to
    * restBits+1 (an all-zero rest field), and at the smaller scale the
    * saturated register's term would be `shiftleft(1L, -1)` — Java shifts
    * reduce the distance mod 64, so that is `1L << 63 = Long.MIN_VALUE`, a
    * sign-flipped harmonic sum. At 2^(restBits+1) the max-rank register
    * contributes exactly 2^0 = 1 and every term stays a positive BIGINT
    * power of two. Doubling both the contributions and the numerator
    * constant is an exact power-of-two rescale, so non-saturated estimates
    * are bit-identical to the old scale.
    */
  private def hllEstimate(s: Column, nb: Column, p: Int): Column = {
    val m = 1 << p
    val scale = 1L << (32 - p + 1)
    val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / m)
    val sFull = s + (lit(m.toLong) - nb) * scale
    val zeros = lit(m.toLong) - nb
    val rawEst = alpha * m.toDouble * m.toDouble * scale.toDouble / sFull.cast("double")
    when(rawEst <= 2.5 * m && zeros > 0L,
      lit(m.toDouble) * log(lit(m.toDouble) / zeros.cast("double")))
      .otherwise(rawEst)
  }

  /** HyperLogLog distinct-count audit (Flajolet et al. 2007): per group,
    * the `m = 2^p` max-rank registers a mergeable cardinality sketch would
    * keep instead of an exact distinct set, the standard bias-corrected
    * estimate, and the exact count next to it — the "what does
    * approx_count_distinct actually cost in accuracy on OUR keys" table.
    *
    * Portability: the key's 32-bit md5-prefix splits into `p` bucket bits
    * (top) and `32 − p` rank bits; `rank = (32 − p) + 1 − msb(rest)` with
    * `msb` via the engines' shared `length(bin(x))`, so registers are
    * identical integers everywhere. The harmonic sum is kept EXACT by
    * scaling to `2^(32−p+1−M)` BIGINTs (no float summation-order hazard);
    * only the final one-expression estimate is floating point. Linear
    * counting takes over below `2.5·m` when empty registers remain
    * (the standard small-range correction).
    *
    * Plan shape: one map-side-combinable `max` over `(group, bucket)` —
    * ≤ `m` rows per group out of any input size — then a group-sized
    * aggregate. Output: `(group, n_exact, n_est, rel_err)`.
    */
  def hllAudit(df: DataFrame, group: String, key: String, p: Int = 8): DataFrame = {
    require(p >= 4 && p <= 16, s"p must be in [4,16], got $p")
    val m = 1 << p
    val restBits = 32 - p
    val restMod = 1L << restBits
    val base = df.where(col(key).isNotNull && col(group).isNotNull)
      .select(col(group).as("__g"), col(key).as("__k"), keyHash(col(key)).as("__x"))
    val rest = col("__x") % restMod
    val regs = base
      .select(col("__g"), (col("__x") / restMod).cast("long").as("__b"),
        when(rest === 0L, lit(restBits + 1))
          .otherwise(lit(restBits + 1) - length(bin(rest))).cast("long").as("__r"))
      .groupBy(col("__g"), col("__b")).agg(max(col("__r")).as("__m"))
    // exact scaled harmonic sum: present buckets contribute 2^(restBits+1-M)
    // (1 for a saturated register), absent buckets 2^(restBits+1) — all
    // positive BIGINT powers of two
    val perGroup = regs.groupBy(col("__g")).agg(
      sum(call_function("shiftleft", lit(1L),
        (lit(restBits + 1) - col("__m")).cast("int"))).as("__s"),
      count(lit(1)).as("__nb"))
    val est = hllEstimate(col("__s"), col("__nb"), p)
    val exact = base.groupBy(col("__g")).agg(count_distinct(col("__k")).as("n_exact"))
    perGroup.join(exact, Seq("__g"))
      .select(col("__g").as(group), col("n_exact"),
        round(est, 4).as("n_est"),
        round(abs(est - col("n_exact")) / col("n_exact"), 4).as("rel_err"))
  }

  /** Sliding-window distinct counts by MERGING daily HyperLogLog registers
    * — the operation that justifies keeping sketches at all: a 7-day
    * distinct-users series needs only `max` over 7 register tables
    * (register merge IS the sketch union), never a 7-day rescan of raw
    * rows. At 100 TB the daily register build is the only full pass; every
    * window after that is arithmetic over `windowDays · m` rows per day.
    *
    * Same hash/bucket/rank/estimate contract as [[hllAudit]]; the exact
    * count rides along for the audit (computed here by the 7-way re-scan
    * the sketch makes unnecessary). Output:
    * `(day, n_exact, n_est, rel_err)` for every day with a full or partial
    * trailing window.
    */
  def hllSlidingDistinct(df: DataFrame, ts: String, key: String,
      windowDays: Int, p: Int = 8): DataFrame = {
    require(p >= 4 && p <= 16, s"p must be in [4,16], got $p")
    require(windowDays >= 1, s"windowDays must be >= 1, got $windowDays")
    val m = 1 << p
    val restBits = 32 - p
    val restMod = 1L << restBits
    val dayUs = 86400000000L
    val base = df.where(col(key).isNotNull && col(ts).isNotNull)
      .select(col(key).as("__k"), col(ts).cast("long").as("__t"),
        keyHash(col(key)).as("__x"))
      .withColumn("__day", expr(s"__t DIV ${dayUs}L"))
    val rest = col("__x") % restMod
    // daily registers: the bounded artifact a production pipeline persists
    val daily = base
      .select(col("__day"), (col("__x") / restMod).cast("long").as("__b"),
        when(rest === 0L, lit(restBits + 1))
          .otherwise(lit(restBits + 1) - length(bin(rest))).cast("long").as("__r"))
      .groupBy(col("__day"), col("__b")).agg(max(col("__r")).as("__m"))
    // window merge: each day's registers cover days day..day+windowDays-1,
    // union-by-max per (window-end-day, bucket)
    val merged = daily
      .select(explode(sequence(col("__day"),
        col("__day") + lit(windowDays - 1L))).as("__w"), col("__b"), col("__m"))
      .groupBy(col("__w"), col("__b")).agg(max(col("__m")).as("__m"))
    val perDay = merged.groupBy(col("__w")).agg(
      sum(call_function("shiftleft", lit(1L),
        (lit(restBits + 1) - col("__m")).cast("int"))).as("__s"),
      count(lit(1)).as("__nb"))
    val est = hllEstimate(col("__s"), col("__nb"), p)
    // the exact twin: the multi-day distinct re-scan the sketch replaces
    val exact = base.select(col("__k"), col("__day")).distinct()
      .select(col("__k"), explode(sequence(col("__day"),
        col("__day") + lit(windowDays - 1L))).as("__w"))
      .groupBy(col("__w")).agg(count_distinct(col("__k")).as("n_exact"))
    perDay.join(exact, Seq("__w"))
      .select(col("__w").as("day"), col("n_exact"),
        round(est, 4).as("n_est"),
        round(abs(est - col("n_exact")) / col("n_exact"), 4).as("rel_err"))
  }

  /** Relative-error quantiles from a log₂-bucket histogram (the
    * HdrHistogram/DDSketch idea with base-2 buckets): per group, count
    * positive integer values into `msb` buckets — a BOUNDED (≤ 64 cells),
    * mergeable, one-pass aggregate — then read each requested quantile as
    * its bucket's upper bound `2^b − 1`, guaranteed within one power of two
    * of the true value. The exact rank-statistic (`⌈q·n⌉`-th smallest)
    * rides along for the accuracy audit, computed over a window only at
    * THIS report's scale — at 100 TB you keep the histogram and drop the
    * exact column.
    *
    * Output: `(group, q, n, est_hi, exact)` per requested quantile.
    */
  def hdrQuantiles(df: DataFrame, group: String, value: String,
      qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty, "qs must be non-empty")
    val spark = df.sparkSession
    val base = df
      .where(col(group).isNotNull && col(value).isNotNull && col(value) > 0)
      .select(col(group).as("__g"), col(value).cast("long").as("__v"))
      .where(col("__v") > 0L)
    val hist = base
      .groupBy(col("__g"), length(bin(col("__v"))).cast("long").as("__b"))
      .agg(count(lit(1)).as("__c"))
    val qDf = spark.createDataFrame(qs.map(Tuple1(_))).toDF("q")
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__g")).orderBy(col("__b"))
    val cum = hist
      .withColumn("__cum", sum(col("__c")).over(wCum))
      .withColumn("__n", sum(col("__c")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("__g"))))
    val est = cum.join(broadcast(qDf), col("__cum") >= ceil(col("q") * col("__n")))
      .groupBy(col("__g"), col("q"), col("__n"))
      .agg(min(col("__b")).as("__bq"))
      .select(col("__g"), col("q"), col("__n").as("n"),
        (call_function("shiftleft", lit(1L), col("__bq").cast("int")) - 1L)
          .as("est_hi"))
    val wRank = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__g")).orderBy(col("__v"))
    val ranked = base.withColumn("__rn", row_number().over(wRank))
    // exact q-th smallest: join ranks to ⌈q·n⌉ per group
    val nPer = base.groupBy(col("__g")).agg(count(lit(1)).as("__nn"))
    val want = nPer.crossJoin(broadcast(qDf))
      .select(col("__g"), col("q"), ceil(col("q") * col("__nn")).cast("int").as("__rn"))
    val exactQ = ranked.join(broadcast(want), Seq("__g", "__rn"))
      .select(col("__g"), col("q"), col("__v").as("exact"))
    est.join(exactQ, Seq("__g", "q"))
      .select(col("__g").as(group), col("q"), col("n"), col("est_hi"), col("exact"))
  }

  /** Audience overlap by HLL inclusion–exclusion: for every pair of groups,
    * `|A ∩ B| ≈ est(A) + est(B) − est(A ∪ B)` where the union estimate
    * comes from MERGING the two register sets (bucket-wise max — sketch
    * union is exact on registers). This is the operation that makes
    * per-segment sketches composable: overlap between any two of `k`
    * segments from `k` stored register tables, no re-scan, no pairwise
    * distinct join over raw rows. The exact intersection rides along for
    * the audit (computed here by the raw self-join the sketch replaces).
    * Intersection estimates inherit the union's error and can go negative
    * on tiny overlaps — reported as-is, that's the audit signal.
    *
    * Output: `(group_a, group_b, n_exact, n_est)` per pair, ordered.
    */
  def hllOverlap(df: DataFrame, group: String, key: String, p: Int = 8): DataFrame = {
    require(p >= 4 && p <= 16, s"p must be in [4,16], got $p")
    val restBits = 32 - p
    val restMod = 1L << restBits
    val base = df.where(col(key).isNotNull && col(group).isNotNull)
      .select(col(group).as("__g"), col(key).as("__k"), keyHash(col(key)).as("__x"))
    val rest = col("__x") % restMod
    val regs = base
      .select(col("__g"), (col("__x") / restMod).cast("long").as("__b"),
        when(rest === 0L, lit(restBits + 1))
          .otherwise(lit(restBits + 1) - length(bin(rest))).cast("long").as("__r"))
      .groupBy(col("__g"), col("__b")).agg(max(col("__r")).as("__m"))
    def harmonic(r: DataFrame, keys: Seq[String]) =
      r.groupBy(keys.map(col): _*).agg(
        sum(call_function("shiftleft", lit(1L),
          (lit(restBits + 1) - col("__m")).cast("int"))).as("__s"),
        count(lit(1)).as("__nb"))
    val groups = regs.select(col("__g")).distinct()
    val pairs = groups.select(col("__g").as("ga"))
      .join(groups.select(col("__g").as("gb")), col("ga") < col("gb"))
    // union registers per pair: every group's registers attach to each pair
    // they belong to, then bucket-wise max
    val unionRegs = regs
      .join(broadcast(pairs), col("__g") === col("ga") || col("__g") === col("gb"))
      .groupBy(col("ga"), col("gb"), col("__b")).agg(max(col("__m")).as("__m"))
    val estU = harmonic(unionRegs, Seq("ga", "gb"))
      .select(col("ga"), col("gb"), hllEstimate(col("__s"), col("__nb"), p).as("__eu"))
    val perG = harmonic(regs, Seq("__g"))
      .select(col("__g"), hllEstimate(col("__s"), col("__nb"), p).as("__e"))
    val exact = base.select(col("__g"), col("__k")).distinct()
    val exactPair = exact.select(col("__g").as("ga"), col("__k"))
      .join(exact.select(col("__g").as("gb"), col("__k")), Seq("__k"))
      .where(col("ga") < col("gb"))
      .groupBy(col("ga"), col("gb")).agg(count_distinct(col("__k")).as("n_exact"))
    estU
      .join(perG.select(col("__g").as("ga"), col("__e").as("__ea")), Seq("ga"))
      .join(perG.select(col("__g").as("gb"), col("__e").as("__eb")), Seq("gb"))
      .join(exactPair, Seq("ga", "gb"), "left")
      .select(col("ga").as("group_a"), col("gb").as("group_b"),
        coalesce(col("n_exact"), lit(0L)).as("n_exact"),
        round(col("__ea") + col("__eb") - col("__eu"), 4).as("n_est"))
      .orderBy(col("group_a"), col("group_b"))
  }
}
