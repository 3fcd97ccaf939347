package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation plan shapes. Spark's partial aggregation already
  * two-phases *algebraic* aggregates (sum/count/min/max combine map-side,
  * so a hot key costs one merged row per task) — salting earns its keep on
  * the aggregates that are NOT algebraic over the raw rows, where a hot
  * key otherwise funnels all its rows through one reducer.
  */
object Skew {

  /** Salted exact count-distinct: `groupBy(key)` with
    * `count_distinct(dedup)` shuffles every (key, dedup) pair of a hot key
    * into one task. Deriving the salt FROM THE DEDUP COLUMN fixes that
    * while staying exact: equal values land in the same (key, salt) cell,
    * so per-cell distinct counts are disjoint and their per-key sum is the
    * true distinct count — phase one fans a hot key across `salts` tasks,
    * phase two merges `salts` small rows. Same result, bounded per-task
    * state at any skew.
    *
    * Output: (`key`, n_distinct, n) — `n` tags along for free as a plain
    * algebraic count.
    */
  /** Key-skew report: Gini coefficient + concentration stats of a key's
    * row-count distribution — the pre-flight check that decides whether a
    * join/aggregate on this key needs salting at all. With counts ranked
    * ascending, `gini = (2·Σ rank·c) / (k·Σc) − (k+1)/k` — every sum is an
    * exact integer, so the coefficient is one engine-stable division; 0 =
    * perfectly uniform keys, →1 = one key owns everything.
    *
    * Plan shape: one keyed count (map-side combinable), then a rank window
    * and a final aggregate over the KEYS-sized count frame, never the raw
    * rows — the window input is bounded by distinct-key cardinality
    * (profile a bucketed hash of the key first when even that frame is
    * too wide).
    *
    * Output: one row
    * `(n_keys, n_rows, max_count, top_share, gini)`.
    */
  def giniReport(df: DataFrame, key: String): DataFrame = {
    val counts = df.where(col(key).isNotNull)
      .groupBy(col(key)).agg(count(lit(1)).as("__c"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("__c"), col(key).cast("string")) // keys-sized frame
    counts.withColumn("__r", row_number().over(w).cast("long"))
      .agg(
        count(lit(1)).as("n_keys"),
        sum(col("__c")).as("n_rows"),
        max(col("__c")).as("max_count"),
        sum(col("__r") * col("__c")).as("__rc"))
      .select(col("n_keys"), col("n_rows"), col("max_count"),
        round(col("max_count") / col("n_rows"), 6).as("top_share"),
        when(col("n_keys") <= 1, lit(0.0)).otherwise(
          round((lit(2L) * col("__rc")) / (col("n_keys") * col("n_rows")) -
            (col("n_keys") + 1L) / col("n_keys").cast("double"), 6))
          .as("gini"))
  }

  def saltedDistinct(df: DataFrame, key: String, dedup: String, salts: Int): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts")
    df.select(col(key), col(dedup).as("__d"),
        pmod(hash(col(dedup)), lit(salts)).as("__salt"))
      .groupBy(col(key), col("__salt"))
      .agg(count_distinct(col("__d")).as("__nd"), count(lit(1)).as("__n"))
      .groupBy(col(key))
      .agg(sum(col("__nd")).cast("long").as("n_distinct"),
        sum(col("__n")).cast("long").as("n"))
  }

  /** Count–Min sketch accuracy audit (Cormode & Muthukrishnan 2005): build
    * the `depth × width` counter table the streaming/partial-agg world
    * would keep instead of exact per-key counts, then compare its estimate
    * against the exact count for the `topN` heaviest keys — the
    * "how much memory can we drop before the top-k report lies" tuning
    * table. The sketch is MERGEABLE by construction (counters are plain
    * sums over `(row, cell)`), so the counter build is ONE map-side-
    * combinable aggregation whose output is bounded by `depth · width`
    * cells at ANY input size — the same bounded-state contract as
    * [[graft.streaming.HeavyHitters]], in batch form.
    *
    * Everything is integer-exact and engine-portable: keys hash through the
    * md5-prefix bucket (the [[graft.operators.Dedup]] convention — works
    * for any key type via its string form), the `depth` pairwise-
    * independent hash rows are `((aᵢ·x + bᵢ) mod P) mod width` with
    * `P = 2³¹−1` and seeded aᵢ, bᵢ (products stay under 2⁶³ because
    * `x < 2³²`), and estimate = min over the key's `depth` counters —
    * BIGINTs end to end, no float anywhere. CM guarantees
    * `estimate ≥ exact`; `overcount` is the audit signal.
    *
    * Output: `(key, exact, estimate, overcount)` for the top `topN` keys by
    * `(exact DESC, key)`.
    */
  def countMinAudit(df: DataFrame, key: String, width: Int, depth: Int,
      topN: Int, seed: Long = 42L): DataFrame = {
    require(width > 1, s"width must be > 1, got $width")
    require(depth >= 1, s"depth must be >= 1, got $depth")
    require(topN > 0, s"topN must be positive, got $topN")
    val P = 2147483647L // 2^31 - 1 (Mersenne prime)
    val (as, bs) = cmHashes(depth, seed)
    val rows = df.where(col(key).isNotNull)
      .select(col(key),
        conv(substring(md5(col(key).cast("string")), 1, 8), 16, 10)
          .cast("long").as("__x"))
    def cells = array((0 until depth).map { i =>
      pmod(lit(as(i)) * col("__x") + lit(bs(i)), lit(P)) % width
    }: _*)
    val counters = rows.select(posexplode(cells).as(Seq("__row", "__cell")))
      .groupBy(col("__row"), col("__cell")).agg(count(lit(1)).as("__cnt"))
    val heavy = rows.groupBy(col(key), col("__x"))
      .agg(count(lit(1)).as("exact"))
      .orderBy(col("exact").desc, col(key))
      .limit(topN)
    heavy
      .select(col(key), col("exact"), posexplode(cells).as(Seq("__row", "__cell")))
      .join(counters, Seq("__row", "__cell"))
      .groupBy(col(key), col("exact"))
      .agg(min(col("__cnt")).as("estimate"))
      .select(col(key), col("exact"), col("estimate"),
        (col("estimate") - col("exact")).as("overcount"))
      .orderBy(col("exact").desc, col(key))
  }

  /** The seeded hash constants [[countMinAudit]] uses, for oracle mirrors. */
  private[graft] def cmHashes(depth: Int, seed: Long = 42L): (Array[Long], Array[Long]) = {
    val P = 2147483647L
    val rnd = new scala.util.Random(seed)
    val as = Array.fill(depth)(1L + (rnd.nextLong().abs % (P - 1)))
    val bs = Array.fill(depth)(rnd.nextLong().abs % P)
    (as, bs)
  }

  /** Salted shuffle join — the skew cure for a hot fact key: every LEFT row
    * scatters to one of `salts` sub-keys (deterministically, from a
    * caller-named tiebreak column so replays agree), the RIGHT side
    * replicates `salts`× (dimension-sized — the cheap side by
    * construction), and the join runs on `(key, salt)` so a key that owns
    * half the fact table spreads across `salts` reducers instead of
    * funneling through one. Result is EXACTLY the plain inner join (each
    * left row meets its right match in precisely one salt cell) — the
    * oracle checks that, not the plan.
    *
    * Prefer AQE's runtime skew-join split when sizes are discoverable;
    * this is the explicit form for when they aren't (streaming joins,
    * pre-partitioned writes, engines without AQE).
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String, salts: Int,
      tieBreak: String): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts")
    val l = left.withColumn("__salt",
      pmod(hash(col(key), col(tieBreak)), lit(salts)))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }
}
