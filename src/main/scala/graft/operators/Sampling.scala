package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling and splitting for training-data pipelines:
  * train/val/test assignment, per-stratum downsampling, per-group caps.
  *
  * Everything keys off [[hashBucket]] — a pure column expression over the
  * row's own id — so membership is reproducible across runs, engines and
  * cluster sizes (unlike `df.sample`, whose outcome depends on partitioning),
  * re-derivable for any single row without scanning the corpus, and free of
  * coordination: the 100 TB plan is a map-only filter with no shuffle at all
  * for splits/sampling, and a single key-partitioned window for caps.
  */
object Sampling {

  /** Deterministic hash bucket in `[0, buckets)`: the first 8 hex chars of
    * `md5(salt || id)` as an integer (the same engine-portable md5-prefix
    * trick as [[Dedup.shingleHash]] — reproducible by any SQL oracle, unlike
    * engine-specific hash functions). Change `salt` to draw an independent
    * assignment; 2^32 ≫ buckets keeps the modulo bias negligible.
    */
  def hashBucket(id: Column, salt: String, buckets: Long): Column =
    Dedup.shingleHash(concat(lit(salt), id.cast("string"))) % buckets

  /** Train/validation/test assignment by hash bucket out of 100:
    * `[0, trainPct)` → train, `[trainPct, trainPct+valPct)` → val, rest →
    * test. Adding documents later never moves an existing document between
    * splits — the property that keeps eval sets stable as a corpus grows.
    */
  def splitAssign(df: DataFrame, id: String, salt: String = "graft",
      trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    require(trainPct >= 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"split percentages must fit in 100, got train=$trainPct val=$valPct")
    val b = hashBucket(col(id), salt, 100L)
    df.withColumn("split",
      when(b < trainPct, lit("train"))
        .when(b < trainPct + valPct, lit("val"))
        .otherwise(lit("test")))
  }

  /** Per-stratum deterministic downsampling: keep a `rates(stratum)` (or
    * `defaultRate`) fraction of each stratum's rows. Thresholds are resolved
    * to integer buckets-per-million ON THE DRIVER (`math.floor(r * 1e6)`) so
    * the plan compares integers — no float-rounding divergence between
    * engines at the cut line. Map-only: no shuffle, no state.
    */
  def sampleStratified(df: DataFrame, id: String, stratum: String,
      rates: Map[String, Double], defaultRate: Double,
      salt: String = "graft"): DataFrame = {
    def perMillion(r: Double): Long = {
      require(r >= 0.0 && r <= 1.0, s"rate must be in [0,1], got $r")
      // round, not floor: 0.3 * 1e6 is 299999.99999999994 in binary — floor
      // would silently shave one bucket off every rate that isn't exactly
      // representable; round is exact for rates with <= 6 decimal digits
      math.round(r * 1e6)
    }
    val threshold = rates.foldLeft(lit(perMillion(defaultRate))) {
      case (acc, (k, r)) => when(col(stratum) === k, lit(perMillion(r))).otherwise(acc)
    }
    df.where(hashBucket(col(id), salt, 1000000L) < threshold)
  }

  /** Keep at most `cap` rows per group, chosen by deterministic hash order
    * (the per-domain cap of web-scale pipelines: no single source may
    * dominate the corpus). One shuffle on the group key; a skewed giant
    * group costs its row count in one task's sort but emits only `cap` rows.
    * The hash order makes the kept subset a stable "random" draw — sorting
    * by id alone would always keep each domain's oldest pages.
    */
  def perGroupCap(df: DataFrame, id: String, group: String, cap: Int,
      salt: String = "graft"): DataFrame = {
    val w = Window.partitionBy(col(group))
      .orderBy(hashBucket(col(id), salt, 1L << 30), col(id))
    df.withColumn("cap_rank", row_number().over(w).cast("long"))
      .where(col("cap_rank") <= cap)
  }

  /** Token-budget corpus mixing — the "N tokens per source" step of
    * pretraining mixture recipes (the per-source row-count cousin of
    * [[perGroupCap]], weighted by a token column instead of 1): keep each
    * group's rows, in the same deterministic hash order, until the group's
    * cumulative token count reaches `budget`. The row that CROSSES the
    * budget is kept (a soft cap: mixtures say "about N tokens", and
    * truncating that document is a downstream concern), everything after it
    * is dropped — so a group whose first draw already exceeds the budget
    * still contributes that one row. Cost shape identical to perGroupCap:
    * one shuffle on the group key, one bounded per-group running sum.
    */
  def perGroupTokenCap(df: DataFrame, id: String, group: String,
      tokens: Column, budget: Long, salt: String = "graft"): DataFrame = {
    val w = Window.partitionBy(col(group))
      .orderBy(hashBucket(col(id), salt, 1L << 30), col(id))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("cum_tokens", sum(tokens).over(w).cast("long"))
      .where(col("cum_tokens") - tokens.cast("long") < budget)
  }

  /** Sequence packing for pretraining: concatenate documents (in a
    * deterministic hash-shuffled order) and chunk the stream into
    * `seqLen`-token context windows — each doc lands in shard `shard`,
    * window `bin`, starting `offset` tokens into it. This is the
    * concat-and-chunk packing of GPT-style pipelines: bins are filled
    * exactly (a doc crossing a boundary spills into the next window), so
    * there is no per-bin loop and no sequential state — one shuffle on the
    * shard key, one per-shard running sum.
    *
    * Shards bound the sort: each shard's documents are one task's
    * `Window partitionBy` sort, so pick `shards` ≈ the cluster's task count
    * at 100 TB. The hash order also *is* the training shuffle — downstream
    * readers consume (shard, bin) in order and get a reproducible,
    * well-mixed epoch without a separate global sort.
    */
  /** Stratified k-fold cross-validation report: deterministic hash-bucket
    * fold assignment (the [[splitAssign]] stability property — new rows
    * never move old ones between folds) plus the per-(fold, label) balance
    * table that says whether the folds are usable as-is or need
    * class-stratified resampling. Map-only assignment + ONE combinable
    * aggregate; `share` is each label's fraction WITHIN its fold.
    */
  def cvFoldReport(df: DataFrame, id: String, label: String, k: Int,
      salt: String = "graft"): DataFrame = {
    require(k >= 2, s"k must be >= 2 folds, got $k")
    val counts = df.where(col(label).isNotNull)
      .select(hashBucket(col(id), salt, k.toLong).as("fold"),
        col(label).cast("long").as("label"))
      .groupBy(col("fold"), col("label"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("fold")) // labels-sized frame per fold
    counts
      .withColumn("share", round(col("n") / sum(col("n")).over(w), 6))
      .select(col("fold"), col("label"), col("n"), col("share"))
  }

  /** Rendezvous (highest-random-weight) shard assignment: each key goes to
    * the shard whose `md5(key + ":" + shard)` is LARGEST — the consistent-
    * hashing scheme whose defining property is minimal movement: adding a
    * shard moves only ~1/(n+1) of the keys (modulo sharding moves almost
    * all of them). Map-only; the argmax is one `greatest` over
    * fixed-length `"hash:shard"` strings, so the comparison (hash first,
    * shard name as tie-break) is pure lexicographic and engine-identical.
    */
  def rendezvousShard(df: DataFrame, id: String, shards: Seq[String],
      outCol: String = "shard"): DataFrame = {
    require(shards.nonEmpty, "need at least one shard")
    require(shards.forall(_.nonEmpty), "shard names must be non-empty")
    val tagged = shards.map(s =>
      concat(md5(concat(col(id).cast("string"), lit(":" + s))), lit("|" + s)))
    val top = if (tagged.length == 1) tagged.head else greatest(tagged: _*)
    df.withColumn(outCol, substring(top, 34, 1000000))
  }

  /** Packing-efficiency sweep: for each candidate `seqLen`, how many
    * training sequences the corpus yields and what fraction of their token
    * slots is real text, under the two standard layouts — concat-and-chunk
    * ([[packSequences]]'s rule: waste only at the tail) and pad-per-document
    * (every doc rounded up to whole sequences). The gap between the two
    * `fill` columns is the token budget document-isolation costs at that
    * length — the table a pretraining config review actually wants.
    *
    * ONE map-side-combinable aggregate for ALL lengths (one conditional sum
    * per candidate); the per-length rows explode from the single result
    * row. Pure integer ceilings; fills are single divisions of exact longs.
    */
  def packingEfficiency(df: DataFrame, tokenCount: Column, seqLens: Seq[Int]): DataFrame = {
    require(seqLens.nonEmpty, "need at least one candidate seqLen")
    require(seqLens.forall(_ > 0), s"seqLens must be positive, got $seqLens")
    val base = df.select(tokenCount.cast("long").as("__t")).where(col("__t").isNotNull)
    val aggCols =
      Seq(count(lit(1)).as("n_docs"), sum(col("__t")).as("total_tokens")) ++
        seqLens.map(l => sum(expr(s"(__t + ${l - 1}) div $l")).as(s"__pad$l"))
    val one = base.agg(aggCols.head, aggCols.tail: _*)
    val structs = array(seqLens.map { l =>
      struct(
        lit(l).cast("long").as("seq_len"),
        expr(s"(total_tokens + ${l - 1}) div $l").as("packed_seqs"),
        col(s"__pad$l").as("padded_seqs"))
    }: _*)
    one.select(col("n_docs"), col("total_tokens"), explode(structs).as("__s"))
      .select(col("__s.seq_len").as("seq_len"), col("n_docs"), col("total_tokens"),
        col("__s.packed_seqs").as("packed_seqs"), col("__s.padded_seqs").as("padded_seqs"))
      .select(col("seq_len"), col("n_docs"), col("total_tokens"),
        col("packed_seqs"), col("padded_seqs"),
        when(col("packed_seqs") === 0, lit(null))
          .otherwise(round(col("total_tokens") / (col("packed_seqs") * col("seq_len")), 6))
          .as("packed_fill"),
        when(col("padded_seqs") === 0, lit(null))
          .otherwise(round(col("total_tokens") / (col("padded_seqs") * col("seq_len")), 6))
          .as("padded_fill"))
  }

  def packSequences(df: DataFrame, id: String, tokenCount: Column,
      seqLen: Int, shards: Int, salt: String = "graft"): DataFrame = {
    require(seqLen > 0 && shards > 0, s"seqLen and shards must be positive")
    val w = Window.partitionBy(col("shard"))
      .orderBy(hashBucket(col(id), salt, 1L << 30), col(id))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("shard", hashBucket(col(id), salt, shards.toLong))
      .withColumn("n_tokens", tokenCount.cast("long"))
      .withColumn("__cum_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(
        col(id), col("shard"), col("n_tokens"),
        // floor, not a bare cast: the oracle mirrors with floor() because
        // DuckDB's double->bigint CAST rounds where Spark's truncates
        floor(col("__cum_before") / seqLen).as("bin"),
        // "tok_offset", not "offset": OFFSET is reserved in most SQL engines
        (col("__cum_before") % seqLen).as("tok_offset"))
  }

  /** Temperature-scaled mixture weights — the multilingual/multi-source
    * sampling formula of mT5/XLM-R: source `g`'s draw probability is
    * `n_tokens(g)^alpha / Σ_h n_tokens(h)^alpha`. `alpha = 1` reproduces
    * natural proportions, `alpha → 0` flattens toward uniform; the usual
    * training settings live in between (0.3–0.7), boosting low-resource
    * sources without drowning the head. `target_tokens` spends
    * `budgetTokens` according to those weights — the per-epoch quota a
    * downstream sampler (e.g. [[perGroupTokenCap]]) enforces.
    *
    * Scale shape: ONE map-side-combinable aggregation over the corpus to
    * a groups-sized table, then a 1-row total broadcast back over it —
    * the corpus is read once and never shuffled (null token counts — null
    * text — drop out of the sums on both engines). Weights and targets
    * are rounded (6 / 3 places) for cross-engine double hygiene.
    */
  def mixtureWeights(df: DataFrame, group: String, tokenCount: Column,
      alpha: Double, budgetTokens: Long): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0, 1], got $alpha")
    val per = df.groupBy(col(group))
      .agg(count(lit(1)).as("n_docs"), sum(tokenCount).cast("long").as("n_tokens"))
    val tot = per.agg(sum(pow(col("n_tokens"), alpha)).as("__z"))
    per.crossJoin(broadcast(tot))
      .select(
        col(group), col("n_docs"), col("n_tokens"),
        round(pow(col("n_tokens"), alpha) / col("__z"), 6).as("weight"),
        round(pow(col("n_tokens"), alpha) / col("__z") * budgetTokens, 3)
          .as("target_tokens"))
  }

  /** Per-group Pareto front (skyline) over two quality axes — the
    * multi-criteria selection cut ("show me the docs where nothing else is
    * both longer AND higher-quality"): a row survives iff NO other row of
    * its group is strictly greater in BOTH `x` and `y`. The front is what
    * a curation review actually looks at — every point below it is
    * improved on in both axes by something else in the same source.
    *
    * Windowed rewrite of the quadratic EXISTS: rank `y` descending
    * (`dense_rank`, so ties share a rank), then the running max of `x`
    * over STRICTLY-higher-`y` rows (a `RANGE … 1 PRECEDING` frame on the
    * rank) is the only number dominance needs — a row is dominated iff
    * that max strictly exceeds its own `x`. Two key-partitioned windows,
    * no self-join, no n² pair frame; both windows sort the same
    * partitioning, so it's ONE shuffle on the group key.
    */
  def paretoFront(df: DataFrame, group: String, x: String, y: String): DataFrame = {
    val base = df.where(col(x).isNotNull && col(y).isNotNull)
    val wr = Window.partitionBy(col(group)).orderBy(col(y).desc)
    val wm = Window.partitionBy(col(group)).orderBy(col("__yr"))
      .rangeBetween(Window.unboundedPreceding, -1)
    base
      .withColumn("__yr", dense_rank().over(wr))
      .withColumn("__mx", max(col(x)).over(wm))
      .where(col("__mx").isNull || col("__mx") <= col(x))
      .drop("__yr", "__mx")
  }

  /** UniMax-style water-filling budget allocation: spread `budgetTokens`
    * as uniformly as possible across sources, capping every source at
    * `maxEpochs` passes over its own data (`cap = n_tokens · maxEpochs`) —
    * the UniMax recipe (Chung et al., 2023) that replaces temperature
    * sampling's hand-tuned alpha with an explicit repeat ceiling, so small
    * sources stop being over-sampled into memorization.
    *
    * Closed form instead of the paper's iterative loop: sort sources by
    * capacity ascending; a source is budget-CONSTRAINED (gets its full
    * cap) iff its cap is at most the budget remaining when its turn comes,
    * split over the sources left — `cap_i · (m−i+1) <= B − Σ_{j<i} cap_j`.
    * That predicate is monotone along the ascending sort (if a source
    * can't be filled, no larger one can), so the constrained set is a
    * prefix and one window pass decides every source; the unconstrained
    * rest share the leftover equally. All of it is exact long arithmetic
    * until the one final share division.
    *
    * Output: `(source, n_docs, n_tokens, cap, alloc_tokens, epochs)` with
    * `alloc` rounded to 3, `epochs = alloc / n_tokens` to 6.
    *
    * Scale shape: ONE map-side-combinable corpus aggregation to a
    * groups-sized table, which then packs into a SINGLE row — sort, prefix
    * sums, the constrained-prefix election, and the leftover share all run
    * as array expressions on that one row (`aggregate`/`transform`/
    * `zip_with`), then explode back out. No global windows, no totals
    * cross join: the control-plane math is one projection, and the corpus
    * itself is never shuffled. The O(m²) prefix-sum slice is over the
    * SOURCES list (m = distinct sources), never data.
    */
  def unimaxAllocate(df: DataFrame, group: String, tokenCount: Column,
      budgetTokens: Long, maxEpochs: Long): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be positive, got $budgetTokens")
    require(maxEpochs > 0, s"maxEpochs must be positive, got $maxEpochs")
    val per = df.groupBy(col(group))
      .agg(count(lit(1)).as("n_docs"), sum(tokenCount).cast("long").as("n_tokens"))
      .withColumn("cap", col("n_tokens") * maxEpochs)
    // struct field order (cap, g) makes array_sort reproduce the
    // (cap ASC, group ASC) election order of the closed form
    per
      .agg(array_sort(collect_list(struct(
        col("cap"), col(group).as("g"), col("n_docs"), col("n_tokens")))).as("xs"))
      .withColumn("flags", expr(
        s"""transform(xs, (x, i) -> x.cap * (size(xs) - i) <=
           |  ${budgetTokens}L -
           |  (aggregate(slice(xs, 1, i + 1), 0L, (a, y) -> a + y.cap) - x.cap))""".stripMargin))
      .withColumn("ccap", expr(
        "aggregate(zip_with(xs, flags, (x, f) -> IF(f, x.cap, 0L)), 0L, (a, v) -> a + v)"))
      .withColumn("nu", expr("aggregate(flags, 0L, (a, f) -> a + IF(f, 0L, 1L))"))
      .select(col("flags"), col("ccap"), col("nu"), posexplode(col("xs")).as(Seq("i", "x")))
      .withColumn("__alloc",
        when(expr("flags[i]"), col("x.cap").cast("double"))
          .otherwise((lit(budgetTokens) - col("ccap")).cast("double") / col("nu")))
      .select(col("x.g").as(group), col("x.n_docs").as("n_docs"),
        col("x.n_tokens").as("n_tokens"), col("x.cap").as("cap"),
        round(col("__alloc"), 3).as("alloc_tokens"),
        round(col("__alloc") / col("x.n_tokens"), 6).as("epochs"))
  }

  /** Weight-proportional Bernoulli sampling — the soft quality filter
    * (DCLM-style) that keeps a document with probability proportional to a
    * per-row weight (quality score, recency, source trust): `P(keep) =
    * w / max(w)`. Deterministic and replay-stable like [[splitAssign]]: the
    * coin is the md5 hash bucket of the id, so re-running the pipeline (or
    * adding documents) never flips an existing decision, and any SQL engine
    * reproduces the draw. The max-weight normalizer is a 1-row broadcast;
    * the filter itself is map-only (integer bucket < double threshold — an
    * exact comparison, both engines promote identically). Null or
    * non-positive weights never pass (their threshold is not > the
    * non-negative bucket).
    */
  def weightedSample(df: DataFrame, id: String, weight: String,
      salt: String = "graft"): DataFrame = {
    // normalizer over POSITIVE weights only: with an all-negative column the
    // max is negative too and w/__wmax turns positive (neg/neg), which would
    // pass every row the contract says must never pass
    val mx = df.where(col(weight).cast("double") > 0.0)
      .agg(max(col(weight).cast("double")).as("__wmax"))
    df.crossJoin(broadcast(mx))
      .where(col(weight).cast("double") > 0.0 &&
        hashBucket(col(id), salt, 1000000L) <
          col(weight).cast("double") / col("__wmax") * 1000000.0)
      .drop("__wmax")
  }

  /** Purged temporal split (the finance-ML "embargo" split): train on
    * everything before `tSplit − embargo`, test on everything from
    * `tSplit` on, and DISCARD the embargo band in between — the band
    * absorbs leakage from any feature computed over trailing windows
    * (a rolling 7-day mean at the last train row would otherwise read
    * test-period rows). A plain hash split ([[splitAssign]]) is the right
    * tool for i.i.d. documents; time-coupled data needs this one.
    *
    * Map-only assignment; the output also carries each split's row count
    * and time range so the leakage audit (`train_max < embargo window <
    * test_min`) is one glance.
    *
    * Output: `(split, n, t_min_us, t_max_us)` for train/embargo/test.
    */
  def purgedTemporalSplit(df: DataFrame, ts: String, tSplit: Long,
      embargoUs: Long): DataFrame = {
    require(embargoUs >= 0, s"embargoUs must be >= 0, got $embargoUs")
    df.where(col(ts).isNotNull)
      .select(
        when(col(ts) < tSplit - embargoUs, "train")
          .when(col(ts) >= tSplit, "test")
          .otherwise("embargo").as("split"),
        col(ts).cast("long").as("__t"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n"), min(col("__t")).as("t_min_us"),
        max(col("__t")).as("t_max_us"))
      .orderBy(col("split"))
  }

  /** Curriculum schedule: assign every row to one of `stages` difficulty
    * stages (1 = easiest) and give it a deterministic within-stage order
    * key, so a trainer can stream the corpus easy→hard with each stage
    * internally shuffled (the standard curriculum-learning data layout).
    *
    * Scale shape — NO global sort at any size: stage boundaries are the
    * exact interpolated `percentile` thresholds (one map-side-combinable
    * aggregate collapsing to a single broadcast row), stage assignment is a
    * map-only comparison against that row, and the shuffle key a consumer
    * would range-partition on is `(stage, ord)` where `ord` is a salted
    * md5 — uniformly distributed by construction, so stage files never
    * skew. Mirrors `quantile_cont` + `md5` verbatim in a SQL oracle.
    *
    * Output: `(id, difficulty, stage, ord)`; `difficulty` is passed
    * through as given (round it upstream if emitting).
    */
  def curriculumSchedule(df: DataFrame, id: String, difficulty: Column,
      stages: Int, salt: String = "graft"): DataFrame = {
    require(stages >= 2, s"need at least 2 stages, got $stages")
    val d = df.select(col(id), difficulty.as("difficulty"))
      .where(col("difficulty").isNotNull)
    val ps = (1 until stages).map(i => i.toDouble / stages)
    val th = d.agg(
      expr(s"percentile(difficulty, array(${ps.mkString(", ")}))").as("__th"))
    val stage = (0 until stages - 1)
      .map(i => when(col("difficulty") > col("__th")(i), 1).otherwise(0))
      .reduce(_ + _) + 1
    d.crossJoin(broadcast(th))
      .select(col(id), col("difficulty"),
        stage.cast("int").as("stage"),
        md5(concat(lit(salt), col(id).cast("string"))).as("ord"))
  }
}
