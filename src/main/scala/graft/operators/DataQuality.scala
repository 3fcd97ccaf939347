package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations over arbitrary frames — the
  * Deequ/expectations-style audit a training-data pipeline gates its inputs
  * on (null rates, value ranges, cross-column consistency, referential
  * integrity), expressed as Column predicates so every rule compiles into
  * the ONE scan it is checked by.
  *
  * Semantics: a row VIOLATES a rule when the predicate is not TRUE — SQL
  * three-valued logic deliberately counts a NULL predicate as a violation
  * (a null inside `value BETWEEN 0 AND 400` means the row could not be
  * shown to satisfy the expectation).
  */
object DataQuality {

  /** One expectation: `passes` must evaluate TRUE on every row. */
  final case class Rule(name: String, passes: Column)

  private def quantize6(c: Column): Column = floor(c * 1000000.0) / 1000000.0

  /** Per-column statistics profile — the table-stats collector behind
    * optimizer estimates and data-contract drift checks: row/null counts,
    * exact distinct count, inverse-Simpson effective cardinality (the
    * log-free concentration measure — `n_nonnull² / Σ c²` is the number of
    * equally-frequent values that would look like this distribution), and
    * the most frequent value with a deterministic `(count DESC, value ASC)`
    * tie-break.
    *
    * Per column: one value-counts aggregate + one rollup — both keyed and
    * map-side combinable; columns union into one report frame. Values are
    * profiled as strings so any column type fits one schema. Counts are
    * exact BIGINTs; where a single value's count can pass ~3·10⁹ (so `c²`
    * would overflow a long), switch the square accumulation to
    * DECIMAL(38,0) — the plan shape is unchanged.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "no columns to profile")
    cols.map { c =>
      val vc = df.select(col(c).cast("string").as("__v"))
        .groupBy(col("__v")).agg(count(lit(1)).as("__c"))
      vc.agg(
        sum(col("__c")).as("__n"),
        sum(when(col("__v").isNull, col("__c")).otherwise(lit(0L))).as("__nulls"),
        count(when(col("__v").isNotNull, lit(1))).as("ndv"),
        sum(when(col("__v").isNotNull, col("__c") * col("__c")).otherwise(lit(0L))).as("__sq"),
        min_by(col("__v"), when(col("__v").isNotNull, struct((-col("__c")).as("c"), col("__v").as("v"))))
          .as("top_value"),
        max(when(col("__v").isNotNull, col("__c"))).as("top_count"))
        .select(
          lit(c).as("col_name"),
          coalesce(col("__n"), lit(0L)).as("n_rows"),
          coalesce(col("__nulls"), lit(0L)).as("n_nulls"),
          col("ndv"),
          when(col("__sq").isNull || col("__sq") === 0, lit(null)).otherwise(
            round(((col("__n") - coalesce(col("__nulls"), lit(0L))) *
              (col("__n") - coalesce(col("__nulls"), lit(0L)))) / col("__sq"), 6))
            .as("eff_card"),
          col("top_value"), col("top_count"))
    }.reduce(_.unionByName(_))
  }

  /** k-anonymity audit over a quasi-identifier column set: every row whose
    * QI combination is shared by fewer than `k` rows is re-identifiable —
    * the privacy gate a training-data release runs BEFORE publishing
    * (redaction ([[graft.operators.TextAnalysis.piiRedact]]) removes direct
    * identifiers; this catches the indirect ones). ONE keyed count over
    * the QI tuple + one rollup.
    *
    * Output: one row
    * `(n_rows, n_groups, n_violating_groups, n_rows_at_risk,
    * min_group_size)`.
    */
  def kAnonymity(df: DataFrame, qiCols: Seq[String], k: Int): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 2, s"k must be >= 2, got $k")
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("__c"))
      .agg(
        sum(col("__c")).as("n_rows"),
        count(lit(1)).as("n_groups"),
        sum(when(col("__c") < k, 1L).otherwise(0L)).as("n_violating_groups"),
        sum(when(col("__c") < k, col("__c")).otherwise(lit(0L))).as("n_rows_at_risk"),
        min(col("__c")).as("min_group_size"))
  }

  /** Benford first-digit audit — "were these numbers typed in by hand":
    * naturally-occurring multiplicative quantities follow
    * `P(d) = log10(1 + 1/d)`; fabricated or truncated ones don't, which is
    * why this is the standard forensic screen over financial columns and a
    * useful synthetic-data smell test over metric columns. Digits are
    * extracted from the BIGINT floor of the value via string head — exact
    * integer-to-string in any engine, deliberately NOT `floor(log10(v))`
    * whose last-ULP behaviour at powers of ten is libm-dependent. Values
    * below 1 (no leading digit in the integer part) are excluded.
    *
    * ONE map-side-combinable count over `(key, digit)` + a per-key total
    * join (at most 9 cells per key). Output one row per `(key, digit)`:
    * observed count, observed share, Benford share, and the chi-square
    * contribution `(obs - exp)² / exp` — sum it per key for the test
    * statistic (8 degrees of freedom).
    */
  def benford(df: DataFrame, key: String, value: String): DataFrame = {
    val benfordP = (1 to 9).map(d => math.log10(1.0 + 1.0 / d))
    val digit = substring(floor(abs(col(value).cast("double"))).cast("long").cast("string"), 1, 1)
      .cast("int")
    val counts = df
      .where(col(value).isNotNull && abs(col(value).cast("double")) >= 1.0)
      .groupBy(col(key), digit.as("digit"))
      .agg(count(lit(1)).as("n"))
    val expP = (1 to 9).foldLeft(lit(null).cast("double")) { (acc, d) =>
      when(col("digit") === d, lit(benfordP(d - 1))).otherwise(acc)
    }
    val tot = counts.groupBy(col(key)).agg(sum(col("n")).as("__t"))
    val dev = col("n") - expP * col("__t")
    counts.join(tot, Seq(key))
      .select(col(key), col("digit"), col("n"),
        quantize6(col("n") / col("__t")).as("obs_p"),
        round(expP, 6).as("benford_p"),
        round(dev * dev / (expP * col("__t")), 6).as("chi2_term"))
  }

  /** l-diversity audit — the companion gate to [[kAnonymity]]: a group of
    * rows can be k-anonymous yet still leak if everyone in it shares the
    * same sensitive value (the "homogeneity attack"). A QI equivalence
    * class is l-diverse when its sensitive column takes at least `l`
    * distinct non-null values. One exact distinct-count aggregation over
    * the QI tuple (two-phase, map-side combinable on `(QI, sensitive)`)
    * + one rollup row:
    * `(n_rows, n_groups, n_violating_groups, n_rows_at_risk,
    * min_diversity)`.
    */
  def lDiversity(df: DataFrame, qiCols: Seq[String], sensitive: String, l: Int): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    require(l >= 2, s"l must be >= 2, got $l")
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("__c"),
        countDistinct(col(sensitive)).as("__d"))
      .agg(
        sum(col("__c")).as("n_rows"),
        count(lit(1)).as("n_groups"),
        sum(when(col("__d") < l, 1L).otherwise(0L)).as("n_violating_groups"),
        sum(when(col("__d") < l, col("__c")).otherwise(lit(0L))).as("n_rows_at_risk"),
        min(col("__d")).as("min_diversity"))
  }

  /** Join-cardinality statistics for a parent/child key relationship — the
    * audit behind broadcast decisions and referential-health dashboards:
    * child match rate, orphan count, and the parent-side fanout profile
    * (children per parent: min/avg/max, plus childless parents). Two keyed
    * aggregates and one broadcast-sized stitch; neither table is scanned
    * twice.
    */
  def joinStats(child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String): DataFrame = {
    val ck = child.select(col(childKey).as("__k"))
    val pk = parent.select(col(parentKey).as("__k")).distinct()
    val perParent = ck.where(col("__k").isNotNull)
      .groupBy(col("__k")).agg(count(lit(1)).as("__c"))
      .join(pk, Seq("__k"), "right_outer")
      .select(coalesce(col("__c"), lit(0L)).as("__c"))
    val childSide = ck
      .join(pk.select(col("__k"), lit(1).as("__hit")), Seq("__k"), "left_outer")
      .agg(count(lit(1)).as("n_children"),
        sum(when(col("__hit").isNotNull, 1L).otherwise(0L)).as("n_matched"))
    val parentSide = perParent.agg(
      count(lit(1)).as("n_parents"),
      sum(when(col("__c") === 0, 1L).otherwise(0L)).as("n_childless"),
      min(col("__c")).as("min_fanout"),
      max(col("__c")).as("max_fanout"),
      sum(col("__c")).as("__tot"))
    childSide.crossJoin(parentSide).select(
      col("n_children"), col("n_matched"),
      (col("n_children") - col("n_matched")).as("n_orphans"),
      quantize6(col("n_matched") / col("n_children")).as("match_rate"),
      col("n_parents"), col("n_childless"), col("min_fanout"), col("max_fanout"),
      round(col("__tot") / col("n_parents"), 6).as("avg_fanout"))
  }

  /** Evaluate all `rules` against `df` in ONE map-side-combinable
    * aggregation pass (a single scan regardless of rule count): returns one
    * row per rule — `(rule, n_rows, n_violations, violation_rate)` with the
    * rate floor-quantized (ratio of two engine-exact longs). An empty frame
    * reports zero rows and a 0.0 rate for every rule.
    */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "no rules to check")
    val aggs = count(lit(1)).as("__n") +:
      rules.zipWithIndex.map { case (r, i) =>
        sum(when(!coalesce(r.passes, lit(false)), 1L).otherwise(0L)).as(s"__v$i")
      }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = rules.zipWithIndex.map { case (r, i) =>
      struct(lit(r.name).as("rule"), col("__n").as("n_rows"),
        coalesce(col(s"__v$i"), lit(0L)).as("n_violations"))
    }
    one.select(explode(array(rows: _*)).as("__r"))
      .select(col("__r.rule").as("rule"), col("__r.n_rows").as("n_rows"),
        col("__r.n_violations").as("n_violations"))
      .withColumn("violation_rate",
        when(col("n_rows") === 0, lit(0.0))
          .otherwise(quantize6(col("n_violations") / col("n_rows"))))
  }

  /** Referential-integrity expectation as the same report row: every
    * `childKey` value in `child` must resolve in `parent(parentKey)`.
    * Violations = child rows whose key has no parent match (null child keys
    * are violations too — they cannot be shown to resolve).
    *
    * Plan shape: one keyed left-anti join (broadcast when the parent key
    * set is small — the planner/AQE decides) plus two count aggregates;
    * nothing is collected.
    */
  def refIntegrity(name: String, child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String): DataFrame = {
    val keys = parent.select(col(parentKey).as("__pk")).distinct()
    val orphans = child.select(col(childKey).as("__ck"))
      .join(keys, col("__ck") === col("__pk"), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
    val total = child.agg(count(lit(1)).as("n_rows"))
    total.crossJoin(orphans) // two 1-row frames
      .select(lit(name).as("rule"), col("n_rows"), col("n_violations"))
      .withColumn("violation_rate",
        when(col("n_rows") === 0, lit(0.0))
          .otherwise(quantize6(col("n_violations") / col("n_rows"))))
  }

  /** Differential-privacy-style noised count release (Laplace mechanism,
    * sensitivity 1): per group, `count + Laplace(1/epsilon)` — the noisy
    * histogram you can hand outside the trust boundary where
    * [[kAnonymity]]/[[lDiversity]] only AUDIT what stays inside. The
    * audit row keeps the exact count and noise magnitude next to the
    * release value for calibration; the release artifact is `n_noised`
    * alone.
    *
    * Noise here is SEEDED (md5-uniform per group, inverse-CDF transform) so
    * pipelines replay deterministically and the oracle can verify the
    * arithmetic — a production release under a real privacy budget would
    * swap in fresh randomness per release and track cumulative epsilon;
    * the mechanism and its error profile are identical.
    */
  def dpNoisedCounts(df: DataFrame, group: String, epsilon: Double,
      seed: Long = 42L): DataFrame = {
    require(epsilon > 0.0, s"epsilon must be positive, got $epsilon")
    val u = (conv(substring(md5(concat(col(group).cast("string"),
      lit(":" + seed))), 1, 8), 16, 10).cast("long") + 0.5) / 4294967296.0
    val noise = lit(-1.0 / epsilon) * signum(u - 0.5) *
      log(lit(1.0) - lit(2.0) * abs(u - 0.5))
    df.where(col(group).isNotNull)
      .groupBy(col(group))
      .agg(count(lit(1)).as("n_exact"))
      .select(col(group), col("n_exact"),
        round(col("n_exact") + noise, 4).as("n_noised"),
        round(abs(noise), 4).as("abs_noise"))
      .orderBy(col(group))
  }

  /** Simpson's-paradox audit: the pooled OLS slope of `y` on `x` next to
    * each group's own slope, with a flag where the signs disagree — the
    * confounding check that catches "conversion is up overall but down in
    * every segment" before a dashboard ships it. Slopes are the closed-form
    * `(n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)` from ONE conditional-sum
    * aggregation pass; the pooled row is the same sums re-aggregated
    * (exact: sums of sums), broadcast back as one row.
    *
    * Output: `(group, n, slope, pooled_slope, sign_flip)`; slope null for
    * a degenerate (constant-x) group.
    */
  def simpsonAudit(df: DataFrame, group: String, x: String, y: String): DataFrame = {
    val base = df.where(col(group).isNotNull && col(x).isNotNull && col(y).isNotNull)
      .select(col(group).as("__g"), col(x).cast("double").as("__x"),
        col(y).cast("double").as("__y"))
    val per = base.groupBy(col("__g")).agg(
      count(lit(1)).as("__n"), sum(col("__x")).as("__sx"),
      sum(col("__y")).as("__sy"), sum(col("__x") * col("__x")).as("__sxx"),
      sum(col("__x") * col("__y")).as("__sxy"))
    def slope(n: Column, sx: Column, sy: Column, sxx: Column, sxy: Column) =
      when(n * sxx - sx * sx > 0.0,
        round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6))
    val pooled = per.agg(
      sum(col("__n")).as("__pn"), sum(col("__sx")).as("__psx"),
      sum(col("__sy")).as("__psy"), sum(col("__sxx")).as("__psxx"),
      sum(col("__sxy")).as("__psxy"))
      .select(slope(col("__pn"), col("__psx"), col("__psy"), col("__psxx"),
        col("__psxy")).as("pooled_slope"))
    per.crossJoin(broadcast(pooled))
      .select(col("__g").as(group), col("__n").as("n"),
        slope(col("__n"), col("__sx"), col("__sy"), col("__sxx"), col("__sxy"))
          .as("slope"),
        col("pooled_slope"))
      .withColumn("sign_flip",
        when(col("slope").isNotNull && col("pooled_slope").isNotNull,
          signum(col("slope")) =!= signum(col("pooled_slope")) &&
            col("slope") =!= 0.0 && col("pooled_slope") =!= 0.0)
          .otherwise(lit(false)))
      .orderBy(col(group))
  }

  /** Conformal filter-calibration audit: hold out a deterministic
    * hash-bucket calibration split, set the acceptance threshold `tau` at
    * the empirical `alpha`-quantile of the calibration scores, and report —
    * per group — how much of the remaining corpus a "keep score >= tau"
    * filter retains. Split-conformal's promise is that the eval rejection
    * rate concentrates around `alpha` regardless of the score's
    * distribution; a per-source coverage far from `1 - alpha` is exactly
    * how score drift between sources shows up.
    *
    * Scale shape: the calibration membership is the same salted-hash
    * bucketing as [[Sampling.splitAssign]] (map-only, stable under corpus
    * growth), `tau` is ONE exact-`percentile` aggregate over the
    * calibration slice collapsing to a single broadcast row (`percentile`
    * == `quantile_cont`, the L35 interop contract), and the audit is one
    * keyed aggregation — no global window, no driver loop. The
    * finite-sample-corrected level `ceil(alpha*(n+1))/n` is reported
    * alongside as plain integer arithmetic; the threshold itself uses the
    * uncorrected quantile so the whole plan stays data-independent.
    *
    * `tau` is rounded to the shared 6-dp grid before the comparison, so
    * the cut line cannot move with a sub-grid interpolation wobble; pass a
    * score already emitted on that grid (e.g. the 6-dp quality score).
    *
    * Output: `(group, n_cal, n_eval, n_kept, coverage, tau,
    * corrected_level)` — `coverage`/`tau`/`corrected_level` at 6 dp.
    */
  def conformalAudit(df: DataFrame, id: String, group: String, score: Column,
      alpha: Double, calPct: Int = 20, salt: String = "conformal"): DataFrame = {
    require(alpha > 0.0 && alpha < 1.0, s"alpha in (0,1), got $alpha")
    require(calPct > 0 && calPct < 100, s"calPct in (1,99), got $calPct")
    val base = df
      .select(col(id).as("__id"), col(group).as("__g"), score.as("__s"))
      .where(col("__s").isNotNull)
      .withColumn("__cal", Sampling.hashBucket(col("__id"), salt, 100L) < calPct)
    val cal = base.where(col("__cal"))
    val tau = cal.agg(
      round(expr(s"percentile(__s, $alpha)"), 6).as("tau"),
      count(lit(1)).as("n_cal"))
      .withColumn("corrected_level",
        round(ceil(lit(alpha) * (col("n_cal") + 1)) / col("n_cal"), 6))
    base.where(!col("__cal"))
      .crossJoin(broadcast(tau))
      .groupBy(col("__g").as(group))
      .agg(
        first(col("n_cal")).as("n_cal"),
        count(lit(1)).as("n_eval"),
        sum(when(col("__s") >= col("tau"), 1L).otherwise(0L)).as("n_kept"),
        first(col("tau")).as("tau"),
        first(col("corrected_level")).as("corrected_level"))
      .withColumn("coverage", round(col("n_kept").cast("double") / col("n_eval"), 6))
      .select(col(group), col("n_cal"), col("n_eval"), col("n_kept"),
        col("coverage"), col("tau"), col("corrected_level"))
      .orderBy(col(group))
  }

  /** Functional-dependency discovery over a chosen attribute set — the
    * Metanome-style profiling primitive behind schema understanding,
    * denormalization checks and key inference: for every ORDERED pair
    * `(determinant, dependent)`, how many rows would have to change for
    * `determinant -> dependent` to hold exactly? `violations = 0` means
    * the FD holds on this data.
    *
    * `violations = n_rows - keep` where `keep` sums, per determinant
    * value, the count of its MOST FREQUENT dependent value — the minimal
    * repair count (counts only, so the result is integer-exact and
    * engine-independent; no tie-break is ever exposed). Null-bearing rows
    * are excluded per pair (an FD says nothing about nulls).
    *
    * Scale shape: ONE corpus pass regardless of attribute count — every
    * row melts into its p x (p-1) ordered attribute pairs (values cast to
    * string) and everything after is map-side-combinable keyed aggs whose
    * cardinality is the pairwise-distinct count, not the corpus. Choose
    * profiling attributes accordingly: a unique-key determinant makes the
    * intermediate as big as the table (and its FDs trivially hold).
    *
    * Output: `(determinant, dependent, n_rows, violations, holds)`.
    */
  def functionalDependencies(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, s"need at least 2 columns, got ${cols.size}")
    require(cols.distinct.size == cols.size, s"duplicate columns in $cols")
    val attrs = array(cols.map(c =>
      struct(lit(c).as("c"), col(c).cast("string").as("v"))): _*)
    val melted = df.select(attrs.as("__as"))
      .select(explode(col("__as")).as("A"), col("__as"))
      .select(col("A"), explode(col("__as")).as("B"))
      .where(col("A.c") =!= col("B.c") &&
        col("A.v").isNotNull && col("B.v").isNotNull)
    val counts = melted
      .groupBy(col("A.c").as("determinant"), col("B.c").as("dependent"),
        col("A.v").as("dv"), col("B.v").as("bv"))
      .agg(count(lit(1)).as("n"))
    counts
      .groupBy(col("determinant"), col("dependent"), col("dv"))
      .agg(sum(col("n")).as("nv"), max(col("n")).as("mx"))
      .groupBy(col("determinant"), col("dependent"))
      .agg(sum(col("nv")).as("n_rows"),
        (sum(col("nv")) - sum(col("mx"))).as("violations"))
      .select(col("determinant"), col("dependent"), col("n_rows"),
        col("violations"), (col("violations") === 0).as("holds"))
  }

  /** Inclusion-dependency discovery — [[functionalDependencies]]'
    * cross-table complement and the basis of FOREIGN-KEY inference: for
    * every ordered pair of profiled columns, how many DISTINCT values of
    * the left column do not appear in the right one? `violations = 0`
    * means `from ⊆ to` holds (a referential-integrity candidate).
    *
    * Input is a labeled column set (label, frame, column) so the pairs can
    * span tables. Values compare as strings; nulls are ignored (an IND
    * says nothing about nulls).
    *
    * Scale shape: the raw labeled value rows union into ONE frame and a
    * single `groupBy(value)` pass (map-side combinable — per-partition the
    * combine IS the per-column distinct) collapses each value to the SET
    * of labels containing it; pair overlaps explode from those label sets
    * (bounded by labels², never a self-join) and sizes fall out of the
    * same rows — one shuffle total, one materialization, the classic
    * value-position-list IND algorithm fused into a single aggregation
    * tree (the r8 plan paid a distinct per column + a value-keyed
    * self-join + a localCheckpoint: 2.5 s of sequential job floor at
    * sf0.1 for the same answer). The intermediate is bounded by
    * Σ distinct values — vocabulary-scaled, not corpus-scaled.
    *
    * Output: `(from_col, to_col, n_distinct, matched, violations, holds)`
    * for every ordered pair of labels.
    */
  def inclusionDependencies(cols: Seq[(String, DataFrame, String)]): DataFrame = {
    require(cols.size >= 2, s"need at least 2 columns, got ${cols.size}")
    require(cols.map(_._1).distinct.size == cols.size,
      s"duplicate labels in ${cols.map(_._1)}")
    val labels = cols.map(_._1)
    // value -> set of labels containing it (collect_set dedups per value,
    // so the per-column distinct is implicit in the ONE shuffle)
    val labelSets = cols.map { case (label, df, c) =>
      df.where(col(c).isNotNull)
        .select(lit(label).as("c"), col(c).cast("string").as("v"))
    }.reduce(_ unionByName _)
      .groupBy(col("v")).agg(collect_set(col("c")).as("cs"))
    // per ordered pair present in a value's label set: one (c, c2) row;
    // per label: one (c, c) row — sizes and overlaps in the same agg
    val pairRows = labelSets.select(explode(expr(
      """flatten(transform(cs, a -> transform(cs, b -> struct(a AS c, b AS c2))))"""))
      .as("p"))
      .groupBy(col("p.c").as("c"), col("p.c2").as("c2"))
      .agg(count(lit(1)).as("n"))
    // the aggregate is ≤ labels² rows — control-plane sized by definition
    // (a bounded collect, the size-gate convention): assemble the ordered
    // pair table on the driver in the SAME single Spark job instead of
    // paying two more joins + a localCheckpoint over a ≤36-row frame. A
    // label with zero non-null values reports n_distinct 0 and holds
    // (∅ ⊆ anything) — exactly the oracle's semantics.
    val m = pairRows.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val spark0 = pairRows.sparkSession
    import spark0.implicits._
    (for (a <- labels; b <- labels if a != b) yield {
      val nd = m.getOrElse((a, a), 0L)
      val mt = m.getOrElse((a, b), 0L)
      (a, b, nd, mt, nd - mt, nd == mt)
    }).toDF("from_col", "to_col", "n_distinct", "matched", "violations", "holds")
  }

  /** Order-dependency discovery — the fourth profiling primitive
    * ([[functionalDependencies]], [[inclusionDependencies]],
    * [[uniqueCombinations]], and this): for every ordered pair of numeric
    * columns, does sorting by the left column sort the right one?
    * `lhs ~> rhs` holds iff for all rows `r, s`:
    * `r.lhs < s.lhs ⇒ r.rhs <= s.rhs` (rows tied on `lhs` don't constrain
    * each other — the lexicographic OD convention). `violations` counts
    * the ROWS whose `rhs` value is below the running maximum of `rhs`
    * over strictly smaller `lhs` values — 0 = the OD holds exactly.
    * Null-bearing rows are excluded per pair (an OD says nothing about
    * nulls); values compare as DOUBLEs (exact for integral magnitudes
    * < 2^53 — the engine-portable numeric order).
    *
    * Scale shape: the FD melt — ONE corpus pass expands each row into its
    * p·(p−1) ordered pairs, a combinable `(pair, lhs, rhs)` count
    * collapses to distinct-value cardinality, the running max is a
    * window over DISTINCT `lhs` per pair (one row per distinct value —
    * `ROWS ... 1 PRECEDING` is exactly "strictly smaller" there), and
    * one `(pair, lhs)`-keyed join scores the counted rows. Everything
    * past the melt is distinct-value-scaled, not corpus-scaled.
    *
    * Output: `(lhs, rhs, n_rows, violations, holds)` per ordered pair.
    */
  def orderDependencies(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, s"need at least 2 columns, got ${cols.size}")
    require(cols.distinct.size == cols.size, s"duplicate columns in $cols")
    val attrs = array(cols.map(c =>
      struct(lit(c).as("c"), col(c).cast("double").as("v"))): _*)
    val counts = df.select(attrs.as("__as"))
      .select(explode(col("__as")).as("A"), col("__as"))
      .select(col("A"), explode(col("__as")).as("B"))
      .where(col("A.c") =!= col("B.c") &&
        col("A.v").isNotNull && col("B.v").isNotNull)
      .groupBy(col("A.c").as("lhs"), col("B.c").as("rhs"),
        col("A.v").as("a"), col("B.v").as("b"))
      .agg(count(lit(1)).as("n"))
    // one row per (pair, distinct lhs): its max rhs, then the running max
    // over strictly smaller lhs (rows-frame; each row IS a distinct value)
    val runw = Window.partitionBy(col("lhs"), col("rhs")).orderBy(col("a"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val g = counts.groupBy(col("lhs"), col("rhs"), col("a"))
      .agg(max(col("b")).as("mxb"))
      .select(col("lhs"), col("rhs"), col("a"), max(col("mxb")).over(runw).as("M"))
    counts.join(g, Seq("lhs", "rhs", "a"))
      .groupBy(col("lhs"), col("rhs"))
      .agg(sum(col("n")).as("n_rows"),
        sum(when(col("M").isNotNull && col("b") < col("M"), col("n"))
          .otherwise(lit(0L))).as("violations"))
      .select(col("lhs"), col("rhs"), col("n_rows"), col("violations"),
        (col("violations") === 0).as("holds"))
  }

  /** Unique-column-combination discovery — the third of the classic
    * profiling trio ([[functionalDependencies]], [[inclusionDependencies]],
    * and this): which single columns and unordered column PAIRS take a
    * distinct value on every row, i.e. are candidate keys?
    * `duplicates = n_rows − n_distinct` is the exact repair distance to
    * uniqueness (0 = candidate key). Rows with a null in any member are
    * excluded from that combination (SQL keys are null-free), and the
    * reported `n_rows` is per-combination for exactly that reason.
    *
    * Scale shape: like the FD melt — each row expands into its singles
    * and `p·(p−1)/2` pairs once, and everything downstream is a
    * combinable count keyed by (combination, value) whose cardinality is
    * the distinct-combination count. Values compare as strings.
    *
    * Output: `(columns, size, n_rows, n_distinct, duplicates, is_key)` —
    * `columns` is the '|'-joined member list in input order.
    */
  def uniqueCombinations(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, s"need at least 2 columns, got ${cols.size}")
    require(cols.distinct.size == cols.size, s"duplicate columns in $cols")
    val combos: Seq[Seq[String]] =
      cols.map(Seq(_)) ++
        (for (i <- cols.indices; j <- i + 1 until cols.size)
          yield Seq(cols(i), cols(j)))
    val attrs = array(combos.map { m =>
      struct(lit(m.mkString("|")).as("c"), lit(m.size.toLong).as("sz"),
        when(m.map(col(_).isNotNull).reduce(_ && _),
          concat_ws("\u0001", m.map(col(_).cast("string")): _*)).as("v"))
    }: _*)
    df.select(explode(attrs).as("A"))
      .where(col("A.v").isNotNull)
      .groupBy(col("A.c").as("columns"), col("A.sz").as("size"),
        col("A.v").as("v"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("columns"), col("size"))
      .agg(sum(col("n")).as("n_rows"), count(lit(1)).as("n_distinct"))
      .select(col("columns"), col("size"), col("n_rows"), col("n_distinct"),
        (col("n_rows") - col("n_distinct")).as("duplicates"),
        (col("n_rows") === col("n_distinct")).as("is_key"))
  }
}
