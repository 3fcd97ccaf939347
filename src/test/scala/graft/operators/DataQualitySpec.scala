package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DataQualitySpec extends SparkSpec {

  test("check: one scan, per-rule counts, null predicate counts as violation") {
    val sp = spark
    import sp.implicits._
    import DataQuality.Rule
    val df = Seq(
      (Some(5.0), Some("a")),
      (Some(-1.0), Some("b")), // range violation
      (None, Some("a")), // null value: violates BOTH value rules (3VL)
      (Some(7.0), None))
      .toDF("v", "k")
    val got = DataQuality.check(df, Seq(
      Rule("v_nonneg", col("v") >= 0),
      Rule("v_present", col("v").isNotNull),
      Rule("k_present", col("k").isNotNull)))
      .collect()
      .map(r => (r.getAs[String]("rule"),
        (r.getAs[Long]("n_rows"), r.getAs[Long]("n_violations"), r.getAs[Double]("violation_rate"))))
      .toMap
    assert(got("v_nonneg") == ((4L, 2L, 0.5))) // the -1 AND the null
    assert(got("v_present") == ((4L, 1L, 0.25)))
    assert(got("k_present") == ((4L, 1L, 0.25)))
  }

  test("check: empty frame reports zero rows and 0.0 rates") {
    val sp = spark
    import sp.implicits._
    import DataQuality.Rule
    val df = Seq((1L, "x")).toDF("a", "b").where(lit(false))
    val got = DataQuality.check(df, Seq(Rule("a_pos", col("a") > 0))).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getAs[Long]("n_rows") == 0L && r.getAs[Long]("n_violations") == 0L
      && r.getAs[Double]("violation_rate") == 0.0)
  }

  test("refIntegrity: orphans and null child keys are violations") {
    val sp = spark
    import sp.implicits._
    val child = Seq(Some(1L), Some(2L), Some(99L), None).toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val r = DataQuality.refIntegrity("child.fk_resolves", child, "fk", parent, "pk")
      .collect().head
    assert(r.getAs[String]("rule") == "child.fk_resolves")
    assert(r.getAs[Long]("n_rows") == 4L)
    assert(r.getAs[Long]("n_violations") == 2L) // 99 and the null
    assert(r.getAs[Double]("violation_rate") == 0.5)
  }

  test("profile: counts, ndv, Simpson effective cardinality, deterministic top value") {
    val sp = spark
    import sp.implicits._
    val rows = Seq(
      (Some("a"), Some(1)), (Some("a"), Some(1)), (Some("b"), Some(1)),
      (Some("b"), None), (None, Some(2)))
      .toDF("s", "x")
    val got = DataQuality.profile(rows, Seq("s", "x"))
      .collect().map(r => r.getAs[String]("col_name") ->
        ((r.getAs[Long]("n_rows"), r.getAs[Long]("n_nulls"), r.getAs[Long]("ndv"),
          r.getAs[Double]("eff_card"), r.getAs[String]("top_value"),
          r.getAs[Long]("top_count")))).toMap
    // s: 4 non-null over {a:2, b:2} -> eff 16/8 = 2; tie a vs b -> 'a'
    assert(got("s") == ((5L, 1L, 2L, 2.0, "a", 2L)))
    // x: {1:3, 2:1} -> eff 16/10 = 1.6; top '1'
    assert(got("x") == ((5L, 1L, 2L, 1.6, "1", 3L)))
  }

  test("profile of an all-null column reports null eff_card and top") {
    val sp = spark
    import sp.implicits._
    val rows = Seq.fill(3)(null.asInstanceOf[String]).toDF("s")
    val r = DataQuality.profile(rows, Seq("s")).collect()(0)
    assert(r.getAs[Long]("n_rows") == 3L && r.getAs[Long]("n_nulls") == 3L)
    assert(r.getAs[Long]("ndv") == 0L)
    assert(r.isNullAt(r.fieldIndex("eff_card")))
    assert(r.isNullAt(r.fieldIndex("top_value")))
  }

  test("kAnonymity: groups under k flag their rows as at-risk") {
    val sp = spark
    import sp.implicits._
    val rows = Seq(
      ("US", "A"), ("US", "A"), ("US", "A"), // group of 3 — safe at k=3
      ("DE", "B"), ("DE", "B"),              // group of 2 — at risk
      ("FR", "C"))                            // group of 1 — at risk
      .toDF("country", "segment")
    val r = DataQuality.kAnonymity(rows, Seq("country", "segment"), k = 3).collect()(0)
    assert(r.getAs[Long]("n_rows") == 6L)
    assert(r.getAs[Long]("n_groups") == 3L)
    assert(r.getAs[Long]("n_violating_groups") == 2L)
    assert(r.getAs[Long]("n_rows_at_risk") == 3L)
    assert(r.getAs[Long]("min_group_size") == 1L)
  }

  test("lDiversity: homogeneous sensitive values flag a k-anonymous group") {
    val sp = spark
    import sp.implicits._
    val rows = Seq(
      // group (US,A): 3 rows but only one sensitive value — NOT 2-diverse
      ("US", "A", "cancer"), ("US", "A", "cancer"), ("US", "A", "cancer"),
      // group (DE,B): 2 rows, 2 distinct values — 2-diverse
      ("DE", "B", "flu"), ("DE", "B", "cold"))
      .toDF("country", "segment", "dx")
    val r = DataQuality.lDiversity(rows, Seq("country", "segment"), "dx", l = 2).collect()(0)
    assert(r.getAs[Long]("n_rows") == 5L)
    assert(r.getAs[Long]("n_groups") == 2L)
    assert(r.getAs[Long]("n_violating_groups") == 1L)
    assert(r.getAs[Long]("n_rows_at_risk") == 3L)
    assert(r.getAs[Long]("min_diversity") == 1L)
  }

  test("benford: digit shares, expectation, and exact digit extraction") {
    val sp = spark
    import sp.implicits._
    // 10 values, first digits: 1 x6, 2 x2, 9 x2; sub-1 and null excluded
    val vals = Seq(1.5, 10.0, 123.4, 1999.0, 1.0, 17.3, 2.2, 250.0, 9.9, 900.0,
      0.5, 0.01).map(Option(_)) :+ Option.empty[Double]
    val df = vals.map(("k", _)).toDF("g", "v")
    val got = DataQuality.benford(df, "g", "v").collect()
      .map(r => r.getAs[Int]("digit") ->
        ((r.getAs[Long]("n"), r.getAs[Double]("obs_p"), r.getAs[Double]("benford_p"))))
      .toMap
    assert(got.keySet == Set(1, 2, 9))
    assert(got(1)._1 == 6L && got(2)._1 == 2L && got(9)._1 == 2L)
    assert(got(1)._2 == 0.6)
    assert(got(1)._3 == 0.30103) // log10(2) to 6 places
    assert(got(9)._3 == 0.045757)
    // digit of 1999.0 comes from the string head, not a log10 round-trip
    assert(got(1)._1 > 0)
  }

  test("joinStats: match rate, orphans, and the parent fanout profile") {
    val sp = spark
    import sp.implicits._
    val child = Seq(Some(1L), Some(1L), Some(2L), Some(9L), None).toDF("ck")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val r = DataQuality.joinStats(child, "ck", parent, "pk").collect()(0)
    assert(r.getAs[Long]("n_children") == 5L)
    assert(r.getAs[Long]("n_matched") == 3L) // 1,1,2 — 9 and null are orphans
    assert(r.getAs[Long]("n_orphans") == 2L)
    assert(r.getAs[Double]("match_rate") == 0.6)
    assert(r.getAs[Long]("n_parents") == 3L)
    assert(r.getAs[Long]("n_childless") == 1L) // parent 3
    assert(r.getAs[Long]("min_fanout") == 0L && r.getAs[Long]("max_fanout") == 2L)
    assert(r.getAs[Double]("avg_fanout") == 1.0) // (2 + 1 + 0) / 3
  }

  test("dpNoisedCounts: deterministic noise, zero-centered-ish, calibrated scale") {
    val sp = spark
    import sp.implicits._
    val df = (1 to 1000).map(i => ("g" + (i % 10)).toString).toDF("g")
    val a = DataQuality.dpNoisedCounts(df, "g", epsilon = 0.5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val b = DataQuality.dpNoisedCounts(df, "g", epsilon = 0.5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(a.toList == b.toList) // seeded: replays identically
    assert(a.forall(_._2 == 100L))
    // Laplace(b=2): |noise| has mean 2; all 10 draws inside a generous tail
    assert(a.forall(t => t._4 >= 0.0 && t._4 < 20.0), a.toList.toString)
    assert(a.exists(t => t._3 != t._2.toDouble)) // noise actually applied
    // a different seed moves the noise
    val c = DataQuality.dpNoisedCounts(df, "g", epsilon = 0.5, seed = 7L)
      .collect().map(r => r.getDouble(2))
    assert(c.toList != a.map(_._3).toList)
  }

  test("simpsonAudit: planted paradox flips the pooled slope sign") {
    val sp = spark
    import sp.implicits._
    // two groups, each with NEGATIVE within-group slope, but group B sits
    // at higher x AND higher y, so the pooled slope is positive
    val rows =
      Seq(("a", 0.0, 10.0), ("a", 1.0, 9.0), ("a", 2.0, 8.0),
          ("b", 10.0, 30.0), ("b", 11.0, 29.0), ("b", 12.0, 28.0))
    val got = DataQuality.simpsonAudit(rows.toDF("g", "x", "y"), "g", "x", "y")
      .collect().map(r => (r.getString(0), r.getDouble(2), r.getDouble(3),
        r.getBoolean(4))).toList
    assert(got.map(_._2) == List(-1.0, -1.0), got.toString)   // per-group slopes
    assert(got.forall(_._3 > 0.0), got.toString)              // pooled positive
    assert(got.forall(_._4), got.toString)                    // paradox flagged
    // constant-x group: slope null, no flag
    val deg = DataQuality.simpsonAudit(
      Seq(("c", 1.0, 5.0), ("c", 1.0, 7.0), ("d", 0.0, 1.0), ("d", 2.0, 3.0))
        .toDF("g", "x", "y"), "g", "x", "y").collect()
      .map(r => r.getString(0) -> r.isNullAt(2)).toMap
    assert(deg("c") && !deg("d"))
  }

  test("conformalAudit: eval coverage concentrates at 1 - alpha; tau is the cal quantile") {
    val sp = spark
    import sp.implicits._
    // score = id as double → tau is a known quantile of the calibration ids
    val df = (0L until 2000L).map(i => (i, s"g${i % 2}", i.toDouble))
      .toDF("doc_id", "source", "score")
    val got = DataQuality.conformalAudit(df, "doc_id", "source", col("score"),
      alpha = 0.1, calPct = 20).collect()
    assert(got.map(_.getAs[String]("source")).toSeq == Seq("g0", "g1"))
    val nCal = got.head.getAs[Long]("n_cal")
    val nEval = got.map(_.getAs[Long]("n_eval")).sum
    assert(nCal + nEval == 2000L)
    assert(nCal > 300L && nCal < 500L, s"n_cal=$nCal of 2000 at calPct=20")
    // pooled eval coverage within a few points of 1 - alpha = 0.9
    val kept = got.map(_.getAs[Long]("n_kept")).sum
    val cov = kept.toDouble / nEval
    assert(cov > 0.85 && cov < 0.95, s"coverage=$cov")
    // tau, corrected_level are corpus-level constants shared by all groups
    assert(got.map(_.getAs[Double]("tau")).distinct.length == 1)
    val lvl = got.head.getAs[Double]("corrected_level")
    assert(lvl >= 0.1 && lvl < 0.11, s"corrected_level=$lvl")
    intercept[IllegalArgumentException] {
      DataQuality.conformalAudit(df, "doc_id", "source", col("score"),
        alpha = 0.0, calPct = 20)
    }
    intercept[IllegalArgumentException] {
      DataQuality.conformalAudit(df, "doc_id", "source", col("score"),
        alpha = 0.1, calPct = 100)
    }
  }

  test("functionalDependencies: holds iff zero repairs; nulls excluded per pair") {
    val sp = spark
    import sp.implicits._
    // city -> country holds (4 rows, 0 repairs); country -> city does not
    // (fr maps to paris x2 and lyon x1 -> 1 repair); zip is null on the
    // berlin row, so every pair touching zip sees only 3 rows
    val df = Seq(
      ("paris", "fr", Option("75")),
      ("paris", "fr", Option("75")),
      ("lyon", "fr", Option("69")),
      ("berlin", "de", Option.empty[String]))
      .toDF("city", "country", "zip")
    val got = DataQuality.functionalDependencies(df, Seq("city", "country", "zip"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getBoolean(4))))
      .toMap
    assert(got(("city", "country")) == ((4L, 0L, true)))
    assert(got(("country", "city")) == ((4L, 1L, false)))
    assert(got(("city", "zip")) == ((3L, 0L, true)))
    assert(got(("zip", "city")) == ((3L, 0L, true)))
    // country -> zip: fr maps to 75 x2 and 69 x1 over the non-null rows
    assert(got(("country", "zip")) == ((3L, 1L, false)))
    assert(got(("zip", "country")) == ((3L, 0L, true)))
    assert(got.size == 6)
  }

  test("inclusionDependencies: subset holds, overlaps counted, nulls ignored") {
    val sp = spark
    import sp.implicits._
    val a = Seq(1, 2, 3, 3).toDF("x") // duplicates collapse
    val b = Seq(Option(2), Option(3), Option.empty[Int]).toDF("y")
    val c = Seq(3, 4).toDF("z")
    val got = DataQuality.inclusionDependencies(Seq(
        ("a", a, "x"), ("b", b, "y"), ("c", c, "z")))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5))))
      .toMap
    assert(got(("b", "a")) == ((2L, 2L, 0L, true)))  // {2,3} subset of {1,2,3}
    assert(got(("a", "b")) == ((3L, 2L, 1L, false)))
    assert(got(("a", "c")) == ((3L, 1L, 2L, false)))
    assert(got(("c", "a")) == ((2L, 1L, 1L, false)))
    assert(got(("b", "c")) == ((2L, 1L, 1L, false)))
    assert(got(("c", "b")) == ((2L, 1L, 1L, false)))
    assert(got.size == 6)
  }

  test("orderDependencies: row-weighted violations vs the running max over " +
      "strictly smaller lhs; ties unconstrained; nulls excluded") {
    val sp = spark
    import sp.implicits._
    val df = Seq(
      (Some(1.0), Some(10.0)), (Some(2.0), Some(20.0)), (Some(2.0), Some(20.0)),
      (Some(3.0), Some(15.0)), (Some(3.0), Some(5.0)), (Some(4.0), Some(20.0)),
      (None: Option[Double], Some(7.0)), (Some(5.0), None: Option[Double]))
      .toDF("x", "y")
    val got = DataQuality.orderDependencies(df, Seq("x", "y"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).toSet
    // x~>y: running max at x=3 is 20 -> rows (3,15) and (3,5) violate (2);
    // the tie at x=2 never constrains itself. y~>x: M(y=10)=3 -> (10,1)
    // violates; M(y=20)=3 -> the DUPLICATED (20,2) row violates twice.
    assert(got == Set(
      ("x", "y", 6L, 2L, false),
      ("y", "x", 6L, 3L, false)))
    // a monotone pair holds in both directions
    val mono = (1 to 20).map(i => (i.toDouble, (2 * i).toDouble)).toDF("x", "y")
    val holds = DataQuality.orderDependencies(mono, Seq("x", "y"))
      .collect().map(r => (r.getString(0), r.getBoolean(4))).toSet
    assert(holds == Set(("x", true), ("y", true)))
  }

  test("uniqueCombinations: key discovery over singles and pairs; nulls excluded") {
    val sp = spark
    import sp.implicits._
    val df = Seq(
      (1L, Option("a"), Option("x")),
      (2L, Option("a"), Option("y")),
      (3L, Option("b"), Option("x")),
      (4L, Option("b"), Option.empty[String]))
      .toDF("id", "g", "h")
    val got = DataQuality.uniqueCombinations(df, Seq("id", "g", "h"))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5))))
      .toMap
    assert(got("id") == ((1L, 4L, 4L, 0L, true)))
    assert(got("g") == ((1L, 4L, 2L, 2L, false)))
    assert(got("h") == ((1L, 3L, 2L, 1L, false))) // null row excluded
    assert(got("id|g") == ((2L, 4L, 4L, 0L, true)))
    assert(got("id|h") == ((2L, 3L, 3L, 0L, true)))
    assert(got("g|h") == ((2L, 3L, 3L, 0L, true))) // (a,x),(a,y),(b,x)
    assert(got.size == 6)
  }
}
