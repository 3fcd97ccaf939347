package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Isolation-forest anomaly scoring (Liu, Ting & Zhou 2008), Spark-first:
  * the trees are CONTROL PLANE — trained on the driver from a deterministic
  * bounded sample — and scoring is pure codegen'd column arithmetic (nested
  * `when` chains), so the 100 TB pass is a map-only projection with zero
  * shuffle, zero UDF, zero per-row model lookup. The same pattern as
  * [[Similarity.trainIvfCentroids]]: driver steers with a bounded collect,
  * the cluster never sees the model except as literals in the plan.
  *
  * Determinism is end-to-end: the training sample is the `sampleSize`
  * smallest `(md5(id), id)` rows (no RNG in the data path), tree structure
  * comes from a seeded PRNG, and every leaf embeds its
  * `depth + c(leafSize)` path-length adjustment as a PRECOMPUTED double
  * literal — no `ln` in either engine at scoring time, so an external
  * engine replaying the generated CASE expression reproduces scores
  * bit-for-bit. Scores are average path lengths: SMALL = isolated early =
  * anomalous (the monotone `2^(−E/c)` normalization is omitted — it adds a
  * libm call and changes no ordering).
  */
object AnomalyForest {

  sealed trait ITree
  final case class ISplit(feature: Int, threshold: Double, lo: ITree, hi: ITree) extends ITree
  final case class ILeaf(pathLen: Double) extends ITree

  final case class Forest(trees: Seq[ITree], nFeatures: Int)

  /** Average unsuccessful-search path length of a BST with n nodes — the
    * standard isolation-forest leaf adjustment. */
  private def c(n: Int): Double =
    if (n <= 1) 0.0
    else if (n == 2) 1.0
    else 2.0 * (math.log(n - 1.0) + 0.5772156649) - 2.0 * (n - 1.0) / n

  /** Train `nTrees` isolation trees on the deterministic sample: the
    * `sampleSize` rows with the smallest `(md5(id), id)` — a fixed
    * pseudo-random subset both this trainer and the oracle's re-trainer
    * select identically. Each node picks a uniformly-seeded non-constant
    * feature and a uniform threshold inside its subset's range; a node
    * isolates (or hits `maxDepth` / constant features) into a leaf carrying
    * `depth + c(n)`.
    */
  def train(df: DataFrame, id: String, features: Seq[Column], nTrees: Int,
      sampleSize: Int, maxDepth: Int, seed: Long = 42L): Forest = {
    require(nTrees >= 1 && sampleSize >= 2 && maxDepth >= 1,
      s"bad forest params: nTrees=$nTrees sampleSize=$sampleSize maxDepth=$maxDepth")
    val fCols = features.zipWithIndex.map { case (f, i) => f.cast("double").as(s"__f$i") }
    val sample = df
      .where(col(id).isNotNull && features.map(_.isNotNull).reduce(_ && _))
      .select((md5(col(id).cast("string")).as("__h") +: col(id).as("__id") +: fCols): _*)
      .orderBy(col("__h"), col("__id"))
      .limit(sampleSize)
      .collect()
      .map(r => Array.tabulate(features.size)(i => r.getDouble(2 + i)))
    val rnd = new scala.util.Random(seed)

    def build(rows: Array[Array[Double]], depth: Int): ITree = {
      if (depth >= maxDepth || rows.length <= 1) ILeaf(depth + c(rows.length))
      else {
        val candidates = (0 until features.size).filter { f =>
          val vs = rows.map(_(f)); vs.min < vs.max
        }
        if (candidates.isEmpty) ILeaf(depth + c(rows.length))
        else {
          val f = candidates(rnd.nextInt(candidates.length))
          val (mn, mx) = (rows.map(_(f)).min, rows.map(_(f)).max)
          val t = mn + rnd.nextDouble() * (mx - mn)
          val (lo, hi) = rows.partition(_(f) < t)
          if (lo.isEmpty || hi.isEmpty) ILeaf(depth + c(rows.length))
          else ISplit(f, t, build(lo, depth + 1), build(hi, depth + 1))
        }
      }
    }
    Forest(Seq.fill(nTrees)(build(sample, 0)), features.size)
  }

  /** The forest's average-path-length score as ONE codegen'd expression
    * over the given feature columns: per tree a nested `when` chain, summed
    * left-to-right and divided by the tree count — the identical
    * fixed-order arithmetic [[scoreSql]] emits.
    */
  def scoreExpr(forest: Forest, features: Seq[Column]): Column = {
    def tree(t: ITree): Column = t match {
      case ILeaf(p) => lit(p)
      case ISplit(f, th, lo, hi) =>
        when(features(f) < lit(th), tree(lo)).otherwise(tree(hi))
    }
    round(forest.trees.map(tree).reduce(_ + _) / lit(forest.trees.size.toDouble), 6)
  }

  /** The same score as ANSI SQL over the given feature expressions —
    * thresholds and leaf path lengths print shortest-round-trip
    * (`Double.toString`), which any IEEE engine parses back to the exact
    * same double.
    */
  def scoreSql(forest: Forest, features: Seq[String]): String = {
    // explicit DOUBLE casts: a bare decimal literal is DECIMAL(18) to
    // DuckDB and the 25-tree sum overflows it; CAST(...AS DOUBLE) parses
    // identically in Spark SQL and DuckDB
    def d(v: Double): String = s"CAST(${v.toString} AS DOUBLE)"
    def tree(t: ITree): String = t match {
      case ILeaf(p) => d(p)
      case ISplit(f, th, lo, hi) =>
        s"(CASE WHEN ${features(f)} < ${d(th)} THEN ${tree(lo)} ELSE ${tree(hi)} END)"
    }
    s"round((${forest.trees.map(tree).mkString(" + ")}) / ${d(forest.trees.size.toDouble)}, 6)"
  }

  private def nodeCount(t: ITree): Int = t match {
    case ILeaf(_) => 1
    case ISplit(_, _, lo, hi) => 1 + nodeCount(lo) + nodeCount(hi)
  }

  /** Top-`topN` most anomalous rows: train on the deterministic sample,
    * score every row map-only, rank ascending (short path = isolated =
    * anomalous) with the id as tiebreak.
    *
    * CODEGEN SIZING (r13 verdict ask #5): the whole forest as ONE `when`
    * chain is a single Catalyst expression, and a single expression cannot
    * be method-split by the code generator — at ~1000 tree nodes the fused
    * scan→filter→project stage trips janino's hard 64 KB method limit and
    * Spark silently falls back to interpreted `processNext()` for the
    * WHOLE stage: a multi-× CPU tax on every scored row, invisible except
    * as a CodeGenerator ERROR in the log (measured: the registered
    * 25-tree/depth-6 forest sat exactly on the edge; per-tree columns in
    * one projection do NOT split either — probed at 60 trees). So large
    * forests are scored in CHUNKS of ≤ `chunkNodeBudget` nodes, each chunk
    * a separate codegen span separated by a row-based fence
    * (`createDataFrame(rdd, schema)` — map-only, no shuffle, no cache),
    * carrying the running sum in an `__acc` column so the summation stays
    * the EXACT left-fold order of [[scoreExpr]]/[[scoreSql]] — association
    * changes the floating-point sum, and the oracle replays the left fold.
    * Small forests keep the single fused span (no fence, no overhead).
    *
    * Output: `(id, score)`.
    */
  def anomalies(df: DataFrame, id: String, features: Seq[Column], nTrees: Int,
      sampleSize: Int, maxDepth: Int, topN: Int, seed: Long = 42L,
      chunkNodeBudget: Int = 400): DataFrame = {
    val spark = df.sparkSession
    val forest = train(df, id, features, nTrees, sampleSize, maxDepth, seed)
    // the scorer is a per-row CASE cascade (~nTrees × depth comparisons):
    // per-row cost ≫ per-byte cost, so a small input must not ride its
    // scan width (r14 probe: 1.9 s of the 2.7 s wall in ONE 1-task stage
    // over the 2.4 MB cached scan) — spreadSmall round-robins it across
    // the cluster and no-ops on large scans
    val base = SizeGates.spreadSmall(
      df.where(col(id).isNotNull && features.map(_.isNotNull).reduce(_ && _))
        .select(col(id) +:
          features.zipWithIndex.map { case (f, i) => f.cast("double").as(s"__f$i") }: _*))
    val fcols = features.indices.map(i => col(s"__f$i"))
    def tree(t: ITree): Column = t match {
      case ILeaf(p) => lit(p)
      case ISplit(f, th, lo, hi) => when(fcols(f) < lit(th), tree(lo)).otherwise(tree(hi))
    }
    // pack whole trees into chunks of ≤ chunkNodeBudget nodes (~28 KB of
    // generated code — 2× margin under the 64 KB method limit); a single
    // tree over budget still gets its own chunk (codegen then falls back
    // for that span only, never the scan)
    val chunks = forest.trees.foldLeft(List.empty[(List[ITree], Int)]) {
      case (acc, t) =>
        val n = nodeCount(t)
        acc match {
          case (ts, sz) :: rest if sz + n <= chunkNodeBudget => ((t :: ts, sz + n)) :: rest
          case _ => ((t :: Nil, n)) :: acc
        }
    }.map(_._1.reverse).reverse
    var cur = base
    chunks.zipWithIndex.foreach { case (ts, i) =>
      val partial = ts.map(tree)
      val acc =
        if (i == 0) partial.reduce(_ + _)
        else partial.foldLeft(col("__acc"))(_ + _)
      val stepped = cur.withColumn("__acc", acc)
      cur =
        if (i == chunks.length - 1) stepped
        else spark.createDataFrame(stepped.rdd, stepped.schema)
    }
    cur
      .select(col(id),
        round(col("__acc") / lit(forest.trees.size.toDouble), 6).as("score"))
      .orderBy(col("score"), col(id))
      .limit(topN)
  }
}
