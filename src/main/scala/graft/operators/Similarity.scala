package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Baseline: brute-force cosine top-k — a broadcast of the (small) query set
  * against a distributed scan of the corpus; per-row arithmetic stays in
  * array lambdas (codegen, no UDF). The scale path is LSH bucketing
  * ([[randomHyperplaneBuckets]]): random-hyperplane signs shrink the
  * candidate set per query so a 100 TB corpus is scanned once, shuffled only
  * by bucket.
  */
object Similarity {

  /** Dot product of two float-array columns, accumulated in double in index
    * order (deterministic, engine-reproducible).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k: for each query vector (small set, broadcast),
    * the `k` nearest corpus vectors. Ties broken by neighbor id; the
    * similarity is rounded before ranking so rankings are reproducible across
    * engines' last-ulp differences.
    */
  def bruteForceKnn(corpus: DataFrame, queries: DataFrame, id: String, vec: String, k: Int): DataFrame = {
    val q = queries.select(col(id).as("query_id"), col(vec).as("__qv"))
    val c = corpus.select(col(id).as("neighbor_id"), col(vec).as("__cv"))
    val scored = c
      .join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", round(cosine(col("__qv"), col("__cv")), 6))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id"))
    scored
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= k)
      .select(col("query_id"), col("neighbor_id"), col("sim"), col("__rn").as("rank"))
  }

  /** Random-hyperplane LSH bucket id: the sign pattern of `planes` fixed
    * pseudo-random hyperplanes (seeded, so buckets are stable). Vectors in
    * the same bucket are likely similar (SimHash for real vectors).
    */
  def randomHyperplaneBuckets(df: DataFrame, id: String, vec: String, planes: Int, dim: Int): DataFrame = {
    val rng = new scala.util.Random(7L)
    val planeCols = (0 until planes).map { p =>
      val plane = Array.fill(dim)(rng.nextGaussian())
      val planeCol = array(plane.map(x => lit(x)): _*)
      when(dot(col(vec), planeCol) >= 0, shiftleft(lit(1), p)).otherwise(lit(0))
    }
    df.select(col(id), col(vec), planeCols.reduce((a, b) => a.bitwiseOR(b)).as("bucket"))
  }

  /** Bucketed approximate KNN: score only (query, corpus) pairs sharing an
    * LSH bucket. Recall < 1 by construction; multiply `planes` down or probe
    * neighboring buckets to trade recall for cost.
    */
  def bucketedKnn(corpus: DataFrame, queries: DataFrame, id: String, vec: String, k: Int, planes: Int, dim: Int): DataFrame = {
    val qb = randomHyperplaneBuckets(queries, id, vec, planes, dim)
      .select(col(id).as("query_id"), col(vec).as("__qv"), col("bucket"))
    val cb = randomHyperplaneBuckets(corpus, id, vec, planes, dim)
      .select(col(id).as("neighbor_id"), col(vec).as("__cv"), col("bucket"))
    val scored = cb
      .join(broadcast(qb), Seq("bucket"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", round(cosine(col("__qv"), col("__cv")), 6))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id"))
    scored
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= k)
      .select(col("query_id"), col("neighbor_id"), col("sim"), col("__rn").as("rank"))
  }

  /** Embedding-cosine near-duplicate pairs: all (i < j) pairs with cosine
    * similarity at or above `threshold`. The brute-force O(n²) shape is the
    * correctness baseline; at 100 TB use [[randomHyperplaneBuckets]] to
    * bucket first and run this within buckets.
    */
  def cosinePairs(df: DataFrame, id: String, vec: String, threshold: Double): DataFrame = {
    val a = df.select(col(id).as("d1"), col(vec).as("__v1"))
    val b = df.select(col(id).as("d2"), col(vec).as("__v2"))
    a.join(b, col("d1") < col("d2"))
      .withColumn("sim", round(cosine(col("__v1"), col("__v2")), 6))
      .where(col("sim") >= threshold)
      .select(col("d1"), col("d2"), col("sim"))
  }

  /** Per-label embedding stats (count + mean L2 norm) — a cheap corpus
    * health check used by the oracle suite.
    */
  def normStats(df: DataFrame, label: String, vec: String): DataFrame =
    df.select(col(label), norm(col(vec)).as("__n"))
      .groupBy(col(label))
      .agg(count(lit(1)).as("n"), round(avg(col("__n")), 6).as("avg_norm"))
}
