package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's related-PV co-occurrence graph (SURVEY.md §2.4 J3/J4 and
  * §2.3 A4; cache.py:785-880, webapp.py:419-445) generalized to any
  * (groupId, member) relation: members sharing a group are an undirected
  * weighted edge.
  *
  * Scale shape: edges are built per-group with an array self-combination
  * (`collect_set` + lambda expansion) instead of a row self-join, so the only
  * shuffles are the groupBys — no quadratic join of the full relation, and
  * skewed giant groups can be capped with `slice` before expansion.
  */
object Pairs {

  /** J3 — undirected co-occurrence edges from a (group, member) relation with
    * canonical order m1 < m2 (cache.py:864-880): score = number of groups the
    * pair shares.
    *
    * `maxGroupSize` is the skew guard: a group of k members expands to k²/2
    * pair rows, so one viral group can dominate the stage — capping takes
    * the first `maxGroupSize` members (sorted, deterministic) and bounds
    * per-row expansion. None = exact.
    */
  def coOccurrence(df: DataFrame, group: String, member: String,
      maxGroupSize: Option[Int] = None): DataFrame = {
    val collected = df.groupBy(col(group)).agg(sort_array(collect_set(col(member))).as("__all"))
    val members = maxGroupSize match {
      case Some(cap) => collected.select(slice(col("__all"), 1, cap).as("__ms"))
      case None => collected.withColumnRenamed("__all", "__ms")
    }
    // all ordered pairs (i < j) of each group's member set. JIT expansion
    // for the common long/string member types (nested Catalyst `transform`
    // lambdas evaluate interpreted, per pair); generic array-lambda
    // fallback for anything else.
    import org.apache.spark.sql.types.{LongType, StringType}
    val pairs = df.schema(member).dataType match {
      case LongType =>
        val pu = udf { (ms: Seq[Long]) => triangle(ms) }
        members.select(explode(pu(col("__ms"))).as("__p"))
          .select(col("__p._1").as("m1"), col("__p._2").as("m2"))
      case StringType =>
        val pu = udf { (ms: Seq[String]) => triangle(ms) }
        members.select(explode(pu(col("__ms"))).as("__p"))
          .select(col("__p._1").as("m1"), col("__p._2").as("m2"))
      case _ =>
        members.select(
          explode(flatten(transform(
            col("__ms"),
            (m1, i) => transform(slice(col("__ms"), i + 2, size(col("__ms"))), m2 => struct(m1.as("_1"), m2.as("_2")))
          ))).as("__p"))
          .select(col("__p._1").as("m1"), col("__p._2").as("m2"))
    }
    pairs.groupBy(col("m1"), col("m2")).agg(count(lit(1)).as("score"))
  }

  private def triangle[T](ms: Seq[T]): Seq[(T, T)] = {
    val n = ms.length
    val out = new scala.collection.mutable.ArrayBuffer[(T, T)](math.max(n * (n - 1) / 2, 0))
    var i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) { out += ((ms(i), ms(j))); j += 1 }
      i += 1
    }
    out.toSeq
  }

  /** A4 max-merge (cache.py:804-835): collapse duplicate / reversed edges to
    * canonical (least, greatest) with the max score.
    */
  def mergeScores(edges: DataFrame, m1: String, m2: String, score: String): DataFrame =
    edges
      .groupBy(least(col(m1), col(m2)).as("m1"), greatest(col(m1), col(m2)).as("m2"))
      .agg(max(col(score)).as("score"))

  /** J4/O2 `get_related` (cache.py:785-802): top-k neighbors of one node —
    * union of both edge directions, ordered by score (deterministic
    * tie-break on the neighbor id).
    */
  def related(edges: DataFrame, m1: String, m2: String, score: String, node: Column, k: Int): DataFrame = {
    val left = edges.where(col(m1) === node).select(col(m2).as("other"), col(score))
    val right = edges.where(col(m2) === node).select(col(m1).as("other"), col(score))
    left.unionByName(right).orderBy(col(score).desc, col("other")).limit(k)
  }

  /** J4 as a POINT query, without materializing the graph: top-k
    * co-occurrence neighbors of ONE node, computed from only the groups
    * that contain it. The reference (and [[related]]) answers this by
    * first building every pair's score — fine when the graph is cached,
    * quadratic waste for one ad-hoc node at 100 TB. Here a broadcast
    * semi-join on the node's own groups (bounded: one row per group the
    * node appears in) restricts the scan, then a plain count per
    * co-member. Result is identical to
    * `related(coOccurrence(df, group, member), "m1", "m2", "score", node, k)`.
    */
  def relatedDirect(df: DataFrame, group: String, member: String, node: Any, k: Int): DataFrame = {
    val rows = df.select(col(group).as("__g"), col(member).as("__m"))
    val nodeGroups = rows.where(col("__m") === lit(node))
      .select(col("__g").as("__ng")).distinct()
    // join the RAW rows against the node's groups FIRST (Catalyst cannot
    // push a join below an aggregate, so distinct-then-join would still
    // shuffle the whole relation); dedupe only the survivors. Null-safe
    // key: coOccurrence's groupBy keeps a null group, so this must too.
    rows.join(broadcast(nodeGroups), col("__g") <=> col("__ng"))
      .where(col("__m") =!= lit(node))
      .select(col("__g"), col("__m"))
      .distinct()
      .groupBy(col("__m"))
      .agg(count(lit(1)).as("score"))
      .select(col("__m").as("other"), col("score"))
      .orderBy(col("score").desc, col("other"))
      .limit(k)
  }

  /** A4 sum-variant (webapp.py:419-437): related-to-any of a set of nodes,
    * scores summed across the set, top-k.
    */
  def relatedToSet(edges: DataFrame, m1: String, m2: String, score: String, nodes: Seq[Any], k: Int): DataFrame = {
    val left = edges.where(col(m1).isin(nodes: _*)).select(col(m2).as("other"), col(score))
    val right = edges.where(col(m2).isin(nodes: _*)).select(col(m1).as("other"), col(score))
    left
      .unionByName(right)
      .where(!col("other").isin(nodes: _*))
      .groupBy(col("other"))
      .agg(sum(col(score)).as("score"))
      .orderBy(col("score").desc, col("other"))
      .limit(k)
  }
}
