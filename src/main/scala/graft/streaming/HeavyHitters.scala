package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming heavy hitters: a Misra–Gries summary per hash bucket — the
  * bounded-state twin of [[graft.operators.TextAnalysis.vocabTopK]]. Exact
  * streaming token counts need state proportional to the vocabulary; the
  * Misra–Gries summary keeps at most `m` counters per bucket and still
  * guarantees, after `n` tokens, that every token with true count `> n/m`
  * is PRESENT and its estimate undershoots by at most `n/m` — the classic
  * frequent-elements contract, and the summary merges across buckets by
  * counter addition (each bucket owns a disjoint token partition here, so
  * the merge is a plain union).
  *
  * State per key: one bounded `Map[token → counter]` (≤ m entries) plus the
  * processed-count scalar; shuffle is keyed by the token-hash bucket, so a
  * hot token never concentrates more than its own bucket.
  */
object HeavyHitters {

  case class Tok(bucket: Int, token: String)

  /** A bucket's current summary, re-emitted each micro-batch (update
    * mode): bounded counters + how many tokens the bucket has folded.
    */
  case class Summary(bucket: Int, tokens: Seq[String], counts: Seq[Long], processed: Long)

  def streaming(ds: Dataset[Tok], m: Int): Dataset[Summary] = {
    require(m >= 1, s"need at least one counter, got $m")
    val spark = ds.sparkSession
    import spark.implicits._
    ds.groupByKey(_.bucket)
      .mapGroupsWithState[Summary, Summary](GroupStateTimeout.NoTimeout) {
        (b: Int, it: Iterator[Tok], gs: GroupState[Summary]) =>
          var cnt: Map[String, Long] = gs.getOption
            .map(s => s.tokens.zip(s.counts).toMap).getOrElse(Map.empty)
          var processed = gs.getOption.map(_.processed).getOrElse(0L)
          it.foreach { t =>
            processed += 1
            cnt.get(t.token) match {
              case Some(c) => cnt += t.token -> (c + 1)
              case None if cnt.size < m => cnt += t.token -> 1L
              case None => // Misra–Gries decrement step
                cnt = cnt.flatMap { case (k, c) =>
                  if (c > 1) Some(k -> (c - 1)) else None
                }
            }
          }
          val ordered = cnt.toSeq.sortBy { case (k, c) => (-c, k) }
          val s = Summary(b, ordered.map(_._1), ordered.map(_._2), processed)
          gs.update(s)
          s
      }
  }
}
