package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming distinct-count dashboard on HyperLogLog state — the live twin
  * of [[graft.operators.Sketches.hllAudit]]: per group, the state store
  * holds exactly `2^p` one-byte registers (256 B at p = 8, at ANY key
  * cardinality — the whole point of the sketch), every micro-batch folds
  * its events in, and each update emits the refreshed estimate. The
  * hash/bucket/rank/estimate arithmetic is BIT-IDENTICAL to the batch
  * operator (same md5-prefix hash, same scaled-BIGINT harmonic sum, same
  * linear-counting fallback), so after any batch split the streaming
  * estimate equals the batch estimate on the same prefix — spec-checked,
  * and the register arrays merge by `max` if shards are ever combined.
  */
object DistinctStream {

  case class KeyedEvent(group: String, key: String)
  case class HllState(regs: Array[Byte])
  case class Estimate(group: String, n_est: Double)

  private def md5Prefix32(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** Fold one key into the register array (batch-identical bucket/rank). */
  private[graft] def update(regs: Array[Byte], key: String, p: Int): Unit = {
    val restBits = 32 - p
    val x = md5Prefix32(key)
    val bucket = (x >>> restBits).toInt
    val rest = x & ((1L << restBits) - 1)
    val rank =
      if (rest == 0L) restBits + 1
      else restBits + 1 - (64 - java.lang.Long.numberOfLeadingZeros(rest))
    if (rank > regs(bucket)) regs(bucket) = rank.toByte
  }

  /** The batch operator's estimate expression, evaluated in the same
    * operation order on the JVM. */
  private[graft] def estimate(regs: Array[Byte], p: Int): Double = {
    val m = 1 << p
    val restBits = 32 - p
    // scale 2^(restBits+1): a saturated register (rank restBits+1) must
    // contribute exactly 1, not `1L << -1` (shift-mod-64 = Long.MIN_VALUE)
    val scale = 1L << (restBits + 1)
    var s = 0L; var zeros = 0L
    var i = 0
    while (i < m) {
      val r = regs(i).toInt
      if (r == 0) { zeros += 1; s += scale }
      else s += 1L << (restBits + 1 - r)
      i += 1
    }
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val raw = alpha * m.toDouble * m.toDouble * scale.toDouble / s.toDouble
    val est =
      if (raw <= 2.5 * m && zeros > 0L) m.toDouble * math.log(m.toDouble / zeros)
      else raw
    BigDecimal(est).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  /** Update-mode stream of per-group estimates; O(2^p) bytes of state per
    * group. */
  def streaming(ds: Dataset[KeyedEvent], p: Int = 8): Dataset[Estimate] = {
    require(p >= 4 && p <= 16, s"p must be in [4,16], got $p")
    val spark = ds.sparkSession
    import spark.implicits._
    ds.filter(e => e.group != null && e.key != null)
      .groupByKey(_.group)
      .mapGroupsWithState[HllState, Estimate](GroupStateTimeout.NoTimeout) {
        (g, it, gs: GroupState[HllState]) =>
          val regs = gs.getOption.map(_.regs).getOrElse(new Array[Byte](1 << p))
          it.foreach(e => update(regs, e.key, p))
          gs.update(HllState(regs))
          Estimate(g, estimate(regs, p))
      }
  }
}
