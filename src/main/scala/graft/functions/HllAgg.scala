package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** HyperLogLog register buffer: one max-rank byte per bucket. */
final case class HllBuf(regs: Array[Byte])

/** HyperLogLog distinct-count sketch (Flajolet et al. 2007) over the
  * engine's 60-bit md5-prefix hash (`SketchAggOps.kmvHash`) — the
  * constant-size companion to the KMV sketch: 2^p bytes of state per
  * group, elementwise-max merge, so shards/days can persist registers
  * and roll them up later without raw data (like q51/q147, but with
  * O(1) rather than O(k) update cost and the classical ±1.04/√m error).
  *
  * DETERMINISM: bucket = top p bits of the hash, rank ρ = leading-zero
  * count of the remaining W = 60−p bits plus one (ρ ∈ [1, W+1]; an
  * all-zero remainder pins ρ = W+1). Both are pure integer functions of
  * the md5 hash, and `length(bin(rem))` computes the bit length in both
  * engines — so the full register table, not just the estimate, is
  * SQL-replayable and the driver hash-checks an approximate operator
  * exactly (the q51 property, ported to HLL).
  *
  * The buffer mutates in place (the Aggregator contract allows it);
  * merge is elementwise max — associative, commutative, idempotent,
  * which is what makes partial aggregation and later rollups exact.
  */
final class HllAgg(p: Int) extends Aggregator[Long, HllBuf, Array[Byte]] {
  require(p >= 4 && p <= 16, s"HLL precision p must be in [4,16]: $p")
  private val m = 1 << p
  private val w = 60 - p // remainder width under the 60-bit hash

  override def zero: HllBuf = HllBuf(new Array[Byte](m))

  override def reduce(b: HllBuf, hv: Long): HllBuf = {
    val bucket = (hv >>> w).toInt
    val rem = hv & ((1L << w) - 1)
    val rho = (w - (64 - java.lang.Long.numberOfLeadingZeros(rem)) + 1).toByte
    if (rho > b.regs(bucket)) b.regs(bucket) = rho
    b
  }

  override def merge(a: HllBuf, b: HllBuf): HllBuf = {
    var i = 0
    while (i < m) {
      if (b.regs(i) > a.regs(i)) a.regs(i) = b.regs(i)
      i += 1
    }
    a
  }

  override def finish(r: HllBuf): Array[Byte] = r.regs

  override def bufferEncoder: Encoder[HllBuf] = Encoders.product[HllBuf]
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

object HllAgg {
  /** Estimate from a register array under hash width 60: the raw
    * harmonic-mean estimate with the standard linear-counting branch
    * for the small range. The denominator Σ 2^(W+1−reg) is an EXACT
    * long in units of 2^−(W+1) (empty buckets contribute 2^(W+1)), so
    * the only floating steps are one division by it, or one ln — both
    * replayed with the identical expression shape in the oracle.
    */
  def estimate(regs: Array[Byte], p: Int): Double = {
    val m = 1 << p
    val wp1 = 60 - p + 1
    val denom = denomUnits(regs, p)
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / m)
    }
    val raw = alpha * m * m * (1L << wp1).toDouble / denom.toDouble
    val zeros = regs.count(_ == 0)
    if (raw <= 2.5 * m && zeros > 0) m.toDouble * math.log(m.toDouble / zeros)
    else raw
  }

  /** Σ 2^(W+1−reg) in exact long units of 2^−(W+1); fits a long for
    * p ≥ 4 (≤ 2^p · 2^(61−p) = 2^61).
    */
  def denomUnits(regs: Array[Byte], p: Int): Long = {
    val wp1 = 60 - p + 1
    var d = 0L
    var i = 0
    while (i < regs.length) { d += 1L << (wp1 - regs(i)); i += 1 }
    d
  }
}
