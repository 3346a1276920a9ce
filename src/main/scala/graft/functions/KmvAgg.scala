package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** KMV buffer/output shells. `mins` is ascending, duplicate-free, and
  * capped at k — the k minimum values of the observed hash set.
  */
final case class KmvBuf(mins: Array[Long])
final case class KmvOut(sketch: Array[Long], estimate: Double)

/** K-Minimum-Values distinct-count sketch (Bar-Yossef et al. 2002;
  * Beyer et al. "On synopses for distinct-value estimation under
  * multiset operations", SIGMOD'07) as a typed Aggregator over
  * pre-hashed rows.
  *
  * Why this sketch here: unlike HLL (`approx_count_distinct`), the KMV
  * synopsis is ORDER-STATISTIC-exact — for a fixed hash function the
  * sketch and the estimate are deterministic values a second engine can
  * recompute from scratch in SQL. The q51 oracle does exactly that in
  * DuckDB (same md5-prefix hash, same k-th-minimum arithmetic), making
  * this the rare approximate operator with a bit-exact cross-engine
  * check. The estimator over the 2^60 hash space:
  *   distinct < k  → exact (the sketch IS the value set)
  *   otherwise     → (k-1) * 2^60 / kthMin
  *
  * Scale shape: map-side partial buffers (≤ k longs each) merge
  * associatively, so a group with billions of members ships k longs per
  * partition, and sketches persisted per shard/day can be merged later
  * for rollups without touching raw data — the multiset-union property
  * HLL shares but exact distinct does not.
  */
final class KmvAgg(k: Int) extends Aggregator[Long, KmvBuf, KmvOut] {
  require(k >= 2, s"KMV needs k >= 2 (got $k)")

  override def zero: KmvBuf = KmvBuf(Array.emptyLongArray)

  override def reduce(b: KmvBuf, h: Long): KmvBuf = {
    val m = b.mins
    if (m.length >= k && h >= m(m.length - 1)) return b
    val pos = java.util.Arrays.binarySearch(m, h)
    if (pos >= 0) return b // duplicate hash: KMV is a set synopsis
    val ins = -pos - 1
    val n = math.min(m.length + 1, k)
    val out = new Array[Long](n)
    System.arraycopy(m, 0, out, 0, ins)
    out(ins) = h
    System.arraycopy(m, ins, out, ins + 1, n - ins - 1)
    KmvBuf(out)
  }

  override def merge(a: KmvBuf, b: KmvBuf): KmvBuf = {
    val (x, y) = (a.mins, b.mins)
    if (x.isEmpty) return b
    if (y.isEmpty) return a
    val out = new Array[Long](math.min(x.length + y.length, k))
    var i = 0; var j = 0; var n = 0
    var last = Long.MinValue
    var first = true
    while (n < out.length && (i < x.length || j < y.length)) {
      val v =
        if (j >= y.length || (i < x.length && x(i) <= y(j))) { val t = x(i); i += 1; t }
        else { val t = y(j); j += 1; t }
      if (first || v != last) { out(n) = v; n = n + 1; last = v; first = false }
    }
    KmvBuf(if (n == out.length) out else java.util.Arrays.copyOf(out, n))
  }

  override def finish(b: KmvBuf): KmvOut = {
    // kthMin == 0 (possible in principle over the 60-bit hash space)
    // would make the ratio Infinity; the exact count is the right answer
    // there too (k distinct values seen, all hashes ≤ 0 ⇒ degenerate)
    val est =
      if (b.mins.length < k || b.mins.last == 0L) b.mins.length.toDouble
      else (k - 1).toDouble * (1L << 60).toDouble / b.mins.last.toDouble
    KmvOut(b.mins, est)
  }

  override def bufferEncoder: Encoder[KmvBuf] = Encoders.product[KmvBuf]
  override def outputEncoder: Encoder[KmvOut] = Encoders.product[KmvOut]
}
