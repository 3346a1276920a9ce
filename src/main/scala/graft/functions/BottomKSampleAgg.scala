package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bottom-k-by-hash sample buffer: parallel arrays sorted ascending by
  * (hv, id), capped at k. The (hv, id) pair is a total order (ids are
  * unique), so the retained set is a pure function of the input SET —
  * independent of partitioning, arrival order, or merge tree shape.
  */
final case class SampBuf(hv: Array[Long], id: Array[Long], v: Array[Double])

/** Deterministic uniform row sample via bottom-k-by-hash (the classic
  * distributed sampling pattern: the k rows with the smallest hash of
  * their unique id ARE a uniform sample of the group, and two nodes'
  * bottom-k sets merge associatively into the group's bottom-k).
  *
  * Unlike `TABLESAMPLE`/`rand()` sampling, the result is a value a
  * second engine can recompute exactly — the q64 oracle re-derives the
  * same sample in DuckDB with the same md5-prefix hash and row_number,
  * then the same order-statistic quantile estimates, giving an
  * approximate-quantile operator with a BIT-EXACT cross-engine check
  * (same property as [[KmvAgg]] for distinct counts).
  *
  * Scale shape: map-side partial buffers of ≤ k (hash, id, value)
  * triples merge associatively — a group of any size ships k rows per
  * partition; samples persisted per shard merge later for rollups.
  */
final class BottomKSampleAgg(k: Int)
    extends Aggregator[(Long, Long, Double), SampBuf, SampBuf] {
  require(k >= 1, s"bottom-k sample needs k >= 1 (got $k)")

  override def zero: SampBuf = SampBuf(Array.emptyLongArray, Array.emptyLongArray,
    Array.emptyDoubleArray)

  private def lessEq(h1: Long, i1: Long, h2: Long, i2: Long): Boolean =
    h1 < h2 || (h1 == h2 && i1 <= i2)

  override def reduce(b: SampBuf, row: (Long, Long, Double)): SampBuf = {
    val (h, i, value) = row
    val n = b.hv.length
    if (n >= k && !lessEq(h, i, b.hv(n - 1), b.id(n - 1))) return b
    // insertion point in the (hv, id) order
    var ins = 0
    while (ins < n && lessEq(b.hv(ins), b.id(ins), h, i)) ins += 1
    // duplicate (hv, id) — the row is already in the sample (set
    // semantics, as KMV): without this, a duplicate id landing on a
    // full buffer would index one past the end
    if (ins > 0 && b.hv(ins - 1) == h && b.id(ins - 1) == i) return b
    val m = math.min(n + 1, k)
    val oh = new Array[Long](m); val oi = new Array[Long](m); val ov = new Array[Double](m)
    System.arraycopy(b.hv, 0, oh, 0, ins)
    System.arraycopy(b.id, 0, oi, 0, ins)
    System.arraycopy(b.v, 0, ov, 0, ins)
    oh(ins) = h; oi(ins) = i; ov(ins) = value
    System.arraycopy(b.hv, ins, oh, ins + 1, m - ins - 1)
    System.arraycopy(b.id, ins, oi, ins + 1, m - ins - 1)
    System.arraycopy(b.v, ins, ov, ins + 1, m - ins - 1)
    SampBuf(oh, oi, ov)
  }

  override def merge(a: SampBuf, b: SampBuf): SampBuf = {
    if (a.hv.isEmpty) return b
    if (b.hv.isEmpty) return a
    val m = math.min(a.hv.length + b.hv.length, k)
    val oh = new Array[Long](m); val oi = new Array[Long](m); val ov = new Array[Double](m)
    var i = 0; var j = 0; var n = 0
    var first = true
    while (n < m && (i < a.hv.length || j < b.hv.length)) {
      val takeA = j >= b.hv.length ||
        (i < a.hv.length && lessEq(a.hv(i), a.id(i), b.hv(j), b.id(j)))
      val (ch, ci, cv) =
        if (takeA) { val t = (a.hv(i), a.id(i), a.v(i)); i += 1; t }
        else { val t = (b.hv(j), b.id(j), b.v(j)); j += 1; t }
      // duplicate-id rows may appear in both partial buffers: set semantics
      if (first || ch != oh(n - 1) || ci != oi(n - 1)) {
        oh(n) = ch; oi(n) = ci; ov(n) = cv; n += 1; first = false
      }
    }
    if (n == m) SampBuf(oh, oi, ov)
    else SampBuf(java.util.Arrays.copyOf(oh, n), java.util.Arrays.copyOf(oi, n),
      java.util.Arrays.copyOf(ov, n))
  }

  override def finish(b: SampBuf): SampBuf = b

  override def bufferEncoder: Encoder[SampBuf] = Encoders.product[SampBuf]
  override def outputEncoder: Encoder[SampBuf] = Encoders.product[SampBuf]
}

object BottomKSample {
  /** order-statistic quantile estimate from a sample: the value at
    * integer rank `num*(m-1)/den` of the sample sorted by (value, id) —
    * integer arithmetic only, so a SQL oracle lands on the same element
    */
  def quantile(values: Array[Double], ids: Array[Long], num: Int, den: Int): Double = {
    require(values.nonEmpty, "quantile of an empty sample")
    val order = values.indices.sortBy(ix => (values(ix), ids(ix)))
    values(order(num * (values.length - 1) / den))
  }
}
