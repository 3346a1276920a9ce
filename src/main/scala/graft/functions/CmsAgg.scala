package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Count-Min sketch buffer: `counters` is depth×width row-major, or
  * empty for the zero buffer (so empty partitions cost nothing to ship).
  */
final case class CmsBuf(counters: Array[Long])

/** Count-Min sketch (Cormode & Muthukrishnan, "An improved data stream
  * summary: the count-min sketch and its applications", J. Algorithms
  * 2005) as a typed Aggregator. Input rows are the PRE-COMPUTED bucket
  * indexes of one item — one index per depth row, produced by column
  * expressions — which keeps the hash family OUTSIDE the aggregator
  * where both engines can state it exactly: the q76 oracle rebuilds the
  * whole sketch in DuckDB from the same md5-prefix indexes and
  * reproduces every counter and every estimate bit-for-bit. (The same
  * cross-engine trick as [[KmvAgg]]'s md5-prefix hash: determinism is
  * what turns an approximate operator into a hash-checkable one.)
  *
  * Estimates: `CmsAgg.estimate(buf, idx)` = min over rows of the
  * addressed counters — an OVERESTIMATE of the item's true count,
  * never an under (the sketch's defining guarantee; CmsSpec pins it).
  *
  * Scale shape: one depth×width long array per map partition, merged by
  * elementwise addition — a group with billions of members ships
  * depth×width longs per partition, and sketches persisted per
  * shard/day merge later for rollups without touching raw data.
  */
final class CmsAgg(depth: Int, width: Int)
    extends Aggregator[Seq[Long], CmsBuf, CmsBuf] {
  require(depth >= 1 && width >= 2, s"bad CMS shape ${depth}x$width")

  override def zero: CmsBuf = CmsBuf(Array.emptyLongArray)

  private def alloc(b: CmsBuf): Array[Long] =
    if (b.counters.isEmpty) new Array[Long](depth * width) else b.counters

  override def reduce(b: CmsBuf, idx: Seq[Long]): CmsBuf = {
    require(idx.length == depth, s"expected $depth indexes, got ${idx.length}")
    val c = alloc(b)
    var i = 0
    while (i < depth) {
      val j = idx(i)
      require(j >= 0 && j < width, s"index $j out of [0, $width)")
      c(i * width + j.toInt) += 1
      i += 1
    }
    CmsBuf(c)
  }

  override def merge(a: CmsBuf, b: CmsBuf): CmsBuf = {
    if (a.counters.isEmpty) return b
    if (b.counters.isEmpty) return a
    val out = a.counters.clone()
    var i = 0
    while (i < out.length) { out(i) += b.counters(i); i += 1 }
    CmsBuf(out)
  }

  override def finish(b: CmsBuf): CmsBuf =
    if (b.counters.isEmpty) CmsBuf(new Array[Long](depth * width)) else b

  override def bufferEncoder: Encoder[CmsBuf] = Encoders.product[CmsBuf]
  override def outputEncoder: Encoder[CmsBuf] = Encoders.product[CmsBuf]
}

object CmsAgg {
  /** point query: min of the addressed counters across depth rows */
  def estimate(buf: CmsBuf, idx: Seq[Long], depth: Int, width: Int): Long = {
    require(buf.counters.length == depth * width, "sketch shape mismatch")
    var best = Long.MaxValue
    var i = 0
    while (i < depth) {
      val v = buf.counters(i * width + idx(i).toInt)
      if (v < best) best = v
      i += 1
    }
    best
  }
}
