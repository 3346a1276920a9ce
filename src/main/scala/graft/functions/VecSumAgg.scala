package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Buffer / output shells with clean product encoders (arrays land as
  * primitive array<double> in Tungsten rows).
  */
final case class VecBuf(sum: Array[Double], n: Long)
final case class VecMean(mean: Array[Double])

/** Typed Aggregator for element-wise vector mean over `Seq[Float]` rows —
  * the custom-Aggregator item of SURVEY.md §7.4, exercised here on
  * embedding centroids. Partial aggregation is natural: per-partition
  * buffers sum locally (map-side combine) and merge() adds buffers, so
  * the shuffle carries one (dim+1)-double buffer per group per partition
  * instead of every row — the property that matters when a group has
  * millions of members at 100 TB.
  */
final class VecMeanAgg(dim: Int) extends Aggregator[Seq[Float], VecBuf, VecMean] {

  override def zero: VecBuf = VecBuf(new Array[Double](dim), 0L)

  override def reduce(b: VecBuf, v: Seq[Float]): VecBuf = {
    val acc = b.sum
    var i = 0
    val n = math.min(dim, v.length)
    while (i < n) { acc(i) += v(i); i += 1 }
    VecBuf(acc, b.n + 1)
  }

  override def merge(a: VecBuf, b: VecBuf): VecBuf = {
    val acc = a.sum
    var i = 0
    while (i < dim) { acc(i) += b.sum(i); i += 1 }
    VecBuf(acc, a.n + b.n)
  }

  override def finish(b: VecBuf): VecMean = {
    val out = new Array[Double](dim)
    var i = 0
    while (i < dim) { out(i) = b.sum(i) / b.n; i += 1 }
    VecMean(out)
  }

  override def bufferEncoder: Encoder[VecBuf] = Encoders.product[VecBuf]
  override def outputEncoder: Encoder[VecMean] = Encoders.product[VecMean]
}
