package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries summary buffer: parallel key/count arrays, ≤ k entries. */
final case class MgBuf(keys: Array[Long], counts: Array[Long])

/** MISRA-GRIES FREQUENT-ITEMS SUMMARY (Misra & Gries 1982; mergeable
  * form Agarwal et al. PODS 2012) — k counters per group, O(k) state:
  * every item with true frequency > n/(k+1) is GUARANTEED present in
  * the summary, and each kept count undercounts by ≤ n/(k+1). The
  * deterministic counterpart to the CMS sketch (q76): no hashing, no
  * collision noise, a hard superset guarantee.
  *
  * Counter VALUES are stream-order dependent (any MG implementation's
  * are), so the engine uses the summary the way production does: as the
  * CANDIDATE GENERATOR of a two-pass exact heavy-hitters (the q224
  * pattern — pass 2 recounts candidates exactly, making the final
  * output order-independent and oracle-checkable).
  *
  * reduce: increment a present key, else occupy a free slot, else
  * decrement ALL counters (dropping zeros) — the classic amortized
  * O(1) form. merge: sum counts keywise, then subtract the (k+1)-th
  * largest count and drop non-positives (Agarwal et al. §3.2), which
  * preserves the error bound under arbitrary merge trees — what makes
  * the summary safe for partial aggregation across 1000 executors.
  */
final class MgAgg(k: Int) extends Aggregator[Long, MgBuf, MgBuf] {
  require(k >= 1 && k <= 100000, s"MG counter budget must be in [1, 1e5]: $k")

  override def zero: MgBuf = MgBuf(Array.emptyLongArray, Array.emptyLongArray)

  override def reduce(b: MgBuf, id: Long): MgBuf = {
    val i = b.keys.indexOf(id)
    if (i >= 0) { b.counts(i) += 1L; b }
    else if (b.keys.length < k)
      MgBuf(b.keys :+ id, b.counts :+ 1L)
    else {
      // decrement step: all counters down one, evict zeros
      var j = 0
      while (j < b.counts.length) { b.counts(j) -= 1L; j += 1 }
      val keep = b.counts.indices.filter(b.counts(_) > 0L).toArray
      MgBuf(keep.map(b.keys), keep.map(b.counts))
    }
  }

  override def merge(a: MgBuf, b: MgBuf): MgBuf = {
    val m = scala.collection.mutable.LongMap.empty[Long]
    var i = 0
    while (i < a.keys.length) { m(a.keys(i)) = m.getOrElse(a.keys(i), 0L) + a.counts(i); i += 1 }
    i = 0
    while (i < b.keys.length) { m(b.keys(i)) = m.getOrElse(b.keys(i), 0L) + b.counts(i); i += 1 }
    if (m.size <= k) {
      val ks = m.keys.toArray.sorted // deterministic layout
      MgBuf(ks, ks.map(m))
    } else {
      // subtract the (k+1)-th largest count, drop non-positives
      val cs = m.values.toArray.sorted(Ordering.Long.reverse)
      val sub = cs(k)
      val kept = m.iterator.map { case (key, c) => (key, c - sub) }
        .filter(_._2 > 0L).toArray.sortBy(_._1)
      MgBuf(kept.map(_._1), kept.map(_._2))
    }
  }

  override def finish(r: MgBuf): MgBuf =
    MgBuf(r.keys.clone(), r.counts.clone())

  override def bufferEncoder: Encoder[MgBuf] = Encoders.product[MgBuf]
  override def outputEncoder: Encoder[MgBuf] = Encoders.product[MgBuf]
}
