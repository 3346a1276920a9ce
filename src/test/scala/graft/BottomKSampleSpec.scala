package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{BottomKSample, BottomKSampleAgg, SampBuf}

/** The bottom-k-by-hash sample aggregator behind q64: the retained set
  * must be a pure function of the input SET — invariant to arrival
  * order, partitioning, and merge-tree shape — and the quantile helper
  * must land on the deterministic order-statistic rank.
  */
class BottomKSampleSpec extends AnyFunSuite {

  private val k = 8
  private val agg = new BottomKSampleAgg(k)

  private def run(rows: Seq[(Long, Long, Double)]): SampBuf =
    rows.foldLeft(agg.zero)(agg.reduce)

  test("retained set is invariant to order, partitioning, and merge shape") {
    val r = new scala.util.Random(11)
    val rows = Seq.tabulate(100)(i => (r.nextLong(), i.toLong, r.nextInt(1000).toDouble))
    val base = run(rows)
    (1 to 10).foreach { _ =>
      val shuffled = r.shuffle(rows)
      val cut = 1 + r.nextInt(shuffled.length - 1)
      val (a, b) = shuffled.splitAt(cut)
      val merged = agg.merge(run(a), run(b))
      assert(merged.hv.toSeq == base.hv.toSeq)
      assert(merged.id.toSeq == base.id.toSeq)
      assert(merged.v.toSeq == base.v.toSeq)
    }
    // the retained set IS the bottom-k by (hv, id)
    val want = rows.sortBy(t => (t._1, t._2)).take(k)
    assert(base.hv.toSeq == want.map(_._1))
    assert(base.v.toSeq == want.map(_._3))
  }

  test("duplicate (hash, id) rows keep set semantics in reduce AND merge") {
    val rows = Seq.tabulate(k + 3)(i => (i.toLong * 10, i.toLong, i.toDouble))
    val full = run(rows) // full buffer (k entries)
    // duplicate of the LAST retained element on a full buffer: the
    // pre-fix code indexed one past the end here
    val last = (full.hv(k - 1), full.id(k - 1), full.v(k - 1))
    val again = agg.reduce(full, last)
    assert(again.hv.toSeq == full.hv.toSeq && again.id.toSeq == full.id.toSeq)
    // the same rows split into two buffers that SHARE entries merge
    // without duplicates
    val merged = agg.merge(run(rows.take(6)), run(rows.drop(2)))
    assert(merged.hv.toSeq == full.hv.toSeq)
    assert(merged.id.toSeq.distinct == merged.id.toSeq)
  }

  test("groups smaller than k keep everything") {
    val rows = Seq((5L, 1L, 10.0), (3L, 2L, 20.0), (9L, 3L, 30.0))
    val b = run(rows)
    assert(b.hv.toSeq == Seq(3L, 5L, 9L))
    assert(b.v.toSeq == Seq(20.0, 10.0, 30.0))
  }

  test("quantile helper lands on the integer order-statistic rank") {
    val vals = Array(40.0, 10.0, 30.0, 20.0, 50.0)
    val ids = Array(1L, 2L, 3L, 4L, 5L)
    // sorted by (value, id): 10,20,30,40,50; ranks 5*(4)/10=2 -> 30; 9*4/10=3 -> 40
    assert(BottomKSample.quantile(vals, ids, 5, 10) == 30.0)
    assert(BottomKSample.quantile(vals, ids, 9, 10) == 40.0)
    // ties break by id: two equal values keep a deterministic order
    val tied = Array(10.0, 10.0, 20.0)
    assert(BottomKSample.quantile(tied, Array(7L, 3L, 9L), 5, 10) == 10.0)
  }
}
