package graft

import graft.functions.{KmvAgg, KmvBuf}

/** The mergeability property q147 rests on: min-k of a union is
  * computable from the partial min-k sets — proven here directly on
  * the aggregator's own merge, including past-k overflow.
  */
class SketchRollupSpec extends SparkSpec {

  private def sketchOf(agg: KmvAgg, xs: Seq[Long]): KmvBuf =
    xs.foldLeft(agg.zero)(agg.reduce)

  test("merging partial sketches equals sketching the union, past k") {
    val k = 8
    val agg = new KmvAgg(k)
    val rnd = new scala.util.Random(13)
    val a = Seq.fill(100)(rnd.nextLong() & Long.MaxValue)
    val b = Seq.fill(100)(rnd.nextLong() & Long.MaxValue) ++ a.take(20) // overlap
    val merged = agg.merge(sketchOf(agg, a), sketchOf(agg, b))
    val direct = sketchOf(agg, a ++ b)
    assert(merged.mins.toSeq == direct.mins.toSeq)
    assert(agg.finish(merged).estimate == agg.finish(direct).estimate)
  }

  test("merge is associative and commutative") {
    val agg = new KmvAgg(4)
    val xs = Seq(Seq(5L, 9L, 1L), Seq(7L, 2L), Seq(8L, 3L, 6L, 4L, 0L))
    val sks = xs.map(sketchOf(agg, _))
    val abc = agg.merge(agg.merge(sks(0), sks(1)), sks(2))
    val cba = agg.merge(sks(2), agg.merge(sks(1), sks(0)))
    assert(abc.mins.toSeq == cba.mins.toSeq)
    assert(abc.mins.toSeq == Seq(0L, 1L, 2L, 3L))
  }
}
