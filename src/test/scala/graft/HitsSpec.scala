package graft

import graft.graph.Hits

/** Fixed-point HITS (graph/Hits.scala): analytic fixed points on a
  * single edge, a shared authority, and a chain; directional
  * asymmetry; duplicate-edge tolerance.
  */
class HitsSpec extends SparkSpec {

  private val S = Hits.Scale

  private def run(edges: Seq[(Long, Long)], iters: Int = 4) = {
    val s = spark
    import s.implicits._
    Hits.hitsFixedPoint(s, edges.toDF("u", "v"), iters)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
  }

  test("single edge: the source is the unit hub, the target the unit authority") {
    val got = run(Seq((1L, 2L)))
    assert(got === Map(1L -> ((S, 0L)), 2L -> ((0L, S))))
  }

  test("two hubs sharing one authority score symmetrically") {
    val got = run(Seq((1L, 3L), (2L, 3L)))
    assert(got(3L) === ((0L, S)))
    assert(got(1L) === ((S, 0L)) && got(2L) === ((S, 0L)))
  }

  test("chain 1->2->3 reaches its fixed point: 2 is both hub and authority") {
    // a-step: a(2) = a(3) = h/max = S; h-step: h(1) = h(2) = S, h(3) = 0;
    // further rounds are stationary
    val got = run(Seq((1L, 2L), (2L, 3L)))
    assert(got === Map(1L -> ((S, 0L)), 2L -> ((S, S)), 3L -> ((0L, S))))
  }

  test("authority mass follows in-degree of hub endorsements") {
    // hub 1 endorses {10, 11}, hub 2 endorses {10}: after round 1,
    // a(10) = 2S/2 = S, a(11) = S/2; h(1) = (S + S/2)/max, h(2) = S/max
    // with max = 3S/2 -> h(1) = S, h(2) = 666666; round 2:
    // a(10) = (S + 666666), a(11) = S -> a(10) = S, a(11) = 600000
    val got = run(Seq((1L, 10L), (1L, 11L), (2L, 10L)), iters = 4)
    assert(got(10L)._2 === S)
    assert(got(10L)._2 > got(11L)._2, "shared authority must outrank")
    assert(got(1L)._1 === S)
    assert(got(1L)._1 > got(2L)._1, "the broader hub must outrank")
  }

  test("duplicate edges collapse before the recurrence") {
    val once = run(Seq((1L, 2L), (2L, 3L)))
    val dup = run(Seq((1L, 2L), (1L, 2L), (2L, 3L), (2L, 3L)))
    assert(once === dup)
  }
}
