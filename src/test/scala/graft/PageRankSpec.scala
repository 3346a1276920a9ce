package graft

import org.apache.spark.sql.functions._
import graft.graph.PageRank

class PageRankSpec extends SparkSpec {

  /** driver-side replay of the exact integer recurrence */
  private def replay(edges: Seq[(Long, Long)], iters: Int,
      mass: Long = 1000000000000L): Map[Long, Long] = {
    val ed = edges.distinct
    val deg = ed.groupBy(_._1).map { case (u, es) => u -> es.length.toLong }
    val n = deg.size
    val rUnit = mass / n
    val base = (rUnit * 15) / 100
    var r: Map[Long, Long] = deg.keys.map(_ -> rUnit).toMap
    for (_ <- 1 to iters) {
      val in = ed.groupBy(_._2).map { case (v, es) =>
        v -> es.map { case (u, _) => r(u) / deg(u) }.sum
      }
      r = deg.keys.map(u => u -> (base + (85 * in.getOrElse(u, 0L)) / 100)).toMap
    }
    r
  }

  private def run(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val s = spark
    import s.implicits._
    PageRank.pagerankFixedPoint(s, edges.toDF("u", "v"), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("matches the integer recurrence on a symmetric star graph") {
    // center 0 linked to 1,2,3 — authority concentrates at the center
    val e0 = Seq((0L, 1L), (0L, 2L), (0L, 3L))
    val edges = e0 ++ e0.map(_.swap)
    for (iters <- Seq(1, 3, 5)) {
      val got = run(edges, iters)
      assert(got == replay(edges, iters), s"iters=$iters")
    }
    val r5 = run(edges, 5)
    assert(r5(0L) > r5(1L) && r5(1L) == r5(2L) && r5(2L) == r5(3L))
  }

  test("matches the recurrence on an asymmetric directed graph; no-inlink node keeps base") {
    // 1 -> 2 -> 3 -> 2 (3 and 2 cycle; 1 has no in-links)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 2L))
    val got = run(edges, 4)
    assert(got == replay(edges, 4))
    val mass = 1000000000000L
    val base = ((mass / 3) * 15) / 100
    assert(got(1L) == base) // nobody links to 1: damped base only
  }

  test("mass is conserved up to truncation on a symmetric graph") {
    val rnd = new scala.util.Random(7)
    val e0 = (0 until 200).map(_ => (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter { case (a, b) => a != b }.distinct
    val edges = e0 ++ e0.map(_.swap)
    val mass = 1000000000000L
    val got = run(edges, 5)
    val total = got.values.sum
    // each node truncates < deg micro-units per div, 5 iterations:
    // conservatively < 100 * |edges| total loss
    assert(total <= mass && total > mass - 100L * edges.length)
  }

  test("duplicate input edges do not double-count") {
    val edges = Seq((1L, 2L), (2L, 1L))
    val got = run(edges ++ edges ++ edges, 3)
    assert(got == replay(edges, 3))
  }
}
