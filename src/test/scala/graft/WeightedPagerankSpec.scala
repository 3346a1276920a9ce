package graft

import org.apache.spark.sql.functions._
import graft.graph.PageRank

class WeightedPagerankSpec extends SparkSpec {

  /** driver-side replay of the weighted integer recurrence */
  private def replay(edges: Seq[(Long, Long, Long)], iters: Int,
      mass: Long = 1000000000000L): Map[Long, Long] = {
    val ed = edges.groupBy(e => (e._1, e._2))
      .map { case ((u, v), es) => (u, v, es.map(_._3).sum) }.toSeq
    val wu = ed.groupBy(_._1).map { case (u, es) => u -> es.map(_._3).sum }
    val n = wu.size
    val rUnit = mass / n
    val base = (rUnit * 15) / 100
    var r: Map[Long, Long] = wu.keys.map(_ -> rUnit).toMap
    for (_ <- 1 to iters) {
      val in = ed.groupBy(_._2).map { case (v, es) =>
        v -> es.map { case (u, _, w) => (r(u) * w) / wu(u) }.sum
      }
      r = wu.keys.map(u => u -> (base + (85 * in.getOrElse(u, 0L)) / 100)).toMap
    }
    r
  }

  private def run(edges: Seq[(Long, Long, Long)], iters: Int): Map[Long, Long] = {
    val s = spark
    import s.implicits._
    PageRank.weightedPagerank(s, edges.toDF("u", "v", "w"), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("weight skew pulls rank toward the heavy edge; matches the recurrence") {
    // 1 sends 9/10 of its rank to 2 and 1/10 to 3; all edges reciprocated
    val edges = Seq((1L, 2L, 9L), (1L, 3L, 1L),
      (2L, 1L, 1L), (3L, 1L, 1L))
    for (iters <- Seq(1, 3, 5)) {
      val got = run(edges, iters)
      assert(got == replay(edges, iters), s"iters=$iters")
    }
    val r = run(edges, 5)
    assert(r(2L) > r(3L), s"the weight-9 target should outrank the weight-1: $r")
  }

  test("uniform weights reduce to unweighted pagerank") {
    val e0 = Seq((1L, 2L), (2L, 3L), (3L, 1L), (2L, 1L), (3L, 2L), (1L, 3L))
    val weighted = run(e0.map { case (u, v) => (u, v, 7L) }, 4)
    val s = spark
    import s.implicits._
    val plain = PageRank.pagerankFixedPoint(s, e0.toDF("u", "v"), 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(weighted == plain)
  }

  test("duplicate weighted edges add their weights") {
    val got = run(Seq((1L, 2L, 3L), (1L, 2L, 6L), (2L, 1L, 1L)), 3)
    assert(got == replay(Seq((1L, 2L, 9L), (2L, 1L, 1L)), 3))
  }
}
