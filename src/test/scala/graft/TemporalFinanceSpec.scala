package graft

import org.apache.spark.sql.functions._
import graft.graph.Temporal

/** Analytic ground truth for temporal reachability and the
  * concentration operators.
  */
class TemporalFinanceSpec extends SparkSpec {

  test("earliest arrival respects time: backwards edges are unusable") {
    val s = spark
    import s.implicits._
    // 1 →(t=5) 2 →(t=3) 3 : static BFS reaches 3, temporal must NOT
    // (edge to 3 departs before 2 is reached); 2 →(t=7) 4 is fine.
    val edges = Seq((1L, 2L, 5L), (2L, 3L, 3L), (2L, 4L, 7L)).toDF("u", "v", "t")
    val seeds = Seq(Tuple1(1L)).toDF("node")
    val got = Temporal.earliestArrival(s, edges, seeds, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 2L -> 5L, 4L -> 7L))
  }

  test("earliest arrival takes the min over waiting-compatible paths") {
    val s = spark
    import s.implicits._
    // two routes to 4: via 2 (arrive 10) and via 3 (arrive 6); also a
    // same-time hop chain 1→5 (t=2), 5→6 (t=2) — equality is allowed
    // (t >= arrival), so 6 is reached at 2.
    val edges = Seq(
      (1L, 2L, 1L), (2L, 4L, 10L),
      (1L, 3L, 4L), (3L, 4L, 6L),
      (1L, 5L, 2L), (5L, 6L, 2L)).toDF("u", "v", "t")
    val seeds = Seq(Tuple1(1L)).toDF("node")
    val got = Temporal.earliestArrival(s, edges, seeds, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(4L) == 6L && got(6L) == 2L)
  }

  test("gini formula: perfect equality is 0, full concentration approaches 1") {
    val s = spark
    import s.implicits._
    // replicate the q180 arithmetic on hand values
    def gini(xs: Seq[Long]): Long = {
      val sorted = xs.sorted
      val n = sorted.length.toLong
      val sx = sorted.sum
      val six = sorted.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
      (2 * six - (n + 1) * sx) * 1000 / (n * sx)
    }
    assert(gini(Seq(5L, 5L, 5L, 5L)) == 0L)
    // one customer holds everything except crumbs: (2*Σix−(n+1)Σx)/(nΣx)
    val g = gini(Seq(1L, 1L, 1L, 997L))
    assert(g > 700L && g < 1000L)
  }
}
