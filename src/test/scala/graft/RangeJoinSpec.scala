package graft

import org.apache.spark.sql.functions._
import graft.rel.RangeJoin

/** [[graft.rel.RangeJoin.binnedIntervalJoin]]: exact parity with the
  * naive theta-join on seeded random data (several bin widths, negative
  * axis values included — floor-div must not truncate toward zero), and
  * the plan must be an equi-join on the bin, not a nested loop.
  */
class RangeJoinSpec extends SparkSpec {

  private def fixture = {
    val s = spark
    import s.implicits._
    val r = new scala.util.Random(7)
    val points = Seq.fill(300)((r.nextInt(2000) - 500).toLong).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("pid", "t")
    val ranges = Seq.fill(80) {
      val start = (r.nextInt(2000) - 500).toLong
      (start, start + r.nextInt(60))
    }.zipWithIndex.map { case ((a, b), i) => (i.toLong, a, b) }
      .toDF("rid", "d_start", "d_end")
    (points, ranges)
  }

  test("parity with the naive theta-join across bin widths") {
    val (points, ranges) = fixture
    val want = points.join(ranges,
        col("t") >= col("d_start") && col("t") <= col("d_end"))
      .select("pid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(want.nonEmpty)
    Seq(1L, 7L, 64L, 1000L).foreach { w =>
      val got = RangeJoin.binnedIntervalJoin(points, "t", ranges, "d_start", "d_end", w)
        .select("pid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == want, s"binWidth=$w: ${got.size} vs ${want.size} pairs")
    }
  }

  test("no duplicate pairs: each match meets in exactly one bin") {
    val (points, ranges) = fixture
    val got = RangeJoin.binnedIntervalJoin(points, "t", ranges, "d_start", "d_end", 16)
      .select("pid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got.size == got.toSet.size)
  }

  test("exact binning past 2^53: nanosecond-epoch axes, small bin width") {
    // at t ≈ 1.7e18 (ns-epoch 2023) with binWidth 3 the QUOTIENT exceeds
    // 2^53, so the old double-division floorDiv mis-binned ~99% of points
    // by up to ±64 bins — every such matching pair silently dropped
    val s = spark
    import s.implicits._
    val base = 1700000000000000000L
    val r = new scala.util.Random(11)
    val points = (0 until 400)
      .map(i => (i.toLong, base + r.nextInt(3000).toLong)).toDF("pid", "t")
    val ranges = (0 until 40).map { i =>
      val st = base + r.nextInt(3000).toLong
      (i.toLong, st, st + r.nextInt(40).toLong)
    }.toDF("rid", "d_start", "d_end")
    val want = points.join(ranges,
        col("t") >= col("d_start") && col("t") <= col("d_end"))
      .select("pid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(want.nonEmpty)
    Seq(3L, 7L, 64L).foreach { w =>
      val got = RangeJoin.binnedIntervalJoin(points, "t", ranges, "d_start", "d_end", w)
        .select("pid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == want, s"binWidth=$w: ${got.size} vs ${want.size} pairs")
    }
  }

  test("the plan is an equi-join on the bin, not a nested loop") {
    val (points, ranges) = fixture
    val plan = RangeJoin
      .binnedIntervalJoin(points, "t", ranges.hint("merge"), "d_start", "d_end", 16)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"nested loop in plan:\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin") ||
      plan.contains("BroadcastHashJoin"), s"no equi-join in plan:\n$plan")
    // and the bare theta-join really is the nested loop being avoided
    val naive = points.join(ranges,
        col("t") >= col("d_start") && col("t") <= col("d_end"))
      .queryExecution.executedPlan.toString
    assert(naive.contains("BroadcastNestedLoopJoin"), s"unexpected naive plan:\n$naive")
  }
}
