package graft

import org.apache.spark.sql.functions._
import graft.rel.Profile

class ProfileSpec extends SparkSpec {

  test("profile: null/distinct accounting and string-cast extrema") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, Some("a"), 2.5), (2L, None, 1.0), (3L, Some("c"), 2.5),
      (4L, None, -1.0), (5L, Some("a"), 9.0)
    ).toDF("id", "tag", "v")
    val got = Profile.profile(s, df, Seq("id", "tag", "v")).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5)))
      .toMap
    assert(got("id") == ((5L, 0L, 5L, "1", "5")))
    assert(got("tag") == ((5L, 2L, 2L, "a", "c")))
    assert(got("v") == ((5L, 0L, 4L, "-1.0", "9.0")))
  }

  test("histogram: bin arithmetic, out-of-range accounting, nulls excluded") {
    val s = spark
    import s.implicits._
    val df = Seq[java.lang.Double](-5.0, 0.0, 3.9, 4.0, 7.99, 8.0, 11.0, 12.0, 99.0, null)
      .toDF("v")
    val got = Profile.histogram(s, df, "v", nBins = 3, lo = 0.0, hi = 12.0)
      .collect().map(r => (r.getString(0),
        Option(r.get(1)).map(_.asInstanceOf[Double]),
        Option(r.get(2)).map(_.asInstanceOf[Double]), r.getLong(3)))
      .sortBy(_._1).toSeq
    // bins: [0,4)={0.0,3.9}, [4,8)={4.0,7.99}, [8,12)={8.0,11.0};
    // 12.0 and 99.0 are __above, -5.0 __below, null excluded
    assert(got == Seq(
      ("0", Some(0.0), Some(4.0), 2L),
      ("1", Some(4.0), Some(8.0), 2L),
      ("2", Some(8.0), Some(12.0), 2L),
      ("__above", None, None, 2L),
      ("__below", None, None, 1L)), s"got $got")
  }

  test("approx mode: no Expand in the plan, estimates near exact") {
    val s = spark
    import s.implicits._
    val df = Seq.tabulate(5000)(i => (i.toLong, (i % 997).toString, i % 10))
      .toDF("id", "k", "b")
    val cols = Seq("id", "k", "b")
    val exactPlan = Profile.profile(s, df, cols, exact = true)
      .queryExecution.executedPlan.toString
    val approxPlan = Profile.profile(s, df, cols, exact = false)
      .queryExecution.executedPlan.toString
    // NEITHER mode may plan the multi-distinct Expand (which also
    // forces a sort of the expanded rows — measured 6+ s on 600k rows):
    // exact counts distinct via the unpivoted single-distinct hash agg,
    // approx via HLL sketches in the base fold
    assert(!exactPlan.contains("Expand"), "exact mode must not Expand")
    assert(!approxPlan.contains("Expand"), "approx mode must not Expand")
    // approx stays a single branch: no join in the plan
    assert(!approxPlan.contains("Join"), "approx mode must be one pass")
    val exact = Profile.profile(s, df, cols, exact = true).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    val approx = Profile.profile(s, df, cols, exact = false).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    cols.foreach { c =>
      val (e, a) = (exact(c).toDouble, approx(c).toDouble)
      assert(math.abs(a - e) / e < 0.1, s"$c: approx $a vs exact $e")
    }
    // null counting is sketch-independent: identical in both modes
    assert(approx("b") >= 9 && approx("b") <= 11)
  }
}
