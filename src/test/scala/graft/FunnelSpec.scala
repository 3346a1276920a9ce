package graft

import graft.rel.Funnel

class FunnelSpec extends SparkSpec {

  test("funnel requires strict temporal order through every stage") {
    val s = spark
    import s.implicits._
    val ev = Seq(
      // user 1 converts fully: view@1, click@2, purchase@3
      ("view", 1L, 1L), ("click", 1L, 2L), ("purchase", 1L, 3L),
      // user 2's click precedes its first view — stuck at view
      ("click", 2L, 1L), ("view", 2L, 2L), ("purchase", 2L, 1L),
      // user 3 views and clicks, never purchases
      ("view", 3L, 5L), ("click", 3L, 9L),
      // user 4 purchases with no view at all
      ("purchase", 4L, 1L)
    ).toDF("et", "uid", "tus")
    val got = Funnel.funnelCounts(ev, "et", "uid", "tus",
        Seq("view", "click", "purchase"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("1_view" -> 3L, "2_click" -> 2L, "3_purchase" -> 1L))
  }

  test("first-touch: a later qualifying event cannot resurrect an earlier stage") {
    val s = spark
    import s.implicits._
    // first click at t=2 before first view at t=4; second click at t=6
    // counts because the stage takes the first click AFTER the view
    val ev = Seq(("click", 1L, 2L), ("view", 1L, 4L), ("click", 1L, 6L))
      .toDF("et", "uid", "tus")
    val got = Funnel.funnelCounts(ev, "et", "uid", "tus", Seq("view", "click"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("1_view" -> 1L, "2_click" -> 1L))
  }

  test("retention cohorts bucket by first-seen day; offset 0 is cohort size") {
    val s = spark
    import s.implicits._
    val d = java.sql.Date.valueOf(_: String)
    val ev = Seq(
      (1L, d("2024-01-01")), (1L, d("2024-01-03")),
      (2L, d("2024-01-01")), (2L, d("2024-01-01")), // dup user-day collapses
      (3L, d("2024-01-02")), (3L, d("2024-01-03"))
    ).toDF("uid", "day")
    val got = Funnel.retentionCohorts(ev, "uid", "day")
      .collect().map(r => (r.getDate(0).toString, r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map(
      ("2024-01-01", 0L) -> 2L, ("2024-01-01", 2L) -> 1L,
      ("2024-01-02", 0L) -> 1L, ("2024-01-02", 1L) -> 1L))
  }
}
