package graft

import graft.rel.Survival

/** Kaplan-Meier (rel/Survival.scala): the textbook hand case with
  * censoring, the no-censoring empirical degeneration, exact-zero tail,
  * monotonicity, and the loud event guard.
  */
class SurvivalSpec extends SparkSpec {

  private def df(rows: Seq[(Long, Long)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("t", "e")
  }

  test("hand case with censoring matches the product-limit arithmetic") {
    // (1,e),(2,c),(3,e),(3,e),(4,c),(5,e)
    val rows = Seq((1L, 1L), (2L, 0L), (3L, 1L), (3L, 1L), (4L, 0L), (5L, 1L))
    val got = Survival.kaplanMeier(df(rows)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(got.map(g => (g._1, g._2, g._3, g._4)).toSeq == Seq(
      (1L, 6L, 1L, 0L), (2L, 5L, 0L, 1L), (3L, 4L, 2L, 0L),
      (4L, 2L, 0L, 1L), (5L, 1L, 1L, 0L)))
    val surv = got.map(_._5)
    assert(math.abs(surv(0) - 0.833333) < 1e-9)   // 5/6
    assert(math.abs(surv(1) - 0.833333) < 1e-9)   // censoring: unchanged
    assert(math.abs(surv(2) - 0.416667) < 1e-9)   // 5/6 * 2/4
    assert(math.abs(surv(3) - 0.416667) < 1e-9)
    assert(surv(4) == 0.0)                        // last at-risk unit dies
  }

  test("no censoring degenerates to the empirical survival function") {
    val rows = Seq((1L, 1L), (2L, 1L), (2L, 1L), (4L, 1L), (7L, 1L))
    val got = Survival.kaplanMeier(df(rows)).collect()
      .map(r => r.getLong(0) -> r.getDouble(4)).toMap
    val n = rows.size.toDouble
    var cum = 0L
    for ((t, grp) <- rows.groupBy(_._1).toSeq.sortBy(_._1)) {
      cum += grp.size
      val emp = math.rint((n - cum) / n * 1e6) / 1e6
      assert(math.abs(got(t) - emp) < 1e-9, s"t=$t")
    }
  }

  test("survival is monotone non-increasing and all-censored stays at 1") {
    val cens = Seq((1L, 0L), (3L, 0L), (9L, 0L))
    Survival.kaplanMeier(df(cens)).collect()
      .foreach(r => assert(r.getDouble(4) == 1.0))
    val mixed = (1L to 30L).map(i => (i % 9, i % 3 min 1))
    val surv = Survival.kaplanMeier(df(mixed)).collect().map(_.getDouble(4))
    assert(surv.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
  }

  test("invalid event codes fail loudly") {
    intercept[Exception] {
      Survival.kaplanMeier(df(Seq((1L, 2L)))).collect()
    }
  }
}
