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

  private def gdf(rows: Seq[(Long, Long, Long)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("t", "e", "g")
  }

  /** independent double reference for the log-rank sums */
  private def refLogRank(rows: Seq[(Long, Long, Long)]): (Double, Double) = {
    val times = rows.map(_._1).distinct.sorted
    var oe = 0.0; var v = 0.0
    for (t <- times) {
      val atRisk = rows.filter(_._1 >= t)
      val n = atRisk.size.toDouble
      val n1 = atRisk.count(_._3 == 1).toDouble
      val here = rows.filter(_._1 == t)
      val d = here.count(_._2 == 1).toDouble
      val d1 = here.count(r => r._2 == 1 && r._3 == 1).toDouble
      if (d > 0) {
        oe += d1 - (d * (n1 / n))
        if (n > 1) v += ((d * (n1 / n)) * (1.0 - (n1 / n))) * ((n - d) / (n - 1.0))
      }
    }
    (oe, v)
  }

  test("log-rank: mirrored groups give chi2 = 0; the reference sums match") {
    val mirrored = Seq((1L, 1L), (3L, 1L), (5L, 0L), (8L, 1L))
      .flatMap { case (t, e) => Seq((t, e, 0L), (t, e, 1L)) }
    val r = Survival.logRank(gdf(mirrored)).collect().head
    assert(r.getDouble(1) == 0.0) // O-E sums to exactly 0 per time
    assert(r.getDouble(3) == 0.0 && !r.getBoolean(4))
    val (oe, v) = refLogRank(mirrored)
    assert(math.abs(r.getDouble(1) - math.rint(oe * 1e6) / 1e6) < 1e-9)
    assert(math.abs(r.getDouble(2) - math.rint(v * 1e6) / 1e6) < 1e-9)
  }

  test("log-rank: clearly separated curves are significant and match the reference") {
    val rows = (1L to 20L).map(i => (i % 5 + 1, 1L, 0L)) ++
      (1L to 20L).map(i => (i % 5 + 10, 1L, 1L))
    val r = Survival.logRank(gdf(rows)).collect().head
    val (oe, v) = refLogRank(rows)
    assert(math.abs(r.getDouble(1) - math.rint(oe * 1e6) / 1e6) < 1e-9)
    assert(math.abs(r.getDouble(2) - math.rint(v * 1e6) / 1e6) < 1e-9)
    val chi2 = (oe * oe) / v
    assert(math.abs(r.getDouble(3) - math.rint(chi2 * 1e6) / 1e6) < 1e-5)
    assert(r.getBoolean(4), s"chi2 ${r.getDouble(3)} should flag")
  }

  test("log-rank: no events gives chi2 = 0 by convention; bad group raises") {
    val r = Survival.logRank(gdf(Seq((1L, 0L, 0L), (2L, 0L, 1L))))
      .collect().head
    assert(r.getLong(0) == 0 && r.getDouble(3) == 0.0)
    intercept[Exception] {
      Survival.logRank(gdf(Seq((1L, 1L, 2L)))).collect()
    }
  }

  test("nelson-aalen hand case: hazard terms accumulate d/n and d/n^2") {
    val s = spark
    import s.implicits._
    // units: death@1, death@2, censor@3, death@4
    // t=1: n=4 d=1 -> H=1/4, V=1/16; t=2: n=3 d=1 -> H+=1/3, V+=1/9;
    // t=3: censor only; t=4: n=1 d=1 -> H+=1, V+=1
    val df = Seq((1L, 1L), (2L, 1L), (3L, 0L), (4L, 1L)).toDF("t", "e")
    val got = Survival.nelsonAalen(df).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5))).toMap
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(got(1L)._1 == 4 && got(1L)._2 == 1)
    assert(got(1L)._3 == 0.25 && got(1L)._4 == 0.0625)
    assert(got(2L)._3 == r6(0.25 + 1.0 / 3) &&
      got(2L)._4 == r6(0.0625 + 1.0 / 9))
    assert(got(3L)._2 == 0 && got(3L)._3 == got(2L)._3)
    assert(got(4L)._3 == r6(0.25 + 1.0 / 3 + 1.0))
    assert(got(4L)._5 == r6(math.exp(-(0.25 + 1.0 / 3 + 1.0))))
    // NA cumulative hazard never exceeds -ln(KM) termwise identity
    // check at the first event: exp(-1/4) >= 1 - 1/4
    assert(got(1L)._5 >= 0.75)
  }

  test("stratified log-rank: one stratum reduces exactly to the plain test") {
    val s = spark
    import s.implicits._
    val rows = Seq((1L, 1L, 1L), (2L, 1L, 0L), (3L, 0L, 1L), (4L, 1L, 0L),
      (5L, 0L, 1L), (6L, 1L, 0L))
    val df1 = rows.toDF("t", "e", "g")
    val plain = Survival.logRank(df1).collect().head
    val strat = Survival.logRankStratified(
      df1.withColumn("s", org.apache.spark.sql.functions.lit(0L)))
      .collect().head
    assert(strat.getLong(0) == 1L)
    assert(strat.getDouble(2) == plain.getDouble(1)
      && strat.getDouble(3) == plain.getDouble(2)
      && strat.getDouble(4) == plain.getDouble(3))
  }

  test("stratified log-rank: a pure stratum effect is adjusted away") {
    val s = spark
    import s.implicits._
    // stratum 0: group 1 only, all die at t=1; stratum 1: group 0
    // only, all die at t=5. Pooled naive log-rank would scream; the
    // stratified test sees single-group strata -> O-E = 0, V = 0
    val rows = Seq((1L, 1L, 1L, 0L), (1L, 1L, 1L, 0L),
      (5L, 1L, 0L, 1L), (5L, 1L, 0L, 1L))
    val got = Survival.logRankStratified(rows.toDF("t", "e", "g", "s"))
      .collect().head
    assert(got.getLong(0) == 2L && got.getDouble(4) == 0.0
      && !got.getBoolean(5), got.toString)
  }

  test("stratified log-rank: bad event/group codes raise loudly") {
    val s = spark
    import s.implicits._
    val bad = Seq((1L, 2L, 0L, 0L)).toDF("t", "e", "g", "s")
    val e1 = intercept[Exception](Survival.logRankStratified(bad).collect())
    assert(e1.getMessage.contains("event must be 0/1"), e1.getMessage)
  }
}
