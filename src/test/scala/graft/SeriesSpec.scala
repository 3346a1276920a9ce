package graft

import graft.rel.Series

class SeriesSpec extends SparkSpec {

  private def run(rows: Seq[(Long, Long, Long)], num: Long, den: Long): Map[(Long, Long), Long] = {
    val s = spark
    import s.implicits._
    Series.ewmaFixedPoint(rows.toDF("k", "t", "x"), "k", "t", "x", num, den)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
  }

  test("alpha=1/4 recurrence matches hand computation") {
    // s1=100; s2=(200+300)/4=125; s3=(40+375)/4=103
    val got = run(Seq((1L, 1L, 100L), (1L, 2L, 200L), (1L, 3L, 40L)), 1, 4)
    assert(got == Map((1L, 1L) -> 100L, (1L, 2L) -> 125L, (1L, 3L) -> 103L))
  }

  test("state resets at key boundaries even when keys share a partition") {
    val rows = (1L to 5L).flatMap(k => Seq((k, 1L, 80L), (k, 2L, 0L)))
    val got = run(rows, 1, 2)
    // every key independently: s1=80, s2=(0+80)/2=40
    (1L to 5L).foreach { k =>
      assert(got((k, 1L)) == 80L && got((k, 2L)) == 40L)
    }
  }

  test("negative values use truncating division (DuckDB // semantics)") {
    // DuckDB // truncates toward zero ((-5)//2 = -2, NOT floor's -3):
    // s1=-3; s2=(1*(-2)+1*(-3)) quot 2 = -5 quot 2 = -2
    val got = run(Seq((7L, 1L, -3L), (7L, 2L, -2L)), 1, 2)
    assert(got((7L, 2L)) == -2L)
  }

  test("rows arrive unordered; the operator imposes (key, ord) order") {
    val got = run(Seq((1L, 3L, 40L), (1L, 1L, 100L), (1L, 2L, 200L)), 1, 4)
    assert(got((1L, 3L)) == 103L)
  }

  test("alpha outside (0,1) is rejected") {
    intercept[IllegalArgumentException](run(Seq((1L, 1L, 1L)), 4, 4))
    intercept[IllegalArgumentException](run(Seq((1L, 1L, 1L)), 0, 4))
  }

  test("holt: level tracks and trend converges on a linear ramp; declining series truncate like DuckDB") {
    val s = spark
    import s.implicits._
    // x_i = 100*i: alpha=1/2, beta=1/5 hand-replay of the first steps
    val ramp = (1L to 6L).map(i => (1L, i, 100L * i))
    val got = Series.holtFixedPoint(ramp.toDF("k", "t", "x"), "k", "t", "x", 1, 2, 1, 5)
      .collect().map(r => r.getLong(1) -> (r.getLong(3), r.getLong(4))).toMap
    // l1=100,b1=0; l2=(200+100)/2=150,b2=(50+0)/5=10; l3=(300+160)/2=230,b3=(80+40)/5=24
    assert(got(1L) == (100L, 0L) && got(2L) == (150L, 10L) && got(3L) == (230L, 24L), got)
    // declining: l1=100,b1=0; l2=(0+100)/2=50, b2=(-50+0)/5=-10 (trunc, floor would differ on -49/5 style cases)
    val dec = Series.holtFixedPoint(Seq((1L, 1L, 100L), (1L, 2L, 0L), (1L, 3L, 0L))
        .toDF("k", "t", "x"), "k", "t", "x", 1, 2, 1, 5)
      .collect().map(r => r.getLong(1) -> (r.getLong(3), r.getLong(4))).toMap
    assert(dec(2L) == (50L, -10L), dec)
    // step 3: l3=(0+40)/2=20, b3=(-30-40)/5=-14
    assert(dec(3L) == (20L, -14L), dec)
  }

  test("resample forward-fills interior gaps only, inside each user's span") {
    val s = spark
    import s.implicits._
    val work = java.nio.file.Files.createTempDirectory("ffill").toString
    val day = 86400000000L
    // user 1: days 0,3 -> grid 0..3 with days 1,2 filled from day 0
    Seq((1L, 0L * day, 1L, 2.0), (2L, 3L * day, 1L, 5.0))
      .toDF("event_id", "tsl", "user_id", "value")
      .select(org.apache.spark.sql.functions.col("event_id"),
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.col("tsl")).as("ts"),
        org.apache.spark.sql.functions.col("user_id"),
        org.apache.spark.sql.functions.lit("view").as("event_type"),
        org.apache.spark.sql.functions.col("value"),
        org.apache.spark.sql.functions.lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$work/events.parquet")
    val got = SparkEntry.queries("q161_resample_ffill")(s, work)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(got.toSeq == Seq((0L, 200L, false), (1L, 200L, true),
      (2L, 200L, true), (3L, 500L, false)), got.toSeq)
  }

  test("plan shape: the recurrence costs exactly one shuffle") {
    val s = spark
    import s.implicits._
    val df = (1L to 100L).map(i => (i % 7, i, i * 3)).toDF("k", "t", "x")
    val plan = Series.ewmaFixedPoint(df, "k", "t", "x", 1, 4)
      .queryExecution.executedPlan.toString
    val exchanges = "(?m)^\\s*\\+?-? ?Exchange ".r.findAllIn(plan).length
    assert(exchanges == 1, s"plan:\n$plan")
  }

  private def acfOf(rows: Seq[(Long, Long)], maxLag: Int)
      : Map[Long, (Long, Option[Double])] = {
    val s = spark
    import s.implicits._
    Series.acfExact(rows.toDF("t", "x"), "t", "x", maxLag)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .toMap
  }

  test("acf: hand case 1,2,3,4 — lag0 pins 1.0, hand ratios at 1..3") {
    // dev (scaled by n=4): -6,-2,2,6; den=80; num1=20, num2=-24, num3=-36
    val got = acfOf(Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L)), 3)
    assert(got(0L) == ((4L, Some(1.0))))
    assert(got(1L) == ((3L, Some(0.25))))
    assert(got(2L) == ((2L, Some(-0.3))))
    assert(got(3L) == ((1L, Some(-0.45))))
  }

  test("acf: zero-variance series yields null, not NaN") {
    val got = acfOf(Seq((0L, 5L), (1L, 5L), (2L, 5L)), 1)
    assert(got(0L)._2.isEmpty && got(1L)._2.isEmpty)
  }

  test("acf: a gap drops exactly the unmatched pairs") {
    // t = 0,1,3: lag-1 pairs only (0,1); lag-2 pairs only (1,3)
    val got = acfOf(Seq((0L, 1L), (1L, 4L), (3L, 9L)), 2)
    assert(got(1L)._1 == 1L && got(2L)._1 == 1L)
  }

  test("ljung-box: hand replay on 1,2,3,4,5,6 at h=2") {
    val s = spark
    import s.implicits._
    // n=6, dev(x6): -15,-9,-3,3,9,15; den=630
    // num1 = 135+27-9+27+135 = 315 -> r1 = 0.5
    // num2 = 45-27+(-27)+45 = ... (-15)(-3)+(-9)(3)+(-3)(9)+(3)(15) = 45-27-27+45 = 36 -> r2 = 36/630
    val df = (1L to 6L).map(i => (i - 1, i)).toDF("t", "x")
    val out = Series.ljungBox(df, "t", "x", h = 2).collect()
    assert(out.length == 1)
    val r1 = 315.0 / 630.0; val r2 = 36.0 / 630.0
    val q = 6.0 * 8.0 * (r1 * r1 / 5.0 + r2 * r2 / 4.0)
    val exp = BigDecimal(q).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.head.getLong(0) == 2L && out.head.getLong(1) == 6L)
    assert(out.head.getDouble(2) == exp, s"got ${out.head.getDouble(2)} want $exp")
    assert(!out.head.getBoolean(3)) // 2.4455 < 5.99
  }

  test("ljung-box: a gappy series raises loudly (n-k calibration)") {
    val s = spark
    import s.implicits._
    val df = Seq((0L, 1L), (1L, 4L), (3L, 9L), (4L, 2L)).toDF("t", "x")
    val e = intercept[Exception](Series.ljungBox(df, "t", "x", h = 1).collect())
    assert(e.getMessage != null && e.getMessage.contains("not regular"),
      e.getMessage)
  }

  test("theil-sen: exact line recovered; one fat-finger day cannot drag it") {
    val s = spark
    import s.implicits._
    // y = 3t + 7 exactly, except t=5 spikes to 1000
    val rows = (0L to 9L).map(t => (t, if (t == 5) 1000L else 3 * t + 7))
    val out = Series.theilSen(rows.toDF("t", "y"), "t", "y").collect().head
    assert(out.getLong(0) == 10L && out.getLong(1) == 45L)
    assert(out.getDouble(2) == 3.0, s"slope ${out.getDouble(2)}")
    assert(out.getDouble(3) == 7.0, s"intercept ${out.getDouble(3)}")
  }

  test("theil-sen: lower-median convention on an even pair count") {
    val s = spark
    import s.implicits._
    // 4 points -> 6 pairs, lower median = rank (6+1) div 2 = 3
    val rows = Seq((0L, 0L), (1L, 1L), (2L, 4L), (3L, 9L))
    val out = Series.theilSen(rows.toDF("t", "y"), "t", "y").collect().head
    // slopes sorted: 1,2,3,3,4,5 -> rank3 = 3.0
    assert(out.getDouble(2) == 3.0, s"slope ${out.getDouble(2)}")
  }

  test("ljung-box: h beyond the series length raises instead of dropping terms") {
    val s = spark
    import s.implicits._
    val df = Seq((0L, 1L), (1L, 4L), (2L, 9L)).toDF("t", "x")
    val e = intercept[Exception](Series.ljungBox(df, "t", "x", h = 5).collect())
    assert(e.getMessage != null && e.getMessage.contains("too short"),
      e.getMessage)
  }

  test("kendall tau-b: perfect concordance, reversal, and tie correction") {
    val s = spark
    import s.implicits._
    def tau(rows: Seq[(Long, Long, Long)]) =
      Series.kendallTau(rows.toDF("t", "x", "y"), "t", "x", "y")
        .collect().head
    // monotone together: tau = 1
    val up = tau((1L to 5L).map(i => (i, i, i * 10)))
    assert(up.getDouble(6) == 1.0 && up.getLong(2) == 10L)
    // perfectly opposed: tau = -1
    val dn = tau((1L to 5L).map(i => (i, i, 60L - i)))
    assert(dn.getDouble(6) == -1.0)
    // tie correction: x = (1,1,2), y = (1,2,3): C=2, D=0, tx=1, ty=0
    // tau-b = 2 / sqrt(2 * 3) = 0.816497
    val tb = tau(Seq((1L, 1L, 1L), (2L, 1L, 2L), (3L, 2L, 3L)))
    assert(tb.getLong(2) == 2L && tb.getLong(4) == 1L)
    assert(tb.getDouble(6) == BigDecimal(2.0 / math.sqrt(6.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // one side constant -> null, not NaN
    val cz = tau(Seq((1L, 5L, 1L), (2L, 5L, 2L), (3L, 5L, 3L)))
    assert(cz.isNullAt(6))
  }

  test("ljung-box: a zero-variance series raises (Q undefined), acf stays null") {
    val s = spark
    import s.implicits._
    val df = (0L to 5L).map(t => (t, 7L)).toDF("t", "x")
    val e = intercept[Exception](Series.ljungBox(df, "t", "x", h = 2).collect())
    assert(e.getMessage != null && e.getMessage.contains("zero-variance"),
      e.getMessage)
  }
}
