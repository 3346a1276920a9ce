package graft

import graft.rel.Experiment

/** CUPED + Poisson bootstrap (rel/Experiment.scala): hand-computed θ
  * and adjusted means, the mean-preservation law, degenerations, the
  * loud magnitude guard, and bootstrap determinism / degeneracy.
  */
class ExperimentSpec extends SparkSpec {

  private def units = {
    val s = spark
    import s.implicits._
    // y = 2x + e with small e; variants split the slope's range so
    // the raw variant means differ while the CUPED-adjusted ones
    // converge toward the treatment effect
    Seq(
      (0L, 1000L, 2100L), (0L, 3000L, 6050L), (0L, 5000L, 9950L),
      (1L, 2000L, 4300L), (1L, 4000L, 8350L), (1L, 6000L, 12250L)
    ).toDF("variant", "x", "y")
  }

  /** the same moments by driver-side arithmetic */
  private def handCuped(rows: Seq[(Long, Long, Long)]) = {
    val n = rows.size.toDouble
    val sx = rows.map(_._2).sum.toDouble
    val sy = rows.map(_._3).sum.toDouble
    val sxy = rows.map(r => r._2 * r._3).sum.toDouble
    val sx2 = rows.map(r => r._2 * r._2).sum.toDouble
    val theta = ((n * sxy) - (sx * sy)) / ((n * sx2) - (sx * sx))
    (theta, sx / n)
  }

  test("theta and per-variant adjusted means match hand arithmetic") {
    val rows = Seq(
      (0L, 1000L, 2100L), (0L, 3000L, 6050L), (0L, 5000L, 9950L),
      (1L, 2000L, 4300L), (1L, 4000L, 8350L), (1L, 6000L, 12250L))
    val (theta, mxp) = handCuped(rows)
    val got = Experiment.cuped(units).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(math.abs(got(0L).getDouble(6) - math.rint(theta * 1e6) / 1e6) < 1e-9)
    for (v <- Seq(0L, 1L)) {
      val g = rows.filter(_._1 == v)
      val nv = g.size.toDouble
      val my = g.map(_._3).sum / nv / 1000.0
      val mc = ((g.map(_._3).sum - (theta * (g.map(_._2).sum - (nv * mxp))))
        / nv) / 1000.0
      assert(math.abs(got(v).getDouble(2) - math.rint(my * 1e6) / 1e6) < 1e-9)
      assert(math.abs(got(v).getDouble(3) - math.rint(mc * 1e6) / 1e6) < 1e-9,
        s"variant $v cuped mean")
    }
  }

  test("CUPED is mean-preserving over the pooled population and cuts variance") {
    val got = Experiment.cuped(units).collect()
    val pooledRaw = got.map(r => r.getLong(1) * r.getDouble(2)).sum
    val pooledAdj = got.map(r => r.getLong(1) * r.getDouble(3)).sum
    assert(math.abs(pooledRaw - pooledAdj) < 1e-3)
    got.foreach { r =>
      assert(r.getDouble(5) <= r.getDouble(4) + 1e-9,
        s"variant ${r.getLong(0)}: var_cuped ${r.getDouble(5)} > var_y ${r.getDouble(4)}")
    }
    // strongly correlated covariate: the cut must be large, not marginal
    assert(got.map(_.getDouble(5)).sum < 0.05 * got.map(_.getDouble(4)).sum)
  }

  test("zero-variance covariate degenerates to theta=0 and no adjustment") {
    val s = spark
    import s.implicits._
    val flat = Seq((0L, 7L, 100L), (0L, 7L, 300L), (1L, 7L, 200L))
      .toDF("variant", "x", "y")
    val got = Experiment.cuped(flat).collect()
    got.foreach { r =>
      assert(r.getDouble(6) == 0.0)
      assert(r.getDouble(2) == r.getDouble(3))
      assert(r.getDouble(4) == r.getDouble(5))
    }
  }

  test("milli magnitudes past the exact-product cap raise loudly") {
    val s = spark
    import s.implicits._
    val big = Seq((0L, 4000000000L, 1L), (1L, 2L, 2L)).toDF("variant", "x", "y")
    val e = intercept[Exception] { Experiment.cuped(big).collect() }
    assert(e.getMessage != null)
  }

  test("bootstrap is deterministic and brackets the mean on a constant column") {
    val s = spark
    import s.implicits._
    val df = (1L to 100L).map(i => ("g", i, 5000L)).toDF("grp", "id", "v")
    val a = Experiment.bootstrapCi(df, "grp", "id", "v", reps = 40).collect()
    val b = Experiment.bootstrapCi(df, "grp", "id", "v", reps = 40).collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    // every replicate mean of a constant column is the constant
    assert(a.head.getDouble(2) == 5.0)
    assert(a.head.getDouble(3) == 5.0)
    assert(a.head.getDouble(4) == 5.0)
  }

  test("bootstrap CI straddles the point mean and orders lo <= hi on real-ish data") {
    val s = spark
    import s.implicits._
    val df = (1L to 500L).map(i => ("g", i, (i % 97) * 100L)).toDF("grp", "id", "v")
    val r = Experiment.bootstrapCi(df, "grp", "id", "v", reps = 40).collect().head
    val (mean, lo, hi) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
    assert(lo <= hi)
    assert(lo <= mean && mean <= hi,
      s"mean $mean outside [$lo, $hi] — 40-rep Poisson CI should cover it here")
  }

  test("invalid reps fail loudly") {
    val s = spark
    import s.implicits._
    val df = Seq(("g", 1L, 1L)).toDF("grp", "id", "v")
    intercept[IllegalArgumentException] {
      Experiment.bootstrapCi(df, "grp", "id", "v", reps = 1)
    }
  }

  test("SRM chi-square matches hand arithmetic and flags at the 5% line") {
    val s = spark
    import s.implicits._
    // 60/40 under a 500/500 design: chi2 = (10^2/50)*2 = 4.0 > 3.8415
    val a = (1 to 60).map(_ => "A") ++ (1 to 40).map(_ => "B")
    val r = Experiment.srmCheck(a.toDF("variant"), "variant",
      Map("A" -> 500L, "B" -> 500L)).collect().head
    assert(r.getLong(0) == 100 && r.getInt(1) == 2)
    assert(r.getDouble(2) == 4.0)
    assert(math.abs(r.getDouble(3) - 3.841458820694124) < 1e-12)
    assert(r.getBoolean(4))
    // 50/50 exact: chi2 = 0, no flag
    val b = (1 to 50).map(_ => "A") ++ (1 to 50).map(_ => "B")
    val r2 = Experiment.srmCheck(b.toDF("variant"), "variant",
      Map("A" -> 500L, "B" -> 500L)).collect().head
    assert(r2.getDouble(2) == 0.0 && !r2.getBoolean(4))
  }

  test("SRM counts a variant MISSING from the data as its full (0-exp)^2 term") {
    val s = spark
    import s.implicits._
    // all 10 rows in A under 500/500: chi2 = (10-5)^2/5 + (0-5)^2/5 = 10
    val r = Experiment.srmCheck((1 to 10).map(_ => "A").toDF("variant"),
      "variant", Map("A" -> 500L, "B" -> 500L)).collect().head
    assert(r.getDouble(2) == 10.0 && r.getBoolean(4))
  }

  test("SRM guards: off-design variant, bad weights") {
    val s = spark
    import s.implicits._
    intercept[Exception] {
      Experiment.srmCheck(Seq("A", "C").toDF("variant"), "variant",
        Map("A" -> 500L, "B" -> 500L)).collect()
    }
    intercept[IllegalArgumentException] {
      Experiment.srmCheck(Seq("A").toDF("variant"), "variant",
        Map("A" -> 400L, "B" -> 500L))
    }
  }

  test("delta-method ratio CI: exact-multiple units give se = 0 and a point CI") {
    val s = spark
    import s.implicits._
    val units = Seq((0L, 2L, 6000L), (0L, 5L, 15000L), (1L, 1L, 3000L),
      (1L, 3L, 9000L)).toDF("variant", "x", "y")
    val got = Experiment.deltaRatioCi(units).collect()
    got.foreach { r =>
      assert(r.getDouble(2) == 3000.0)
      assert(r.getDouble(3) == 0.0)
      assert(r.getDouble(4) == 3000.0 && r.getDouble(5) == 3000.0)
    }
  }

  test("delta-method ratio CI matches hand moments on a mixed fixture") {
    val s = spark
    import s.implicits._
    val rows = Seq((0L, 1L, 500L), (0L, 3L, 2500L), (0L, 2L, 1000L),
      (0L, 0L, 0L))
    val got = Experiment.deltaRatioCi(rows.toDF("variant", "x", "y"))
      .collect().head
    val n = rows.size.toDouble
    val sx = rows.map(_._2).sum.toDouble; val sy = rows.map(_._3).sum.toDouble
    val sxy = rows.map(r => r._2 * r._3).sum.toDouble
    val sx2 = rows.map(r => r._2 * r._2).sum.toDouble
    val sy2 = rows.map(r => r._3 * r._3).sum.toDouble
    val ratio = sy / sx
    val se = math.sqrt(math.max(((sy2 / n - (sy / n) * (sy / n))
      - (2.0 * ratio) * (sxy / n - (sx / n) * (sy / n))
      + (ratio * ratio) * (sx2 / n - (sx / n) * (sx / n)))
      / (n * ((sx / n) * (sx / n))), 0.0))
    assert(math.abs(got.getDouble(2) - math.rint(ratio * 1e6) / 1e6) < 1e-9)
    assert(math.abs(got.getDouble(3) - math.rint(se * 1e6) / 1e6) < 1e-6)
    assert(got.getDouble(4) <= got.getDouble(2) &&
      got.getDouble(2) <= got.getDouble(5))
  }

  test("CUPED moment fold law: fold(moments(A), moments(B)) == moments(A ∪ B), readout bit-equal") {
    val s = spark
    import s.implicits._
    val rows = (1L to 40L).map(i =>
      (i % 2, (i * 37) % 500, ((i * 37) % 500) * 2 + (i % 7)))
    val all = rows.toDF("variant", "x", "y")
    val a = rows.filter(_._1 == 0).toDF("variant", "x", "y")
      .unionAll(rows.filter(r => r._1 == 1 && r._2 < 250).toDF("variant", "x", "y"))
    val b = rows.filter(r => r._1 == 1 && r._2 >= 250).toDF("variant", "x", "y")
    val folded = Experiment.cupedFold(
      Experiment.cupedMoments(a), Experiment.cupedMoments(b))
    val full = Experiment.cupedMoments(all)
    assert(folded.collect().map(_.toSeq).toSet ==
      full.collect().map(_.toSeq).toSet)
    assert(Experiment.cupedFromMoments(folded).collect().map(_.toSeq).toSeq ==
      Experiment.cuped(all).collect().map(_.toSeq).toSeq)
  }

  test("delta-method ratio CI fails loudly when a variant has sum(x) <= 0") {
    val s = spark
    import s.implicits._
    val bad = Seq((0L, 0L, 100L), (0L, 0L, 200L)).toDF("variant", "x", "y")
    intercept[Exception] { Experiment.deltaRatioCi(bad).collect() }
  }

  test("group-sequential: hand z against the published OBF K=2 boundary") {
    val s = spark
    import s.implicits._
    // look 1: A [0,10] B [20,30] -> z = 20/sqrt(50) = 2.828427 > 2.7965
    // look 2: same units accrued more: A [0,10,0,10] B [20,30,20,30]
    //   var = 100/3, z = 20/sqrt((100/3)/4*2) = 20/sqrt(16.6667) = 4.898979
    val rows = Seq(
      (1L, "A", 0L), (1L, "A", 10L), (1L, "B", 20L), (1L, "B", 30L),
      (2L, "A", 0L), (2L, "A", 10L), (2L, "A", 0L), (2L, "A", 10L),
      (2L, "B", 20L), (2L, "B", 30L), (2L, "B", 20L), (2L, "B", 30L))
      .toDF("lk", "variant", "y")
    val got = Experiment.groupSequential(rows, "lk").collect()
    assert(got.length == 2)
    val l1 = got.head; val l2 = got(1)
    assert(l1.getLong(1) == 2L && l1.getLong(2) == 2L)
    assert(l1.getDouble(3) == 2.828427 && l1.getDouble(4) == 2.7965)
    assert(l1.getBoolean(5), "look 1 crosses the OBF boundary")
    assert(l2.getDouble(4) == 1.9774 && l2.getBoolean(5))
  }

  test("group-sequential: unsupported look counts and variants raise") {
    val s = spark
    import s.implicits._
    val one = Seq((1L, "A", 0L), (1L, "A", 2L), (1L, "B", 1L),
      (1L, "B", 3L)).toDF("lk", "variant", "y")
    val e1 = intercept[Exception](Experiment.groupSequential(one, "lk")
      .collect())
    assert(e1.getMessage.contains("no OBF table"), e1.getMessage)
    val bad = Seq((1L, "C", 0L), (2L, "A", 1L)).toDF("lk", "variant", "y")
    val e2 = intercept[Exception](Experiment.groupSequential(bad, "lk")
      .collect())
    assert(e2.getMessage.contains("variant must be A/B"), e2.getMessage)
    val thin = Seq((1L, "A", 0L), (1L, "B", 1L), (2L, "A", 0L),
      (2L, "B", 1L)).toDF("lk", "variant", "y")
    val e3 = intercept[Exception](Experiment.groupSequential(thin, "lk")
      .collect())
    assert(e3.getMessage.contains(">= 2 units per arm"), e3.getMessage)
  }
}
