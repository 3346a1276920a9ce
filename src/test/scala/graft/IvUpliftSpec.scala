package graft

import graft.rel.{Causal, Logistic}

/** IV/Wald (rel/Causal.ivWald) and uplift/Qini
  * (rel/Logistic.upliftQini): hand-checked Wald arithmetic, the weak/
  * degenerate instrument guards, the model-independent total-Qini
  * identity, bin accounting, and determinism.
  */
class IvUpliftSpec extends SparkSpec {

  test("wald: hand-checked itt / first-stage / late") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, 1L, 10L), (1L, 1L, 20L), (1L, 0L, 0L), (1L, 0L, 2L),
      (0L, 1L, 9L), (0L, 0L, 1L), (0L, 0L, 1L), (0L, 0L, 1L))
      .toDF("z", "t", "y")
    val got = Causal.ivWald(df).collect()(0)
    assert(got.getLong(0) == 4L && got.getLong(1) == 4L)
    assert(got.getDouble(2) == 5.0, s"itt: $got")     // 8 - 3
    assert(got.getDouble(3) == 0.25, s"fs: $got")     // 0.5 - 0.25
    assert(got.getDouble(4) == 20.0, s"late: $got")
  }

  test("wald: a weak instrument raises loudly") {
    val s = spark
    import s.implicits._
    // identical treatment rates in both z-arms -> first stage 0
    val df = Seq((1L, 1L, 5L), (1L, 0L, 3L), (0L, 1L, 4L), (0L, 0L, 2L))
      .toDF("z", "t", "y")
    val ex = intercept[Exception] { Causal.ivWald(df).collect() }
    assert(ex.getMessage.contains("weak instrument"), ex.getMessage)
  }

  test("wald: an empty instrument arm raises loudly") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, 1L, 5L), (1L, 0L, 3L)).toDF("z", "t", "y")
    val ex = intercept[Exception] { Causal.ivWald(df).collect() }
    assert(ex.getMessage.contains("degenerate instrument"), ex.getMessage)
  }

  // treated respond above the x-median; control mostly don't
  private def upliftUnits = {
    val s = spark
    import s.implicits._
    val tr = (1 to 20).map(k =>
      (1L, if (k > 10) 1L else 0L, 0.01 * k))
    val co = (1 to 20).map(k =>
      (0L, if (k > 16) 1L else 0L, 0.01 * k))
    (tr ++ co).toDF("treat", "y", "x")
  }

  test("uplift: bin accounting and the model-independent total Qini") {
    val rows = Logistic.upliftQini(upliftUnits, iters = 4).collect()
    assert(rows.map(r => r.getLong(1) + r.getLong(2)).sum == 40L,
      "bins must partition the population")
    assert(rows.forall(r => r.getLong(0) >= 0L && r.getLong(0) <= 9L))
    val bins = rows.map(_.getLong(0)).toSeq
    assert(bins == bins.sortBy(-_), s"must be ordered bin desc: $bins")
    // over ALL bins the Qini fold is model-independent:
    // st_tot - sc_tot * nt_tot / nc_tot = 10 - 4 * 20/20 = 6
    assert(rows.last.getDouble(5) == 6.0, s"total qini: ${rows.last}")
  }

  test("uplift: the top bin out-lifts the bottom bin") {
    val rows = Logistic.upliftQini(upliftUnits, iters = 4).collect()
      .filter(r => !r.isNullAt(4))
    assert(rows.head.getDouble(4) >= rows.last.getDouble(4),
      s"${rows.head} vs ${rows.last}")
  }

  test("uplift: re-running is bit-deterministic") {
    val a = Logistic.upliftQini(upliftUnits, iters = 4)
      .collect().map(_.toSeq).toSeq
    val b = Logistic.upliftQini(upliftUnits, iters = 4)
      .collect().map(_.toSeq).toSeq
    assert(a == b)
  }
}
