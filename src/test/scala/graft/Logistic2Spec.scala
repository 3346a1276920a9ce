package graft

import graft.rel.Logistic

/** Two-covariate logistic (rel/Logistic.logisticFit2): signal/noise
  * separation, the exact-zero collinearity raise, covariate-swap
  * symmetry, and determinism.
  */
class Logistic2Spec extends SparkSpec {

  // y follows x1; x2 is a fixed pseudo-noise pattern (k*7 mod 13)
  private def units = {
    val s = spark
    import s.implicits._
    (1 to 40).map { k =>
      (if (k > 20) 1L else 0L, 0.01 * k, 0.01 * ((k * 7) % 13))
    }.toDF("y", "x1", "x2")
  }

  test("the signal covariate gets the weight, the noise one does not") {
    val r = Logistic.logisticFit2(units, iters = 6).collect()(0)
    val (b1, b2) = (r.getLong(1), r.getLong(2))
    assert(b1 > 0L, s"b1 must be positive: $r")
    assert(math.abs(b2) < b1 / 2, s"noise must stay small: $r")
    assert(r.getLong(7) == 40L && r.getLong(8) == 20L)
  }

  test("exactly collinear covariates raise loudly") {
    val s = spark
    import s.implicits._
    val bad = (1 to 20).map(k => (if (k > 10) 1L else 0L, 0.01 * k,
      0.01 * k)).toDF("y", "x1", "x2")
    val ex = intercept[Exception] {
      Logistic.logisticFit2(bad, iters = 2).collect()
    }
    assert(ex.getMessage.contains("singular"), ex.getMessage)
  }

  test("swapping the covariates swaps the coefficients exactly") {
    val a = Logistic.logisticFit2(units, "y", "x1", "x2", iters = 4)
      .collect()(0)
    val b = Logistic.logisticFit2(units, "y", "x2", "x1", iters = 4)
      .collect()(0)
    assert(a.getLong(1) == b.getLong(2) && a.getLong(2) == b.getLong(1),
      s"$a vs $b")
    assert(a.getLong(0) == b.getLong(0), "intercepts must agree")
  }

  test("re-running is bit-deterministic") {
    val a = Logistic.logisticFit2(units, iters = 5).collect().map(_.toSeq)
    val b = Logistic.logisticFit2(units, iters = 5).collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }
}
