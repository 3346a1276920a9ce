package graft

import graft.rel.Logistic

/** Doubly-robust AIPW ATE (rel/Logistic.aipwAte): when the per-arm
  * outcomes are EXACTLY linear with equal slopes, the outcome models
  * absorb every residual and the estimate recovers the arm shift
  * exactly — whatever the propensity model says (the "either model
  * right" guarantee, testable half). Plus the loud degenerate-arm
  * guard and determinism.
  */
class AipwSpec extends SparkSpec {

  // treated = odd k, control = even k: full overlap in x; outcomes
  // exactly linear per arm, yo = 100 + 2k + 500*t cents
  private def units = {
    val s = spark
    import s.implicits._
    (1 to 20).map { k =>
      val t = k % 2
      (t.toLong, (100 + 2 * k + 500 * t).toLong, 0.001 * k)
    }.toDF("treat", "yo", "x")
  }

  test("exact linear outcomes with equal slopes recover the shift") {
    val got = Logistic.aipwAte(units, iters = 4, clipMilli = 10).collect()(0)
    assert(math.abs(got.getDouble(7) - 500.0) < 1e-6,
      s"ate_r6 should be the 500-cent shift: $got")
    assert(got.getLong(4) == 10L && got.getLong(5) == 10L)
    // equal slopes: both arms fit 2000 milli-cents per milli-unit
    assert(got.getLong(2) == 2000L * 1000000000L)
    assert(got.getLong(3) == 2000L * 1000000000L)
  }

  test("a degenerate covariate in one arm raises loudly") {
    val s = spark
    import s.implicits._
    val bad = ((1 to 10).map(k => (1L, 100L + k, 0.001 * k))
      ++ (1 to 10).map(_ => (0L, 100L, 0.005))).toDF("treat", "yo", "x")
    val ex = intercept[Exception] {
      Logistic.aipwAte(bad, iters = 2).collect()
    }
    assert(ex.getMessage.contains("degenerate")
      || ex.getMessage.contains("singular"), ex.getMessage)
  }

  test("re-running is bit-deterministic") {
    val a = Logistic.aipwAte(units, iters = 4).collect().map(_.toSeq).toSeq
    val b = Logistic.aipwAte(units, iters = 4).collect().map(_.toSeq).toSeq
    assert(a == b)
  }
}
