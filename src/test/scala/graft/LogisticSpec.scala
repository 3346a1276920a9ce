package graft

import org.apache.spark.sql.functions._
import graft.rel.Logistic

/** Logistic fit (q348) and IPW ATE (q349) semantics. */
class LogisticSpec extends SparkSpec {

  test("planted log-odds slope is recovered within tolerance") {
    val s = spark
    import s.implicits._
    val r = new scala.util.Random(19)
    // y ~ Bernoulli(sigmoid(-0.5 + 1.2 x)), x in [-2, 2]
    val rows = (1 to 4000).map { _ =>
      val x = r.nextDouble() * 4 - 2
      val p = 1.0 / (1.0 + math.exp(-(-0.5 + 1.2 * x)))
      (if (r.nextDouble() < p) 1L else 0L, x)
    }
    val got = Logistic.logisticFit(rows.toDF("y", "x"), iters = 8)
      .collect().head
    val a = got.getLong(0) / 1e6; val b = got.getLong(1) / 1e6
    assert(math.abs(b - 1.2) < 0.15, s"slope $b != ~1.2")
    assert(math.abs(a + 0.5) < 0.15, s"intercept $a != ~-0.5")
    // odds ratio consistency
    assert(math.abs(got.getDouble(2) - math.exp(b)) < 1e-5)
  }

  test("IPW removes planted confounding the naive difference shows") {
    val s = spark
    import s.implicits._
    val r = new scala.util.Random(23)
    // confounder x drives BOTH treatment probability and the outcome;
    // true treatment effect is exactly +10
    val rows = (1 to 6000).map { _ =>
      val x = r.nextDouble() * 2 - 1
      val pt = 1.0 / (1.0 + math.exp(-2.0 * x))
      val t = if (r.nextDouble() < pt) 1L else 0L
      val y = math.round(50 + 40 * x + 10 * t + r.nextGaussian() * 2)
      (t, y, x)
    }
    val got = Logistic.ipwAte(rows.toDF("treat", "spend", "x"),
      "treat", "spend", "x", iters = 8).collect().head
    val naive = got.getDouble(4); val ate = got.getDouble(5)
    assert(naive > 20.0,
      s"the fixture must confound the naive estimate upward: $naive")
    assert(math.abs(ate - 10.0) < 3.0,
      s"IPW must land near the true +10 effect: $ate")
  }

  test("guards: non-binary label, constant covariate, unscaled covariate") {
    val s = spark
    import s.implicits._
    intercept[Exception] {
      Logistic.logisticFit(Seq((2L, 1.0), (0L, 2.0)).toDF("y", "x"),
        iters = 1).collect()
    }
    val ex = intercept[Exception] {
      Logistic.logisticFit(
        Seq((1L, 3.0), (0L, 3.0), (1L, 3.0)).toDF("y", "x"),
        iters = 1).collect()
    }
    assert(ex.getMessage.contains("singular") ||
      ex.getMessage.contains("degenerate"), ex.getMessage)
    val ex2 = intercept[Exception] {
      Logistic.logisticFit(Seq((1L, 5000.0), (0L, 0.0)).toDF("y", "x"),
        iters = 1).collect()
    }
    assert(ex2.getMessage.contains("standardize"), ex2.getMessage)
  }
}
