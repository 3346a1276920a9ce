package graft

import graft.rel.{Causal, Series}

/** RDD (q367) and the SSE changepoint (q368). */
class CausalRddSpec extends SparkSpec {

  test("RDD recovers a planted jump under a shared linear trend") {
    val s = spark
    import s.implicits._
    val r = new scala.util.Random(43)
    // y = 100 + 3x + 50*(x >= 0) + noise, x in [-10, 10]
    val rows = (1 to 4000).map { _ =>
      val x = r.nextDouble() * 20 - 10
      val y = math.round(100 + 3 * x + (if (x >= 0) 50 else 0) +
        r.nextGaussian() * 4)
      (x, y)
    }
    val got = Causal.regressionDiscontinuity(rows.toDF("x", "y"),
      bandwidthMilli = 10000L).collect().head
    val jump = got.getDouble(2)
    assert(math.abs(jump - 50.0) < 3.0, s"planted +50 jump: $jump")
    assert(got.getDouble(4) > 5.0, "the jump must be clearly significant")
    // without a discontinuity the estimate collapses toward 0
    val flat = (1 to 4000).map { _ =>
      val x = r.nextDouble() * 20 - 10
      (x, math.round(100 + 3 * x + r.nextGaussian() * 4))
    }
    val j0 = Causal.regressionDiscontinuity(flat.toDF("x", "y"),
      bandwidthMilli = 10000L).collect().head.getDouble(2)
    assert(math.abs(j0) < 3.0, s"no-jump fixture must read ~0: $j0")
  }

  test("RDD guards: thin side, zero-variance side") {
    val s = spark
    import s.implicits._
    val ex = intercept[Exception] {
      Causal.regressionDiscontinuity(
        Seq((-1.0, 1L), (-2.0, 2L), (-3.0, 3L), (1.0, 4L), (2.0, 5L))
          .toDF("x", "y"), bandwidthMilli = 10000L).collect()
    }
    assert(ex.getMessage.contains("< 3 units"), ex.getMessage)
  }

  test("changepoint finds a planted mean shift at the exact day") {
    val s = spark
    import s.implicits._
    val series = (0L until 60L).map(o =>
      (o, if (o <= 24L) 100L + (o % 5) else 200L + (o % 5)))
    val got = Series.changepointSse(series.toDF("o", "y")).collect().head
    assert(got.getLong(0) == 24L, s"split at day 24: $got")
    assert(math.abs(got.getDouble(3) - 102.0) < 0.5)
    assert(math.abs(got.getDouble(4) - 202.0) < 0.5)
    assert(got.getDouble(5) > 0.0)
    // duplicate ordinates raise
    intercept[Exception] {
      Series.changepointSse(
        Seq((1L, 5L), (1L, 6L), (2L, 7L)).toDF("o", "y")).collect()
    }
  }
}
