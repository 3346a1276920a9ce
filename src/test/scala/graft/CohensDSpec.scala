package graft

import graft.rel.Experiment

/** Cohen's d / Hedges' g (rel/Experiment.cohensD): hand-checked
  * moments, the small-sample shrink, and the loud guards.
  */
class CohensDSpec extends SparkSpec {

  test("hand-checked d and g on a simple two-arm fixture") {
    val s = spark
    import s.implicits._
    // treat: 10, 14 (mean 12, var 8); control: 0, 4 (mean 2, var 8)
    val df = Seq((1L, 10L), (1L, 14L), (0L, 0L), (0L, 4L))
      .toDF("variant", "y")
    val r = Experiment.cohensD(df).collect()(0)
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L)
    assert(r.getDouble(2) == 10.0, s"mean diff: $r")
    val sp = math.sqrt(8.0)
    assert(r.getDouble(3) ==
      BigDecimal(sp).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble, s"sp: $r")
    val d = 10.0 / sp
    assert(r.getDouble(4) ==
      BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble, s"d: $r")
    val g = d * (1.0 - 3.0 / (4.0 * 4 - 9))
    assert(r.getDouble(5) ==
      BigDecimal(g).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble, s"g: $r")
  }

  test("an arm with n < 2 raises") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, 10L), (0L, 0L), (0L, 4L)).toDF("variant", "y")
    val ex = intercept[Exception] { Experiment.cohensD(df).collect() }
    assert(ex.getMessage.contains("n >= 2"), ex.getMessage)
  }

  test("zero pooled sd raises rather than dividing") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, 5L), (1L, 5L), (0L, 3L), (0L, 3L))
      .toDF("variant", "y")
    val ex = intercept[Exception] { Experiment.cohensD(df).collect() }
    assert(ex.getMessage.contains("zero pooled sd"), ex.getMessage)
  }
}
