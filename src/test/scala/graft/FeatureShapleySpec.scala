package graft

import graft.rel.Logistic

/** Feature Shapley over AUC (rel/Logistic.featureShapleyAuc): the
  * efficiency axiom, signal/noise separation, and determinism.
  */
class FeatureShapleySpec extends SparkSpec {

  private def units = {
    val s = spark
    import s.implicits._
    (1 to 40).map { k =>
      (if (k > 20) 1L else 0L, 0.01 * k, 0.01 * ((k * 7) % 13))
    }.toDF("y", "x1", "x2")
  }

  test("efficiency: shapley values sum to the full-model lift") {
    val r = Logistic.featureShapleyAuc(units, iters = 4).collect()(0)
    val (auc12, s1, s2) = (r.getDouble(3), r.getDouble(4), r.getDouble(5))
    assert(math.abs((s1 + s2) - (auc12 - 0.5)) <= 2e-6,
      s"$s1 + $s2 vs ${auc12 - 0.5}")
    assert(r.getDouble(0) == 0.5)
  }

  test("the signal feature out-attributes the noise feature") {
    val r = Logistic.featureShapleyAuc(units, iters = 4).collect()(0)
    assert(r.getDouble(4) > r.getDouble(5), s"$r")
    assert(r.getDouble(1) > 0.9, s"signal alone should separate: $r")
  }

  test("re-running is bit-deterministic") {
    val a = Logistic.featureShapleyAuc(units, iters = 4)
      .collect().map(_.toSeq)
    val b = Logistic.featureShapleyAuc(units, iters = 4)
      .collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }
}
