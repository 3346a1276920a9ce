package graft

import graft.rel.Logistic

/** K-fold cross-validated AUC (rel/Logistic.kFoldCvAuc): fold
  * accounting, perfect held-out discrimination on separable data,
  * and salt-keyed reproducibility.
  */
class KFoldCvSpec extends SparkSpec {

  private def units = {
    val s = spark
    import s.implicits._
    (1L to 60L).map(k => (k, if (k > 30) 1L else 0L, 0.001 * k))
      .toDF("user_id", "y", "x")
  }

  test("folds partition the units and sizes add up") {
    val rows = Logistic.kFoldCvAuc(units, folds = 3, iters = 4).collect()
    assert(rows.length <= 3)
    rows.foreach { r =>
      assert(r.getLong(1) + r.getLong(2) == 60L, s"$r")
      assert(r.getLong(3) + r.getLong(4) == r.getLong(2), s"$r")
    }
    assert(rows.map(_.getLong(2)).sum == 60L,
      "test folds must cover every unit")
  }

  test("separable data scores a perfect held-out AUC in every fold") {
    val rows = Logistic.kFoldCvAuc(units, folds = 3, iters = 4).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(5) == 1.0, s"$r"))
  }

  test("the same salt reproduces folds and scores bit-for-bit") {
    val a = Logistic.kFoldCvAuc(units, folds = 3, iters = 4)
      .collect().map(_.toSeq).toSeq
    val b = Logistic.kFoldCvAuc(units, folds = 3, iters = 4)
      .collect().map(_.toSeq).toSeq
    assert(a == b)
  }
}
