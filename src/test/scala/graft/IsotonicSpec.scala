package graft

import graft.rel.Isotonic

class IsotonicSpec extends SparkSpec {

  private def fit(rows: Seq[(Long, Long)]): Seq[(Long, Long, Long, Double)] = {
    val s = spark
    import s.implicits._
    Isotonic.isotonicFit(rows.toDF("bin", "y")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(4)))
      .toSeq
  }

  test("violation pools: [1, 0, 1] -> [0.5, 0.5, 1]") {
    val got = fit(Seq((1L, 1L), (2L, 0L), (3L, 1L)))
    assert(got == Seq((1L, 1L, 1L, 0.5), (2L, 1L, 0L, 0.5), (3L, 1L, 1L, 1.0)))
  }

  test("already-monotone input is the identity fit") {
    val got = fit(Seq((1L, 0L), (2L, 0L), (2L, 1L), (3L, 1L)))
    assert(got.map(_._4) == Seq(0.0, 0.5, 1.0))
  }

  test("weights via row multiplicity: heavy bin dominates its pool") {
    // bin1: 3 rows y=1 (rate 1); bin2: 1 row y=0 -> pooled (3*1+0)/4
    val got = fit(Seq((1L, 1L), (1L, 1L), (1L, 1L), (2L, 0L)))
    assert(got.map(_._4) == Seq(0.75, 0.75))
  }

  test("global decreasing input pools everything to the grand mean") {
    val got = fit(Seq((1L, 1L), (2L, 1L), (3L, 0L), (4L, 0L)))
    assert(got.map(_._4).forall(_ == 0.5))
  }

  test("fit is nondecreasing on adversarial noise") {
    val rows = (1L to 12L).map(i => (i, (i * 7 % 3) % 2))
    val got = fit(rows)
    got.map(_._4).sliding(2).foreach { w =>
      assert(w(1) >= w(0) - 1e-12, s"not monotone: ${got.map(_._4)}")
    }
  }

  test("single bin returns its raw rate") {
    val got = fit(Seq((5L, 1L), (5L, 0L)))
    assert(got == Seq((5L, 2L, 1L, 0.5)))
  }
}
