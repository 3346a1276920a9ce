package graft

import graft.llm.Eval

/** Calibration operators (llm/Eval.scala): hand-checked bins and
  * ECE/Brier, the perfectly calibrated and perfectly wrong extremes,
  * bin-edge placement (p = 1000 lands in the top bin), and the loud
  * range guards.
  */
class CalibrationSpec extends SparkSpec {

  private def scored(rows: Seq[(Long, Long)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("p_milli", "y")
  }

  test("bins, confidence, accuracy, and gap match hand arithmetic") {
    // bin0: (50,0),(150? no -> bin1) ... choose explicit coverage:
    val rows = Seq((50L, 0L), (80L, 1L), (150L, 0L), (999L, 1L), (1000L, 1L))
    val got = Eval.calibrationBins(scored(rows)).collect()
      .map(r => r.getInt(0) -> r).toMap
    assert(got.keySet == Set(0, 1, 9))
    assert(got(0).getLong(1) == 2)
    assert(math.abs(got(0).getDouble(2) - 0.065) < 1e-9)  // (50+80)/2000
    assert(math.abs(got(0).getDouble(3) - 0.5) < 1e-9)
    assert(math.abs(got(0).getDouble(4) - 0.435) < 1e-9)
    assert(got(1).getLong(1) == 1)
    assert(got(9).getLong(1) == 2)                         // 999 and 1000
    assert(math.abs(got(9).getDouble(2) - 0.9995) < 1e-9)
    assert(math.abs(got(9).getDouble(3) - 1.0) < 1e-9)
  }

  test("summary ECE and Brier match hand arithmetic") {
    val rows = Seq((50L, 0L), (80L, 1L), (150L, 0L), (999L, 1L), (1000L, 1L))
    val r = Eval.calibrationSummary(scored(rows)).collect().head
    assert(r.getLong(0) == 5)
    // per bin |sum_p - 1000*pos|: bin0 |130-1000|=870, bin1 |150-0|=150,
    // bin9 |1999-2000|=1; ece = 1021/5000
    assert(math.abs(r.getDouble(1) - math.rint(1021.0 / 5000.0 * 1e6) / 1e6) < 1e-9)
    // brier numerator: 50^2 + 920^2 + 150^2 + 1^2 + 0^2 = 871401
    assert(math.abs(r.getDouble(2) - math.rint(871401.0 / 5e6 * 1e6) / 1e6) < 1e-9)
  }

  test("perfect predictions score zero on both metrics; inverted score one") {
    val perfect = Seq((1000L, 1L), (0L, 0L), (1000L, 1L))
    val rp = Eval.calibrationSummary(scored(perfect)).collect().head
    assert(rp.getDouble(1) == 0.0 && rp.getDouble(2) == 0.0)
    val wrong = Seq((1000L, 0L), (0L, 1L))
    val rw = Eval.calibrationSummary(scored(wrong)).collect().head
    assert(rw.getDouble(1) == 1.0 && rw.getDouble(2) == 1.0)
  }

  test("bin count is honored and edges land left-closed") {
    val rows = Seq((0L, 0L), (499L, 0L), (500L, 1L), (1000L, 1L))
    val got = Eval.calibrationBins(scored(rows), bins = 2).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got == Map(0 -> 2, 1 -> 2))
  }

  test("out-of-range probabilities and non-binary labels fail loudly") {
    intercept[Exception] {
      Eval.calibrationBins(scored(Seq((1001L, 1L)))).collect()
    }
    intercept[Exception] {
      Eval.calibrationBins(scored(Seq((-1L, 0L)))).collect()
    }
    intercept[Exception] {
      Eval.calibrationBins(scored(Seq((500L, 2L)))).collect()
    }
    intercept[IllegalArgumentException] {
      Eval.calibrationBins(scored(Seq((500L, 1L))), bins = 0)
    }
  }
}
