package graft

import graft.rel.Logistic

/** Brier decomposition + Hosmer–Lemeshow (q370). */
class CalibrationAuditSpec extends SparkSpec {

  test("perfectly calibrated scores: reliability ~0 and the BS identity holds") {
    val s = spark
    import s.implicits._
    val r = new scala.util.Random(53)
    // units whose outcome is drawn at exactly the stated probability
    val rows = (1 to 20000).map { _ =>
      val p = (r.nextInt(10) * 100000L + 50000L) // bin midpoints
      (if (r.nextDouble() < p / 1e6) 1L else 0L, p)
    }
    val got = Logistic.calibrationAudit(rows.toDF("y", "p_micro"))
      .collect().head
    val (brier, rel, res, unc) =
      (got.getDouble(2), got.getDouble(3), got.getDouble(4), got.getDouble(5))
    assert(rel < 0.001, s"calibrated scores must have ~0 reliability: $rel")
    assert(math.abs(brier - (rel - res + unc)) < 0.002,
      s"Murphy identity: $brier vs ${rel - res + unc}")
    assert(got.getDouble(6) < 30.0, s"HL chi2 should be small: ${got.getDouble(6)}")
  }

  test("anti-calibrated scores blow up reliability and HL") {
    val s = spark
    import s.implicits._
    // says 90% but events happen 10% of the time
    val rows = (1 to 1000).map(i => (if (i % 10 == 0) 1L else 0L, 900000L))
    val got = Logistic.calibrationAudit(rows.toDF("y", "p_micro"))
      .collect().head
    assert(got.getDouble(3) > 0.5, s"reliability must be large: ${got.getDouble(3)}")
    assert(got.getDouble(6) > 100.0, s"HL must be large: ${got.getDouble(6)}")
  }

  test("out-of-range score raises") {
    val s = spark
    import s.implicits._
    intercept[Exception] {
      Logistic.calibrationAudit(Seq((1L, 2000000L)).toDF("y", "p_micro"))
        .collect()
    }
  }
}
