package graft

import graft.rel.Logistic

/** Propensity-score caliper matching (rel/Logistic.psmAtt): the
  * bucket-banded candidate join must equal brute-force 1-NN within
  * the caliper (the covering argument, verified by replaying the
  * integer quantization chain in plain Scala), ties must break to the
  * smallest control id, out-of-caliper treated units count as
  * unmatched, and an empty match set raises loudly.
  */
class PsmSpec extends SparkSpec {

  private def mkUnits(rows: Seq[(Long, Long, Long, Double)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("user_id", "treat", "yo", "x")
  }

  /** replay ê exactly as psmAtt computes it: milli-quantized centered
    * covariate, integer (a, b), micro-quantized sigmoid
    */
  private def eMicro(rows: Seq[(Long, Long, Long, Double)],
      a: Long, b: Long): Map[Long, Long] = {
    val xm0 = rows.map { case (id, _, _, x) => id -> math.round(x * 1000) }
    val cbar = math.round(xm0.map(_._2).sum.toDouble / xm0.length)
    xm0.map { case (id, m) =>
      val xm = m - cbar
      id -> math.round(1e6 / (1.0 + math.exp(-(a * 1000L + xm * b) / 1e9)))
    }.toMap
  }

  private def brute(rows: Seq[(Long, Long, Long, Double)],
      a: Long, b: Long, caliper: Long): (Long, Long, Double) = {
    val e = eMicro(rows, a, b)
    val tr = rows.filter(_._2 == 1L)
    val co = rows.filter(_._2 == 0L)
    val matched = tr.flatMap { case (tid, _, yo1, _) =>
      val cands = co.map { case (cid, _, yo0, _) =>
        (math.abs(e(tid) - e(cid)), cid, yo0)
      }.filter(_._1 <= caliper)
      if (cands.isEmpty) None else Some((yo1, cands.min._3))
    }
    (matched.length.toLong, tr.length.toLong - matched.length,
      matched.map { case (y1, y0) => (y1 - y0).toDouble }.sum /
        matched.length)
  }

  // x varies within arms, duplicate-x controls force an id tie-break
  private val rows = Seq(
    (1L, 1L, 900L, 1.0), (2L, 1L, 800L, 2.0), (3L, 1L, 700L, 3.0),
    (4L, 0L, 400L, 1.1), (5L, 0L, 300L, 1.1), (6L, 0L, 500L, 2.9),
    (7L, 0L, 200L, 0.4), (8L, 1L, 950L, 1.6), (9L, 0L, 350L, 2.2),
    (10L, 1L, 650L, 0.2))

  test("bucket-banded matching equals brute 1-NN; ties -> smallest cid") {
    val got = Logistic.psmAtt(mkUnits(rows), iters = 6,
      caliperMicro = 50000L).collect()(0)
    val (nm, nu, att) = brute(rows, got.getLong(0), got.getLong(1), 50000L)
    assert(got.getLong(4) == nm, s"n_matched: $got")
    assert(got.getLong(5) == nu, s"n_unmatched: $got")
    assert(got.getDouble(6) ==
      BigDecimal(att).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
      s"att: $got vs $att")
  }

  test("a wide caliper matches every treated unit") {
    val got = Logistic.psmAtt(mkUnits(rows), iters = 6,
      caliperMicro = 500000L).collect()(0)
    assert(got.getLong(4) == got.getLong(2) && got.getLong(5) == 0L)
  }

  test("a narrow caliper leaves isolated treated units unmatched") {
    val got = Logistic.psmAtt(mkUnits(rows), iters = 6,
      caliperMicro = 1000L).collect()(0)
    val (nm, nu, _) = brute(rows, got.getLong(0), got.getLong(1), 1000L)
    assert(got.getLong(4) == nm && got.getLong(5) == nu && nu > 0,
      s"expected some unmatched: $got")
  }

  test("zero matches raises loudly") {
    // controls pushed far from every treated unit in propensity space
    val far = Seq(
      (1L, 1L, 100L, 0.0), (2L, 1L, 110L, 0.01),
      (3L, 0L, 50L, 6.0), (4L, 0L, 60L, 6.01))
    val ex = intercept[Exception] {
      Logistic.psmAtt(mkUnits(far), iters = 2, caliperMicro = 1000L)
        .collect()
    }
    assert(ex.getMessage != null)
  }
}
