package graft

import graft.rel.Causal

class CausalSpec extends SparkSpec {

  private def run(rows: Seq[(Long, Long, Long)])
      : (Long, Long, Long, Long, Double, Double) = {
    val s = spark
    import s.implicits._
    val r = Causal.stratifiedAte(rows.toDF("treat", "y", "s")).collect().head
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getDouble(4), r.getDouble(5))
  }

  test("simpson's paradox: naive shows a lift, stratified recovers zero") {
    // stratum 0 (light): treated 1@10, control 9@10 -> both mean 10
    // stratum 1 (heavy): treated 9@100, control 1@100 -> both mean 100
    // naive: treated mean = (10+900)/10 = 91, control = (90+100)/10 = 19
    val rows =
      Seq((1L, 10L, 0L)) ++ Seq.fill(9)((0L, 10L, 0L)) ++
      Seq.fill(9)((1L, 100L, 1L)) ++ Seq((0L, 100L, 1L))
    val (used, dropped, n1, n0, naive, ate) = run(rows)
    assert((used, dropped, n1, n0) == ((2L, 0L, 10L, 10L)))
    assert(naive == 72.0, s"naive $naive")
    assert(ate == 0.0, s"ate $ate")
  }

  test("hand-weighted two-stratum effect") {
    // s0: treated mean 20, control 10 (diff 10, n=4)
    // s1: treated mean 50, control 20 (diff 30, n=2)
    // ATE = (4*10 + 2*30)/6 = 100/6
    val rows = Seq((1L, 20L, 0L), (1L, 20L, 0L), (0L, 10L, 0L),
      (0L, 10L, 0L), (1L, 50L, 1L), (0L, 20L, 1L))
    val (_, _, _, _, _, ate) = run(rows)
    assert(math.abs(ate - 100.0 / 6.0) < 1e-6, s"ate $ate")
  }

  test("positivity: a one-armed stratum is dropped and reported, weights renormalized") {
    val rows = Seq((1L, 20L, 0L), (0L, 10L, 0L), (1L, 999L, 7L))
    val (used, dropped, n1, n0, _, ate) = run(rows)
    assert((used, dropped, n1, n0) == ((1L, 1L, 1L, 1L)))
    assert(ate == 10.0)
  }

  test("no comparable stratum raises loudly") {
    val e = intercept[Exception](run(Seq((1L, 5L, 0L), (0L, 3L, 1L))))
    assert(e.getMessage != null && e.getMessage.contains("positivity"),
      e.getMessage)
  }

  test("non-binary treatment raises loudly") {
    val e = intercept[Exception](run(Seq((2L, 5L, 0L), (0L, 3L, 0L))))
    assert(e.getMessage != null && e.getMessage.contains("treat must be 0/1"),
      e.getMessage)
  }
}
