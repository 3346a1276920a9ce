package graft

import graft.rel.Survival

/** Restricted mean survival time (q365): exact step-function integral. */
class RmstSpec extends SparkSpec {

  test("hand-computed step integral, tail term, and tau truncation") {
    val s = spark
    import s.implicits._
    // group a: deaths at t=2 (1 of 4) and t=4 (1 of 3); censored at 6, 8
    // S: 1 on [0,2), 3/4 on [2,4), 1/2 on [4,..)
    val df = Seq(("a", 2L, 1L), ("a", 4L, 1L), ("a", 6L, 0L), ("a", 8L, 0L))
      .toDF("g", "t", "e")
    val at10 = Survival.rmst(df, tau = 10L).collect().head.getDouble(3)
    // ∫ = 1*2 + 0.75*2 + 0.5*(4-4.. intervals: [0,2)=2, [2,4)=1.5,
    // [4,6)=1.0, [6,8)=1.0 (censoring doesn't drop S), tail [8,10)=1.0
    val want = 2.0 + 0.75 * 2 + 0.5 * 2 + 0.5 * 2 + 0.5 * 2
    assert(math.abs(at10 - want) < 1e-6, s"$at10 vs $want")
    // tau inside the curve truncates: tau=3 → 1*2 + 0.75*1
    val at3 = Survival.rmst(df, tau = 3L).collect().head.getDouble(3)
    assert(math.abs(at3 - 2.75) < 1e-6, at3)
  }

  test("extinguished group gets a zero tail; rmst = tau for no events") {
    val s = spark
    import s.implicits._
    val df = Seq(("x", 5L, 1L), ("x", 5L, 1L), // all die at 5
      ("y", 9L, 0L), ("y", 9L, 0L)) // all censored
      .toDF("g", "t", "e")
    val got = Survival.rmst(df, tau = 8L).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(math.abs(got("x") - 5.0) < 1e-6, got) // 1.0 on [0,5), 0 after
    assert(math.abs(got("y") - 8.0) < 1e-6, got) // never drops
  }
}
