package graft

import graft.rel.Survival

/** Harrell's concordance index (q371): grid formulation semantics. */
class CIndexSpec extends SparkSpec {

  test("hand-countable pairs: concordant, discordant, score ties, time ties excluded") {
    val s = spark
    import s.implicits._
    // unit A dies t=1 s=10; B dies t=2 s=5; C censored t=3 s=5;
    // D censored t=1 s=0 (time-tied with A's event: excluded)
    val df = Seq((1L, 1L, 10L), (2L, 1L, 5L), (3L, 0L, 5L), (1L, 0L, 0L))
      .toDF("t", "e", "s")
    val got = Survival.concordanceIndex(df).collect().head
    // comparable: A vs B (conc: 10>5), A vs C (conc), B vs C (tied s)
    assert(got.getLong(0) == 3L, s"comparable: $got")
    assert(got.getLong(1) == 2L, s"concordant: $got")
    assert(got.getLong(2) == 1L, s"tied: $got")
    assert(math.abs(got.getDouble(3) - 0.833333) < 1e-9) // r6-rounded
  }

  test("a perfect risk ranking scores 1.0; an inverted one scores 0.0") {
    val s = spark
    import s.implicits._
    val perfect = (1L to 20L).map(i => (i, 1L, 100L - i)) // earlier death = higher score
    val p = Survival.concordanceIndex(perfect.toDF("t", "e", "s"))
      .collect().head.getDouble(3)
    assert(math.abs(p - 1.0) < 1e-9, p)
    val inverted = (1L to 20L).map(i => (i, 1L, i))
    val q = Survival.concordanceIndex(inverted.toDF("t", "e", "s"))
      .collect().head.getDouble(3)
    assert(math.abs(q) < 1e-9, q)
  }

  test("censored units never open a pair; no-comparable raises") {
    val s = spark
    import s.implicits._
    // only censored units: no event ever precedes anything
    val ex = intercept[Exception] {
      Survival.concordanceIndex(
        Seq((1L, 0L, 5L), (2L, 0L, 6L)).toDF("t", "e", "s")).collect()
    }
    assert(ex.getMessage.contains("no comparable"), ex.getMessage)
  }
}
