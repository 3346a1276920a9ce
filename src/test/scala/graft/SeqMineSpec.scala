package graft

import graft.rel.SeqMine

/** Sequential pattern mining (q362): subsequence semantics. */
class SeqMineSpec extends SparkSpec {

  private def seqs(rows: Seq[(Long, Long, String)]) = {
    val s = spark
    import s.implicits._
    rows.map { case (k, o, it) => (k, o, o, it) }.toDF("k", "o", "t", "it")
  }

  test("subsequence (not substring) semantics: gaps allowed, order required") {
    val s = spark
    // user 1: a x b y c — contains a>b, a>c, b>c, a>b>c despite gaps
    // user 2: c b a     — contains NONE of the forward patterns
    val df = seqs(Seq((1L, 1L, "a"), (1L, 2L, "x"), (1L, 3L, "b"),
      (1L, 4L, "y"), (1L, 5L, "c"),
      (2L, 1L, "c"), (2L, 2L, "b"), (2L, 3L, "a")))
    val got = SeqMine.frequentSequences(df, "k", "o", "t", "it", 1L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got("a>b") == 1L && got("a>c") == 1L && got("a>b>c") == 1L)
    assert(got("c>b>a") == 1L, "user 2's reversed journey counts once")
    assert(!got.contains("b>a>c"), got)
  }

  test("repeated items: x>x requires two occurrences; greedy middle rule is exact") {
    val s = spark
    // user 1: a a  → a>a holds; user 2: a → does not
    // user 3: b a b — a>b holds (positions 2<3), b>a>b holds
    val df = seqs(Seq((1L, 1L, "a"), (1L, 2L, "a"), (2L, 1L, "a"),
      (3L, 1L, "b"), (3L, 2L, "a"), (3L, 3L, "b")))
    val got = SeqMine.frequentSequences(df, "k", "o", "t", "it", 1L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got("a>a") == 1L)
    assert(got("b>a>b") == 1L)
    assert(got("a") == 3L)
    // the greedy trap: first b-after-first-a in user 3 is position 3,
    // which must NOT block b>a>b (the a>b test uses first a = pos 2)
    assert(got("b>b") == 1L)
  }

  test("support threshold filters; oversized alphabet raises") {
    val s = spark
    import s.implicits._
    val df = seqs(Seq((1L, 1L, "a"), (2L, 1L, "a"), (3L, 1L, "b")))
    val got = SeqMine.frequentSequences(df, "k", "o", "t", "it", 2L)
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("a"), got)
    val big = (1 to 100).map(i => (1L, i.toLong, s"it$i"))
    val ex = intercept[Exception] {
      SeqMine.frequentSequences(seqs(big), "k", "o", "t", "it", 1L).collect()
    }
    assert(ex.getMessage.contains("dictionary-bucket"), ex.getMessage)
  }
}
