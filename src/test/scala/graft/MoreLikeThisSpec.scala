package graft

import graft.llm.Lexical

/** More-like-this (llm/Lexical.moreLikeThis): the probe's nearest
  * neighbor shares its signature terms, the probe never returns
  * itself, and the ranking is deterministic.
  */
class MoreLikeThisSpec extends SparkSpec {

  private def docs = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "spark shuffle join broadcast"),
      (2L, "spark shuffle join exchange"),
      (3L, "cat dog bird fish"),
      (4L, "cat dog bird whale"),
      (5L, "filler words only here")
    ).toDF("doc_id", "text")
  }

  test("the nearest neighbor shares the probe's vocabulary") {
    val got = Lexical.moreLikeThis(spark, docs, Seq(1L), nTerms = 4,
      k = 2).collect()
    assert(got.nonEmpty)
    assert(got(0).getLong(2) == 2L, s"doc 2 shares 3 terms: ${got.toSeq}")
    assert(got.forall(_.getLong(2) != 1L), "the probe must exclude itself")
  }

  test("multiple probes rank independently") {
    val got = Lexical.moreLikeThis(spark, docs, Seq(1L, 3L), nTerms = 4,
      k = 1).collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(got(1) == 2L && got(3) == 4L, s"$got")
  }

  test("re-running is bit-deterministic") {
    val a = Lexical.moreLikeThis(spark, docs, Seq(1L, 3L))
      .collect().map(_.toSeq).toSeq
    val b = Lexical.moreLikeThis(spark, docs, Seq(1L, 3L))
      .collect().map(_.toSeq).toSeq
    assert(a == b)
  }
}
