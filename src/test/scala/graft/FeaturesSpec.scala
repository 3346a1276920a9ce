package graft

import graft.llm.Features

/** Chi-square feature selection (llm/Features.scala): hand-checked 2x2
  * contingency, perfect/zero discrimination extremes, the df floor,
  * and rank determinism.
  */
class FeaturesSpec extends SparkSpec {

  private def docs = {
    val s = spark
    import s.implicits._
    // "aa" appears only in label x docs; "cc" in every doc; "dd" rare
    Seq(
      (1L, "aa cc", "x"), (2L, "aa cc", "x"), (3L, "aa cc dd", "x"),
      (4L, "bb cc", "y"), (5L, "bb cc", "y"), (6L, "bb cc", "y")
    ).toDF("doc_id", "text", "lang")
  }

  test("perfectly discriminative terms score N; universal terms score 0") {
    val got = Features.chiSquareTerms(spark, docs, k = 3, minDf = 2)
      .collect()
      .map(r => (r.getString(0), r.getString(2)) -> r.getDouble(5)).toMap
    // a=3, b=0, c=0, d=3: chi2 = 6*(9-0)^2/(3*3*3*3) = 6.0 for aa in x
    assert(got(("x", "aa")) == 6.0)
    assert(got(("y", "bb")) == 6.0)
    // cc is in every doc: the (c+d) margin is 0, the statistic is
    // undefined, and the term carries no signal -> 0 by convention
    assert(got(("x", "cc")) == 0.0)
    assert(!got.contains(("x", "dd")), "df floor must drop rare terms")
  }

  test("df floor bounds the candidate vocabulary") {
    val all = Features.chiSquareTerms(spark, docs, k = 10, minDf = 1)
      .collect().map(_.getString(2)).toSet
    val floored = Features.chiSquareTerms(spark, docs, k = 10, minDf = 2)
      .collect().map(_.getString(2)).toSet
    assert(all.contains("dd") && !floored.contains("dd"))
  }

  test("mi: a perfectly discriminative term scores ln 2; universal scores 0") {
    val got = Features.miTerms(spark, docs, k = 3, minDf = 2)
      .collect()
      .map(r => (r.getString(0), r.getString(2)) -> r.getDouble(5)).toMap
    // aa: cells (3,0,0,3) over nn=6 -> (1/2)ln2 + (1/2)ln2 = ln 2
    assert(got(("x", "aa")) == 0.693147, s"$got")
    // cc appears in every doc: every cell's ratio is 1 (or empty) -> 0
    assert(got(("x", "cc")) == 0.0, s"$got")
  }

  test("ranks are deterministic and bounded by k") {
    val a = Features.chiSquareTerms(spark, docs, 2, 1).collect().map(_.toSeq)
    val b = Features.chiSquareTerms(spark, docs, 2, 1).collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
    assert(a.groupBy(_.head).values.forall(_.length <= 2))
  }
}
