package graft

import graft.llm.TextRank

/** Spectral term axis (llm/TextRank.spectralTermAxis): the Perron
  * vector concentrates on the strongest association cluster, PPMI is
  * exactly invariant under corpus duplication (so the integer rounds
  * replay bit-for-bit), and an under-floor corpus yields an empty
  * (not erroring) result.
  */
class SpectralTermsSpec extends SparkSpec {

  private def docs(texts: String*) = {
    val s = spark
    import s.implicits._
    texts.toDF("text")
  }

  // x-terms form a 4-node, 5-edge association block (spectral radius
  // ~2.56 edges deep); y is a single edge — even with y's PMI a bit
  // higher (the rare-pair bias), the Perron vector loads on x
  private val corpus = (1 to 8).map(_ => "x1 x2 x3 x4") ++
    (1 to 6).map(_ => "y1 y2") ++ Seq("x1 y1 bridge")

  test("the dominant axis loads on the strongest association block") {
    val top = TextRank.spectralTermAxis(spark, docs(corpus: _*),
      minCount = 3, k = 4).collect().map(_.getString(0)).toSet
    assert(top == Set("x1", "x2", "x3", "x4"), s"got $top")
  }

  test("corpus duplication leaves the axis bit-identical (PPMI scale invariance)") {
    val a = TextRank.spectralTermAxis(spark, docs(corpus: _*),
      minCount = 3, k = 10).collect().map(_.toSeq).toSeq
    val b = TextRank.spectralTermAxis(spark, docs((corpus ++ corpus): _*),
      minCount = 3, k = 10).collect().map(_.toSeq).toSeq
    assert(a == b, s"$a vs $b")
  }

  test("an under-floor corpus yields an empty axis") {
    val got = TextRank.spectralTermAxis(spark,
      docs("a b c", "d e f"), minCount = 5, k = 10).collect()
    assert(got.isEmpty)
  }

  test("re-running is bit-deterministic") {
    val a = TextRank.spectralTermAxis(spark, docs(corpus: _*), minCount = 3)
      .collect().map(_.toSeq).toSeq
    val b = TextRank.spectralTermAxis(spark, docs(corpus: _*), minCount = 3)
      .collect().map(_.toSeq).toSeq
    assert(a == b)
  }
}
