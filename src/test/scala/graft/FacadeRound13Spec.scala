package graft

import org.apache.spark.sql.functions._

/** Round-13 facade methods delegate to (and agree with) their kernels. */
class FacadeRound13Spec extends SparkSpec {

  private def docsFixture = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "the cat sat on the mat", "a", "en"),
      (2L, "the cat sat on the mat", "b", "en"),
      (3L, "zz qq pp rr ss tt uu vv", "b", "xx"),
      (4L, "one two three four five six seven eight", "a", "en")
    ).toDF("doc_id", "text", "source", "lang")
  }

  test("jpeg / normalize / louvain facades equal the kernels") {
    val s = spark
    import s.implicits._
    val g = graft.io.Bmp.Gray(2, 1, Array(10, 250))
    val jpg = graft.io.Jpeg.buildGray(graft.io.Jpeg.upsample(g, 8),
      graft.io.Jpeg.DcExactQuant)
    assert(Graft.jpegDecode(jpg).pixels.sameElements(
      graft.io.Jpeg.parse(jpg).pixels))
    val norm = Seq(Tuple1("ＡＢ  c")).toDF("t")
      .select(Graft.normalizeText(s, col("t"))).collect()(0).getString(0)
    assert(norm == "ab c")
    val e = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("u", "v")
    assert(Graft.louvainTwoLevel(s, e, 2, 2).collect().map(_.toSeq).toSet ==
      graft.graph.Louvain.louvainTwoLevel(s, e, 2, 2)
        .collect().map(_.toSeq).toSet)
  }

  test("curation-tier facades equal the kernels") {
    val s = spark
    val d = docsFixture
    def same(a: org.apache.spark.sql.DataFrame,
        b: org.apache.spark.sql.DataFrame): Unit =
      assert(a.collect().map(_.toSeq).toSet == b.collect().map(_.toSeq).toSet)
    same(Graft.perplexityFilter(s, d, tau = -1.5),
      graft.llm.Curation.perplexityFilter(s, d, tau = -1.5))
    same(Graft.gramNovelty(s, d, k = 2, buckets = 4),
      graft.llm.Curation.gramNovelty(s, d, k = 2, buckets = 4))
    same(Graft.sourceDupMatrix(s, d, minJaccard = 0.5),
      graft.llm.Dedup.sourceDupMatrix(s, d, minJaccard = 0.5))
    same(Graft.repetitionFilter(s, d),
      graft.llm.Curation.repetitionFilter(s, d))
    same(Graft.priorityDedup(s, d, lit(1L), minJaccard = 0.5),
      graft.llm.Dedup.priorityDedup(s, d, lit(1L), minJaccard = 0.5))
    same(Graft.gopherQualityRules(s, d),
      graft.llm.Curation.gopherQualityRules(s, d))
    same(Graft.heapsLaw(s, d, buckets = 4),
      graft.llm.TextStats.heapsLaw(s, d, buckets = 4))
  }

  test("eval/graph-tier facades equal the kernels") {
    val s = spark
    import s.implicits._
    def same(a: org.apache.spark.sql.DataFrame,
        b: org.apache.spark.sql.DataFrame): Unit =
      assert(a.collect().map(_.toSeq).toSet == b.collect().map(_.toSeq).toSet)
    val scores = Seq(("g", 3L, true), ("g", 2L, false), ("g", 1L, true))
      .toDF("g", "sc", "y")
    same(Graft.groupedPrCurve(scores, col("g"), col("sc"), col("y")),
      graft.llm.Eval.groupedPrCurve(scores, col("g"), col("sc"), col("y")))
    val vecs = (0L until 12L)
      .map(i => (i, Array.tabulate(4)(j => ((i + j) % 5).toFloat)))
      .toDF("vec_id", "embedding")
    same(Graft.matryoshkaRecall(s, vecs, dims = Seq(2, 4), k = 3,
        querySkip = 4L),
      graft.llm.Eval.matryoshkaRecall(s, vecs, dims = Seq(2, 4), k = 3,
        querySkip = 4L))
    val urls = Seq((1L, "https://www.X.com/a?q=1"), (2L, "http://x.com/a"))
      .toDF("doc_id", "url")
    same(Graft.urlCanonicalDedup(s, urls),
      graft.llm.Curation.urlCanonicalDedup(s, urls))
    val e = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("a", "b")
    same(Graft.degreePowerlaw(s, e),
      graft.graph.Assortativity.degreePowerlaw(s, e))
  }
}
