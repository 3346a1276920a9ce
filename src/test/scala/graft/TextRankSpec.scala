package graft

import org.apache.spark.sql.functions._
import graft.llm.TextRank
import graft.graph.PageRank

/** TextRank keywords (llm/TextRank.scala): composition pin — the
  * operator must equal weightedPagerank run over the hand-built
  * windowed pair graph — plus hub salience, self-pair exclusion, and
  * determinism.
  */
class TextRankSpec extends SparkSpec {

  private def docs(texts: String*) = {
    val s = spark
    import s.implicits._
    texts.toDF("text")
  }

  /** pair counts of a ±2 window with self-pairs dropped, by hand */
  private def handPairs(texts: Seq[String]): Map[(String, String), Long] = {
    val out = scala.collection.mutable.Map[(String, String), Long]()
    for (t <- texts) {
      val toks = t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
      for (i <- toks.indices; o <- 1 to 2; if i + o < toks.length) {
        val (x, y) = (toks(i), toks(i + o))
        if (x != y) {
          val k = if (x <= y) (x, y) else (y, x)
          out(k) = out.getOrElse(k, 0L) + 1L
        }
      }
    }
    out.toMap
  }

  private val corpus = Seq(
    "alpha hub beta", "gamma hub delta", "alpha hub gamma",
    "beta hub delta", "alpha beta gamma", "hub alpha hub beta")

  test("composition pin: equals weightedPagerank over the hand-built graph") {
    val s = spark
    import s.implicits._
    val pc = handPairs(corpus).filter(_._2 >= 2L)
    val terms = pc.keys.flatMap(p => Seq(p._1, p._2)).toSeq.distinct.sorted
    val id = terms.zipWithIndex.map { case (t, i) => t -> (i + 1L) }.toMap
    val e1 = pc.toSeq.map { case ((a, b), c) => (id(a), id(b), c) }
    val ed = (e1 ++ e1.map { case (u, v, c) => (v, u, c) })
      .toDF("u", "v", "w")
    val want = PageRank.weightedPagerank(spark, ed, iters = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = TextRank.textRankKeywords(spark, docs(corpus: _*),
      minCount = 2, k = 100)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want.map { case (n, r) => terms((n - 1).toInt) -> r },
      s"got $got")
  }

  test("the hub term ranks first") {
    val top = TextRank.textRankKeywords(spark, docs(corpus: _*),
      minCount = 2, k = 1).collect()(0).getString(0)
    assert(top == "hub", s"got $top")
  }

  test("self-pairs are excluded: a repeated-token corpus has no graph") {
    val ex = intercept[Exception] {
      TextRank.textRankKeywords(spark,
        docs("aa aa aa aa", "bb bb bb bb"), minCount = 1).collect()
    }
    assert(ex.getMessage.contains("empty edge set"), ex.getMessage)
  }

  test("re-running is bit-deterministic") {
    val a = TextRank.textRankKeywords(spark, docs(corpus: _*), minCount = 2)
      .collect().map(_.toSeq).toSeq
    val b = TextRank.textRankKeywords(spark, docs(corpus: _*), minCount = 2)
      .collect().map(_.toSeq).toSeq
    assert(a == b)
  }
}
