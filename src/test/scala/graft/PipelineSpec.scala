package graft

import org.apache.spark.sql.functions._
import graft.llm.{Eval, Lexical, Pipeline}

class PipelineSpec extends SparkSpec {

  /** docs 0/1 dense-retrievable on +x/+y, doc 2 lexical-only */
  private def corpus = {
    val s = spark
    import s.implicits._
    Seq(
      (0L, "alpha beta gamma alpha delta"),
      (1L, "beta beta epsilon zeta eta"),
      (2L, "needle haystack needle needle iota")
    ).toDF("doc_id", "text")
  }

  private def embs = {
    val s = spark
    import s.implicits._
    def v(xs: Double*): Seq[Float] = xs.map(_.toFloat)
    Seq(
      (0L, v(1.0, 0.0, 0.0)),
      (1L, v(0.0, 1.0, 0.0)),
      (2L, v(0.0, 0.0, 1.0))
    ).toDF("id", "vec")
  }

  test("window >= doc length degenerates to whole-doc hybrid retrieval " +
      "(single chunk per doc == the q106 shape)") {
    val s = spark
    val queries = Seq(0 -> Seq("alpha"), 1 -> Seq("needle"))
    val qv = embs.filter(col("id") < 2)
      .select(col("id").as("qid"), col("vec").as("qvec"))
    val got = Pipeline.hybridChunkRetrieve(s, corpus, queries, embs, qv,
      window = 100, stride = 100, kPerSystem = 3, kFused = 3)
    // build the same fusion from whole-doc BM25 + dense directly
    val lex = Lexical.bm25TopK(s, corpus, queries, k = 3)
    val dense = graft.llm.Ann.cosineTopK(s, embs, qv, 3)
      .withColumnRenamed("id", "doc_id")
    val want = graft.llm.Fusion.rrfFuse(Seq(lex, dense), 3)
      .select(col("qid").cast("int").as("qid"), col("rn"), col("doc_id"),
        col("rrf_r6"))
    assert(got.collect().map(_.toSeq).toSet ==
      want.collect().map(_.toSeq).toSet)
    assert(got.count() > 0)
  }

  test("chunking restores a long document's best-window match that " +
      "whole-doc BM25 length normalization buries") {
    val s = spark
    import s.implicits._
    // doc 10: one tight 'needle needle needle' window diluted by 600
    // filler tokens; doc 11: short, one needle. Whole-doc BM25 ranks
    // the short doc first (length normalization); chunk-BM25 must
    // surface the long doc's dense window.
    val filler = Seq.fill(300)("blah").mkString(" ")
    val shortFiller = Seq.fill(39)("blah").mkString(" ")
    val docs = Seq(
      (10L, s"$filler needle needle needle $filler"),
      (11L, s"needle $shortFiller")
    ).toDF("doc_id", "text")
    val queries = Seq(0 -> Seq("needle"))
    val wholeTop = Lexical.bm25TopK(s, docs, queries, k = 1)
      .head.getLong(2)
    assert(wholeTop == 11L, s"premise: whole-doc BM25 prefers the short doc")
    val e = Seq((10L, Seq(1.0f, 0f)), (11L, Seq(0f, 1.0f))).toDF("id", "vec")
    // no dense contribution for qid 0 (its qvec set is empty): pure
    // lexical fusion — chunk ranking must now lead with the long doc
    val qv = e.filter(col("id") < 0)
      .select(col("id").as("qid"), col("vec").as("qvec"))
    val chunked = Pipeline.hybridChunkRetrieve(s, docs, queries, e, qv,
      window = 40, stride = 30, kPerSystem = 2, kFused = 2)
      .filter(col("rn") === 1).head.getLong(2)
    assert(chunked == 10L,
      "chunk-level BM25 should surface the dense window in the long doc")
  }

  test("retrieveDiversifyEval: metrics land for every query; perfect " +
      "single-relevant retrieval gives mrr = ndcg = 1") {
    val s = spark
    import s.implicits._
    val queries = Seq(0 -> Seq("alpha"), 1 -> Seq("needle"))
    val qv = embs.filter(col("id") < 0)
      .select(col("id").as("qid"), col("vec").as("qvec"))
    val qrels = Eval.termMatchQrels(s, corpus, queries)
    val got = Pipeline.retrieveDiversifyEval(s, corpus, queries, embs, qv,
        qrels, k = 2, window = 100, stride = 100)
      .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    // each query has exactly one AND-matching doc, retrieved at rank 1
    assert(got == Map(0L -> 1.0, 1L -> 1.0))
  }
}
