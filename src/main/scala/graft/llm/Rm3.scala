package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.rel.RelQueries.Q
import graft.rel.Tables

/** RM3 PSEUDO-RELEVANCE FEEDBACK — the classic lexical
  * query-expansion loop (Lavrenko & Croft SIGIR'01 relevance models;
  * the RM3 interpolation of Abdul-Jaleel et al., TREC 2004): retrieve
  * top-n feedback docs with BM25, estimate the relevance model
  * P(t|R) = Σ_d (tf_td/len_d)·w_d with w_d the doc's normalized
  * first-pass score, interpolate with the uniform original-query
  * distribution (α·P(t|R) + (1−α)·P_orig), keep the top-m expansion
  * terms, and re-rank with the term-weighted BM25 sum.
  *
  * Scale shapes (100 TB):
  *  - Feedback docs are n·|queries| rows — a broadcast; their term
  *    distributions are bounded by n·doclen, never corpus-sized.
  *  - The expansion set (m terms per query) is a broadcast; the
  *    second pass is one postings scan filtered to those terms
  *    (broadcast semi-join prunes at the scan) into the bounded-heap
  *    top-k — the q102 shape with a weight factor.
  *  - The only per-query windows (expansion-term ranking) run over
  *    feedback-doc vocabularies — n·doclen-bounded, not corpus-bounded.
  *
  * Cross-engine determinism: the q102 contract — scores and term
  * weights round to 6 decimals BEFORE any ranking, ties break by
  * term / doc id, so both passes replay in DuckDB.
  */
object Rm3 {

  /** normalized tokens + per-doc length: (id, len, t) */
  private def withLen(docs: DataFrame, id: String, text: String): DataFrame = {
    val toks = filter(split(trim(lower(col(text))), "\\s+"), t => length(t) > 0)
    docs.select(col(id), toks.as("t"))
      .select(col(id), size(col("t")).as("len"), col("t"))
  }

  /** the q102 BM25 per-term score expression, shared by both passes */
  private def tscore(k1: Double, b: Double): Column =
    log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
      (col("tf") * lit(k1 + 1)) /
      (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("len") / col("avg_len")))

  /** Top-m RM3 expansion terms per query: (qid, rn, term, w_r6) with
    * w = α·P(t|R) + (1−α)·P_orig(t), α = alphaMilli/1000, ranked by
    * (w_r6 desc, term). Queries with no first-pass match fall back to
    * the (1−α)-scaled original terms. */
  def rm3Expansion(s: SparkSession, docs: DataFrame,
      queries: Seq[(Int, Seq[String])], nFb: Int, mExp: Int,
      alphaMilli: Int, k1: Double = 1.2, b: Double = 0.75,
      id: String = "doc_id", text: String = "text"): DataFrame = {
    import s.implicits._
    require(nFb > 0 && mExp > 0)
    require(alphaMilli >= 0 && alphaMilli <= 1000, s"alphaMilli=$alphaMilli")
    val alpha = alphaMilli / 1000.0
    val fb = Lexical.bm25TopK(s, docs, queries, nFb, k1, b, id, text)
    val wd = fb.join(fb.groupBy("qid").agg(sum(col("score_r6")).as("ssum")), "qid")
      .select(col("qid"), col(id), (col("score_r6") / col("ssum")).as("wd"))
    // relevance model over the feedback docs' full vocabularies
    val pfb = withLen(docs, id, text)
      .join(broadcast(wd), Seq(id))
      .select(col("qid"), col(id), col("wd"), col("len"),
        explode(col("t")).as("term"))
      .groupBy(col("qid"), col(id), col("term"), col("wd"), col("len"))
      .agg(count(lit(1)).as("tf"))
      .groupBy(col("qid"), col("term"))
      .agg(sum(col("tf").cast("double") / col("len") * col("wd")).as("pfb"))
    val porig = queries.flatMap { case (qi, ts) =>
      ts.distinct.map(t => (qi, t, 1.0 / ts.distinct.size))
    }.toDF("qid", "term", "porig")
    val mix = pfb.join(porig, Seq("qid", "term"), "full_outer")
      .select(col("qid"), col("term"),
        round(lit(alpha) * coalesce(col("pfb"), lit(0.0))
          + lit(1 - alpha) * coalesce(col("porig"), lit(0.0)), 6).as("w_r6"))
    // per-query ranking over an n·doclen-bounded vocabulary
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("w_r6").desc, col("term"))
    mix.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= mExp)
      .select(col("qid"), col("rn"), col("term"), col("w_r6"))
      .orderBy("qid", "rn")
  }

  /** Second-pass retrieval with the expanded weighted query:
    * score(q,d) = Σ_t w_t · BM25term(t,d) over the m expansion terms,
    * rounded to 6 decimals, bounded-heap top-k.
    * Output: (qid, rn, id, score_r6). */
  def rm3Rerank(s: SparkSession, docs: DataFrame,
      queries: Seq[(Int, Seq[String])], nFb: Int, mExp: Int,
      alphaMilli: Int, k: Int, k1: Double = 1.2, b: Double = 0.75,
      id: String = "doc_id", text: String = "text"): DataFrame = {
    require(k > 0)
    val exp = rm3Expansion(s, docs, queries, nFb, mExp, alphaMilli,
      k1, b, id, text)
    val dl = withLen(docs, id, text)
    val stats = dl.agg(count(lit(1)).as("n_docs"), avg(col("len")).as("avg_len"))
    val expTerms = exp.select(col("term")).distinct()
    val post = dl.select(col(id), col("len"), explode(col("t")).as("term"))
      .join(broadcast(expTerms), Seq("term"), "left_semi")
      .groupBy(col("term"), col(id), col("len"))
      .agg(count(lit(1)).as("tf"))
    val dfd = post.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = post
      .join(broadcast(dfd), "term")
      .join(broadcast(exp.select(col("qid"), col("term"), col("w_r6"))), "term")
      .crossJoin(broadcast(stats))
      .withColumn("ts", col("w_r6") * tscore(k1, b))
      .groupBy(col("qid"), col(id))
      .agg(round(sum(col("ts")), 6).as("score_r6"))
    graft.functions.TopK.perKeyTopK(scored, k, "qid", id, "score_r6")
      .orderBy("qid", "rn")
  }

  // ------------------------------------------------------------------
  //  driver entries — q102's query batch, nFb=5, m=8, α=0.6, k=5
  // ------------------------------------------------------------------

  private val demoQueries: Seq[(Int, Seq[String])] = Seq(
    0 -> Seq("join", "hash"),
    1 -> Seq("vector", "scan", "filter"),
    2 -> Seq("customer"))

  /** shared oracle prelude: corpus stats, full postings, first-pass
    * BM25, feedback weights, relevance model, interpolated expansion */
  private def rm3SqlCtes: String =
    """t AS (SELECT doc_id,
      |    list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
      |      x -> len(x) > 0) AS w
      |  FROM documents),
      |dl AS (SELECT doc_id, len(w) AS len, w FROM t),
      |stats AS (SELECT count(*) AS n_docs, avg(len) AS avg_len FROM dl),
      |allpost AS (SELECT term, doc_id, len, count(*) AS tf
      |  FROM (SELECT doc_id, len, unnest(w) AS term FROM dl) u
      |  GROUP BY term, doc_id, len),
      |dfd AS (SELECT term, count(*) AS df FROM allpost GROUP BY term),
      |q(qid, term) AS (VALUES (0,'join'),(0,'hash'),(1,'vector'),
      |  (1,'scan'),(1,'filter'),(2,'customer')),
      |qn AS (SELECT qid, count(*) AS nq FROM q GROUP BY qid),
      |sc0 AS (SELECT q.qid, p.doc_id,
      |    round(sum(ln(1.0 + (s.n_docs - d.df + 0.5)/(d.df + 0.5))
      |      * (p.tf * 2.2)
      |      / (p.tf + 1.2 * (0.25 + 0.75 * p.len / s.avg_len))), 6)
      |      AS score_r6
      |  FROM allpost p JOIN dfd d USING (term) JOIN q USING (term)
      |  CROSS JOIN stats s GROUP BY q.qid, p.doc_id),
      |fb AS (SELECT qid, doc_id, score_r6 FROM (
      |    SELECT qid, doc_id, score_r6, row_number() OVER (
      |      PARTITION BY qid ORDER BY score_r6 DESC, doc_id) AS rn
      |    FROM sc0) z WHERE rn <= 5),
      |wd AS (SELECT fb.qid, fb.doc_id, fb.score_r6 / ws.ssum AS wd
      |  FROM fb JOIN (SELECT qid, sum(score_r6) AS ssum FROM fb
      |    GROUP BY qid) ws USING (qid)),
      |pfb AS (SELECT wd.qid, p.term,
      |    sum(CAST(p.tf AS DOUBLE) / p.len * wd.wd) AS pfb
      |  FROM allpost p JOIN wd ON p.doc_id = wd.doc_id
      |  GROUP BY wd.qid, p.term),
      |po AS (SELECT q.qid, q.term, 1.0 / qn.nq AS porig
      |  FROM q JOIN qn USING (qid)),
      |mix AS (SELECT coalesce(pfb.qid, po.qid) AS qid,
      |    coalesce(pfb.term, po.term) AS term,
      |    round(0.6 * coalesce(pfb.pfb, 0) + 0.4 * coalesce(po.porig, 0), 6)
      |      AS w_r6
      |  FROM pfb FULL OUTER JOIN po
      |    ON pfb.qid = po.qid AND pfb.term = po.term),
      |expn AS (SELECT qid, rn, term, w_r6 FROM (
      |    SELECT qid, term, w_r6, row_number() OVER (
      |      PARTITION BY qid ORDER BY w_r6 DESC, term) AS rn
      |    FROM mix) z WHERE rn <= 8)""".stripMargin

  val all: ListMap[String, Q] = ListMap(
    // ---- q285: the RM3 expansion terms themselves — the relevance
    //      model + interpolation, fully replayed. ----
    "q285_rm3_expansion" -> Q(
      (s, d) => rm3Expansion(s, Tables.documents(s, d), demoQueries,
        nFb = 5, mExp = 8, alphaMilli = 600),
      Some(s"""WITH $rm3SqlCtes
             |SELECT qid, CAST(rn AS INT) AS rn, term, w_r6
             |FROM expn ORDER BY qid, rn""".stripMargin)),

    // ---- q286: second-pass weighted-BM25 re-rank under the expanded
    //      query — the full RM3 loop end-to-end. ----
    "q286_rm3_rerank" -> Q(
      (s, d) => rm3Rerank(s, Tables.documents(s, d), demoQueries,
        nFb = 5, mExp = 8, alphaMilli = 600, k = 5),
      Some(s"""WITH $rm3SqlCtes,
             |sc2 AS (SELECT e.qid, p.doc_id,
             |    round(sum(e.w_r6 * (ln(1.0 + (s.n_docs - d.df + 0.5)/(d.df + 0.5))
             |      * (p.tf * 2.2)
             |      / (p.tf + 1.2 * (0.25 + 0.75 * p.len / s.avg_len)))), 6)
             |      AS score_r6
             |  FROM allpost p JOIN expn e USING (term)
             |  JOIN dfd d USING (term) CROSS JOIN stats s
             |  GROUP BY e.qid, p.doc_id),
             |r AS (SELECT qid, doc_id, score_r6, row_number() OVER (
             |    PARTITION BY qid ORDER BY score_r6 DESC, doc_id) AS rn
             |  FROM sc2)
             |SELECT qid, CAST(rn AS INT) AS rn, doc_id, score_r6
             |FROM r WHERE rn <= 5 ORDER BY qid, rn""".stripMargin)))
}
