package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.rel.RelQueries.Q
import graft.rel.Tables

/** QUERY-LIKELIHOOD language-model retrieval (Ponte & Croft SIGIR'98;
  * the smoothing study of Zhai & Lafferty SIGIR'01): rank documents by
  * the log-likelihood of the query under a smoothed per-document
  * unigram model —
  *
  *  - DIRICHLET:        p(t|d) = (tf + µ·p_c(t)) / (len + µ)
  *  - JELINEK–MERCER:   p(t|d) = (1−λ)·tf/len + λ·p_c(t)
  *
  * with p_c(t) = cf_t / |C| the collection model (collection term
  * frequency over total collection tokens). The engine's third lexical
  * ranker next to BM25 (q102) and RM3 (q285/q286).
  *
  * Both scores are computed in the SPARSE decomposition (the Zhai &
  * Lafferty §2 rewriting): the full log-likelihood splits into a
  * matching-term sum that rides the postings of the query terms only,
  * a per-query constant, and — for Dirichlet — a length normalizer:
  *
  *   dirichlet(q,d) = Σ_{t∈q∩d} qtf·ln(1 + tf/(µ·p_c))
  *                    + Σ_{t∈q} qtf·ln(µ·p_c)  −  |q|·ln(len + µ)
  *   jm(q,d)        = Σ_{t∈q∩d} qtf·ln(1 + (1−λ)·tf/(λ·len·p_c))
  *                    + Σ_{t∈q} qtf·ln(λ·p_c)
  *
  * so the VALUE (not just the rank) equals the exact full-form
  * Σ_{t∈q} qtf·ln p(t|d) — QlSpec pins the identity term by term.
  *
  * Query terms absent from the collection (cf = 0) have no finite
  * log-likelihood under either model (p_c = 0 makes every document
  * score −∞ identically), so they are dropped from the query — in both
  * engines by the same inner join against the collection-frequency
  * table — and the per-query constants run over the surviving terms.
  *
  * Candidates are documents matching ≥ 1 surviving query term (the
  * q102 convention); scores round to 6 decimals BEFORE ranking, ties
  * break by doc id, and the top-k rides the bounded-heap aggregator.
  *
  * Scale shape (100 TB): collection stats are one aggregation; the
  * collection-frequency table is query-vocabulary-sized (a broadcast);
  * postings are pruned at the scan by a broadcast semi-join on the
  * query terms; the per-query constants are a |queries|-row broadcast;
  * the only wide state is the per-(query, candidate) partial sum into
  * the map-side-combining TopK heap — the exact q102/q286 shape.
  */
object Ql {

  /** normalized tokens + per-doc length: (id, len, t) — the q102 rule */
  private def withLen(docs: DataFrame, id: String, text: String): DataFrame = {
    val toks = filter(split(trim(lower(col(text))), "\\s+"), t => length(t) > 0)
    docs.select(col(id), toks.as("t"))
      .select(col(id), size(col("t")).as("len"), col("t"))
  }

  /** query bag → (qid, term, qtf) with duplicate terms folded into qtf */
  private def qtermsOf(s: SparkSession, queries: Seq[(Int, Seq[String])]): DataFrame = {
    import s.implicits._
    queries.flatMap { case (qi, ts) =>
      ts.groupBy(identity).toSeq.sortBy(_._1)
        .map { case (t, xs) => (qi, t, xs.size.toLong) }
    }.toDF("qid", "term", "qtf")
  }

  /** Shared prep: (postings restricted to query terms with doc length,
    * per-term collection probability p_c). One corpus scan feeds both. */
  private def prep(docs: DataFrame, qterms: DataFrame,
      id: String, text: String): (DataFrame, DataFrame) = {
    val dl = withLen(docs, id, text)
    val terms = qterms.select("term").distinct()
    val tok = dl.select(col(id), col("len"), explode(col("t")).as("term"))
      .join(broadcast(terms), Seq("term"), "left_semi")
    val post = tok.groupBy(col("term"), col(id), col("len"))
      .agg(count(lit(1)).as("tf"))
    val clen = dl.agg(sum(col("len")).as("c_len"))
    val pc = tok.groupBy("term").agg(count(lit(1)).as("cf"))
      .crossJoin(broadcast(clen))
      .select(col("term"), (col("cf").cast("double") / col("c_len")).as("pc"))
    (post, pc)
  }

  /** Dirichlet-smoothed query likelihood, bounded-heap top-k.
    * Output: (qid, rn, id, score_r6). */
  def qlDirichletTopK(s: SparkSession, docs: DataFrame,
      queries: Seq[(Int, Seq[String])], k: Int, mu: Double = 500.0,
      id: String = "doc_id", text: String = "text"): DataFrame = {
    require(k > 0, s"k=$k")
    require(mu > 0, s"mu=$mu (Dirichlet pseudo-count must be positive)")
    val qterms = qtermsOf(s, queries)
    val (post, pc) = prep(docs, qterms, id, text)
    // per-query constants over SURVIVING terms: Cq = Σ qtf·ln(µ·p_c), Lq = Σ qtf
    val qc = qterms.join(pc, "term").groupBy("qid")
      .agg(sum(col("qtf") * log(lit(mu) * col("pc"))).as("cq"),
        sum(col("qtf")).as("lq"))
    val scored = post
      .join(broadcast(pc), "term")
      .join(broadcast(qterms), "term")
      .groupBy(col("qid"), col(id), col("len"))
      .agg(sum(col("qtf") * log(lit(1.0) + col("tf") / (lit(mu) * col("pc")))).as("ms"))
      .join(broadcast(qc), "qid")
      .select(col("qid"), col(id),
        round(col("ms") + col("cq")
          - col("lq") * log(col("len") + lit(mu)), 6).as("score_r6"))
    graft.functions.TopK.perKeyTopK(scored, k, "qid", id, "score_r6")
      .orderBy("qid", "rn")
  }

  /** Jelinek–Mercer-smoothed query likelihood (λ = lambdaMilli/1000 the
    * collection weight), bounded-heap top-k. λ = 1 degenerates to the
    * pure collection model — every candidate ties, ranks fall to doc id
    * (QlSpec pins it). Output: (qid, rn, id, score_r6). */
  def qlJmTopK(s: SparkSession, docs: DataFrame,
      queries: Seq[(Int, Seq[String])], k: Int, lambdaMilli: Int = 400,
      id: String = "doc_id", text: String = "text"): DataFrame = {
    require(k > 0, s"k=$k")
    require(lambdaMilli > 0 && lambdaMilli <= 1000,
      s"lambdaMilli=$lambdaMilli (0 would unsmooth unseen terms to −∞)")
    val lam = lambdaMilli / 1000.0
    val qterms = qtermsOf(s, queries)
    val (post, pc) = prep(docs, qterms, id, text)
    val qc = qterms.join(pc, "term").groupBy("qid")
      .agg(sum(col("qtf") * log(lit(lam) * col("pc"))).as("cq"))
    val scored = post
      .join(broadcast(pc), "term")
      .join(broadcast(qterms), "term")
      .groupBy(col("qid"), col(id))
      .agg(sum(col("qtf") * log(lit(1.0)
        + lit(1.0 - lam) * col("tf") / (lit(lam) * col("len") * col("pc")))).as("ms"))
      .join(broadcast(qc), "qid")
      .select(col("qid"), col(id), round(col("ms") + col("cq"), 6).as("score_r6"))
    graft.functions.TopK.perKeyTopK(scored, k, "qid", id, "score_r6")
      .orderBy("qid", "rn")
  }

  // ------------------------------------------------------------------
  //  driver entries — the q102 query batch plus a repeated-term query
  //  (qtf = 2) and a collection-absent term ("zzz" → dropped, both
  //  engines via the same cf inner join)
  // ------------------------------------------------------------------

  private val demoQueries: Seq[(Int, Seq[String])] = Seq(
    0 -> Seq("join", "hash"),
    1 -> Seq("vector", "scan", "filter"),
    2 -> Seq("customer", "customer", "zzz"))

  /** shared oracle prelude: tokens, lengths, query bag with qtf,
    * query-term postings, collection model p_c over surviving terms */
  private def qlSqlCtes: String = qlSqlCtesFor(
    """(0,'join',1),(0,'hash',1),
      |  (1,'vector',1),(1,'scan',1),(1,'filter',1),
      |  (2,'customer',2),(2,'zzz',1)""".stripMargin)

  /** The same prelude with a caller-supplied (qid, term, qtf) VALUES
    * body — q341's RBO oracle replays this ranker over the BM25
    * query set.
    */
  private[llm] def qlSqlCtesFor(queryValues: String): String =
    s"""t AS (SELECT doc_id,
      |    list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
      |      x -> len(x) > 0) AS w
      |  FROM documents),
      |dl AS (SELECT doc_id, len(w) AS len, w FROM t),
      |cstat AS (SELECT sum(len) AS c_len FROM dl),
      |q(qid, term, qtf) AS (VALUES $queryValues),
      |qt AS (SELECT DISTINCT term FROM q),
      |tok AS (SELECT doc_id, len, unnest(w) AS term FROM dl),
      |post AS (SELECT term, doc_id, len, count(*) AS tf
      |  FROM tok JOIN qt USING (term) GROUP BY term, doc_id, len),
      |pc AS (SELECT term, CAST(count(*) AS DOUBLE) / any_value(c_len) AS pc
      |  FROM tok JOIN qt USING (term) CROSS JOIN cstat
      |  GROUP BY term)""".stripMargin

  /** The full Dirichlet-QL replay over a caller-supplied query VALUES
    * body — shared by q288 and q341's RBO composition.
    */
  private[llm] def qlDirichletOracleSqlFor(queryValues: String): String =
    s"""WITH ${qlSqlCtesFor(queryValues)},
       |qc AS (SELECT qid, sum(qtf * ln(500.0 * pc)) AS cq,
       |    sum(qtf) AS lq
       |  FROM q JOIN pc USING (term) GROUP BY qid),
       |ms AS (SELECT q.qid, p.doc_id, p.len,
       |    sum(q.qtf * ln(1.0 + p.tf / (500.0 * pc.pc))) AS ms
       |  FROM post p JOIN q USING (term) JOIN pc USING (term)
       |  GROUP BY q.qid, p.doc_id, p.len),
       |sc AS (SELECT ms.qid, ms.doc_id,
       |    round(ms.ms + qc.cq - qc.lq * ln(ms.len + 500.0), 6)
       |      AS score_r6
       |  FROM ms JOIN qc USING (qid)),
       |r AS (SELECT qid, doc_id, score_r6, row_number() OVER (
       |    PARTITION BY qid ORDER BY score_r6 DESC, doc_id) AS rn
       |  FROM sc)
       |SELECT qid, CAST(rn AS INT) AS rn, doc_id, score_r6
       |FROM r WHERE rn <= 5 ORDER BY qid, rn""".stripMargin

  private def qlDirichletOracleSql: String = qlDirichletOracleSqlFor(
    """(0,'join',1),(0,'hash',1),
      |  (1,'vector',1),(1,'scan',1),(1,'filter',1),
      |  (2,'customer',2),(2,'zzz',1)""".stripMargin)

  val all: ListMap[String, Q] = ListMap(
    // ---- q288: Dirichlet query likelihood — sparse decomposition,
    //      per-query constants, length normalizer, top-5. ----
    "q288_ql_dirichlet" -> Q(
      (s, d) => qlDirichletTopK(s, Tables.documents(s, d), demoQueries,
        k = 5, mu = 500.0),
      Some(qlDirichletOracleSql)),

    // ---- q289: Jelinek–Mercer query likelihood, λ = 0.4, top-5. ----
    "q289_ql_jm" -> Q(
      (s, d) => qlJmTopK(s, Tables.documents(s, d), demoQueries,
        k = 5, lambdaMilli = 400),
      Some(s"""WITH $qlSqlCtes,
             |qc AS (SELECT qid, sum(qtf * ln(0.4 * pc)) AS cq
             |  FROM q JOIN pc USING (term) GROUP BY qid),
             |ms AS (SELECT q.qid, p.doc_id,
             |    sum(q.qtf * ln(1.0 + 0.6 * p.tf / (0.4 * p.len * pc.pc))) AS ms
             |  FROM post p JOIN q USING (term) JOIN pc USING (term)
             |  GROUP BY q.qid, p.doc_id),
             |sc AS (SELECT ms.qid, ms.doc_id,
             |    round(ms.ms + qc.cq, 6) AS score_r6
             |  FROM ms JOIN qc USING (qid)),
             |r AS (SELECT qid, doc_id, score_r6, row_number() OVER (
             |    PARTITION BY qid ORDER BY score_r6 DESC, doc_id) AS rn
             |  FROM sc)
             |SELECT qid, CAST(rn AS INT) AS rn, doc_id, score_r6
             |FROM r WHERE rn <= 5 ORDER BY qid, rn""".stripMargin)))
}
