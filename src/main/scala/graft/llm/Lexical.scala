package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.rel.RelQueries.Q
import graft.rel.Tables

/** LEXICAL search — the keyword counterpart to the ANN serving path:
  * BM25 scoring (Robertson & Zaragoza 2009, "The probabilistic
  * relevance framework: BM25 and beyond"; the idf is the
  * ln(1 + (N − df + 0.5)/(df + 0.5)) form) of a query batch against
  * the corpus, top-k docs per query.
  *
  * Scale shape (100 TB): the query term set broadcasts (small by
  * definition) and FILTERS the exploded token stream before any
  * aggregation — the full inverted index is never built for a query
  * batch; postings exist only for queried terms. Per-term df and the
  * (qid, term) table are |terms|-bounded broadcasts; corpus size and
  * average length enter the plan as a broadcast 1-row aggregate (no
  * driver round-trip); the final ranking is the bounded-heap
  * [[graft.functions.TopK]] aggregator — k rows per query per map
  * partition cross the shuffle, never the full scored list.
  *
  * Cross-engine determinism: scores are rounded to 6 decimals BEFORE
  * ranking (float sums across terms are order-sensitive at ~1e-15;
  * the rounding absorbs it — the q44 contract) and ties break by doc
  * id, so the (qid, rank → doc) mapping is total and replayable.
  */
object Lexical {

  def bm25TopK(s: SparkSession, docs: DataFrame, queries: Seq[(Int, Seq[String])],
      k: Int, k1: Double = 1.2, b: Double = 0.75,
      id: String = "doc_id", text: String = "text"): DataFrame = {
    import s.implicits._
    require(k > 0 && queries.nonEmpty)
    val toks = filter(split(trim(lower(col(text))), "\\s+"), t => length(t) > 0)
    val dl = docs.select(col(id), toks.as("t"))
      .select(col(id), size(col("t")).as("len"), col("t"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), avg(col("len")).as("avg_len"))
    val qterms = queries.flatMap(_._2).distinct
    val post = dl.select(col(id), col("len"), explode(col("t")).as("term"))
      .filter(col("term").isin(qterms: _*))
      .groupBy(col("term"), col(id), col("len"))
      .agg(count(lit(1)).as("tf"))
    val dfd = post.groupBy("term").agg(count(lit(1)).as("df"))
    val qdf = queries.flatMap { case (qi, ts) => ts.map(t => (qi, t)) }
      .toDF("qid", "term")
    val scored = post
      .join(broadcast(dfd), "term")
      .join(broadcast(qdf), "term")
      .crossJoin(broadcast(stats))
      .withColumn("tscore",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
          * (col("tf") * lit(k1 + 1))
          / (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("len") / col("avg_len"))))
      .groupBy(col("qid"), col(id))
      .agg(round(sum(col("tscore")), 6).as("score_r6"))
    graft.functions.TopK.perKeyTopK(scored, k, "qid", id, "score_r6")
  }

  /** the q102 query batch: corpus-frequent terms, one single-term query
    * and two multi-term ones so idf mixing and score summing both have
    * real work
    */
  private val demoQueries = Seq(
    0 -> Seq("join", "hash"),
    1 -> Seq("vector", "scan", "filter"),
    2 -> Seq("customer"))

  val all: ListMap[String, Q] = ListMap(
    // ---- BM25 top-5 per query: the oracle replays the same postings,
    //      df, idf and tf-normalization arithmetic with the identical
    //      expression shape, rounds to 6 decimals, and ranks with the
    //      same (score desc, id asc) tie-break ----
    "q102_bm25_topk" -> Q(
      (s, d) => bm25TopK(s, Tables.documents(s, d), demoQueries, k = 5)
        .orderBy("qid", "rn"),
      Some("""WITH t AS (SELECT doc_id,
             |    list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
             |      x -> len(x) > 0) AS w
             |  FROM documents),
             |dl AS (SELECT doc_id, len(w) AS len, w FROM t),
             |stats AS (SELECT count(*) AS n_docs, avg(len) AS avg_len FROM dl),
             |post AS (SELECT term, doc_id, len, count(*) AS tf
             |  FROM (SELECT doc_id, len, unnest(w) AS term FROM dl) u
             |  WHERE term IN ('join','hash','vector','scan','filter','customer')
             |  GROUP BY term, doc_id, len),
             |dfd AS (SELECT term, count(*) AS df FROM post GROUP BY term),
             |q(qid, term) AS (VALUES (0,'join'),(0,'hash'),(1,'vector'),
             |  (1,'scan'),(1,'filter'),(2,'customer')),
             |sc AS (SELECT q.qid, p.doc_id,
             |    round(sum(ln(1.0 + (s.n_docs - d.df + 0.5)/(d.df + 0.5))
             |      * (p.tf * 2.2)
             |      / (p.tf + 1.2 * (0.25 + 0.75 * p.len / s.avg_len))), 6)
             |      AS score_r6
             |  FROM post p JOIN dfd d USING (term) JOIN q USING (term)
             |  CROSS JOIN stats s
             |  GROUP BY q.qid, p.doc_id),
             |r AS (SELECT qid, doc_id, score_r6,
             |    row_number() OVER (PARTITION BY qid
             |      ORDER BY score_r6 DESC, doc_id) AS rn
             |  FROM sc)
             |SELECT qid, CAST(rn AS INT) AS rn, doc_id, score_r6
             |FROM r WHERE rn <= 5 ORDER BY qid, rn""".stripMargin)),
  )
}
