package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.rel.RelQueries.Q
import graft.rel.Tables

/** HYBRID RETRIEVAL — reciprocal-rank fusion (Cormack, Clarke &
  * Buettcher, SIGIR 2009) of per-query ranked lists from heterogeneous
  * retrievers, here the engine's own lexical ([[Lexical.bm25TopK]]) and
  * dense ([[Ann.cosineTopK]]) paths: the standard first stage of a
  * retrieval pipeline that wants keyword recall AND semantic recall
  * without calibrating incomparable score scales (BM25 sums vs cosines).
  * RRF uses only the RANKS: score(d) = Σ_systems 1/(c + rank_d), c = 60
  * per the paper, docs absent from a system's top-k contribute nothing.
  *
  * Scale shape (100 TB): each input ranking is already k-bounded per
  * query (the retrievers' bounded-heap output), so the fusion input is
  * |queries|·k·systems rows — trivially small regardless of corpus
  * size; one hash aggregation on (qid, id), no join back to the corpus.
  * The expensive work stays inside the retrievers, which keep their own
  * scale stories (bucket-pruned postings probe, IVF-pruned ANN probe).
  *
  * Cross-engine determinism: ranks are exact integers; each fused score
  * sums ≤ |systems| doubles of the form 1/(c+rn) (two-term sums are
  * order-insensitive in IEEE; for many systems the rounding absorbs
  * order), rounded to 6 decimals BEFORE ranking with ties to the lower
  * id — the q44/q102 contract, so the fused ranking replays exactly in
  * SQL.
  */
object Fusion {

  /** Fuse per-query rankings into an RRF top-k. Each input DataFrame
    * carries (`qid`, `id`, `rn`) with `rn` the 1-based rank within its
    * system (extra columns are ignored); a (qid, id) pair may appear at
    * most once per system. Output: (qid, rn, id, rrf_r6) in rank order
    * per query — [[graft.functions.TopK.perKeyTopK]]'s shape.
    */
  def rrfFuse(rankings: Seq[DataFrame], k: Int, c: Int = 60,
      qid: String = "qid", id: String = "doc_id", rn: String = "rn"): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    require(k > 0 && c >= 0, s"need k > 0 and c >= 0: k=$k c=$c")
    val contrib = rankings
      .map(_.select(col(qid).cast("long").as(qid), col(id).cast("long").as(id),
        col(rn).cast("int").as(rn)))
      .reduce(_ unionAll _)
      .withColumn("_rr", lit(1.0) / (lit(c) + col(rn)))
    val fused = contrib
      .groupBy(col(qid), col(id))
      .agg(round(sum(col("_rr")), 6).as("rrf_r6"))
    graft.functions.TopK.perKeyTopK(fused, k, qid, id, "rrf_r6")
  }

  /** q106: BM25 top-10 (the q102 query batch) fused with cosine top-10
    * (each query's OWN embedding probing the corpus, the q37 shape) at
    * c = 60, fused top-5 per query. The id spaces align by construction
    * of the testdata: `embeddings.vec_id` indexes the same corpus as
    * `documents.doc_id`.
    */
  private def q106(s: SparkSession, d: String): DataFrame = {
    val lex = Lexical.bm25TopK(s, Tables.documents(s, d), Lexical.demoQueries, k = 10)
    val e = Tables.embeddings(s, d)
    val qv = e.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val vec = Ann.cosineTopK(s, e, qv, k = 10, id = "vec_id", vec = "embedding")
      .withColumnRenamed("vec_id", "doc_id")
    rrfFuse(Seq(lex, vec), k = 5)
      .select(col("qid").cast("int").as("qid"), col("rn"), col("doc_id"), col("rrf_r6"))
      .orderBy("qid", "rn")
  }

  /** replays both rankings (the q102 BM25 CTE chain at depth 10; the q37
    * cosine window at depth 10) and the fusion arithmetic; 1.0 is cast
    * to DOUBLE because a bare DuckDB decimal literal would fuse in
    * DECIMAL arithmetic
    */
  private val rrfOracleSql =
    """WITH t AS (SELECT doc_id,
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
      |lexr AS (SELECT qid, doc_id,
      |    row_number() OVER (PARTITION BY qid
      |      ORDER BY score_r6 DESC, doc_id) AS rn
      |  FROM sc),
      |vecr AS (SELECT qid, vec_id,
      |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rn
      |  FROM (SELECT q.vec_id AS qid, e.vec_id,
      |      list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))
      |      / (sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])))
      |         * sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))) AS cos
      |    FROM embeddings q JOIN embeddings e
      |      ON q.vec_id < 3 AND e.vec_id != q.vec_id) s0),
      |u AS (SELECT qid, doc_id, rn FROM lexr WHERE rn <= 10
      |  UNION ALL SELECT qid, vec_id AS doc_id, rn FROM vecr WHERE rn <= 10),
      |f AS (SELECT qid, doc_id,
      |    round(sum(CAST(1.0 AS DOUBLE) / (60 + rn)), 6) AS rrf_r6
      |  FROM u GROUP BY qid, doc_id),
      |r AS (SELECT qid, doc_id, rrf_r6,
      |    row_number() OVER (PARTITION BY qid
      |      ORDER BY rrf_r6 DESC, doc_id) AS rn
      |  FROM f)
      |SELECT CAST(qid AS INT) AS qid, CAST(rn AS INT) AS rn, doc_id, rrf_r6
      |FROM r WHERE rn <= 5 ORDER BY qid, rn""".stripMargin

  val all: ListMap[String, Q] = ListMap(
    "q106_rrf_fusion" -> Q(q106, Some(rrfOracleSql)))
}
