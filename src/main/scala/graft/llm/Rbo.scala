package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.rel.RelQueries.Q
import graft.rel.Tables

/** RANK-BIASED OVERLAP (Webber, Moffat & Zobel TOIS 2010) between two
  * top-k rankings — the ranker-agreement metric built for INDEFINITE
  * rankings: top-weighted (disagreement at rank 1 costs more than at
  * rank k), handles non-conjoint lists (a doc in one ranking only
  * simply never contributes). The question it answers here: "how
  * differently do BM25 and Dirichlet-QL order the same corpus for the
  * same queries?" — the cheap pre-check before an interleaving
  * experiment buys the answer with traffic.
  *
  * Truncated, NORMALIZED form: each doc present in BOTH top-k lists
  * contributes S(m) = Σ_{d=m..k} (1−p)p^(d−1)/d / norm, where
  * m = max(rank_A, rank_B) and norm = Σ_{d=1..k} (1−p)p^(d−1) — so
  * identical rankings score exactly 1. The S table is PRECOMPUTED IN
  * SCALA to nano-unit literals embedded in both engines (the q325
  * rule), which ALSO makes the per-query score an exact integer sum —
  * order-free, no IEEE accumulation anywhere. One broadcast-size join
  * of two k-row-per-query tables.
  */
object Rbo {

  /** Per-nano suffix weights S(1..k), normalized so identical top-k
    * rankings sum to exactly 10⁹ (± k/2 nano of rounding).
    */
  private[llm] def suffixNano(k: Int, pMilli: Long): IndexedSeq[Long] = {
    val p = pMilli.toDouble / 1000.0
    val w = (1 to k).map(d => (1.0 - p) * math.pow(p, (d - 1).toDouble) / d)
    val norm = (1 to k).map(d => (1.0 - p) * math.pow(p, (d - 1).toDouble)).sum
    (1 to k).map(m => math.round(w.drop(m - 1).sum / norm * 1e9))
  }

  /** RBO@k per query between rankings `a` and `b` (each with columns
    * qid, rn, doc_id; rows beyond rank k are ignored). Output per qid
    * in `a`, ordered: (qid, n_overlap, rbo_nano) — 10⁹ ≡ identical
    * top-k lists, 0 ≡ disjoint.
    */
  def rboAgreement(a: DataFrame, b: DataFrame, k: Int,
      pMilli: Long = 900L): DataFrame = {
    require(k >= 2 && k <= 100, s"rboAgreement: 2 <= k <= 100: $k")
    require(pMilli >= 1 && pMilli <= 999,
      s"rboAgreement: 1 <= pMilli <= 999: $pMilli")
    val sv = suffixNano(k, pMilli)
    val svCol = sv.zipWithIndex
      .map { case (vv, i) => ((i + 1).toLong, vv) }
      .foldRight(lit(0L)) { case ((m, vv), rest) =>
        when(col("m") === m, lit(vv)).otherwise(rest)
      }
    val ra = a.filter(col("rn") <= k)
      .select(col("qid"), col("doc_id"), col("rn").cast("long").as("rna"))
    val rb = b.filter(col("rn") <= k)
      .select(col("qid"), col("doc_id"), col("rn").cast("long").as("rnb"))
    val per = ra.join(rb, Seq("qid", "doc_id"))
      .withColumn("m", greatest(col("rna"), col("rnb")))
      .groupBy("qid")
      .agg(count(lit(1)).as("n_overlap"), sum(svCol).as("rbo_nano"))
    ra.select("qid").distinct()
      .join(per, Seq("qid"), "left")
      .select(col("qid"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
        coalesce(col("rbo_nano"), lit(0L)).as("rbo_nano"))
      .orderBy("qid")
  }

  val all: ListMap[String, Q] = ListMap(
    // ---- q341: RBO@5 between the q102 BM25 and q288 Dirichlet-QL
    //      rankings over ONE query set — the oracle replays BOTH
    //      rankers end to end (the q246 nested-composition pattern)
    //      and re-derives the agreement, so any drift in either
    //      ranker OR the weighting table breaks the hash. ----
    "q341_rbo_rankers" -> Q(
      (s, d) => {
        val docs = Tables.documents(s, d)
        val a = Lexical.bm25TopK(s, docs, Lexical.demoQueries, k = 5)
        val b = Ql.qlDirichletTopK(s, docs, Lexical.demoQueries,
          k = 5, mu = 500.0)
        rboAgreement(a, b, k = 5)
      },
      Some {
        val svRows = suffixNano(5, 900L).zipWithIndex
          .map { case (vv, i) => s"(${i + 1}, $vv)" }.mkString(", ")
        val qlValues =
          """(0,'join',1),(0,'hash',1),
            |  (1,'vector',1),(1,'scan',1),(1,'filter',1),
            |  (2,'customer',1)""".stripMargin
        s"""WITH a AS (SELECT * FROM (${Lexical.bm25OracleSql}) ta),
           |b AS (SELECT * FROM (
           |${Ql.qlDirichletOracleSqlFor(qlValues)}) tb),
           |sv(m, nano) AS (VALUES $svRows),
           |j AS (SELECT a.qid, greatest(a.rn, b.rn) AS m
           |  FROM a JOIN b ON a.qid = b.qid AND a.doc_id = b.doc_id),
           |per AS (SELECT qid, count(*) AS n_overlap,
           |    sum(sv.nano) AS rbo_nano
           |  FROM j JOIN sv USING (m) GROUP BY qid),
           |qs AS (SELECT DISTINCT qid FROM a)
           |SELECT qs.qid,
           |  CAST(coalesce(per.n_overlap, 0) AS BIGINT) AS n_overlap,
           |  CAST(coalesce(per.rbo_nano, 0) AS BIGINT) AS rbo_nano
           |FROM qs LEFT JOIN per USING (qid) ORDER BY qs.qid""".stripMargin
      }),

    // ---- q405: RBO@5 between the χ² (q302) and MI (q404) term
    //      rankings per language — do the two feature-selection
    //      methods agree about what characterizes each language? The
    //      oracle replays BOTH rankers and the nano weighting. ----
    "q405_feature_ranking_rbo" -> Q(
      (s, d) => {
        val docs = Tables.documents(s, d)
        val a = Features.chiSquareTerms(s, docs, k = 5, minDf = 10L)
          .select(col("label").as("qid"), col("rn"),
            col("term").as("doc_id"))
        val b = Features.miTerms(s, docs, k = 5, minDf = 10L)
          .select(col("label").as("qid"), col("rn"),
            col("term").as("doc_id"))
        rboAgreement(a, b, k = 5)
      },
      Some {
        val svRows = suffixNano(5, 900L).zipWithIndex
          .map { case (vv, i) => s"(${i + 1}, $vv)" }.mkString(", ")
        s"""WITH a AS (SELECT label AS qid, rn, term AS doc_id
           |  FROM (${Features.chi2OracleSql}) ta),
           |b AS (SELECT label AS qid, rn, term AS doc_id
           |  FROM (${Features.miOracleSql}) tb),
           |sv(m, nano) AS (VALUES $svRows),
           |j AS (SELECT a.qid, greatest(a.rn, b.rn) AS m
           |  FROM a JOIN b ON a.qid = b.qid AND a.doc_id = b.doc_id),
           |per AS (SELECT qid, count(*) AS n_overlap,
           |    sum(sv.nano) AS rbo_nano
           |  FROM j JOIN sv USING (m) GROUP BY qid),
           |qs AS (SELECT DISTINCT qid FROM a)
           |SELECT qs.qid,
           |  CAST(coalesce(per.n_overlap, 0) AS BIGINT) AS n_overlap,
           |  CAST(coalesce(per.rbo_nano, 0) AS BIGINT) AS rbo_nano
           |FROM qs LEFT JOIN per USING (qid) ORDER BY qs.qid""".stripMargin
      }),
  )
}
