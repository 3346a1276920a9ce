package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.rel.RelQueries.Q
import graft.rel.Tables

/** χ² FEATURE SELECTION over text (Yang & Pedersen ICML'97, "A
  * comparative study on feature selection in text categorization" —
  * where χ² ranked top): per (term, label), the 2×2 presence
  * contingency against document counts,
  *
  *   χ² = N·(ad − bc)² / ((a+b)(c+d)(a+c)(b+d))
  *
  * with a = docs of the label containing the term, b/c/d the
  * complements. Every contingency cell is an exact integer from two
  * hash aggregations; χ² is one fixed IEEE chain over them (rounded
  * to 6); ties break by term.
  *
  * Scale shape: term presence is one explode + distinct (doc-bounded);
  * the candidate vocabulary is bounded BY CONSTRUCTION by the
  * document-frequency floor (df ≥ minDf ⇒ ≤ N/minDf candidates — the
  * standard rare-term cut that is also the scale lever), so the
  * label × candidate completion is a broadcast fan-out and the
  * per-label rank window orders a floored vocabulary, not a corpus.
  */
object Features {

  /** Top-k discriminative terms per label by χ².
    * Output: (label, rn, term, df, a, chi2_r6), rank 1..k per label.
    */
  def chiSquareTerms(s: SparkSession, docs: DataFrame, k: Int, minDf: Long,
      id: String = "doc_id", text: String = "text",
      label: String = "lang"): DataFrame = {
    require(k > 0, s"k=$k")
    require(minDf >= 1, s"minDf=$minDf")
    val toks = filter(split(trim(lower(col(text))), "\\s+"),
      t => length(t) > 0)
    val pres = docs
      .select(col(id), col(label).as("label"), explode(toks).as("term"))
      .distinct()
    val termDf = pres.groupBy("term").agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
    val byLabel = pres.groupBy("term", "label").agg(count(lit(1)).as("a"))
    val labels = docs.groupBy(col(label).as("label"))
      .agg(count(lit(1)).as("nl"))
    val tot = docs.agg(count(lit(1)).as("nn"))
    val full = termDf.crossJoin(broadcast(labels))
      .join(byLabel, Seq("term", "label"), "left")
      .withColumn("a", coalesce(col("a"), lit(0L)))
      .crossJoin(broadcast(tot))
    val aD = col("a").cast("double")
    val bD = (col("df") - col("a")).cast("double")
    val cD = (col("nl") - col("a")).cast("double")
    val dD = (col("nn") - col("df") - col("nl") + col("a")).cast("double")
    val nD = col("nn").cast("double")
    // a term present in EVERY document (or a label with no documents)
    // zeroes a margin: the statistic is undefined and the term carries
    // no signal — score 0 by convention rather than the IEEE infinity
    val denom = ((aD + bD) * (cD + dD)) * ((aD + cD) * (bD + dD))
    val chi2 = when(denom === 0.0, lit(0.0)).otherwise(
      (nD * (((aD * dD) - (bD * cD)) * ((aD * dD) - (bD * cD)))) / denom)
    val scored = full.select(col("label"), col("term"), col("df"), col("a"),
      round(chi2, 6).as("chi2_r6"))
    val w = Window.partitionBy("label")
      .orderBy(col("chi2_r6").desc, col("term"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("label"), col("rn"), col("term"), col("df"), col("a"),
        col("chi2_r6"))
      .orderBy("label", "rn")
  }

  /** MUTUAL-INFORMATION term selection — the other ranking Yang &
    * Pedersen compared against [[chiSquareTerms]]'s χ²: the expected
    * MI of the (term-presence, label) pair in nats,
    *
    *   I = Σ_cells (n_ij/N) · ln(N·n_ij / (n_i·n_j)),
    *
    * empty cells contributing zero by the 0·ln0 convention. Same
    * contingency machinery, same df floor (the vocabulary lever),
    * same deterministic (score desc, term) ranking — shipped beside
    * χ² because the two DISAGREE about rare terms (MI loves them,
    * χ² is margin-normalized), and a feature pipeline should see
    * both.
    *
    * Output: (label, rn, term, df, a, mi_r6), rank 1..k per label.
    */
  def miTerms(s: SparkSession, docs: DataFrame, k: Int, minDf: Long,
      id: String = "doc_id", text: String = "text",
      label: String = "lang"): DataFrame = {
    require(k > 0, s"k=$k")
    require(minDf >= 1, s"minDf=$minDf")
    val toks = filter(split(trim(lower(col(text))), "\\s+"),
      t => length(t) > 0)
    val pres = docs
      .select(col(id), col(label).as("label"), explode(toks).as("term"))
      .distinct()
    val termDf = pres.groupBy("term").agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
    val byLabel = pres.groupBy("term", "label").agg(count(lit(1)).as("a"))
    val labels = docs.groupBy(col(label).as("label"))
      .agg(count(lit(1)).as("nl"))
    val tot = docs.agg(count(lit(1)).as("nn"))
    val full = termDf.crossJoin(broadcast(labels))
      .join(byLabel, Seq("term", "label"), "left")
      .withColumn("a", coalesce(col("a"), lit(0L)))
      .crossJoin(broadcast(tot))
    val nD = col("nn").cast("double")
    def cell(nij: Column, ni: Column, nj: Column) =
      when(nij > 0L,
        (nij.cast("double") / nD) * log(nD * nij.cast("double")
          / (ni.cast("double") * nj.cast("double"))))
        .otherwise(lit(0.0))
    val mi =
      cell(col("a"), col("df"), col("nl")) +
        cell(col("df") - col("a"), col("df"), col("nn") - col("nl")) +
        cell(col("nl") - col("a"), col("nn") - col("df"), col("nl")) +
        cell(col("nn") - col("df") - col("nl") + col("a"),
          col("nn") - col("df"), col("nn") - col("nl"))
    val scored = full.select(col("label"), col("term"), col("df"),
      col("a"), round(mi, 6).as("mi_r6"))
    val w = Window.partitionBy("label")
      .orderBy(col("mi_r6").desc, col("term"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("label"), col("rn"), col("term"), col("df"), col("a"),
        col("mi_r6"))
      .orderBy("label", "rn")
  }

  private[llm] val chi2OracleSql: String =
    """WITH pres AS (SELECT DISTINCT doc_id, lang AS label, term
             |  FROM (SELECT doc_id, lang,
             |      unnest(list_filter(regexp_split_to_array(
             |        trim(lower(text)), '\s+'), x -> len(x) > 0)) AS term
             |    FROM documents)),
             |tdf AS (SELECT term, count(*) AS df FROM pres GROUP BY term
             |  HAVING count(*) >= 10),
             |bl AS (SELECT term, label, count(*) AS a FROM pres
             |  GROUP BY term, label),
             |lb AS (SELECT lang AS label, count(*) AS nl FROM documents
             |  GROUP BY lang),
             |tt AS (SELECT count(*) AS nn FROM documents),
             |fl AS (SELECT t.term, l.label, t.df, l.nl,
             |    coalesce(b.a, 0) AS a, (SELECT nn FROM tt) AS nn
             |  FROM tdf t CROSS JOIN lb l
             |  LEFT JOIN bl b ON b.term = t.term AND b.label = l.label),
             |dn AS (SELECT label, term, df, a, nn,
             |    ((CAST(a AS DOUBLE) + CAST(df - a AS DOUBLE))
             |      * (CAST(nl - a AS DOUBLE)
             |        + CAST(nn - df - nl + a AS DOUBLE)))
             |    * ((CAST(a AS DOUBLE) + CAST(nl - a AS DOUBLE))
             |      * (CAST(df - a AS DOUBLE)
             |        + CAST(nn - df - nl + a AS DOUBLE))) AS denom,
             |    (CAST(a AS DOUBLE) * CAST(nn - df - nl + a AS DOUBLE))
             |      - (CAST(df - a AS DOUBLE) * CAST(nl - a AS DOUBLE)) AS adbc
             |  FROM fl),
             |sc AS (SELECT label, term, df, a,
             |    CASE WHEN denom = 0.0 THEN 0.0
             |      ELSE round((CAST(nn AS DOUBLE) * (adbc * adbc))
             |        / denom, 6) END AS chi2_r6
             |  FROM dn),
             |r AS (SELECT label, term, df, a, chi2_r6, row_number() OVER (
             |    PARTITION BY label ORDER BY chi2_r6 DESC, term) AS rn
             |  FROM sc)
             |SELECT label, CAST(rn AS INT) AS rn, term,
             |  CAST(df AS BIGINT) AS df, CAST(a AS BIGINT) AS a, chi2_r6
             |FROM r WHERE rn <= 5 ORDER BY label, rn""".stripMargin

  private[llm] val miOracleSql: String =
    """WITH pres AS (SELECT DISTINCT doc_id, lang AS label, term
             |  FROM (SELECT doc_id, lang,
             |      unnest(list_filter(regexp_split_to_array(
             |        trim(lower(text)), '\s+'), x -> len(x) > 0)) AS term
             |    FROM documents)),
             |tdf AS (SELECT term, count(*) AS df FROM pres GROUP BY term
             |  HAVING count(*) >= 10),
             |bl AS (SELECT term, label, count(*) AS a FROM pres
             |  GROUP BY term, label),
             |lb AS (SELECT lang AS label, count(*) AS nl FROM documents
             |  GROUP BY lang),
             |tt AS (SELECT count(*) AS nn FROM documents),
             |fl AS (SELECT t.term, l.label, t.df, l.nl,
             |    coalesce(b.a, 0) AS a, (SELECT nn FROM tt) AS nn
             |  FROM tdf t CROSS JOIN lb l
             |  LEFT JOIN bl b ON b.term = t.term AND b.label = l.label),
             |sc AS (SELECT label, term, df, a,
             |    round(
             |      (CASE WHEN a > 0 THEN
             |        (CAST(a AS DOUBLE) / CAST(nn AS DOUBLE))
             |        * ln(CAST(nn AS DOUBLE) * CAST(a AS DOUBLE)
             |          / (CAST(df AS DOUBLE) * CAST(nl AS DOUBLE)))
             |        ELSE 0.0 END)
             |      + (CASE WHEN df - a > 0 THEN
             |        (CAST(df - a AS DOUBLE) / CAST(nn AS DOUBLE))
             |        * ln(CAST(nn AS DOUBLE) * CAST(df - a AS DOUBLE)
             |          / (CAST(df AS DOUBLE) * CAST(nn - nl AS DOUBLE)))
             |        ELSE 0.0 END)
             |      + (CASE WHEN nl - a > 0 THEN
             |        (CAST(nl - a AS DOUBLE) / CAST(nn AS DOUBLE))
             |        * ln(CAST(nn AS DOUBLE) * CAST(nl - a AS DOUBLE)
             |          / (CAST(nn - df AS DOUBLE) * CAST(nl AS DOUBLE)))
             |        ELSE 0.0 END)
             |      + (CASE WHEN nn - df - nl + a > 0 THEN
             |        (CAST(nn - df - nl + a AS DOUBLE) / CAST(nn AS DOUBLE))
             |        * ln(CAST(nn AS DOUBLE)
             |          * CAST(nn - df - nl + a AS DOUBLE)
             |          / (CAST(nn - df AS DOUBLE) * CAST(nn - nl AS DOUBLE)))
             |        ELSE 0.0 END), 6) AS mi_r6
             |  FROM fl),
             |r AS (SELECT label, term, df, a, mi_r6, row_number() OVER (
             |    PARTITION BY label ORDER BY mi_r6 DESC, term) AS rn
             |  FROM sc)
             |SELECT label, CAST(rn AS INT) AS rn, term,
             |  CAST(df AS BIGINT) AS df, CAST(a AS BIGINT) AS a, mi_r6
             |FROM r WHERE rn <= 5 ORDER BY label, rn""".stripMargin

  val all: ListMap[String, Q] = ListMap(
    // ---- q404: MI TERM SELECTION — the q302 question under the
    //      other ranking; the oracle replays all four cell terms with
    //      the 0·ln0 convention. ----
    "q404_mi_features" -> Q(
      (s, d) => miTerms(s, Tables.documents(s, d), k = 5, minDf = 10L),
      Some(miOracleSql)),


    // ---- q302: χ² TERM SELECTION — the 5 most language-discriminative
    //      terms per language over the documents corpus, df floor 10. ----
    "q302_chi2_features" -> Q(
      (s, d) => chiSquareTerms(s, Tables.documents(s, d), k = 5, minDf = 10L),
      Some(chi2OracleSql)))
}
