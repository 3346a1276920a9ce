package graft.llm

import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.rel.RelQueries.Q
import graft.rel.Tables

/** POSITIONAL PHRASE SEARCH — exact-adjacency phrase matching over the
  * document corpus: "the tokens appear in THIS order, consecutively",
  * the query class a bag-of-words index (q103 lexical index, q102
  * BM25) cannot answer. Counted per document with a position-indexed
  * scan expressed as a codegen'd array lambda — occurrences of
  * [w₁, w₂] = |{ i : t_i = w₁ ∧ t_{i+1} = w₂ }| — so the whole
  * operator is one narrow map over the corpus: no positional posting
  * list is materialized, no join, no shuffle except the final order.
  *
  * Scale shape (100 TB): embarrassingly parallel per document; a
  * serving deployment would pair this with the q103 inverted index as
  * a candidate filter (docs containing both words) and run this exact
  * check only on candidates — both halves exist in the engine.
  */
object Phrase {

  /** Exact-adjacency occurrence count of `phrase` (≥ 2 tokens, already
    * lower-cased) per document: one narrow map — a codegen'd array
    * lambda over the position range, no posting list, no shuffle.
    * Output: (idCol, n_hits) for docs with ≥ 1 hit.
    */
  def phraseCounts(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, phrase: Seq[String]): org.apache.spark.sql.DataFrame = {
    require(phrase.length >= 2, s"phrase needs >= 2 tokens: $phrase")
    val toks = filter(split(trim(lower(col(textCol))), "\\s+"),
      t => length(t) > 0)
    val span = phrase.length
    docs.select(col(idCol), toks.as("toks"))
      .select(col(idCol),
        when(size(col("toks")) >= span,
          size(filter(sequence(lit(1), size(col("toks")) - (span - 1)),
            i => phrase.zipWithIndex.map { case (p, k) =>
              element_at(col("toks"), i + k) === p
            }.reduce(_ && _))))
          .otherwise(0).cast("long").as("n_hits"))
      .filter(col("n_hits") > 0)
  }

  val all: ListMap[String, Q] = ListMap(
    // ---- q171: count exact occurrences of the phrase "fast table" per
    //      document (q103's whitespace token discipline); docs with ≥ 1
    //      hit, ordered by (hits DESC, doc_id). The index arithmetic is
    //      1-based in both engines and the i+1 lookup is guarded by
    //      ranging only to len−1. ----
    "q171_phrase_search" -> Q(
      (s, d) => phraseCounts(Tables.documents(s, d), "doc_id", "text",
          Seq("fast", "table"))
        .orderBy(col("n_hits").desc, col("doc_id")),
      Some("""WITH t AS (SELECT doc_id,
             |    list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
             |      x -> len(x) > 0) AS toks
             |  FROM documents)
             |SELECT doc_id,
             |  CAST(len(list_filter(range(1, len(toks)),
             |    i -> toks[i] = 'fast' AND toks[i + 1] = 'table')) AS BIGINT)
             |    AS n_hits
             |FROM t
             |WHERE len(list_filter(range(1, len(toks)),
             |    i -> toks[i] = 'fast' AND toks[i + 1] = 'table')) > 0
             |ORDER BY n_hits DESC, doc_id""".stripMargin)),

    // ---- q191: PER-DOCUMENT KEYWORDS — the top-3 most distinctive
    //      terms per document under the INTEGER tf·N div df salience
    //      score (rank-equivalent to tf·idf without the logarithm, so
    //      the ranking is exact and engine-portable), tie order (score
    //      DESC, term ASC) pinned; docs 1–20 keep the output bounded.
    //      Scale: tf is a (doc, term) agg, df a term agg joined back —
    //      two keyed shuffles and a per-doc window. ----
    "q191_doc_keywords" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val toks = filter(split(trim(lower(col("text"))), "\\s+"),
          t => length(t) > 0)
        val terms = Tables.documents(s, d)
          .select(col("doc_id"), explode(toks).as("term"))
        val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        val dfT = tf.groupBy("term").agg(count(lit(1)).as("df"))
        val n = Tables.documents(s, d).count()
        val w = Window.partitionBy("doc_id")
          .orderBy(col("score").desc, col("term"))
        tf.join(dfT, "term")
          .withColumn("score", expr(s"tf * ${n}L div df"))
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 3 && col("doc_id") <= 20)
          .select(col("doc_id"), col("rk"), col("term"), col("score"))
          .orderBy("doc_id", "rk")
      },
      Some("""WITH t AS (SELECT doc_id, unnest(list_filter(
             |      regexp_split_to_array(trim(lower(text)), '\s+'),
             |      x -> len(x) > 0)) AS term
             |  FROM documents),
             |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
             |  FROM t GROUP BY 1, 2),
             |df AS (SELECT term, CAST(count(*) AS BIGINT) AS df
             |  FROM tf GROUP BY 1),
             |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
             |r AS (SELECT tf.doc_id, tf.term, tf.tf * n.n // df.df AS score,
             |    CAST(row_number() OVER (PARTITION BY tf.doc_id
             |      ORDER BY tf.tf * n.n // df.df DESC, tf.term) AS BIGINT) AS rk
             |  FROM tf JOIN df ON tf.term = df.term, n)
             |SELECT doc_id, rk, term, score
             |FROM r WHERE rk <= 3 AND doc_id <= 20
             |ORDER BY doc_id, rk""".stripMargin)),
  )
}
