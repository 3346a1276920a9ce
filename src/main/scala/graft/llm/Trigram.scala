package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.rel.RelQueries.Q
import graft.rel.Tables

/** TRIGRAM INFIX-SEARCH INDEX (the pg_trgm / Google Code Search
  * design, Cox 2012 "Regular Expression Matching with a Trigram
  * Index"): `LIKE '%pattern%'` over a corpus is a full scan UNLESS a
  * character-trigram posting table turns it into
  *   candidates = ⋂_{g ∈ trigrams(pattern)} postings(g)
  * followed by exact `contains` verification of the (small) candidate
  * set. The index is filter-only, never lossy: every true match
  * contains every pattern trigram, so the intersection can only
  * over-approximate — correctness comes from the verify step, the
  * index just deletes the scan.
  *
  * Scale shape: the posting build is one explode + distinct (gram,
  * id) pass; a query touches ONLY the pattern's trigram postings (a
  * pushed `IN` filter on the gram column — with the postings table
  * persisted sorted/bucketed by gram this is a pruned read, the
  * lexical-index pattern), then one groupBy(id) counting distinct
  * matched grams with HAVING count = |trigrams(pattern)|, then the
  * verify join against just the candidates. The corpus is scanned
  * once at BUILD time, never per query.
  *
  * Trigrams are RAW CHARACTER windows of the lowercased text (no
  * token split — infix search must cross word boundaries), distinct
  * per doc. Patterns shorter than 3 chars have no trigrams and raise
  * loudly rather than degrade to a full scan.
  */
object Trigram {

  /** Character trigrams, lowercased, distinct — empty below 3 chars
    * (the q264 sequence-step guard). Built via expr because the
    * Scala-DSL substring takes only literal positions.
    */
  private def gramsExpr(textCol: String): Column =
    when(length(lower(col(textCol))) >= 3,
      array_distinct(expr(
        s"transform(sequence(1, length(lower($textCol)) - 2), " +
          s"i -> substring(lower($textCol), i, 3))")))
      .otherwise(array().cast("array<string>"))

  /** Posting table (gram, id), distinct — build once, persist sorted
    * by gram for pruned query reads.
    */
  def buildTrigramPostings(docs: DataFrame, id: String = "id",
      text: String = "text"): DataFrame =
    docs.select(col(id), explode(gramsExpr(text)).as("gram"))

  /** All docs whose text contains `pattern` (case-insensitive), via
    * posting intersection + exact verification. Output (id), ordered.
    */
  def likeSearch(s: SparkSession, docs: DataFrame, postings: DataFrame,
      pattern: String, id: String = "id", text: String = "text"): DataFrame = {
    require(pattern.length >= 3,
      s"likeSearch: pattern needs >= 3 chars for trigram pruning: '$pattern'")
    val p = pattern.toLowerCase
    val grams = (0 to p.length - 3).map(i => p.substring(i, i + 3)).distinct
    val cand = postings
      .filter(col("gram").isin(grams: _*)) // pushed to the posting scan
      .groupBy(col(id))
      .agg(countDistinct(col("gram")).as("hit"))
      .filter(col("hit") === grams.size.toLong)
      .select(col(id))
    docs.join(cand, Seq(id), "left_semi")
      .filter(contains(lower(col(text)), lit(p))) // the verify step
      .select(col(id))
      .orderBy(col(id))
  }

  val all: ListMap[String, Q] = ListMap(
    // ---- q336: TRIGRAM-ACCELERATED INFIX SEARCH — '%fast merge%'
    //      over the documents corpus through the posting
    //      intersection; the oracle is the brute LIKE scan, so the
    //      driver hash proves the index path is EXACTLY the scan's
    //      answer (the filter-only-index contract). ----
    "q336_trigram_like" -> Q(
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("doc_id").as("id"), col("text"))
        val postings = buildTrigramPostings(docs)
        likeSearch(s, docs, postings, "fast merge")
          .withColumnRenamed("id", "doc_id")
      },
      Some("""SELECT doc_id FROM documents
             |WHERE lower(text) LIKE '%fast merge%'
             |ORDER BY doc_id""".stripMargin)),
  )
}
