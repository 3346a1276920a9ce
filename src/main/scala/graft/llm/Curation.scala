package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.rel.RelQueries.Q
import graft.rel.Tables

/** Corpus-hygiene operators a training-data pipeline runs before (and
  * after) dedup: BENCHMARK DECONTAMINATION — drop training documents
  * that share long n-grams with an evaluation set, so the model is not
  * graded on its own training data — and PII SCRUBBING — count and
  * redact emails / phone numbers with patterns portable across regex
  * engines (validated against DuckDB's RE2 in the oracle).
  *
  * Scale shape (100 TB): the eval set is small BY DEFINITION (that is
  * what makes decontamination tractable), so its distinct k-gram hashes
  * broadcast and the training corpus is ONE narrow pass + one hash agg
  * keyed by doc — no shuffle carries text. PII scrubbing is a pure
  * narrow map over the scan.
  */
object Curation {

  /** distinct 64-bit FNV hashes of the k-token grams of `toks` — the
    * k-generalized [[SketchOps.shingles64Of]] (same hash, same
    * separator), so a gram's hash is a pure function of its text
    */
  private[graft] def gramHashes(toks: Array[String], k: Int): Array[Long] = {
    if (toks.length < k) return Array.empty
    val out = new Array[Long](toks.length - k + 1)
    var i = 0
    while (i <= toks.length - k) {
      var h = 0xcbf29ce484222325L
      var g = 0
      while (g < k) {
        val t = toks(i + g)
        var c = 0
        while (c < t.length) { h = (h ^ t.charAt(c)) * 0x100000001b3L; c += 1 }
        if (g < k - 1) h = (h ^ ' ') * 0x100000001b3L
        g += 1
      }
      out(i) = h
      i += 1
    }
    out.distinct
  }

  /** Training docs sharing at least one distinct k-gram with the eval
    * set: (id, n_shared_grams). The eval grams broadcast; the training
    * side never shuffles text.
    */
  def contamination(s: SparkSession, train: DataFrame, eval: DataFrame,
      k: Int = 8, id: String = "doc_id", text: String = "text"): DataFrame = {
    import s.implicits._
    def grams(df: DataFrame, keep: Boolean) =
      df.select(col(id), col(text)).as[(Long, String)]
        .flatMap { case (i, t) =>
          gramHashes(SketchOps.tokensOf(t), k).iterator.map(h => (i, h))
        }
        .toDF(if (keep) id else "eid", "gh")
    val evalGrams = grams(eval, keep = false).select("gh").distinct()
    grams(train, keep = true)
      .join(broadcast(evalGrams), "gh")
      .groupBy(id)
      .agg(countDistinct(col("gh")).as("n_shared_grams"))
  }

  // regex dialect note: these run under BOTH Java regex (Spark) and RE2
  // (DuckDB), so they use only the common subset — no backrefs, no
  // lookaround
  private[graft] val emailRe = "[a-z0-9._]+@[a-z0-9]+\\.[a-z]+"
  private[graft] val phoneRe = "\\+1-[0-9]{3}-[0-9]{3}-[0-9]{4}"

  /** per-doc PII counts and the scrubbed text: emails → [EMAIL],
    * phones → [PHONE]
    */
  def piiScrub(s: SparkSession, docs: DataFrame,
      id: String = "doc_id", text: String = "text"): DataFrame =
    docs.select(col(id),
      regexp_count(col(text), lit(emailRe)).as("n_emails"),
      regexp_count(col(text), lit(phoneRe)).as("n_phones"),
      regexp_replace(regexp_replace(col(text), emailRe, "[EMAIL]"),
        phoneRe, "[PHONE]").as("scrubbed"))

  // ---- fixtures for the driver entries ------------------------------
  // the corpus carries no PII and no eval set; both are synthesized
  // DETERMINISTICALLY from the documents table (the q40/q58 fixture
  // pattern), so the DuckDB oracle can rebuild the exact same inputs

  /** eval set: docs 0-19 with their first token dropped — each shares
    * almost all its k-grams with its source doc (and that doc's
    * near-dups), so the entry is non-vacuous by construction
    */
  private def evalSet(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).filter(col("doc_id") < 20)
      .select((col("doc_id") + 900000L).as("doc_id"),
        regexp_replace(col("text"), "^\\S+\\s+", "").as("text"))

  /** PII-injected corpus: every 7th doc gains an email, every 11th a
    * phone number, both derived from doc_id
    */
  private def piiDocs(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(col("doc_id"),
      concat(col("text"),
        when(col("doc_id") % 7 === 0,
          concat(lit(" contact user"), col("doc_id"), lit("@mail.com"))).otherwise(lit("")),
        when(col("doc_id") % 11 === 0,
          concat(lit(" call +1-555-"),
            lpad((col("doc_id") % 1000).cast("string"), 3, "0"),
            lit("-0199"))).otherwise(lit(""))).as("text"))

  val all: ListMap[String, Q] = ListMap(
    // ---- decontamination: which training docs share an 8-gram with
    //      the eval slice. The oracle recomputes the overlap with
    //      STRING grams (Spark compares 64-bit FNV hashes — a collision
    //      would flip this red, same contract as q34/q49/q60). ----
    "q73_decontaminate" -> Q(
      (s, d) => contamination(s, Tables.documents(s, d), evalSet(s, d))
        .orderBy("doc_id"),
      Some("""WITH ev AS (SELECT regexp_replace(text, '^\S+\s+', '') AS text
             |  FROM documents WHERE doc_id < 20),
             |eg AS (SELECT DISTINCT g FROM (
             |  SELECT unnest(list_transform(range(1, len(t)-6),
             |    i -> array_to_string(t[i:i+7], ' '))) AS g
             |  FROM (SELECT regexp_split_to_array(trim(lower(text)), '\s+') AS t
             |        FROM ev) x) y),
             |tg AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(t)-6),
             |    i -> array_to_string(t[i:i+7], ' ')))) AS g
             |  FROM (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
             |        FROM documents) x)
             |SELECT tg.doc_id, count(DISTINCT tg.g) AS n_shared_grams
             |FROM tg JOIN eg ON tg.g = eg.g
             |GROUP BY tg.doc_id ORDER BY tg.doc_id""".stripMargin)),

    // ---- PII scrub: counts + scrubbed length over the injected
    //      corpus; both engines run the same RE2-safe patterns ----
    "q74_pii_scrub" -> Q(
      (s, d) => piiScrub(s, piiDocs(s, d))
        .select(col("doc_id"), col("n_emails"), col("n_phones"),
          length(col("scrubbed")).as("scrubbed_len"))
        .orderBy("doc_id"),
      Some("""WITH pii AS (SELECT doc_id, text ||
             |    CASE WHEN doc_id % 7 = 0
             |         THEN ' contact user' || doc_id || '@mail.com' ELSE '' END ||
             |    CASE WHEN doc_id % 11 = 0
             |         THEN ' call +1-555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-0199'
             |         ELSE '' END AS text
             |  FROM documents)
             |SELECT doc_id,
             |  CAST(len(regexp_extract_all(text, '[a-z0-9._]+@[a-z0-9]+\.[a-z]+')) AS INT) AS n_emails,
             |  CAST(len(regexp_extract_all(text, '\+1-[0-9]{3}-[0-9]{3}-[0-9]{4}')) AS INT) AS n_phones,
             |  length(regexp_replace(regexp_replace(text, '[a-z0-9._]+@[a-z0-9]+\.[a-z]+', '[EMAIL]', 'g'),
             |    '\+1-[0-9]{3}-[0-9]{3}-[0-9]{4}', '[PHONE]', 'g')) AS scrubbed_len
             |FROM pii ORDER BY doc_id""".stripMargin)),
  )
}
