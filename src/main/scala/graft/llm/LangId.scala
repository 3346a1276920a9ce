package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.rel.RelQueries.Q
import graft.rel.Tables

/** CHARACTER-TRIGRAM LANGUAGE ID — the real language-identification
  * operator the curation stack (llm/Curation.scala) gates on, replacing
  * the q32 stopword heuristic the eval harness convicted (q234b: all-'en'
  * predictions, κ = 0.0). Standard approach (Cavnar & Trenkle 1994,
  * "N-Gram-Based Text Categorization"): per-language character-trigram
  * profiles learned from labeled text; a document is scored against each
  * profile and assigned the argmax.
  *
  * House exactness discipline: profile weights are integer MICRO
  * frequencies ((count · 10⁶) div total — exact integer division, no
  * float anywhere), a document's score is Σ tri_count · weight in long
  * arithmetic, and the argmax tie-breaks on (score desc, lang asc) — a
  * total order, so predictions are deterministic and the DuckDB oracle
  * replays training AND inference bit-for-bit.
  *
  * The training corpus is builder-generated FROM the documents table
  * (the shipped fixture writes English-ish text under every lang label,
  * so it carries no learnable signal): each doc_id deterministically
  * draws 30 words from its language's vocabulary — five languages with
  * genuinely distinct trigram distributions — with one doc per 25 mixing
  * in every third word from the NEXT language (a realistic hard case
  * that stays classifiable). Split is honest: profiles train on the 80%
  * train group, predictions and metrics run on the held-out 20%.
  *
  * Scale shape (100 TB): the corpus is touched once per stage (one
  * trigram explode for training — bounded by 5·|trigram| profile rows —
  * one for inference); the profile is a few hundred rows, broadcast to
  * the score join; the argmax window partitions by doc_id (never
  * global). Everything is codegen'd builtins — no UDFs.
  */
object LangId {

  val langs: Seq[String] = Seq("en", "de", "fr", "es", "it")

  val vocab: ListMap[String, Seq[String]] = ListMap(
    "en" -> Seq("the", "and", "with", "that", "have", "this", "from",
      "they", "would", "there"),
    "de" -> Seq("der", "und", "nicht", "schon", "koennen", "zeit",
      "strasse", "maedchen", "wurde", "durch"),
    "fr" -> Seq("les", "avec", "pour", "dans", "cette", "francais",
      "deja", "beaucoup", "toujours", "etre"),
    "es" -> Seq("los", "que", "senor", "anos", "tambien", "esta",
      "nino", "ciudad", "trabajo", "mujer"),
    "it" -> Seq("il", "che", "sono", "della", "questo", "perche",
      "molto", "anche", "quando", "essere"))

  /** All character trigrams of `text` (positions 1..len−2), as the
    * codegen'd transform-over-sequence both engines share. Texts
    * shorter than 3 chars yield an EMPTY array — guarded explicitly,
    * because an unguarded `sequence(1, len−2)` auto-selects step −1
    * when the upper bound drops below 1 (len 2 → [1,0]) and would emit
    * bogus substr positions where the DuckDB oracle's
    * `range(1, len−1)` is empty.
    */
  def charTrigrams(text: Column): Column =
    when(length(text) >= 3,
      transform(sequence(lit(1), length(text) - 2), p => text.substr(p, lit(3))))
      .otherwise(array().cast("array<string>"))

  /** The deterministic multilingual fixture: (doc_id, lang_true,
    * is_test, text). lang = langs[doc_id mod 5] (balanced classes),
    * test group = (doc_id div 5) mod 5 = 4 (every class appears in the
    * held-out 20%), text = 30 vocabulary words rotated by doc_id·7+i
    * (gcd(7,10)=1 covers the whole vocabulary), mixed docs
    * (doc_id mod 25 = 24, all in the test group) draw every third word
    * from the next language.
    */
  def syntheticCorpus(s: SparkSession, d: String): DataFrame = {
    val ll = array(langs.map(lit): _*)
    val vv = array(langs.map(l => array(vocab(l).map(lit): _*)): _*)
    Tables.documents(s, d).select(col("doc_id"))
      .withColumn("lidx", (col("doc_id") % 5).cast("int"))
      .withColumn("lang_true", element_at(ll, col("lidx") + 1))
      .withColumn("is_test", expr("(doc_id div 5) % 5 = 4"))
      .withColumn("is_mixed", col("doc_id") % 25 === 24)
      .withColumn("own", element_at(vv, col("lidx") + 1))
      .withColumn("nxt", element_at(vv, ((col("lidx") + 1) % 5) + 1))
      .withColumn("text", concat_ws(" ",
        transform(sequence(lit(0), lit(29)), i =>
          element_at(
            when(col("is_mixed") && i % 3 === 2, col("nxt"))
              .otherwise(col("own")),
            ((col("doc_id") * 7 + i) % 10).cast("int") + 1))))
      .select("doc_id", "lang_true", "is_test", "text")
  }

  /** Train per-language trigram profiles from labeled `(lang, text)`
    * rows: (lang, tri, w) with w = (count · 10⁶) div lang_total —
    * exact integer micro-frequencies.
    */
  def trainProfiles(train: DataFrame): DataFrame = {
    val cnt = train
      .select(col("lang"), explode(charTrigrams(col("text"))).as("tri"))
      .groupBy("lang", "tri").agg(count(lit(1)).as("c"))
    val tot = cnt.groupBy("lang").agg(sum("c").as("tot"))
    cnt.join(tot, "lang")
      .select(col("lang"), col("tri"), expr("(c * 1000000) div tot").as("w"))
  }

  /** Classify `(id, text)` rows against `profiles` (lang, tri, w):
    * (id, lang_pred, score_u). score_u = Σ tri_count·w in exact long
    * arithmetic; argmax tie-breaks (score desc, lang asc). The profile
    * side is broadcast (5·|distinct trigram| rows); the window
    * partitions by document.
    */
  def predict(docsDf: DataFrame, profiles: DataFrame,
      id: String = "doc_id"): DataFrame = {
    val tc = docsDf
      .select(col(id), explode(charTrigrams(col("text"))).as("tri"))
      .groupBy(id, "tri").agg(count(lit(1)).as("c"))
    val sc = tc.join(broadcast(profiles), "tri")
      .groupBy(col(id), col("lang"))
      .agg(sum(col("c") * col("w")).as("score_u"))
    val w = Window.partitionBy(id).orderBy(col("score_u").desc, col("lang"))
    sc.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col(id), col("lang").as("lang_pred"),
        col("score_u").cast("long").as("score_u"))
  }

  /** Train on the fixture's train split, predict its held-out test
    * split: (doc_id, lang_true, lang_pred, score_u).
    */
  def predictions(s: SparkSession, d: String): DataFrame = {
    val corp = syntheticCorpus(s, d)
    val prof = trainProfiles(corp.filter(!col("is_test"))
      .select(col("lang_true").as("lang"), col("text")))
    val test = corp.filter(col("is_test"))
    predict(test.select("doc_id", "text"), prof)
      .join(test.select("doc_id", "lang_true"), "doc_id")
      .select("doc_id", "lang_true", "lang_pred", "score_u")
  }

  /** The full pipeline — fixture, training, inference — as DuckDB CTEs
    * ending in `pred(doc_id, lang_true, lang_pred, score_u)`, rendered
    * from the SAME vocab constants as the Spark side.
    */
  val predictionCte: String = {
    val ll = langs.map("'" + _ + "'").mkString("[", ",", "]")
    val vv = langs.map(l => vocab(l).map("'" + _ + "'")
      .mkString("[", ",", "]")).mkString("[", ",", "]")
    s"""corpus AS (
       |  SELECT doc_id, CAST(doc_id % 5 AS INT) AS lidx,
       |    (doc_id // 5) % 5 = 4 AS is_test, doc_id % 25 = 24 AS is_mixed
       |  FROM documents),
       |gen AS (
       |  SELECT doc_id, list_extract($ll, lidx + 1) AS lang_true, is_test,
       |    array_to_string(list_transform(range(0, 30), i ->
       |      list_extract(
       |        CASE WHEN is_mixed AND i % 3 = 2
       |          THEN list_extract($vv, ((lidx + 1) % 5) + 1)
       |          ELSE list_extract($vv, lidx + 1) END,
       |        CAST((doc_id * 7 + i) % 10 AS INT) + 1)), ' ') AS text
       |  FROM corpus),
       |tri AS (
       |  SELECT doc_id, lang_true, is_test, u.tri
       |  FROM gen, UNNEST(list_transform(range(1, length(text) - 1),
       |    p -> substr(text, CAST(p AS INT), 3))) AS u(tri)),
       |prof_cnt AS (
       |  SELECT lang_true AS lang, tri, count(*) AS c
       |  FROM tri WHERE NOT is_test GROUP BY 1, 2),
       |prof_tot AS (SELECT lang, sum(c) AS tot FROM prof_cnt GROUP BY 1),
       |prof AS (
       |  SELECT p.lang, p.tri, (p.c * 1000000) // t.tot AS w
       |  FROM prof_cnt p JOIN prof_tot t ON p.lang = t.lang),
       |tc AS (
       |  SELECT doc_id, lang_true, tri, count(*) AS c
       |  FROM tri WHERE is_test GROUP BY 1, 2, 3),
       |sc AS (
       |  SELECT tc.doc_id, any_value(tc.lang_true) AS lang_true, prof.lang,
       |    CAST(sum(tc.c * prof.w) AS BIGINT) AS score_u
       |  FROM tc JOIN prof ON tc.tri = prof.tri
       |  GROUP BY tc.doc_id, prof.lang),
       |pred AS (
       |  SELECT doc_id, lang_true, lang AS lang_pred, score_u
       |  FROM (SELECT *, row_number() OVER (
       |      PARTITION BY doc_id ORDER BY score_u DESC, lang) AS rn FROM sc)
       |  WHERE rn = 1)""".stripMargin
  }

  val all: ListMap[String, Q] = ListMap(
    // ---- q264: the trained classifier's held-out predictions — the
    //      oracle replays fixture generation, profile training, and
    //      scoring; every value is exact integer arithmetic. ----
    "q264_langid_trigram" -> Q(
      (s, d) => predictions(s, d).orderBy("doc_id"),
      Some(s"""WITH $predictionCte
             |SELECT doc_id, lang_true, lang_pred, score_u
             |FROM pred ORDER BY doc_id""".stripMargin)))
}
