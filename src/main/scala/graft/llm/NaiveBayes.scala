package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.rel.RelQueries.Q
import graft.rel.Tables

/** MULTINOMIAL NAIVE BAYES text classifier (McCallum & Nigam AAAI'98
  * workshop, "A comparison of event models for naive Bayes text
  * classification") with Laplace (+1) smoothing:
  *
  *   score(d, l) = ln p(l) + Σ_t tf(d,t) · ln((c(l,t)+1)/(N_l+|V|)),
  *
  * the generative baseline every text-classification ladder starts
  * from — and the trainable complement to the q264 trigram LangId
  * (which scores CHARACTER n-grams against per-language profiles;
  * this one learns WORD likelihoods from labeled data).
  *
  * Cross-engine determinism (the q348 recipe): the ONE transcendental
  * per model cell — ln of the smoothed likelihood — quantizes to
  * integer MICRO-units at train time, priors likewise; a document's
  * per-label score is then an exact integer sum Σ tf·llm + prior
  * (order-free, overflow-safe: |llm| < 30e6, Σtf is doc length, so a
  * 10⁹-token document stays under 2⁶²), and the argmax tie-breaks on
  * the label string ascending. Both engines agree on every score
  * bit-for-bit.
  *
  * Scale shape: the vocabulary is bounded BY CONSTRUCTION by the
  * document-frequency floor (df ≥ minDf ⇒ ≤ N/minDf terms — the q302
  * lever), so the completed label × vocab model is a BROADCAST table
  * and scoring is one map-side hash join over the doc-term tf stream
  * followed by a (doc, label)-keyed sum — no shuffle keyed by term,
  * no all-pairs anything. Train is one explode + two hash
  * aggregations; docs with zero in-vocabulary tokens fall back to the
  * prior argmax (they fan out from the doc × label completion, never
  * silently dropped).
  */
object NaiveBayes {

  private def toks(text: String) =
    filter(split(trim(lower(col(text))), "\\s+"), t => length(t) > 0)

  /** The trained model: (label, term, llm_micro) over the df-floored
    * vocabulary COMPLETED across labels (unseen (label, term) cells
    * carry the smoothed ln(1/(N_l+|V|))), plus the label priors as
    * (label, null term, prior_micro) rows — one broadcastable table.
    * Output: (label, term nullable, lp_micro).
    */
  def naiveBayesModel(s: SparkSession, docs: DataFrame, minDf: Long,
      text: String = "text", label: String = "lang",
      id: String = "doc_id"): DataFrame = {
    require(minDf >= 1, s"minDf=$minDf")
    val tok = docs.select(col(label).as("label"),
      explode(toks(text)).as("term"))
    val withId = docs.select(col(id).as("_did"),
      explode(toks(text)).as("term"))
    val vocab = withId.distinct().groupBy("term")
      .agg(count(lit(1)).as("df")).filter(col("df") >= minDf)
      .select("term")
    val cc = tok.join(vocab.hint("broadcast"), Seq("term"))
      .groupBy("label", "term").agg(count(lit(1)).as("c"))
    val nl = cc.groupBy("label").agg(sum("c").as("n_l"))
    val v = vocab.agg(count(lit(1)).as("v"))
    val cells = vocab.crossJoin(broadcast(nl)).crossJoin(broadcast(v))
      .join(cc, Seq("term", "label"), "left")
      .select(col("label"), col("term"),
        round(log((coalesce(col("c"), lit(0L)) + lit(1L)).cast("double")
          / (col("n_l") + col("v")).cast("double")) * lit(1e6), 0)
          .cast("long").as("lp_micro"))
    val nd = docs.groupBy(col(label).as("label")).agg(count(lit(1)).as("ndl"))
    val nn = docs.agg(count(lit(1)).as("nn"))
    val priors = nd.crossJoin(broadcast(nn))
      .select(col("label"), lit(null).cast("string").as("term"),
        round(log(col("ndl").cast("double") / col("nn").cast("double"))
          * lit(1e6), 0).cast("long").as("lp_micro"))
    cells.unionByName(priors)
  }

  /** Self-classification confusion matrix: train on the labeled docs,
    * score every doc against every label, argmax (ties → label asc).
    * Output: (lang, pred, n_docs) ordered by (lang, pred).
    */
  def naiveBayesConfusion(s: SparkSession, docs: DataFrame, minDf: Long,
      id: String = "doc_id", text: String = "text",
      label: String = "lang"): DataFrame = {
    val model = naiveBayesModel(s, docs, minDf, text, label, id)
    val cells = model.filter(col("term").isNotNull)
    val priors = model.filter(col("term").isNull)
      .select(col("label"), col("lp_micro").as("prior_micro"))
    val tf = docs.select(col(id).as("did"), explode(toks(text)).as("term"))
      .groupBy("did", "term").agg(count(lit(1)).as("tf"))
    val contrib = tf.join(cells.hint("broadcast"), Seq("term"))
      .groupBy("did", "label")
      .agg(sum(col("tf") * col("lp_micro")).as("like_micro"))
    val base = docs.select(col(id).as("did"), col(label).as("truth"))
      .crossJoin(priors.hint("broadcast"))
    val scored = base.join(contrib, Seq("did", "label"), "left")
      .select(col("did"), col("truth"), col("label"),
        (col("prior_micro") + coalesce(col("like_micro"), lit(0L)))
          .as("score_micro"))
    val w = Window.partitionBy("did")
      .orderBy(col("score_micro").desc, col("label"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .groupBy(col("truth").as("lang"), col("label").as("pred"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("lang", "pred")
  }

  val all: ListMap[String, Q] = ListMap(
    // ---- q372: NAIVE BAYES language ID — train the multinomial model
    //      on the labeled corpus (df floor 10), self-classify, report
    //      the confusion matrix. The oracle replays the micro-quantized
    //      model cells, every doc's integer score sum, and the argmax
    //      tie-break bit-for-bit. ----
    "q372_naive_bayes" -> Q(
      (s, d) => naiveBayesConfusion(s, Tables.documents(s, d), minDf = 10L),
      Some("""WITH tok AS MATERIALIZED (SELECT doc_id, lang, term
             |  FROM (SELECT doc_id, lang,
             |      unnest(list_filter(regexp_split_to_array(
             |        trim(lower(text)), '\s+'), x -> len(x) > 0)) AS term
             |    FROM documents)),
             |vocab AS MATERIALIZED (SELECT term
             |  FROM (SELECT DISTINCT doc_id, term FROM tok)
             |  GROUP BY term HAVING count(*) >= 10),
             |cc AS (SELECT t.lang AS label, t.term, count(*) AS c
             |  FROM tok t JOIN vocab v ON v.term = t.term
             |  GROUP BY t.lang, t.term),
             |nl AS (SELECT label, sum(c) AS n_l FROM cc GROUP BY label),
             |vs AS (SELECT count(*) AS v FROM vocab),
             |cells AS MATERIALIZED (SELECT nl.label, vo.term,
             |    CAST(round(ln(CAST(coalesce(cc.c, 0) + 1 AS DOUBLE)
             |      / CAST(nl.n_l + vs.v AS DOUBLE)) * 1e6, 0) AS BIGINT)
             |      AS lp_micro
             |  FROM vocab vo CROSS JOIN nl CROSS JOIN vs
             |  LEFT JOIN cc ON cc.term = vo.term AND cc.label = nl.label),
             |pri AS (SELECT lang AS label,
             |    CAST(round(ln(CAST(count(*) AS DOUBLE)
             |      / (SELECT CAST(count(*) AS DOUBLE) FROM documents))
             |      * 1e6, 0) AS BIGINT) AS prior_micro
             |  FROM documents GROUP BY lang),
             |tf AS (SELECT doc_id, term, count(*) AS tf
             |  FROM tok GROUP BY doc_id, term),
             |contrib AS (SELECT tf.doc_id, ce.label,
             |    sum(tf.tf * ce.lp_micro) AS like_micro
             |  FROM tf JOIN cells ce ON ce.term = tf.term
             |  GROUP BY tf.doc_id, ce.label),
             |scored AS (SELECT d.doc_id, d.lang AS truth, p.label,
             |    p.prior_micro + coalesce(c.like_micro, 0) AS score_micro
             |  FROM documents d CROSS JOIN pri p
             |  LEFT JOIN contrib c
             |    ON c.doc_id = d.doc_id AND c.label = p.label),
             |pick AS (SELECT truth, label, row_number() OVER (
             |    PARTITION BY doc_id
             |    ORDER BY score_micro DESC, label) AS rn
             |  FROM scored)
             |SELECT truth AS lang, label AS pred, count(*) AS n_docs
             |FROM pick WHERE rn = 1 GROUP BY truth, label
             |ORDER BY lang, pred""".stripMargin)))
}
