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
    // n_l over ALL labels in the training docs, not just labels with at
    // least one in-vocabulary token: a label whose every term falls
    // below the df floor must still get smoothed ln(1/(0+|V|)) cells —
    // prior-only scoring would otherwise make the degenerate label win
    // the argmax for any sufficiently long document, corpus-wide
    val nl = docs.select(col(label).as("label")).distinct()
      .join(cc.groupBy("label").agg(sum("c").as("nlc")), Seq("label"), "left")
      .select(col("label"), coalesce(col("nlc"), lit(0L)).as("n_l"))
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

  /** Per-document self-classification: train on the labeled docs,
    * score every doc against every label, argmax (ties → label asc).
    * Output: (did, truth, pred).
    */
  /** Classify `docs` against a FROZEN model (the [[naiveBayesModel]]
    * layout): map-side tf join against the broadcast cells, per-doc
    * integer score sums, argmax (ties → label asc).
    * Output: (did, truth, pred).
    */
  /** the per-(doc, label) integer score table shared by the argmax
    * scorer and the margin audit
    */
  private def scoredTable(docs: DataFrame, model: DataFrame,
      id: String, text: String, label: String): DataFrame = {
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
    base.join(contrib, Seq("did", "label"), "left")
      .select(col("did"), col("truth"), col("label"),
        (col("prior_micro") + coalesce(col("like_micro"), lit(0L)))
          .as("score_micro"))
  }

  def naiveBayesScore(docs: DataFrame, model: DataFrame,
      id: String = "doc_id", text: String = "text",
      label: String = "lang"): DataFrame = {
    val scored = scoredTable(docs, model, id, text, label)
    val w = Window.partitionBy("did")
      .orderBy(col("score_micro").desc, col("label"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("did"), col("truth"), col("label").as("pred"))
  }

  /** LABEL-NOISE AUDIT (the confident-learning readout, Northcutt et
    * al. JAIR'21 simplified to the self-confidence margin): the k
    * documents whose own trained model disagrees with their given
    * label by the widest integer score margin — the relabel queue a
    * curation pass works through. margin = score(argmax) −
    * score(given label), exact micro; ties → doc id asc.
    *
    * Output: (did, truth, pred, margin_micro), margin desc.
    */
  def labelNoiseAudit(s: SparkSession, docs: DataFrame, minDf: Long,
      k: Int, id: String = "doc_id", text: String = "text",
      label: String = "lang"): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val model = naiveBayesModel(s, docs, minDf, text, label, id)
    val scored = scoredTable(docs, model, id, text, label)
      .localCheckpoint(true)
    val w = Window.partitionBy("did")
      .orderBy(col("score_micro").desc, col("label"))
    val top = scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("did"), col("truth"), col("label").as("pred"),
        col("score_micro").as("s_top"))
    val own = scored.filter(col("label") === col("truth"))
      .select(col("did"), col("score_micro").as("s_own"))
    top.join(own, Seq("did"))
      .filter(col("pred") =!= col("truth"))
      .select(col("did"), col("truth"), col("pred"),
        (col("s_top") - col("s_own")).as("margin_micro"))
      .orderBy(col("margin_micro").desc, col("did"))
      .limit(k)
  }

  def naiveBayesPredict(s: SparkSession, docs: DataFrame, minDf: Long,
      id: String = "doc_id", text: String = "text",
      label: String = "lang"): DataFrame =
    naiveBayesScore(docs, naiveBayesModel(s, docs, minDf, text, label, id),
      id, text, label)

  /** LEAVE-ONE-BUCKET-OUT SOURCE VALUATION (the tractable rung of
    * Data Shapley, Ghorbani & Zou ICML'19 — marginal-contribution
    * valuation collapsed to disjoint-group leave-out): sources hash
    * into `buckets` groups; for each group the classifier trains
    * WITHOUT it and is evaluated ON it — cross-domain generalization
    * per slice, the "which data earns its storage" readout a corpus
    * curator acts on. A bucket scoring far below the others is data
    * the rest of the corpus cannot explain (or data explaining
    * something nothing else covers).
    *
    * Scale shape: `buckets` fixed retrains (each one explode + two
    * hash aggregations over (b−1)/b of the corpus) + one map-side
    * scoring pass per bucket; bucket assignment is the salt-keyed md5
    * idiom, portable to the oracle.
    *
    * Output per bucket: (bucket, n_train, n_test, n_correct, acc_r6).
    */
  def sourceValuation(s: SparkSession, docs: DataFrame, minDf: Long,
      buckets: Int, salt: String, source: String = "source",
      id: String = "doc_id", text: String = "text",
      label: String = "lang"): DataFrame = {
    require(buckets >= 2 && buckets <= 8, s"2 <= buckets <= 8: $buckets")
    // column API, not an expr() splice: salt and the source column name
    // are caller-supplied — string interpolation would let a quote or
    // backslash break (or rewrite) the generated expression at plan time
    val base = docs.withColumn("bkt",
      conv(substring(md5(concat(lit(s"$salt-"), col(source))), 1, 8),
        16, 10).cast("long") % buckets.toLong)
      .localCheckpoint(true)
    (0 until buckets).map { b =>
      val train = base.filter(col("bkt") =!= b.toLong)
      val test = base.filter(col("bkt") === b.toLong)
      val model = naiveBayesModel(s, train, minDf, text, label, id)
      naiveBayesScore(test, model, id, text, label)
        .agg(count(lit(1)).as("n_test"),
          sum(when(col("pred") === col("truth"), 1L).otherwise(0L))
            .as("n_correct"))
        .crossJoin(broadcast(
          train.agg(count(lit(1)).as("n_train"))))
        .select(lit(b.toLong).as("bucket"), col("n_train"), col("n_test"),
          coalesce(col("n_correct"), lit(0L)).as("n_correct"),
          when(col("n_test") > 0L,
            round(coalesce(col("n_correct"), lit(0L)).cast("double")
              / col("n_test").cast("double"), 6)).as("acc_r6"))
    }.reduce(_ unionAll _).orderBy("bucket")
  }

  /** Self-classification confusion matrix over
    * [[naiveBayesPredict]]'s per-document argmax.
    * Output: (lang, pred, n_docs) ordered by (lang, pred).
    */
  def naiveBayesConfusion(s: SparkSession, docs: DataFrame, minDf: Long,
      id: String = "doc_id", text: String = "text",
      label: String = "lang"): DataFrame =
    naiveBayesPredict(s, docs, minDf, id, text, label)
      .groupBy(col("truth").as("lang"), col("pred"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("lang", "pred")

  /** McNEMAR'S PAIRED TEST between two classifiers on the same
    * documents (McNemar 1947; the Dietterich ML'98 recommendation for
    * comparing classifiers on one test set): pair the word-model
    * naive Bayes with the q264 character-trigram scorer, both
    * self-classifying the labeled corpus, and test whether their
    * DISAGREEMENTS are symmetric — χ² = (b−c)²/(b+c) over the
    * discordant counts (b = only NB right, c = only trigram right).
    * Accuracy alone cannot say whether two models differ; the paired
    * discordants can.
    *
    * Exactness: both classifiers are the house integer scorers; the
    * four paired cells are exact integers from one hash aggregation;
    * χ² is one fixed IEEE chain, null when b + c = 0 (identical
    * disagreement patterns — the statistic is undefined, not zero).
    *
    * Output (1 row): (n_docs, nb_correct, tri_correct, b_nb_only,
    * c_tri_only, mcnemar_chi2_r6).
    */
  def mcnemarNbVsTrigram(s: SparkSession, docs: DataFrame,
      minDf: Long): DataFrame = {
    val nb = naiveBayesPredict(s, docs, minDf)
      .select(col("did"), col("truth"), col("pred").as("nb_pred"))
    val prof = LangId.trainProfiles(
      docs.select(col("lang"), col("text")))
    val tri = LangId.predict(docs.select(col("doc_id"), col("text")), prof)
      .select(col("doc_id").as("did"), col("lang_pred").as("tri_pred"))
    nb.join(tri, Seq("did"))
      .select(
        when(col("nb_pred") === col("truth"), 1L).otherwise(0L).as("nr"),
        when(col("tri_pred") === col("truth"), 1L).otherwise(0L).as("tr"))
      .agg(count(lit(1)).as("n_docs"), sum(col("nr")).as("nb_correct"),
        sum(col("tr")).as("tri_correct"),
        sum(when(col("nr") === 1L && col("tr") === 0L, 1L).otherwise(0L))
          .as("b_nb_only"),
        sum(when(col("nr") === 0L && col("tr") === 1L, 1L).otherwise(0L))
          .as("c_tri_only"))
      .withColumn("mcnemar_chi2_r6",
        when(col("b_nb_only") + col("c_tri_only") > 0L,
          round((col("b_nb_only") - col("c_tri_only")).cast("double")
            * (col("b_nb_only") - col("c_tri_only")).cast("double")
            / (col("b_nb_only") + col("c_tri_only")).cast("double"), 6)))
  }

  /** PER-CLASS PRECISION / RECALL / F1 of the self-classified NB
    * model — the standard classification report: tp/fp/fn per class
    * from exact confusion counts, each ratio one fixed IEEE chain
    * (null when undefined — a class never predicted has no
    * precision). Output per class: (label, n_true, tp, fp, fn,
    * precision_r6, recall_r6, f1_r6), ordered by label.
    */
  def classifierReport(s: SparkSession, docs: DataFrame,
      minDf: Long): DataFrame = {
    val conf = naiveBayesPredict(s, docs, minDf)
      .groupBy(col("truth"), col("pred")).agg(count(lit(1)).as("n"))
      .localCheckpoint(true)
    val classes = conf.select(col("truth").as("label"))
      .unionAll(conf.select(col("pred").as("label"))).distinct()
    val tp = conf.filter(col("truth") === col("pred"))
      .select(col("truth").as("label"), col("n").as("tp"))
    val byTruth = conf.groupBy(col("truth").as("label"))
      .agg(sum("n").as("n_true"))
    val byPred = conf.groupBy(col("pred").as("label"))
      .agg(sum("n").as("n_pred"))
    classes
      .join(byTruth, Seq("label"), "left")
      .join(byPred, Seq("label"), "left")
      .join(tp, Seq("label"), "left")
      .select(col("label"),
        coalesce(col("n_true"), lit(0L)).as("n_true"),
        coalesce(col("tp"), lit(0L)).as("tp"),
        (coalesce(col("n_pred"), lit(0L)) - coalesce(col("tp"), lit(0L)))
          .as("fp"),
        (coalesce(col("n_true"), lit(0L)) - coalesce(col("tp"), lit(0L)))
          .as("fn"))
      .withColumn("precision_r6", when(col("tp") + col("fp") > 0L,
        round(col("tp").cast("double")
          / (col("tp") + col("fp")).cast("double"), 6)))
      .withColumn("recall_r6", when(col("tp") + col("fn") > 0L,
        round(col("tp").cast("double")
          / (col("tp") + col("fn")).cast("double"), 6)))
      .withColumn("f1_r6", when(
        lit(2L) * col("tp") + col("fp") + col("fn") > 0L,
        round(lit(2.0) * col("tp").cast("double")
          / (lit(2L) * col("tp") + col("fp") + col("fn")).cast("double"),
          6)))
      .orderBy("label")
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
             |nl AS (SELECT l.label, coalesce(s.n_l, 0) AS n_l
             |  FROM (SELECT DISTINCT lang AS label FROM documents) l
             |  LEFT JOIN (SELECT label, sum(c) AS n_l FROM cc
             |    GROUP BY label) s ON s.label = l.label),
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
             |ORDER BY lang, pred""".stripMargin)),

    // ---- q396: CLASSIFICATION REPORT — per-language precision /
    //      recall / F1 of the self-classified NB model; the oracle
    //      replays the model, every argmax, and the exact-count
    //      ratio chains (F1 via the 2tp/(2tp+fp+fn) identity). ----
    "q396_classifier_report" -> Q(
      (s, d) => classifierReport(s, Tables.documents(s, d), minDf = 10L),
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
             |nl AS (SELECT l.label, coalesce(s.n_l, 0) AS n_l
             |  FROM (SELECT DISTINCT lang AS label FROM documents) l
             |  LEFT JOIN (SELECT label, sum(c) AS n_l FROM cc
             |    GROUP BY label) s ON s.label = l.label),
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
             |conf AS MATERIALIZED (SELECT truth, pred, count(*) AS n
             |  FROM (SELECT doc_id, truth, label AS pred FROM (
             |      SELECT doc_id, truth, label, row_number() OVER (
             |        PARTITION BY doc_id
             |        ORDER BY score_micro DESC, label) AS rn
             |      FROM scored) WHERE rn = 1)
             |  GROUP BY truth, pred),
             |cls AS (SELECT truth AS label FROM conf
             |  UNION SELECT pred FROM conf),
             |bt AS (SELECT truth AS label, sum(n) AS n_true FROM conf
             |  GROUP BY truth),
             |bp AS (SELECT pred AS label, sum(n) AS n_pred FROM conf
             |  GROUP BY pred),
             |tpc AS (SELECT truth AS label, n AS tp FROM conf
             |  WHERE truth = pred),
             |j AS (SELECT c.label,
             |    coalesce(bt.n_true, 0) AS n_true,
             |    coalesce(tpc.tp, 0) AS tp,
             |    coalesce(bp.n_pred, 0) - coalesce(tpc.tp, 0) AS fp,
             |    coalesce(bt.n_true, 0) - coalesce(tpc.tp, 0) AS fn
             |  FROM cls c
             |  LEFT JOIN bt ON bt.label = c.label
             |  LEFT JOIN bp ON bp.label = c.label
             |  LEFT JOIN tpc ON tpc.label = c.label)
             |SELECT label, CAST(n_true AS BIGINT) AS n_true,
             |  CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
             |  CAST(fn AS BIGINT) AS fn,
             |  CASE WHEN tp + fp > 0 THEN round(CAST(tp AS DOUBLE)
             |    / CAST(tp + fp AS DOUBLE), 6) ELSE NULL END
             |    AS precision_r6,
             |  CASE WHEN tp + fn > 0 THEN round(CAST(tp AS DOUBLE)
             |    / CAST(tp + fn AS DOUBLE), 6) ELSE NULL END AS recall_r6,
             |  CASE WHEN 2 * tp + fp + fn > 0 THEN
             |    round(2.0 * CAST(tp AS DOUBLE)
             |      / CAST(2 * tp + fp + fn AS DOUBLE), 6) ELSE NULL END
             |    AS f1_r6
             |FROM j ORDER BY label""".stripMargin)),

    // ---- q393: LABEL-NOISE AUDIT — the 15 documents the corpus's
    //      own NB model most confidently relabels; the curation
    //      relabel queue. The oracle replays the model, every score,
    //      and the margin top-k. ----
    "q393_label_noise" -> Q(
      (s, d) => labelNoiseAudit(s, Tables.documents(s, d), minDf = 10L,
        k = 15),
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
             |nl AS (SELECT l.label, coalesce(s.n_l, 0) AS n_l
             |  FROM (SELECT DISTINCT lang AS label FROM documents) l
             |  LEFT JOIN (SELECT label, sum(c) AS n_l FROM cc
             |    GROUP BY label) s ON s.label = l.label),
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
             |scored AS MATERIALIZED (SELECT d.doc_id, d.lang AS truth,
             |    p.label,
             |    p.prior_micro + coalesce(c.like_micro, 0) AS score_micro
             |  FROM documents d CROSS JOIN pri p
             |  LEFT JOIN contrib c
             |    ON c.doc_id = d.doc_id AND c.label = p.label),
             |top AS (SELECT doc_id, truth, label AS pred,
             |    score_micro AS s_top
             |  FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
             |      ORDER BY score_micro DESC, label) AS rn FROM scored)
             |  WHERE rn = 1),
             |own AS (SELECT doc_id, score_micro AS s_own FROM scored
             |  WHERE label = truth)
             |SELECT t.doc_id AS did, t.truth, t.pred,
             |  CAST(t.s_top - o.s_own AS BIGINT) AS margin_micro
             |FROM top t JOIN own o ON o.doc_id = t.doc_id
             |WHERE t.pred <> t.truth
             |ORDER BY margin_micro DESC, did LIMIT 15""".stripMargin)),

    // ---- q391: STREAMING classify-at-ingest with the frozen NB
    //      model (the q364/q284 pattern on the text classifier): the
    //      model trains once and persists; documents arrive as a
    //      3-batch stream with the LAST batch REPLAYED
    //      (at-least-once), each micro-batch scoring map-side against
    //      the frozen broadcast model; replays collapse in the
    //      id-keyed dedup. Output must equal one-shot batch
    //      classification — the oracle replays the model and every
    //      doc's argmax. ----
    "q391_nb_stream_classify" -> Q(
      (s, d) => {
        import s.implicits._
        implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
        import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
        val docs = Tables.documents(s, d)
        val work = java.nio.file.Files.createTempDirectory("graft-q391")
        val ckDir = java.nio.file.Files.createTempDirectory("graft-q391-ck")
        sys.addShutdownHook {
          def rm(f: java.io.File): Unit = {
            Option(f.listFiles()).foreach(_.foreach(rm))
            f.delete(); ()
          }
          rm(work.toFile); rm(ckDir.toFile)
        }
        naiveBayesModel(s, docs, minDf = 10L)
          .coalesce(1).write.parquet(s"$work/model")
        val frozen = s.read.parquet(s"$work/model")
        val arriving = docs.select(col("doc_id"), col("text"), col("lang"))
          .as[(Long, String, String)].collect()
        val (b12, b3) = arriving.partition(_._1 % 3 != 2)
        val (b1, b2) = b12.partition(_._1 % 3 == 0)
        val mem = MemoryStream[(Long, String, String)]
        val q = mem.toDF.toDF("doc_id", "text", "lang").writeStream
          .foreachBatch { (batch: DataFrame, _: Long) =>
            naiveBayesScore(batch, frozen)
              .select(col("did").as("doc_id"), col("pred"))
              .write.mode("append").parquet(s"$work/preds")
          }
          .option("checkpointLocation", ckDir.toString)
          .start()
        try {
          mem.addData(b1.toSeq); q.processAllAvailable()
          mem.addData(b2.toSeq); q.processAllAvailable()
          mem.addData(b3.toSeq); q.processAllAvailable()
          mem.addData(b3.toSeq); q.processAllAvailable() // replay
        } finally q.stop()
        s.read.parquet(s"$work/preds")
          .dropDuplicates("doc_id")
          .orderBy("doc_id")
      },
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
             |nl AS (SELECT l.label, coalesce(s.n_l, 0) AS n_l
             |  FROM (SELECT DISTINCT lang AS label FROM documents) l
             |  LEFT JOIN (SELECT label, sum(c) AS n_l FROM cc
             |    GROUP BY label) s ON s.label = l.label),
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
             |scored AS (SELECT d.doc_id, p.label,
             |    p.prior_micro + coalesce(c.like_micro, 0) AS score_micro
             |  FROM documents d CROSS JOIN pri p
             |  LEFT JOIN contrib c
             |    ON c.doc_id = d.doc_id AND c.label = p.label)
             |SELECT doc_id, label AS pred FROM (
             |  SELECT doc_id, label, row_number() OVER (
             |      PARTITION BY doc_id
             |      ORDER BY score_micro DESC, label) AS rn
             |  FROM scored) WHERE rn = 1
             |ORDER BY doc_id""".stripMargin)),

    // ---- q389: SOURCE VALUATION — train the NB classifier without
    //      each md5-hashed source bucket, evaluate on it: the
    //      cross-domain generalization per data slice. The oracle
    //      replays all four leave-out trainings and scorings. ----
    "q389_source_valuation" -> Q(
      (s, d) => sourceValuation(s, Tables.documents(s, d), minDf = 10L,
        buckets = 4, salt = "sv389"),
      Some {
        def bucketCtes(b: Int): String = {
          val p = s"k$b"
          s"""${p}vocab AS MATERIALIZED (SELECT term
             |  FROM (SELECT DISTINCT doc_id, term FROM tokall
             |    WHERE bkt <> $b)
             |  GROUP BY term HAVING count(*) >= 10),
             |${p}cc AS (SELECT t.lang AS label, t.term, count(*) AS c
             |  FROM tokall t JOIN ${p}vocab v ON v.term = t.term
             |  WHERE t.bkt <> $b GROUP BY t.lang, t.term),
             |${p}nl AS (SELECT l.label, coalesce(s.n_l, 0) AS n_l
             |  FROM (SELECT DISTINCT lang AS label FROM dall
             |    WHERE bkt <> $b) l
             |  LEFT JOIN (SELECT label, sum(c) AS n_l FROM ${p}cc
             |    GROUP BY label) s ON s.label = l.label),
             |${p}vs AS (SELECT count(*) AS v FROM ${p}vocab),
             |${p}cells AS MATERIALIZED (SELECT nl.label, vo.term,
             |    CAST(round(ln(CAST(coalesce(cc.c, 0) + 1 AS DOUBLE)
             |      / CAST(nl.n_l + vs.v AS DOUBLE)) * 1e6, 0) AS BIGINT)
             |      AS lp_micro
             |  FROM ${p}vocab vo CROSS JOIN ${p}nl nl CROSS JOIN ${p}vs vs
             |  LEFT JOIN ${p}cc cc
             |    ON cc.term = vo.term AND cc.label = nl.label),
             |${p}pri AS (SELECT lang AS label,
             |    CAST(round(ln(CAST(count(*) AS DOUBLE)
             |      / (SELECT CAST(count(*) AS DOUBLE) FROM dall
             |         WHERE bkt <> $b)) * 1e6, 0) AS BIGINT) AS prior_micro
             |  FROM dall WHERE bkt <> $b GROUP BY lang),
             |${p}tf AS (SELECT doc_id, term, count(*) AS tf
             |  FROM tokall WHERE bkt = $b GROUP BY doc_id, term),
             |${p}contrib AS (SELECT tf.doc_id, ce.label,
             |    sum(tf.tf * ce.lp_micro) AS like_micro
             |  FROM ${p}tf tf JOIN ${p}cells ce ON ce.term = tf.term
             |  GROUP BY tf.doc_id, ce.label),
             |${p}scored AS (SELECT d.doc_id, d.lang AS truth, p.label,
             |    p.prior_micro + coalesce(c.like_micro, 0) AS score_micro
             |  FROM (SELECT * FROM dall WHERE bkt = $b) d
             |  CROSS JOIN ${p}pri p
             |  LEFT JOIN ${p}contrib c
             |    ON c.doc_id = d.doc_id AND c.label = p.label),
             |${p}agg AS (SELECT CAST($b AS BIGINT) AS bucket,
             |    (SELECT count(*) FROM dall WHERE bkt <> $b) AS n_train,
             |    count(*) AS n_test,
             |    coalesce(sum(CASE WHEN pred = truth THEN 1 ELSE 0 END),
             |      0) AS n_correct
             |  FROM (SELECT doc_id, truth, label AS pred FROM (
             |      SELECT doc_id, truth, label, row_number() OVER (
             |        PARTITION BY doc_id
             |        ORDER BY score_micro DESC, label) AS rn
             |      FROM ${p}scored) WHERE rn = 1))""".stripMargin
        }
        s"""WITH dall AS MATERIALIZED (SELECT doc_id, lang, text,
           |    ('0x' || substr(md5('sv389-' || source), 1, 8))::BIGINT
           |      % 4 AS bkt
           |  FROM documents),
           |tokall AS MATERIALIZED (SELECT doc_id, lang, bkt, term
           |  FROM (SELECT doc_id, lang, bkt,
           |      unnest(list_filter(regexp_split_to_array(
           |        trim(lower(text)), '\\s+'), x -> len(x) > 0)) AS term
           |    FROM dall)),
           |${(0 until 4).map(bucketCtes).mkString(",\n")}
           |SELECT bucket, CAST(n_train AS BIGINT) AS n_train,
           |  CAST(n_test AS BIGINT) AS n_test,
           |  CAST(n_correct AS BIGINT) AS n_correct,
           |  CASE WHEN n_test > 0 THEN round(CAST(n_correct AS DOUBLE)
           |    / CAST(n_test AS DOUBLE), 6) ELSE NULL END AS acc_r6
           |FROM (${(0 until 4).map(b => s"SELECT * FROM k${b}agg")
            .mkString("\nUNION ALL ")})
           |ORDER BY bucket""".stripMargin
      }),

    // ---- q387: McNEMAR — do the word NB (q372) and the character-
    //      trigram scorer (the q264 machinery, trained on the real
    //      corpus) disagree symmetrically? The oracle replays BOTH
    //      classifiers end to end and the paired discordant fold. ----
    "q387_mcnemar" -> Q(
      (s, d) => mcnemarNbVsTrigram(s, Tables.documents(s, d), minDf = 10L),
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
             |nl AS (SELECT l.label, coalesce(s.n_l, 0) AS n_l
             |  FROM (SELECT DISTINCT lang AS label FROM documents) l
             |  LEFT JOIN (SELECT label, sum(c) AS n_l FROM cc
             |    GROUP BY label) s ON s.label = l.label),
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
             |npick AS (SELECT doc_id, truth, label AS nb_pred
             |  FROM (SELECT doc_id, truth, label, row_number() OVER (
             |      PARTITION BY doc_id
             |      ORDER BY score_micro DESC, label) AS rn
             |    FROM scored) WHERE rn = 1),
             |rtri AS MATERIALIZED (SELECT doc_id, lang, u.tri
             |  FROM documents, UNNEST(list_transform(
             |    range(1, length(text) - 1),
             |    p -> substr(text, CAST(p AS INT), 3))) AS u(tri)),
             |pcnt AS (SELECT lang, tri, count(*) AS c FROM rtri
             |  GROUP BY 1, 2),
             |ptot AS (SELECT lang, sum(c) AS tot FROM pcnt GROUP BY 1),
             |prof AS (SELECT p.lang, p.tri, (p.c * 1000000) // t.tot AS w
             |  FROM pcnt p JOIN ptot t ON p.lang = t.lang),
             |rtc AS (SELECT doc_id, tri, count(*) AS c FROM rtri
             |  GROUP BY 1, 2),
             |rsc AS (SELECT rtc.doc_id, prof.lang,
             |    CAST(sum(rtc.c * prof.w) AS BIGINT) AS score_u
             |  FROM rtc JOIN prof ON rtc.tri = prof.tri GROUP BY 1, 2),
             |rpred AS (SELECT doc_id, lang AS tri_pred
             |  FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
             |      ORDER BY score_u DESC, lang) AS rn FROM rsc)
             |  WHERE rn = 1),
             |pairs AS (SELECT
             |    CASE WHEN n.nb_pred = n.truth THEN 1 ELSE 0 END AS nr,
             |    CASE WHEN r.tri_pred = n.truth THEN 1 ELSE 0 END AS tr
             |  FROM npick n JOIN rpred r ON r.doc_id = n.doc_id),
             |ag AS (SELECT count(*) AS n_docs, sum(nr) AS nb_correct,
             |    sum(tr) AS tri_correct,
             |    sum(CASE WHEN nr = 1 AND tr = 0 THEN 1 ELSE 0 END)
             |      AS b_nb_only,
             |    sum(CASE WHEN nr = 0 AND tr = 1 THEN 1 ELSE 0 END)
             |      AS c_tri_only
             |  FROM pairs)
             |SELECT CAST(n_docs AS BIGINT) AS n_docs,
             |  CAST(nb_correct AS BIGINT) AS nb_correct,
             |  CAST(tri_correct AS BIGINT) AS tri_correct,
             |  CAST(b_nb_only AS BIGINT) AS b_nb_only,
             |  CAST(c_tri_only AS BIGINT) AS c_tri_only,
             |  CASE WHEN b_nb_only + c_tri_only > 0 THEN
             |    round(CAST(b_nb_only - c_tri_only AS DOUBLE)
             |      * CAST(b_nb_only - c_tri_only AS DOUBLE)
             |      / CAST(b_nb_only + c_tri_only AS DOUBLE), 6)
             |    ELSE NULL END AS mcnemar_chi2_r6
             |FROM ag""".stripMargin)))
}
