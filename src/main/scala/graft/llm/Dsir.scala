package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.rel.RelQueries.Q
import graft.rel.Tables

/** DSIR — Data Selection via Importance Resampling (Xie, Santurkar,
  * Ma & Liang, NeurIPS 2023): pick raw-pool documents whose n-gram
  * distribution looks like a small TARGET corpus, by importance weight
  * under two bag-of-ngrams multinomials.
  *
  *  - Features: word unigrams ∪ bigrams (one gram-occurrence stream
  *    per doc — the paper's hashed n-gram features, with [[dsirWeights]]
  *    the exact un-hashed anchor and [[dsirWeightsHashed]] the fixed-m
  *    bucketed form that actually ships at scale).
  *  - Models: add-one-smoothed multinomials p̂ (target) and q̂ (raw);
  *    the per-doc importance weight is the length-normalized
  *    log-likelihood ratio avg_g [ln p̂(g) − ln q̂(g)] (the avg, not the
  *    paper's raw sum, so the weight is not a document-length proxy —
  *    the same normalization the bigram-LM quality score q108 uses).
  *  - Resampling: Gumbel-top-k (Vieira 2014) — top k of
  *    weight + τ·gᵢ with gᵢ = −ln(−ln uᵢ) standard Gumbel noise.
  *    uᵢ is a DETERMINISTIC hash of the doc id (Knuth multiplicative,
  *    2654435761 mod 2³¹), so a selection is replayable bit-for-bit by
  *    any engine — the property a 100 TB curation run needs for
  *    auditability, and what lets DuckDB replay the whole chain.
  *    τ = 0 degenerates to deterministic top-k by weight.
  *
  * Scale shapes (100 TB):
  *  - The exact models are gram→count tables — Zipf-bounded distinct
  *    grams, NOT corpus-sized; scoring streams each doc's grams through
  *    one hash-join per model (the q108 shape). Totals (V, N_t, N_r)
  *    ride a 1-row broadcast.
  *  - The hashed path caps the model at m buckets regardless of corpus
  *    size, so both models become a broadcastable m-row array — scoring
  *    is then map-side only (no gram-keyed shuffle at all): the form
  *    that wins when the raw pool is the 100 TB side.
  *  - Selection is a global top-k on (key, id) — the bounded-heap
  *    aggregator shape; never a full sort of the pool.
  *
  * All count arithmetic is exact integers; the only floats are the
  * final ln/avg rounded to 6 decimals (the q44/q108 contract), so every
  * score replays across engines.
  */
object Dsir {

  private def toks(c: Column): Column =
    filter(split(trim(lower(c)), "\\s+"), t => length(t) > 0)

  /** unigrams ∪ bigrams of a token array, as one array */
  private def grams(t: Column): Column =
    concat(t,
      when(size(t) < 2, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(0), size(t) - 2),
          i => concat(element_at(t, i + 1), lit(" "), element_at(t, i + 2)))))

  /** (id, g) — one row per gram occurrence */
  private def gramStream(docs: DataFrame, id: String, text: String): DataFrame =
    docs.select(col(id), explode(grams(toks(col(text)))).as("g"))

  /** Per raw-pool doc: gram count and the length-normalized importance
    * weight avg_g [ln p̂_target(g) − ln p̂_raw(g)] rounded to 6 decimals.
    * Docs with no grams surface with weight 0.0 (and are skipped by the
    * selection operators). Output: (id, n_grams, avg_lr_r6).
    */
  def dsirWeights(s: SparkSession, target: DataFrame, raw: DataFrame,
      id: String = "doc_id", text: String = "text"): DataFrame =
    weighted(s, target, raw, id, text)
      .select(col(id), col("n_grams"), round(col("avg_lr"), 6).as("avg_lr_r6"))

  /** Train the frozen model triple: (gram→ct target counts, gram→cr raw
    * counts, 1-row totals (v, nt, nr) with v = |union vocab|). Persist
    * these once, score forever — the 100 TB shape is train-on-snapshot,
    * then score every ingested batch against the frozen tables
    * ([[dsirScoreWithModels]]). */
  def trainModels(s: SparkSession, target: DataFrame, raw: DataFrame,
      id: String = "doc_id", text: String = "text"): (DataFrame, DataFrame, DataFrame) = {
    val tm = gramStream(target, id, text).groupBy("g").agg(count(lit(1)).as("ct"))
    val rm = gramStream(raw, id, text).groupBy("g").agg(count(lit(1)).as("cr"))
    (tm, rm, totalsOf(tm, rm))
  }

  /** The 1-row (v, nt, nr) totals of a model pair. The smoothing
    * dimension v is the UNION vocabulary (= raw's when target ⊆ raw) —
    * derived, never stored, so folded models stay consistent. */
  def totalsOf(tm: DataFrame, rm: DataFrame): DataFrame =
    rm.select(col("g"), col("cr"))
      .join(tm.select(col("g"), col("ct")), Seq("g"), "full_outer")
      .agg(count(lit(1)).as("v"),
        sum(coalesce(col("ct"), lit(0L))).as("nt"),
        sum(coalesce(col("cr"), lit(0L))).as("nr"))

  /** Fold a batch's gram counts into a model — the n-gram multinomial's
    * sufficient statistics are ADDITIVE, so incremental maintenance is
    * one count-keyed outer sum; fold(train(A), train(B)) ≡ train(A∪B)
    * exactly, no approximation. `cnt` names the count column ("ct" for
    * target models, "cr" for raw). */
  def foldCounts(a: DataFrame, b: DataFrame, cnt: String): DataFrame =
    a.select(col("g"), col(cnt))
      .unionByName(b.select(col("g"), col(cnt)))
      .groupBy("g").agg(sum(col(cnt)).as(cnt))

  /** Score `docs` against frozen models — the shared kernel of the batch
    * and streaming paths. Grams unseen by a model take its smoothed
    * floor (c = 0); gram-less docs surface at the 0-weight floor.
    * Output: (id, n_grams, avg_lr_r6). */
  def dsirScoreWithModels(s: SparkSession, docs: DataFrame,
      tm: DataFrame, rm: DataFrame, totals: DataFrame,
      id: String = "doc_id", text: String = "text"): DataFrame =
    scoreWith(docs, tm, rm, totals, id, text)
      .select(col(id), col("n_grams"), round(col("avg_lr"), 6).as("avg_lr_r6"))

  private def scoreWith(docs: DataFrame, tm: DataFrame, rm: DataFrame,
      totals: DataFrame, id: String, text: String): DataFrame =
    // ONE gram-keyed model table (g, ct, cr) — the same full-outer
    // join totalsOf pays — so the occurrence stream is joined ONCE
    // instead of once per model (r15 opt pass; arithmetic unchanged:
    // both joins were left on the same unique gram key)
    scoreWithModel(docs,
      rm.select(col("g"), col("cr"))
        .join(tm.select(col("g"), col("ct")), Seq("g"), "full_outer"),
      totals, id, text)

  private def scoreWithModel(docs: DataFrame, model: DataFrame,
      totals: DataFrame, id: String, text: String): DataFrame = {
    val scored = gramStream(docs, id, text)
      .join(model, Seq("g"), "left")
      .crossJoin(broadcast(totals))
      .withColumn("lr",
        log((coalesce(col("ct"), lit(0L)) + 1).cast("double") / (col("nt") + col("v")))
          - log((coalesce(col("cr"), lit(0L)) + 1).cast("double") / (col("nr") + col("v"))))
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_grams"), avg(col("lr")).as("avg_lr"))
    docs.select(col(id)).distinct()
      .join(scored, Seq(id), "left")
      .select(col(id), coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("avg_lr"), lit(0.0)).as("avg_lr"))
  }

  /** (id, n_grams, avg_lr) with avg_lr unrounded — the selection
    * operators add noise BEFORE the single terminal rounding. */
  private def weighted(s: SparkSession, target: DataFrame, raw: DataFrame,
      id: String, text: String): DataFrame = {
    val tm = gramStream(target, id, text).groupBy("g").agg(count(lit(1)).as("ct"))
    val rm = gramStream(raw, id, text).groupBy("g").agg(count(lit(1)).as("cr"))
    // The joined model is MATERIALIZED once (eager localCheckpoint —
    // Zipf-bounded gram vocabulary, NOT corpus-sized, so this is the
    // one intermediate that is always safe to pin): totals and the
    // scoring join then read it instead of re-running both gram
    // streams — the raw corpus was tokenized 3×, now 2× (r15 opt pass).
    val model = rm.select(col("g"), col("cr"))
      .join(tm.select(col("g"), col("ct")), Seq("g"), "full_outer")
      .localCheckpoint(true)
    val totals = model.agg(count(lit(1)).as("v"),
      sum(coalesce(col("ct"), lit(0L))).as("nt"),
      sum(coalesce(col("cr"), lit(0L))).as("nr"))
    scoreWithModel(raw, model, totals, id, text)
  }

  /** Deterministic standard-Gumbel noise for a doc id: u = (Knuth-hash
    * + 1)/(2³¹ + 1) ∈ (0,1) strictly, g = −ln(−ln u). Pure int64
    * arithmetic before the one ln chain — identical in any engine. */
  private def gumbelOf(idCol: Column): Column = {
    val u = (pmod(idCol.cast("long") * lit(2654435761L), lit(2147483648L))
      .cast("double") + 1) / lit(2147483649.0)
    -log(-log(u))
  }

  /** Gumbel-top-k importance resampling: top `k` docs by
    * avg_lr + (τmilli/1000)·Gumbel(id), rounded to 6 decimals, ties by
    * id. τmilli = 0 is deterministic top-k by weight. Gram-less docs
    * never qualify. Output: (rank, id, key_r6), rank 1..k.
    */
  def dsirGumbelTopK(s: SparkSession, target: DataFrame, raw: DataFrame,
      k: Int, tauMilli: Int = 500,
      id: String = "doc_id", text: String = "text"): DataFrame = {
    val w = weighted(s, target, raw, id, text).filter(col("n_grams") > 0)
      .withColumn("key_r6",
        round(col("avg_lr") + lit(tauMilli / 1000.0) * gumbelOf(col(id)), 6))
    graft.functions.TopK.perKeyTopK(
        w.withColumn("one", lit(1)), k, "one", id, "key_r6")
      .select(col("rn").cast("long").as("rank"), col(id), col("key_r6"))
      .orderBy("rank")
  }

  /** The hashed-feature form the paper ships: grams land in
    * m = `buckets` xxhash64 buckets, both multinomials live on those
    * buckets (smoothing dimension = m, fixed — the model no longer
    * grows with the corpus and broadcasts at any scale). Same weight
    * and selection semantics as the exact path. Output:
    * (id, n_grams, avg_lr_r6).
    */
  def dsirWeightsHashed(s: SparkSession, target: DataFrame, raw: DataFrame,
      buckets: Int, id: String = "doc_id", text: String = "text"): DataFrame =
    weightedHashed(s, target, raw, buckets, id, text)
      .select(col(id), col("n_grams"), round(col("avg_lr"), 6).as("avg_lr_r6"))

  private def weightedHashed(s: SparkSession, target: DataFrame, raw: DataFrame,
      buckets: Int, id: String, text: String): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    def bs(docs: DataFrame) = gramStream(docs, id, text)
      .withColumn("b", pmod(xxhash64(col("g")), lit(buckets.toLong)))
    val tm = bs(target).groupBy("b").agg(count(lit(1)).as("ct"))
    val rm = bs(raw).groupBy("b").agg(count(lit(1)).as("cr"))
    val totals = tm.agg(sum(col("ct")).as("nt"))
      .crossJoin(rm.agg(sum(col("cr")).as("nr")))
    val scored = bs(raw)
      .join(broadcast(rm), Seq("b"), "left")
      .join(broadcast(tm), Seq("b"), "left")
      .crossJoin(broadcast(totals))
      .withColumn("lr",
        log((coalesce(col("ct"), lit(0L)) + 1).cast("double")
            / (col("nt") + lit(buckets.toLong)))
          - log((coalesce(col("cr"), lit(0L)) + 1).cast("double")
            / (col("nr") + lit(buckets.toLong))))
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_grams"), avg(col("lr")).as("avg_lr"))
    raw.select(col(id)).distinct()
      .join(scored, Seq(id), "left")
      .select(col(id), coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("avg_lr"), lit(0.0)).as("avg_lr"))
  }

  /** Deterministic (τ=0) top-k under the hashed model — the scale-path
    * twin of [[dsirGumbelTopK]](τ=0). Output: (rank, id, key_r6). */
  def dsirTopKHashed(s: SparkSession, target: DataFrame, raw: DataFrame,
      k: Int, buckets: Int,
      id: String = "doc_id", text: String = "text"): DataFrame = {
    val w = weightedHashed(s, target, raw, buckets, id, text)
      .filter(col("n_grams") > 0)
      .withColumn("key_r6", round(col("avg_lr"), 6))
    graft.functions.TopK.perKeyTopK(
        w.withColumn("one", lit(1)), k, "one", id, "key_r6")
      .select(col("rn").cast("long").as("rank"), col(id), col("key_r6"))
      .orderBy("rank")
  }

  /** How much of the exact top-k the hashed path recovers: one row
    * (k, n_overlap, agree_milli). The q271-style agreement audit for
    * the m-bucket approximation. */
  def hashedAgreement(s: SparkSession, target: DataFrame, raw: DataFrame,
      k: Int, buckets: Int,
      id: String = "doc_id", text: String = "text"): DataFrame = {
    val exact = dsirGumbelTopK(s, target, raw, k, 0, id, text)
      .select(col(id))
    val hashed = dsirTopKHashed(s, target, raw, k, buckets, id, text)
      .select(col(id))
    exact.join(hashed, Seq(id), "inner")
      .agg(count(lit(1)).as("n_overlap"))
      .select(lit(k.toLong).as("k"), col("n_overlap"),
        round(col("n_overlap") * lit(1000.0) / k, 0).cast("long").as("agree_milli"))
  }

  // ------------------------------------------------------------------
  //  driver entries
  // ------------------------------------------------------------------

  private def docs(s: SparkSession, d: String): DataFrame = Tables.documents(s, d)

  /** shared SQL prelude: gram stream + exact models over documents,
    * target = lang='en' */
  private def weightSqlCtes: String =
    """t AS (SELECT doc_id, lang,
      |    list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
      |      x -> len(x) > 0) AS w
      |  FROM documents),
      |gr AS (SELECT doc_id, lang, unnest(w ||
      |    CASE WHEN len(w) < 2 THEN []::VARCHAR[] ELSE
      |      list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1]) END) AS g
      |  FROM t),
      |tm AS (SELECT g, count(*) AS ct FROM gr WHERE lang = 'en' GROUP BY g),
      |rm AS (SELECT g, count(*) AS cr FROM gr GROUP BY g),
      |tot AS (SELECT count(*) AS v, sum(coalesce(tm.ct, 0)) AS nt,
      |    sum(cr) AS nr
      |  FROM rm LEFT JOIN tm USING (g)),
      |sc AS (SELECT gr.doc_id,
      |    ln(CAST(coalesce(tm.ct, 0) + 1 AS DOUBLE) / (tot.nt + tot.v))
      |      - ln(CAST(rm.cr + 1 AS DOUBLE) / (tot.nr + tot.v)) AS lr
      |  FROM gr JOIN rm USING (g) LEFT JOIN tm USING (g) CROSS JOIN tot),
      |agg AS (SELECT doc_id, count(*) AS n_grams, avg(lr) AS avg_lr
      |  FROM sc GROUP BY doc_id)""".stripMargin

  val all: ListMap[String, Q] = ListMap(
    // ---- q281: DSIR importance weights — exact n-gram models, target
    //      = the English slice, raw = the whole corpus; full SQL
    //      replay of both multinomials and the per-doc avg log-ratio. ----
    "q281_dsir_weights" -> Q(
      (s, d) => dsirWeights(s,
          docs(s, d).filter(col("lang") === "en"), docs(s, d))
        .orderBy("doc_id"),
      Some(s"""WITH $weightSqlCtes
             |SELECT t.doc_id,
             |  CAST(coalesce(agg.n_grams, 0) AS BIGINT) AS n_grams,
             |  coalesce(round(agg.avg_lr, 6), 0.0) AS avg_lr_r6
             |FROM t LEFT JOIN agg USING (doc_id) ORDER BY t.doc_id""".stripMargin)),

    // ---- q282: Gumbel-top-k importance RESAMPLING — τ=0.5 noise from
    //      the deterministic Knuth-hash uniform, k=25; the oracle
    //      replays weights, noise, and the (key desc, id) total order. ----
    "q282_dsir_gumbel" -> Q(
      (s, d) => dsirGumbelTopK(s,
          docs(s, d).filter(col("lang") === "en"), docs(s, d),
          k = 25, tauMilli = 500),
      Some(s"""WITH $weightSqlCtes,
             |key AS (SELECT doc_id,
             |    round(avg_lr + (CAST(500 AS DOUBLE) / 1000) * (
             |      -ln(-ln((CAST((doc_id * 2654435761) % 2147483648 AS DOUBLE) + 1)
             |        / 2147483649.0))), 6) AS key_r6
             |  FROM agg WHERE n_grams > 0)
             |SELECT CAST(row_number() OVER (ORDER BY key_r6 DESC, doc_id) AS BIGINT) AS rank,
             |  doc_id, key_r6
             |FROM key ORDER BY key_r6 DESC, doc_id LIMIT 25""".stripMargin)),

    // ---- q283: the hashed 16384-bucket scale path vs the exact anchor —
    //      q271-style agreement audit, VALUES-pinned at sf0.01: the
    //      m-bucket model recovers 24 of the exact top-25 (0.96). ----
    "q283_dsir_hashed_agree" -> Q(
      (s, d) => hashedAgreement(s,
          docs(s, d).filter(col("lang") === "en"), docs(s, d),
          k = 25, buckets = 16384),
      Some("SELECT * FROM (VALUES (CAST(25 AS BIGINT), CAST(24 AS BIGINT), CAST(960 AS BIGINT))) t(k, n_overlap, agree_milli)")),

    // ---- q284: STREAMING score-at-ingest — models trained once on the
    //      snapshot, persisted, then the corpus arrives as a file stream
    //      (3 micro-batches, last one REPLAYED: at-least-once delivery);
    //      each batch scores against the frozen tables and folds into
    //      id-keyed state (dedup makes replays idempotent). The fold
    //      must be indistinguishable from one-shot batch scoring — the
    //      oracle is q281's SQL verbatim. ----
    "q284_dsir_stream_score" -> Q(
      (s, d) => {
        val all = docs(s, d)
        val (tm0, rm0, tot0) = trainModels(s,
          all.filter(col("lang") === "en"), all)
        val work = java.nio.file.Files.createTempDirectory("graft-q284")
          .toString
        tm0.write.parquet(s"$work/tm"); rm0.write.parquet(s"$work/rm")
        tot0.write.parquet(s"$work/tot")
        val tm = s.read.parquet(s"$work/tm")
        val rm = s.read.parquet(s"$work/rm")
        val tot = s.read.parquet(s"$work/tot")
        val in = s"$work/in"
        all.filter(col("doc_id") < 150).select("doc_id", "text")
          .coalesce(1).write.mode("append").parquet(in)
        all.filter(col("doc_id") >= 150 && col("doc_id") < 300)
          .select("doc_id", "text")
          .coalesce(1).write.mode("append").parquet(in)
        val b3 = all.filter(col("doc_id") >= 300).select("doc_id", "text")
        b3.coalesce(1).write.mode("append").parquet(in)
        b3.coalesce(1).write.mode("append").parquet(in) // replayed delivery
        val sch = s.read.parquet(in).schema
        val src = s.readStream.schema(sch)
          .option("maxFilesPerTrigger", 1).parquet(in)
        val stateA = s"$work/state_a"; val stateB = s"$work/state_b"
        def statePath(gen: Long) = if (gen % 2 == 0) stateA else stateB
        // gen-0 state: empty, right schema
        dsirScoreWithModels(s, all.limit(0), tm, rm, tot)
          .write.parquet(stateA)
        var gen = 1L
        val q = src.writeStream
          .option("checkpointLocation", s"$work/ckpt")
          .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
            val scored = dsirScoreWithModels(s, batch.toDF(), tm, rm, tot)
            s.read.parquet(statePath(gen - 1)).unionByName(scored)
              .dropDuplicates("doc_id")
              .write.mode("overwrite").parquet(statePath(gen))
            gen += 1
          }
          .start()
        try q.processAllAvailable() finally q.stop()
        require(gen >= 5, s"expected >= 4 micro-batches, got ${gen - 1}")
        s.read.parquet(statePath(gen - 1)).orderBy("doc_id")
      },
      Some(s"""WITH $weightSqlCtes
             |SELECT t.doc_id,
             |  CAST(coalesce(agg.n_grams, 0) AS BIGINT) AS n_grams,
             |  coalesce(round(agg.avg_lr, 6), 0.0) AS avg_lr_r6
             |FROM t LEFT JOIN agg USING (doc_id) ORDER BY t.doc_id""".stripMargin)),

    // ---- q287: INCREMENTAL model maintenance — the multinomials'
    //      sufficient statistics are additive, so folding a batch's
    //      counts into a snapshot's models must be INDISTINGUISHABLE
    //      from full retraining: snapshot = doc_id < 250, batch = the
    //      rest, scores from the folded models over the whole corpus
    //      against q281's full-retrain SQL verbatim. ----
    "q287_dsir_model_fold" -> Q(
      (s, d) => {
        val all = docs(s, d)
        val snap = all.filter(col("doc_id") < 250)
        val batch = all.filter(col("doc_id") >= 250)
        val (tm0, rm0, _) = trainModels(s,
          snap.filter(col("lang") === "en"), snap)
        val (tmB, rmB, _) = trainModels(s,
          batch.filter(col("lang") === "en"), batch)
        val tm = foldCounts(tm0, tmB, "ct")
        val rm = foldCounts(rm0, rmB, "cr")
        dsirScoreWithModels(s, all, tm, rm, totalsOf(tm, rm))
          .orderBy("doc_id")
      },
      Some(s"""WITH $weightSqlCtes
             |SELECT t.doc_id,
             |  CAST(coalesce(agg.n_grams, 0) AS BIGINT) AS n_grams,
             |  coalesce(round(agg.avg_lr, 6), 0.0) AS avg_lr_r6
             |FROM t LEFT JOIN agg USING (doc_id) ORDER BY t.doc_id""".stripMargin)))
}
