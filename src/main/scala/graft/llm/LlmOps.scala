package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.rel.RelQueries.Q
import graft.rel.Tables

/** LLM-training-data pipeline operators over the `documents` and
  * `embeddings` tables: dedup (exact, MinHash+LSH, SimHash, n-gram
  * Jaccard), similarity search (brute-force + LSH-bucketed ANN), text
  * analysis (token stats, quality, language-ID, fingerprints) and
  * multimodal binary plumbing. These have no counterpart in the reference
  * (SURVEY.md §7.6) — they are the extension surface for 100 TB pipelines.
  *
  * Determinism: tokenization is split(trim(lower(text)), "\s+") in both
  * dialects; ratios divide exact ints; cosine/dot are sequential f64
  * folds — verified bit-identical to DuckDB's list_dot_product over
  * DOUBLE[] (d / (sqrt(na)*sqrt(nb)), same expression shape both sides).
  *
  * Scale notes (100 TB): every per-doc op is a narrow map over the scan.
  * The pair-producing ops avoid the O(n²) cross join: n-gram Jaccard
  * joins on shared shingles (shuffle keyed by shingle; frequency-capped),
  * MinHash/LSH joins on band buckets, SimHash on band prefixes, ANN on
  * hyperplane buckets. Those joins shuffle only candidate pairs, never
  * the full cross product.
  */
object LlmOps {

  private def docs(s: SparkSession, d: String): DataFrame = Tables.documents(s, d)
  private def embs(s: SparkSession, d: String): DataFrame = Tables.embeddings(s, d)

  /** multi-line corpus for q97 (the q96 fixture pattern — the corpus
    * has no newlines, so line structure is synthesized deterministically
    * both engines can replay): each doc's normalized tokens chunk into
    * 8-token lines, and shared boilerplate lines inject cross-doc
    * duplicates by construction — a nav header on every 3rd doc, a
    * footer on every 2nd — beyond the corpus's own exact-dup docs
    */
  private def lineDocs(s: SparkSession, d: String): DataFrame = {
    val toks = split(trim(lower(col("text"))), "\\s+")
    val nLines = ceil(size(toks).cast("double") / 8).cast("int")
    val body = transform(sequence(lit(0), nLines - 1),
      i => array_join(slice(toks, i * 8 + 1, lit(8)), " "))
    val hdr = when(col("doc_id") % 3 === 0,
      array(lit("home about contact subscribe"))).otherwise(lit(Array.empty[String]))
    val ftr = when(col("doc_id") % 2 === 0,
      array(lit("copyright 2026 example corp all rights reserved")))
      .otherwise(lit(Array.empty[String]))
    docs(s, d).select(col("doc_id"),
      array_join(concat(hdr, body, ftr), "\n").as("text"))
  }

  /** Shingle document-frequency cap for q34: a shingle appearing in more
    * than this many docs is dropped before the pair self-join (bounding
    * any single join key to ≤ cap² candidate pairs) AND from the per-doc
    * shingle sizes, so the reported Jaccard is exact over the capped
    * shingle universe. The oracle SQL applies the same cap, so outputs
    * hash-match at every SF. 16 is above every fixture frequency at
    * sf0.01 (max df there is 7) and operative at sf0.1 (drops the ~2.5%
    * hottest shingles, df up to 25).
    */
  val shingleDfCap = 16

  /** Shared oracle CTE preamble (shingles → df-cap → pair intersections →
    * per-doc sizes) composed into the q34, q49, and q60 oracles, so
    * their pair semantics cannot silently drift apart. `from` names the
    * doc relation — q60 runs the pair machinery over pipeline SURVIVORS,
    * where the df-cap must count within the filtered corpus.
    */
  private[llm] def pairOracleCtesPublic(from: String = "documents"): String =
    pairOracleCtes(from)

  private def pairOracleCtes(from: String = "documents"): String =
    s"""s AS (SELECT doc_id,
       |    list_distinct(list_transform(range(1, len(t)-1),
       |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS sh
       |  FROM (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t
       |        FROM $from)),
       |e AS (SELECT doc_id, unnest(sh) AS g FROM s),
       |hot AS (SELECT g FROM e GROUP BY g HAVING count(*) > $shingleDfCap),
       |k AS (SELECT doc_id, g FROM e WHERE g NOT IN (SELECT g FROM hot)),
       |i AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS inter
       |      FROM k a JOIN k b ON a.g = b.g AND a.doc_id < b.doc_id
       |      GROUP BY 1, 2),
       |z AS (SELECT doc_id, count(*) AS n FROM k GROUP BY doc_id)""".stripMargin

  /** Winnowing-style document fingerprint: Karp-Rabin rolling hash over
    * UTF-8 bytes (k=16 grams), window minima flushed every 64 positions,
    * combined order-independently by xor-multiply. Pure and
    * deterministic — q43 verifies that by evaluating it twice through
    * independent plans.
    */
  private def fingerprintOf(text: String): Long = {
    val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val k = 16 // gram length in bytes
    val base = 1000003L
    var pow = 1L
    var i = 0
    while (i < k - 1) { pow *= base; i += 1 }
    var h = 0L
    var minH = Long.MaxValue
    var fp = 0L // order-independent combine of window minima
    i = 0
    while (i < bytes.length) {
      h = h * base + (bytes(i) & 0xff)
      if (i >= k) h -= pow * base * (bytes(i - k) & 0xff)
      if (i >= k - 1) {
        if (h < minH) minH = h
        if ((i + 1) % 64 == 0) { fp ^= minH * 0x9e3779b97f4a7c15L; minH = Long.MaxValue }
      }
      i += 1
    }
    if (minH != Long.MaxValue) fp ^= minH * 0x9e3779b97f4a7c15L
    fp
  }

  /** tokens of lowercased, trimmed text (both dialects: \s+ split) */
  private def toks(c: Column): Column = split(trim(lower(c)), "\\s+")

  // dot/cosine kernels: graft.functions.FloatVecDot — a native codegen'd
  // Catalyst expression whose sequential f64 fold is bit-identical to
  // DuckDB's list_dot_product over DOUBLE[] casts.

  private val stopEn = Seq("the", "a", "of", "to", "and", "in", "is", "it")

  /** SEMANTIC dedup, SemDeDup-shaped (Abbas et al. 2023, "SemDeDup:
    * data-efficient learning at web-scale through semantic
    * deduplication"): k-means-cluster the embeddings (the deterministic
    * [[IvfOps.trainCentroids]]), then compare pairs only WITHIN each
    * cluster — a doc is a duplicate iff a SMALLER-ID cluster-mate sits
    * above the cosine threshold (SemDeDup keeps the point closest to
    * the centroid; min-id is this engine's deterministic tie-stable
    * representative rule). Returns every doc: (id, cell, dup_of) with
    * dup_of null for kept docs.
    *
    * Scale shape: the quadratic pair space shrinks from n² to
    * Σ|cell|² — with cells scaled so clusters stay bounded, the
    * within-cell self-join is the same shuffle shape as the
    * label-blocked q41. Flagged dups are SOUND by construction (the
    * in-cluster cosine is exact); clustering only costs RECALL (true
    * near-dup pairs split across cells), which q92's recall twin
    * measures against the exact global pair set.
    */
  def semDedup(s: SparkSession, emb: DataFrame, cells: Int = 16,
      iters: Int = 3, threshold: Double = 0.4,
      id: String = "id", vec: String = "vec"): DataFrame = {
    import s.implicits._
    val norm = IvfOps.normalized(s, emb, id, vec).cache()
    val cents = IvfOps.trainCentroids(s, norm, cells, iters)
    val bc = s.sparkContext.broadcast(cents)
    val cellOf = norm.map { case (i, v) =>
      (i, IvfOps.nearestCells(bc.value, v, 1).head)
    }.toDF(id, "cell")
    // original f32 vectors ride to the pair scan so the cosine is the
    // exact q41 expression (normalized doubles would change the fold).
    // localCheckpoint (not cache): the self-join reads this twice and
    // the result joins it a third time — checkpointing materializes it
    // once, cuts the lineage, and the blocks release with the reference
    // instead of squatting in executor storage (the probe-cache lesson)
    val assigned = emb.select(col(id), col(vec))
      .join(cellOf, id).select(col("cell"), col(id), col(vec))
      .localCheckpoint()
    norm.unpersist()
    val a = assigned.select(col("cell"), col(id).as("ia"), col(vec).as("va"))
    val b = assigned.select(col("cell"), col(id).as("ib"), col(vec).as("vb"))
    val dupOf = a.join(b, "cell").filter(col("ia") < col("ib"))
      .withColumn("cos",
        graft.functions.VecFunctions.vecCosine(s, col("va"), col("vb")))
      .filter(col("cos") >= threshold)
      .groupBy(col("ib").as(id))
      .agg(min(col("ia")).as("dup_of"))
    assigned.select(col(id), col("cell"))
      .join(dupOf, Seq(id), "left")
  }

  val all: ListMap[String, Q] = ListMap(
    // ---- text analysis: token counting + char-class stats ----
    "q30_text_stats" -> Q(
      (s, d) =>
        docs(s, d)
          .select(col("doc_id"),
            size(toks(col("text"))).as("n_tokens"),
            length(col("text")).as("len_chars"),
            length(regexp_replace(col("text"), "[^.,;:!?]", "")).as("punct_cnt"),
            length(regexp_replace(col("text"), "[^0-9]", "")).as("digit_cnt"))
          .withColumn("avg_token_len",
            (col("len_chars") - col("n_tokens") + 1).cast("double") / col("n_tokens"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  len(regexp_split_to_array(trim(lower(text)), '\s+')) AS n_tokens,
             |  length(text) AS len_chars,
             |  length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS punct_cnt,
             |  length(regexp_replace(text, '[^0-9]', '', 'g')) AS digit_cnt,
             |  CAST(length(text) - len(regexp_split_to_array(trim(lower(text)), '\s+')) + 1 AS DOUBLE)
             |    / len(regexp_split_to_array(trim(lower(text)), '\s+')) AS avg_token_len
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---- quality scoring: stopword ratio in exact milli-units ----
    "q31_quality_score" -> Q(
      (s, d) =>
        docs(s, d)
          .select(col("doc_id"), toks(col("text")).as("t"))
          .select(col("doc_id"), size(col("t")).as("n_tokens"),
            size(filter(col("t"), x => x.isin(stopEn: _*))).as("stop_cnt"))
          .withColumn("stop_milli",
            round(col("stop_cnt") * lit(1000.0) / col("n_tokens"), 0).cast("long"))
          .withColumn("quality",
            when(col("n_tokens") >= 20 && col("stop_milli").between(10, 500), "good")
              .otherwise("suspect"))
          .orderBy("doc_id"),
      Some(s"""SELECT doc_id, n_tokens, stop_cnt,
             |  CAST(round(stop_cnt*1000.0/n_tokens) AS BIGINT) AS stop_milli,
             |  CASE WHEN n_tokens >= 20 AND CAST(round(stop_cnt*1000.0/n_tokens) AS BIGINT) BETWEEN 10 AND 500
             |    THEN 'good' ELSE 'suspect' END AS quality
             |FROM (SELECT doc_id,
             |    len(regexp_split_to_array(trim(lower(text)), '\\s+')) AS n_tokens,
             |    len(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
             |        x -> x IN (${stopEn.map("'" + _ + "'").mkString(",")}))) AS stop_cnt
             |  FROM documents) t
             |ORDER BY doc_id""".stripMargin)),

    // ---- language-ID: n-gram/stopword heuristic with fixed precedence ----
    "q32_langid" -> Q(
      (s, d) => {
        val t = toks(col("text"))
        def hits(words: Seq[String]): Column =
          size(filter(t, x => x.isin(words: _*)))
        val en = hits(Seq("the", "a", "of", "and", "is"))
        val de = hits(Seq("der", "die", "das", "und", "ist"))
        val fr = hits(Seq("le", "la", "les", "et", "est"))
        val es = hits(Seq("el", "los", "las", "y", "es"))
        docs(s, d)
          .select(col("doc_id"),
            en.as("en_hits"), de.as("de_hits"), fr.as("fr_hits"), es.as("es_hits"),
            length(regexp_replace(col("text"), "[^\\u4e00-\\u9fff]", "")).as("cjk_cnt"))
          .withColumn("lang_pred",
            when(col("cjk_cnt") > 0, "zh")
              .when(col("de_hits") > col("en_hits") && col("de_hits") >= col("fr_hits") &&
                col("de_hits") >= col("es_hits"), "de")
              .when(col("fr_hits") > col("en_hits") && col("fr_hits") >= col("es_hits"), "fr")
              .when(col("es_hits") > col("en_hits"), "es")
              .otherwise("en"))
          .select(col("doc_id"), col("lang_pred"), col("cjk_cnt"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |  CASE WHEN cjk_cnt > 0 THEN 'zh'
             |    WHEN de_hits > en_hits AND de_hits >= fr_hits AND de_hits >= es_hits THEN 'de'
             |    WHEN fr_hits > en_hits AND fr_hits >= es_hits THEN 'fr'
             |    WHEN es_hits > en_hits THEN 'es'
             |    ELSE 'en' END AS lang_pred,
             |  cjk_cnt
             |FROM (SELECT doc_id,
             |    len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
             |        x -> x IN ('the','a','of','and','is'))) AS en_hits,
             |    len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
             |        x -> x IN ('der','die','das','und','ist'))) AS de_hits,
             |    len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
             |        x -> x IN ('le','la','les','et','est'))) AS fr_hits,
             |    len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
             |        x -> x IN ('el','los','las','y','es'))) AS es_hits,
             |    length(regexp_replace(text, '[^一-鿿]', '', 'g')) AS cjk_cnt
             |  FROM documents) t
             |ORDER BY doc_id""".stripMargin)),

    // ---- exact dedup: content-hash grouping (canonical = min doc_id) ----
    "q33_exact_dedup" -> Q(
      (s, d) =>
        docs(s, d)
          .groupBy(md5(col("text").cast("binary")).as("content_hash"))
          .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_copies"))
          .orderBy("content_hash"),
      Some("""SELECT md5(text) AS content_hash, min(doc_id) AS canonical_id,
             |  count(*) AS n_copies
             |FROM documents GROUP BY 1 ORDER BY content_hash""".stripMargin),
      headline = true),

    // ---- n-gram Jaccard near-dup: top-20 most similar pairs.
    //      Delegates to Dedup.jaccardPairs: ONE wide shuffle groups
    //      shingle posting lists, the document-frequency cap is applied
    //      INLINE while streaming each group (a shingle in more than
    //      `shingleDfCap` docs is dropped — from pairs AND sizes, so the
    //      Jaccard is exact over the capped universe, identically in the
    //      DuckDB oracle), and pairs + per-doc sizes are emitted in the
    //      same pass. Memory per group is bounded at cap+1 ids, so a
    //      boilerplate shingle shared by a million docs streams through
    //      as one skipped group instead of k² join rows — the dedup
    //      skew-bomb at 100 TB. The drop is NOT silent: observe()
    //      metrics q34_shingles_{pre,post}_cap surface kept-vs-dropped
    //      row counts to any QueryExecutionListener (Verify/Bench print
    //      them). Shingling runs in a typed narrow map: inlining the
    //      equivalent nested higher-order expression into the
    //      generator-pushdown filters costs minutes of codegen on first
    //      evaluation. ----
    "q34_ngram_jaccard" -> Q(
      (s, d) => {
        Dedup.jaccardPairs(s,
            docs(s, d).select(col("doc_id").as("id"), col("text")),
            minJaccard = 0.0, observePrefix = Some("q34_shingles"))
          .select(col("ida").as("da"), col("idb").as("db"), col("inter"), col("jac"))
          .orderBy(col("jac").desc, col("da"), col("db"))
          .limit(20)
      },
      Some(s"""WITH ${pairOracleCtes()}
             |SELECT da, db, inter,
             |  CAST(inter AS DOUBLE) / (za.n + zb.n - inter) AS jac
             |FROM i JOIN z za ON i.da = za.doc_id JOIN z zb ON i.db = zb.doc_id
             |ORDER BY jac DESC, da, db LIMIT 20""".stripMargin),
      headline = true),

    // ---- q260: BLOCKING QUALITY of the sorted-neighborhood blocker —
    //      pairs completeness (recall of the candidate stage against
    //      the ≥ 0.5-Jaccard ground truth) and reduction ratio (the
    //      fraction of C(n,2) never touched), the two numbers every
    //      blocker is judged by. Exact counts, engine-computed rounded
    //      divisions, full SQL replay of BOTH pair sets. ----
    "q260_blocking_quality" -> Q(
      (s, d) => {
        val dd = docs(s, d)
        val n = dd.count()
        val cands = graft.llm.SortedNeighborhood.neighborhoodPairs(
          dd.select(col("doc_id"),
            lower(substring(col("text"), 1, 32)).as("key")),
          Seq(col("key"), col("doc_id")), "doc_id", w = 10)
        val truth = Dedup.jaccardPairs(s,
            dd.select(col("doc_id").as("id"), col("text")),
            minJaccard = 0.0)
          .filter(col("jac") >= 0.5)
          .select(col("ida").as("id_a"), col("idb").as("id_b"))
        graft.rel.EntityResolution.blockingQuality(cands, truth, n)
          .select(col("n_candidates").cast("long"), col("n_true").cast("long"),
            col("n_hit").cast("long"), col("pairs_completeness_r6"),
            col("reduction_ratio_r6"))
      },
      Some(s"""WITH ${pairOracleCtes()},
             |tp AS (SELECT da AS lo, db AS hi
             |  FROM i JOIN z za ON i.da = za.doc_id
             |  JOIN z zb ON i.db = zb.doc_id
             |  WHERE CAST(inter AS DOUBLE) / (za.n + zb.n - inter) >= 0.5),
             |r AS (SELECT doc_id,
             |    row_number() OVER (ORDER BY lower(substr(text, 1, 32)),
             |      doc_id) AS rk
             |  FROM documents),
             |cp AS (SELECT a.doc_id AS lo, b.doc_id AS hi
             |  FROM r a JOIN r b ON b.rk > a.rk AND b.rk - a.rk < 10),
             |cc AS (SELECT least(lo, hi) AS lo, greatest(lo, hi) AS hi
             |  FROM cp GROUP BY 1, 2),
             |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
             |agg AS (SELECT
             |  (SELECT count(*) FROM cc) AS n_candidates,
             |  (SELECT count(*) FROM tp) AS n_true,
             |  (SELECT count(*) FROM cc JOIN tp
             |     ON cc.lo = tp.lo AND cc.hi = tp.hi) AS n_hit)
             |SELECT CAST(n_candidates AS BIGINT) AS n_candidates,
             |  CAST(n_true AS BIGINT) AS n_true,
             |  CAST(n_hit AS BIGINT) AS n_hit,
             |  CASE WHEN n_true = 0 THEN 1.0
             |    ELSE round(CAST(n_hit AS DOUBLE) / n_true, 6) END
             |    AS pairs_completeness_r6,
             |  round(1.0 - CAST(n_candidates AS DOUBLE)
             |    / (nn.n * (nn.n - 1) / 2), 6) AS reduction_ratio_r6
             |FROM agg, nn""".stripMargin)),

    // ---- q255: CROSS-SOURCE DUPLICATION MATRIX — where the near-dups
    //      COME FROM: every ≥ 0.5-Jaccard pair attributed to its
    //      unordered (source, source) cell. The mirror-crawl /
    //      re-scrape diagnostic a corpus audit runs before choosing
    //      which source to drop; reuses the exact q34 pair machinery
    //      (hash-green, so the jac doubles are engine-identical and
    //      the threshold decision cannot diverge). ----
    "q255_source_overlap" -> Q(
      (s, d) => {
        val pairs = Dedup.jaccardPairs(s,
            docs(s, d).select(col("doc_id").as("id"), col("text")),
            minJaccard = 0.0)
          .filter(col("jac") >= 0.5)
          .select(col("ida").as("da"), col("idb").as("db"))
        val src = docs(s, d).select(col("doc_id"), col("source"))
        pairs
          .join(src.select(col("doc_id").as("da"), col("source").as("sa")), "da")
          .join(src.select(col("doc_id").as("db"), col("source").as("sb")), "db")
          .groupBy(least(col("sa"), col("sb")).as("source_lo"),
            greatest(col("sa"), col("sb")).as("source_hi"))
          .agg(count(lit(1)).as("n_pairs"))
          .orderBy("source_lo", "source_hi")
      },
      Some(s"""WITH ${pairOracleCtes()},
             |p AS (SELECT da, db
             |  FROM i JOIN z za ON i.da = za.doc_id
             |  JOIN z zb ON i.db = zb.doc_id
             |  WHERE CAST(inter AS DOUBLE) / (za.n + zb.n - inter) >= 0.5),
             |m AS (SELECT least(a.source, b.source) AS source_lo,
             |    greatest(a.source, b.source) AS source_hi
             |  FROM p JOIN documents a ON p.da = a.doc_id
             |  JOIN documents b ON p.db = b.doc_id)
             |SELECT source_lo, source_hi, count(*) AS n_pairs
             |FROM m GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // ---- prefix-filtered Jaccard join at a REAL threshold (t = 0.4):
    //      df-ordered prefixes bound the candidate space, exact verify
    //      restores bit-parity with the full q34 pair machinery; the
    //      acceptance is integer (1000·inter ≥ 400·union) in BOTH
    //      engines so the threshold boundary cannot float-drift ----
    "q182_prefix_jaccard" -> Q(
      (s, d) => {
        Dedup.prefixJaccardPairs(s,
            docs(s, d).select(col("doc_id").as("id"), col("text")),
            minJacMilli = 400, observePrefix = Some("q182"))
          .select(col("ida").as("da"), col("idb").as("db"), col("inter"), col("jac"))
          .orderBy(col("jac").desc, col("da"), col("db"))
      },
      Some(s"""WITH ${pairOracleCtes()}
             |SELECT da, db, inter,
             |  CAST(inter AS DOUBLE) / (za.n + zb.n - inter) AS jac
             |FROM i JOIN z za ON i.da = za.doc_id JOIN z zb ON i.db = zb.doc_id
             |WHERE inter * 1000 >= 400 * (za.n + zb.n - inter)
             |ORDER BY jac DESC, da, db""".stripMargin)),

    // ---- asymmetric containment near-dup (|A∩B| / min|A|,|B| — the
    //      excerpt/superset modality); same shingle+cap machinery and
    //      oracle preamble as q34, exact integer milli-units ----
    "q133_containment" -> Q(
      (s, d) => {
        Dedup.containmentPairs(s,
            docs(s, d).select(col("doc_id").as("id"), col("text")),
            minContMilli = 500, observePrefix = Some("q133_shingles"))
          .select(col("ida").as("da"), col("idb").as("db"),
            col("inter"), col("n_small"), col("cont_milli"))
          .orderBy(col("cont_milli").desc, col("inter").desc, col("da"), col("db"))
          .limit(20)
      },
      Some(s"""WITH ${pairOracleCtes()}
             |SELECT da, db, CAST(inter AS BIGINT) AS inter,
             |  CAST(least(za.n, zb.n) AS BIGINT) AS n_small,
             |  CAST((inter * 1000) // least(za.n, zb.n) AS BIGINT) AS cont_milli
             |FROM i JOIN z za ON i.da = za.doc_id JOIN z zb ON i.db = zb.doc_id
             |WHERE (inter * 1000) // least(za.n, zb.n) >= 500
             |ORDER BY cont_milli DESC, inter DESC, da, db LIMIT 20""".stripMargin)),

    // ---- brute-force cosine top-k (exact ANN baseline) ----
    "q37_knn_cosine" -> Q(
      (s, d) => {
        val e = embs(s, d)
        val q = e.filter(col("vec_id") < 3)
          .select(col("vec_id").as("qid"), col("embedding").as("qv"))
        val scored = broadcast(q).join(e, col("vec_id") =!= col("qid"))
          .withColumn("cos", graft.functions.VecFunctions.vecCosine(s, col("qv"), col("embedding")))
        graft.functions.TopK.perKeyTopK(scored, 5, "qid", "vec_id", "cos")
          .orderBy("qid", "rn")
      },
      Some("""SELECT qid, rn, vec_id, cos FROM (
             |  SELECT q.vec_id AS qid, e.vec_id AS vec_id,
             |    list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))
             |      / (sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])))
             |         * sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))) AS cos,
             |    row_number() OVER (PARTITION BY q.vec_id ORDER BY
             |      list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))
             |      / (sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])))
             |         * sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))) DESC,
             |      e.vec_id) AS rn
             |  FROM embeddings q JOIN embeddings e ON q.vec_id < 3 AND e.vec_id != q.vec_id) t
             |WHERE rn <= 5 ORDER BY qid, rn""".stripMargin),
      headline = true),

    // ---- embedding stats: exact L2 norms + label histogram join ----
    "q39_embed_norms" -> Q(
      (s, d) =>
        embs(s, d)
          .select(col("vec_id"), col("label"),
            size(col("embedding")).as("dim"),
            sqrt(graft.functions.VecFunctions.vecDot(s, col("embedding"), col("embedding"))).as("l2_norm"))
          .orderBy("vec_id"),
      Some("""SELECT vec_id, label, len(embedding) AS dim,
             |  sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS l2_norm
             |FROM embeddings ORDER BY vec_id""".stripMargin)),

    // ---- embedding-cosine near-dup pairs, EXACT, blocked on the label:
    //      both sides shuffle by `label`, pairs form only inside a label
    //      group, so the pair volume is Σ n_label² — the right tool when
    //      label granularity bounds group size (shard/source/domain keys
    //      in a real pipeline; a giant label needs the LSH-blocked
    //      variant below, whose blocking recall q41_lsh_recall pins).
    //      Exact ⇒ a full hash oracle, non-vacuous at sf0.01 (5 pairs at
    //      cos ≥ 0.4; this synthetic corpus has no true near-dups, so
    //      the threshold sits where qualifying pairs exist). ----
    "q41_embed_neardup" -> Q(
      (s, d) => {
        val e = embs(s, d).select(col("vec_id"), col("label"), col("embedding"))
        val a = e.select(col("label"), col("vec_id").as("va"), col("embedding").as("ea"))
        val b = e.select(col("label"), col("vec_id").as("vb"), col("embedding").as("eb"))
        a.join(b, "label")
          .filter(col("va") < col("vb"))
          .select(col("label"), col("va"), col("vb"),
            graft.functions.VecFunctions.vecCosine(s, col("ea"), col("eb")).as("cos"))
          .filter(col("cos") >= 0.4)
          .orderBy(col("cos").desc, col("va"), col("vb"))
      },
      Some("""SELECT a.label AS label, a.vec_id AS va, b.vec_id AS vb,
             |  list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
             |    / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
             |       * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))) AS cos
             |FROM embeddings a JOIN embeddings b
             |  ON a.label = b.label AND a.vec_id < b.vec_id
             |WHERE list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
             |    / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
             |       * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))) >= 0.4
             |ORDER BY cos DESC, va, vb""".stripMargin)),

    // ---- the LSH-BLOCKED near-dup variant's blocking recall, pinned.
    //      Blocking on the multi-table hyperplane bucket (annSigs, 8×4)
    //      is the 100 TB path when no bounded blocking key exists — no
    //      label ever induces an O(n_label²) self-join; the price is
    //      approximate candidate generation. This entry measures it
    //      honestly: of the exact top-20 same-label pairs by cosine
    //      (cos ≈ 0.35-0.47 here — far below real near-dup similarity,
    //      where per-table collision ≥ (1-acos(c)/π)⁴ → 1), how many
    //      collide in ≥1 of the 8 tables? Deterministic (fixed
    //      hyperplanes), so the measured value is pinnable. ----
    "q41_lsh_recall" -> Q(
      (s, d) => {
        import s.implicits._
        val e = embs(s, d).select(col("vec_id"), col("label"), col("embedding"))
        val a = e.select(col("label"), col("vec_id").as("va"), col("embedding").as("ea"))
        val b = e.select(col("label"), col("vec_id").as("vb"), col("embedding").as("eb"))
        val top = a.join(b, "label")
          .filter(col("va") < col("vb"))
          .select(col("va"), col("vb"),
            graft.functions.VecFunctions.vecCosine(s, col("ea"), col("eb")).as("cos"))
          .orderBy(col("cos").desc, col("va"), col("vb"))
          .limit(20)
        val flat = e.select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])]
          .map { case (id, v) => (id, SketchOps.annSigs(v)) }
          .toDF("vec_id", "sigs")
          .select(col("vec_id"), posexplode(col("sigs")).as(Seq("t", "bucket")))
        // bucket-keyed candidate generation (shuffle on (t,bucket), pair
        // volume bounded per bucket), one distinct over pairs
        val cand = flat.as("x").join(flat.as("y"),
            col("x.t") === col("y.t") && col("x.bucket") === col("y.bucket") &&
              col("x.vec_id") < col("y.vec_id"))
          .select(col("x.vec_id").as("va"), col("y.vec_id").as("vb")).distinct()
        top.join(cand.withColumn("hit", lit(1)), Seq("va", "vb"), "left")
          .agg(count(lit(1)).as("n_pairs"),
            sum(coalesce(col("hit"), lit(0))).as("n_hits"))
          .select(col("n_pairs"), col("n_hits"),
            (col("n_hits").cast("double") / col("n_pairs")).as("recall_at_20"))
      },
      Some("""SELECT CAST(20 AS BIGINT) AS n_pairs, CAST(14 AS BIGINT) AS n_hits,
             |  CAST(0.7 AS DOUBLE) AS recall_at_20""".stripMargin)),

    // ---- BPE-ish regex token counting (words / numbers / punctuation
    //      runs — the pre-tokenizer shape BPE vocabularies use) ----
    "q42_bpe_tokens" -> Q(
      (s, d) => {
        val pat = " ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+"
        docs(s, d)
          .select(col("doc_id"),
            size(split(trim(col("text")), "\\s+")).as("ws_tokens"),
            size(regexp_extract_all(col("text"), lit(pat), lit(0))).as("bpe_tokens"))
          .withColumn("ratio_milli",
            round(col("bpe_tokens") * lit(1000.0) / col("ws_tokens"), 0).cast("long"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |  len(regexp_split_to_array(trim(text), '\s+')) AS ws_tokens,
             |  len(regexp_extract_all(text, ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+')) AS bpe_tokens,
             |  CAST(round(len(regexp_extract_all(text, ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+'))*1000.0
             |    / len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT) AS ratio_milli
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---- document fingerprinting: Karp-Rabin rolling hash over bytes +
    //      per-window minima (winnowing-style). Oracle-checked as
    //      self-consistency: n_bytes must equal DuckDB's byte length
    //      (UTF-8 view parity) and a second, independently-planned
    //      distributed evaluation must reproduce identical fingerprints —
    //      the determinism contract content-addressed dedup rests on. ----
    "q43_fingerprint" -> Q(
      (s, d) => {
        import s.implicits._
        val base = docs(s, d).select(col("doc_id"), col("text")).as[(Long, String)]
        val f1 = base.map { case (id, t) =>
          (id, t.getBytes(java.nio.charset.StandardCharsets.UTF_8).length, fingerprintOf(t))
        }.toDF("doc_id", "n_bytes", "fp")
        val f2 = base.map { case (id, t) => (id, fingerprintOf(t)) }.toDF("did2", "fp2")
        f1.join(f2, col("doc_id") === col("did2"))
          .select(col("doc_id"), col("n_bytes"), (col("fp") === col("fp2")).as("fp_stable"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, strlen(text) AS n_bytes, TRUE AS fp_stable
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---- dedup clusters: connected components over the df-capped exact
    //      Jaccard pairs at ≥0.9 — every clustered doc labeled with the
    //      min id reachable from it (the canonical doc). Spark side is
    //      iterative min-label propagation (Dedup.connectedComponents);
    //      the oracle recomputes reachability with a recursive CTE over
    //      the identical pair set. ----
    "q49_dedup_clusters" -> Q(
      (s, d) => {
        val pairs = Dedup.jaccardPairs(s,
          docs(s, d).select(col("doc_id").as("id"), col("text")), minJaccard = 0.9)
        Dedup.connectedComponents(pairs)
          .select(col("id").as("doc_id"), col("cluster_id"))
          .orderBy("doc_id")
      },
      Some(s"""WITH RECURSIVE ${pairOracleCtes()},
             |p AS (SELECT da, db FROM i
             |      JOIN z za ON i.da = za.doc_id JOIN z zb ON i.db = zb.doc_id
             |      WHERE CAST(inter AS DOUBLE) / (za.n + zb.n - inter) >= 0.9),
             |ed AS (SELECT da AS u, db AS v FROM p UNION ALL SELECT db, da FROM p),
             |reach(u, root) AS (
             |  SELECT DISTINCT u, u FROM ed
             |  UNION
             |  SELECT ed.v, reach.root FROM reach JOIN ed ON ed.u = reach.u)
             |SELECT u AS doc_id, min(root) AS cluster_id FROM reach
             |GROUP BY u ORDER BY doc_id""".stripMargin)),

    // ---- q145: GOLDEN-RECORD survivorship — turn q49's near-dup
    //      clusters into one canonical record per cluster under a
    //      DETERMINISTIC total-order policy (most tokens, ties to the
    //      lower doc_id: "keep the richest copy"), with cluster
    //      bookkeeping a dedup pipeline reports (member and token
    //      counts). The entity-resolution step after clustering; the
    //      policy being a total order is what makes the choice
    //      replayable — the oracle reruns the recursive-CTE clusters
    //      and the same row_number rule. Scale: clusters' member lists
    //      are pair-bounded (q34's df-cap machinery); the policy is one
    //      window over cluster-keyed members, nothing corpus-sized. ----
    "q145_golden_record" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val pairs = Dedup.jaccardPairs(s,
          docs(s, d).select(col("doc_id").as("id"), col("text")), minJaccard = 0.9)
        val members = Dedup.connectedComponents(pairs)
          .select(col("id").as("doc_id"), col("cluster_id"))
          .join(docs(s, d).select(col("doc_id"),
            size(filter(split(trim(lower(col("text"))), "\\s+"),
              t => length(t) > 0)).cast("long").as("n_tokens")), "doc_id")
        val w = Window.partitionBy(col("cluster_id"))
          .orderBy(col("n_tokens").desc, col("doc_id"))
        members
          .withColumn("rn", row_number().over(w))
          .groupBy("cluster_id")
          .agg(max(when(col("rn") === 1, col("doc_id"))).as("canonical_id"),
            count(lit(1)).as("n_members"), sum("n_tokens").as("tok_sum"))
          .orderBy("cluster_id")
      },
      Some(s"""WITH RECURSIVE ${pairOracleCtes()},
             |p AS (SELECT da, db FROM i
             |      JOIN z za ON i.da = za.doc_id JOIN z zb ON i.db = zb.doc_id
             |      WHERE CAST(inter AS DOUBLE) / (za.n + zb.n - inter) >= 0.9),
             |ed AS (SELECT da AS u, db AS v FROM p UNION ALL SELECT db, da FROM p),
             |reach(u, root) AS (
             |  SELECT DISTINCT u, u FROM ed
             |  UNION
             |  SELECT ed.v, reach.root FROM reach JOIN ed ON ed.u = reach.u),
             |cl AS (SELECT u AS doc_id, min(root) AS cluster_id FROM reach GROUP BY u),
             |m AS (SELECT cl.doc_id, cl.cluster_id,
             |    CAST(len(list_filter(regexp_split_to_array(trim(lower(d.text)), '\\s+'),
             |      x -> len(x) > 0)) AS BIGINT) AS n_tokens,
             |    row_number() OVER (PARTITION BY cl.cluster_id
             |      ORDER BY len(list_filter(regexp_split_to_array(trim(lower(d.text)), '\\s+'),
             |        x -> len(x) > 0)) DESC, cl.doc_id) AS rn
             |  FROM cl JOIN documents d ON d.doc_id = cl.doc_id)
             |SELECT cluster_id, CAST(max(CASE WHEN rn = 1 THEN doc_id END) AS BIGINT)
             |    AS canonical_id,
             |  count(*) AS n_members, CAST(sum(n_tokens) AS BIGINT) AS tok_sum
             |FROM m GROUP BY cluster_id ORDER BY cluster_id""".stripMargin)),

    // ---- leakage-free train/val/test split: assignment is a pure
    //      function of the q49 near-dup cluster id (singletons cluster
    //      as themselves), so near-dup pairs cannot straddle splits.
    //      The oracle replays clusters (recursive CTE), the md5 rule
    //      and the threshold arithmetic; thresholds interpolate from
    //      the SAME Scala cumulative sums the operator computes, so
    //      double rounding (0.8+0.1 != 0.9 exactly) cannot drift ----
    "q112_leakage_split" -> {
      val fr = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
      val cum = fr.map(_._2).scanLeft(0.0)(_ + _).tail
      val Seq(t1, t2) =
        cum.init.map(c => (c * (1L << 60).toDouble).toLong)
      Q(
        (s, d) => {
          val pairs = Dedup.jaccardPairs(s,
            docs(s, d).select(col("doc_id").as("id"), col("text")), minJaccard = 0.9)
          val clusters = Dedup.connectedComponents(pairs)
            .select(col("id").as("doc_id"), col("cluster_id"))
          Curation.splitByCluster(s, docs(s, d), clusters, fr)
            .groupBy("split")
            .agg(count(lit(1)).as("n_docs"),
              countDistinct(col("cluster_id")).as("n_clusters"),
              sum(col("doc_id")).as("id_sum"))
            .orderBy("split")
        },
        Some(s"""WITH RECURSIVE ${pairOracleCtes()},
               |p AS (SELECT da, db FROM i
               |      JOIN z za ON i.da = za.doc_id JOIN z zb ON i.db = zb.doc_id
               |      WHERE CAST(inter AS DOUBLE) / (za.n + zb.n - inter) >= 0.9),
               |ed AS (SELECT da AS u, db AS v FROM p UNION ALL SELECT db, da FROM p),
               |reach(u, root) AS (
               |  SELECT DISTINCT u, u FROM ed
               |  UNION
               |  SELECT ed.v, reach.root FROM reach JOIN ed ON ed.u = reach.u),
               |cl AS (SELECT u AS doc_id, min(root) AS cluster_id FROM reach GROUP BY u),
               |a AS (SELECT d.doc_id, coalesce(cl.cluster_id, d.doc_id) AS cluster_id
               |  FROM documents d LEFT JOIN cl USING (doc_id)),
               |h AS (SELECT doc_id, cluster_id,
               |    ('0x' || substr(md5(CAST(cluster_id AS VARCHAR)), 1, 15))::BIGINT AS hv
               |  FROM a),
               |sp AS (SELECT doc_id, cluster_id,
               |    CASE WHEN hv < $t1 THEN 'train'
               |      WHEN hv < $t2 THEN 'val' ELSE 'test' END AS split
               |  FROM h)
               |SELECT split, count(*) AS n_docs,
               |  CAST(count(DISTINCT cluster_id) AS BIGINT) AS n_clusters,
               |  CAST(sum(doc_id) AS BIGINT) AS id_sum
               |FROM sp GROUP BY split ORDER BY split""".stripMargin))
    },

    // ---- TF-IDF term weighting: top-5 terms per document (doc_id < 5)
    //      by tf · (N/df). The idf factor is LINEAR (N/df), not log —
    //      log() is a transcendental whose last ulp differs between
    //      libm implementations, and the driver's hash compare is
    //      bit-exact; tf·N is exact integer arithmetic and the one IEEE
    //      division by df is bit-identical cross-engine. Ranking is the
    //      point of the op; the monotone-in-(N/df) weight preserves it
    //      per term. Plan shape at scale: tf is a (doc, term) hash agg,
    //      df a term hash agg, joined on term — all shuffles keyed by
    //      term/doc, no collect. ----
    "q53_tfidf" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val tf = docs(s, d)
          .select(col("doc_id"), explode(toks(col("text"))).as("term"))
          .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
        val n = docs(s, d).count() // one scalar; the scan is column-pruned
        val w = Window.partitionBy(col("doc_id"))
          .orderBy(col("score").desc, col("term"))
        tf.filter(col("doc_id") < 5)
          .join(df, "term")
          .withColumn("score", (col("tf") * lit(n)).cast("double") / col("df"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 5)
          .select(col("doc_id"), col("rn"), col("term"), col("tf"), col("df"), col("score"))
          .orderBy("doc_id", "rn")
      },
      Some("""WITH tf AS (
             |  SELECT doc_id, token AS term, count(*) AS tf
             |  FROM (SELECT doc_id,
             |          unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS token
             |        FROM documents) t
             |  GROUP BY doc_id, token),
             |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
             |n AS (SELECT count(*) AS n FROM documents)
             |SELECT doc_id, rn, term, tf, df, score FROM (
             |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
             |    CAST(tf.tf * n.n AS DOUBLE) / df.df AS score,
             |    row_number() OVER (PARTITION BY tf.doc_id
             |      ORDER BY CAST(tf.tf * n.n AS DOUBLE) / df.df DESC, tf.term) AS rn
             |  FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
             |  WHERE tf.doc_id < 5) t
             |WHERE rn <= 5 ORDER BY doc_id, rn""".stripMargin)),

    // ---- vocabulary building: corpus token frequencies (explode/unnest) ----
    "q45_vocab_top_terms" -> Q(
      (s, d) =>
        docs(s, d)
          .select(col("doc_id"), explode(toks(col("text"))).as("token"))
          .groupBy(col("token"))
          .agg(count(lit(1)).as("tf"), countDistinct(col("doc_id")).as("df"))
          .orderBy(col("tf").desc, col("token"))
          .limit(20),
      Some("""SELECT token, count(*) AS tf, count(DISTINCT doc_id) AS df
             |FROM (SELECT doc_id,
             |        unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS token
             |      FROM documents) t
             |GROUP BY token ORDER BY tf DESC, token LIMIT 20""".stripMargin)),

    // ---- per-source corpus stats with rollup subtotals ----
    "q46_source_stats" -> Q(
      (s, d) =>
        docs(s, d)
          .rollup(col("source"), col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("total_chars"),
            min(col("n_chars")).as("min_chars"), max(col("n_chars")).as("max_chars"))
          .orderBy(col("source").asc_nulls_first, col("lang").asc_nulls_first),
      Some("""SELECT source, lang, count(*) AS n_docs,
             |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
             |  min(n_chars) AS min_chars, max(n_chars) AS max_chars
             |FROM documents GROUP BY ROLLUP (source, lang)
             |ORDER BY source ASC NULLS FIRST, lang ASC NULLS FIRST""".stripMargin)),

    // ---- per-label embedding centroids via a typed Aggregator with
    //      map-side partial buffers (graft.functions.VecMeanAgg) — the
    //      shuffle carries one 65-double buffer per (label, partition)
    //      instead of every row. Long-format output for the oracle. ----
    "q44_label_centroids" -> Q(
      (s, d) => {
        import s.implicits._
        val agg = new graft.functions.VecMeanAgg(64)
        embs(s, d).select(col("label"), col("embedding")).as[(Int, Seq[Float])]
          .groupByKey(_._1)
          .mapValues(_._2)
          .agg(agg.toColumn)
          .toDF("label", "vm")
          .select(col("label"), posexplode(col("vm.mean")).as(Seq("idx", "m")))
          .select(col("label"), col("idx"), round(col("m"), 6).as("mean_r6"))
          .orderBy("label", "idx")
      },
      Some("""SELECT label, CAST(idx - 1 AS INT) AS idx,
             |  round(sum(CAST(x AS DOUBLE)) / count(*), 6) AS mean_r6
             |FROM (SELECT label, unnest(embedding) AS x,
             |        generate_subscripts(embedding, 1) AS idx
             |      FROM embeddings) t
             |GROUP BY label, idx ORDER BY label, idx""".stripMargin)),

    // ---- q150: LABEL-CENTROID SIMILARITY MATRIX — pairwise cosine
    //      between the q44 class centroids (label-space confusion
    //      structure: which classes are embedding-adjacent — the
    //      near-dup-across-labels / taxonomy-collapse diagnostic).
    //      Determinism: centroids are snapped to round-6 means FIRST
    //      (the exact doubles q44 pins cross-engine), then the cosine
    //      accumulates in index order in both engines (Spark
    //      `aggregate` folds left; DuckDB list_dot_product walks the
    //      list), so the one division + sqrt is over identical
    //      operands. Scale: |labels|² pairs of d-long arrays — the
    //      corpus is touched only by the centroid agg. ----
    "q150_centroid_sim" -> Q(
      (s, d) => {
        import s.implicits._
        val agg = new graft.functions.VecMeanAgg(64)
        val cent = embs(s, d).select(col("label"), col("embedding"))
          .as[(Int, Seq[Float])]
          .groupByKey(_._1).mapValues(_._2).agg(agg.toColumn).toDF("label", "vm")
          .select(col("label"), expr("transform(vm.mean, x -> round(x, 6))").as("c"))
        cent.as("a").join(cent.as("b"), col("a.label") < col("b.label"))
          .select(col("a.label").as("la"), col("b.label").as("lb"),
            round(expr(
              "aggregate(zip_with(a.c, b.c, (x, y) -> x * y), 0D, (acc, v) -> acc + v)" +
                " / (sqrt(aggregate(a.c, 0D, (acc, x) -> acc + x * x))" +
                " * sqrt(aggregate(b.c, 0D, (acc, x) -> acc + x * x)))"), 6)
              .as("cos_r6"))
          .orderBy("la", "lb")
      },
      Some("""WITH g AS (SELECT label, idx,
             |    sum(CAST(x AS DOUBLE)) / count(*) AS m
             |  FROM (SELECT label, unnest(embedding) AS x,
             |          generate_subscripts(embedding, 1) AS idx FROM embeddings) t
             |  GROUP BY label, idx),
             |c AS (SELECT label, list(round(m, 6) ORDER BY idx) AS c
             |  FROM g GROUP BY label)
             |SELECT a.label AS la, b.label AS lb,
             |  round(list_dot_product(a.c, b.c) /
             |    (sqrt(list_dot_product(a.c, a.c)) * sqrt(list_dot_product(b.c, b.c))), 6)
             |    AS cos_r6
             |FROM c a JOIN c b ON a.label < b.label ORDER BY la, lb""".stripMargin)),

    // ---- the END-TO-END curation pipeline: the operators above
    //      composed the way a training-data run composes them —
    //      quality gate (q31 semantics) → language gate (q32) → exact
    //      dedup keeping the smallest doc_id per text (q33) → near-dup
    //      removal keeping each ≥0.9-Jaccard cluster's representative
    //      (q34/q49 machinery, df-cap counted WITHIN the survivor set)
    //      → curated per-source stats. One entry pins the whole
    //      composition: a drift in any stage's semantics, or in how the
    //      stages chain, goes hash-red even if each stage's own entry
    //      stays green.
    //
    //      Scale shape: two narrow gates off the scan, one hash-agg for
    //      exact dedup, the capped shingle join for pairs (never the n²
    //      space), the iterated-shuffle components loop bounded by
    //      cluster diameter, and a final broadcast-sized anti-join +
    //      per-source agg. No stage collects to the driver.
    "q60_curation_pipeline" -> Q(
      (s, d) => {
        val dd = docs(s, d)
        // ONE tokenize pass computes BOTH gates' signals (quality +
        // language) — per-doc scalars only, no text, persisted to feed
        // the eligibility filter and the final stats join. At 100 TB
        // this is one corpus scan where the stage-by-stage composition
        // would pay three (qual, lang, stats).
        def hits(c: Column, words: Seq[String]): Column =
          size(filter(c, x => x.isin(words: _*)))
        val qual = dd
          // the Unicode-normalization rung (NFKC+casefold+strip+collapse,
          // q407) chains INTO the one tokenize pass — zero extra scans.
          // On this ASCII corpus it reduces to lower+collapse, so the
          // oracle's trim(lower(text)) tokenization is unchanged.
          .select(col("doc_id"),
            toks(graft.functions.TextNorm.normalizeText(s, col("text"))).as("t"),
            col("text"))
          .select(col("doc_id"), size(col("t")).as("n_tokens"),
            size(filter(col("t"), x => x.isin(stopEn: _*))).as("stop_cnt"),
            hits(col("t"), Seq("the", "a", "of", "and", "is")).as("en_hits"),
            hits(col("t"), Seq("der", "die", "das", "und", "ist")).as("de_hits"),
            hits(col("t"), Seq("le", "la", "les", "et", "est")).as("fr_hits"),
            hits(col("t"), Seq("el", "los", "las", "y", "es")).as("es_hits"),
            length(regexp_replace(col("text"), "[^\\u4e00-\\u9fff]", ""))
              .as("cjk_cnt"))
          .withColumn("stop_milli",
            round(col("stop_cnt") * lit(1000.0) / col("n_tokens"), 0).cast("long"))
          .withColumn("good",
            col("n_tokens") >= 20 && col("stop_milli").between(10, 500))
          .withColumn("is_en",
            col("cjk_cnt") === 0 && col("de_hits") <= col("en_hits") &&
              !(col("fr_hits") > col("en_hits") && col("fr_hits") >= col("es_hits")) &&
              col("es_hits") <= col("en_hits"))
          .persist()
        val elig = dd
          .join(qual.filter(col("good") && col("is_en")).select("doc_id"), "doc_id")
        val ex = elig.groupBy(col("text"))
          .agg(min(col("doc_id")).as("doc_id")).select("doc_id")
        // survivors feed the pair join AND the final anti-join; persist
        // (memory-and-disk, spill-safe) so the gate+dedup stages upstream
        // run once. A production run at scale would write this boundary
        // to parquet instead — same plan cut, durable across job retries.
        val survivors = dd.join(ex, "doc_id").persist()
        val pairs = Dedup.jaccardPairs(s,
          survivors.select(col("doc_id").as("id"), col("text")), minJaccard = 0.9)
        val dropped = Dedup.connectedComponents(pairs)
          .filter(col("id") =!= col("cluster_id"))
          .select(col("id").as("doc_id"))
        survivors.join(dropped, Seq("doc_id"), "left_anti")
          .join(qual.select("doc_id", "n_tokens"), "doc_id")
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("sum_tokens"))
          .orderBy("source")
      },
      Some(s"""WITH RECURSIVE
             |qual AS (SELECT doc_id, n_tokens,
             |    CAST(round(stop_cnt*1000.0/n_tokens) AS BIGINT) AS stop_milli
             |  FROM (SELECT doc_id,
             |      len(regexp_split_to_array(trim(lower(text)), '\\s+')) AS n_tokens,
             |      len(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
             |          x -> x IN (${stopEn.map("'" + _ + "'").mkString(",")}))) AS stop_cnt
             |    FROM documents) t),
             |lang AS (SELECT doc_id,
             |    (cjk_cnt = 0 AND de_hits <= en_hits
             |      AND NOT (fr_hits > en_hits AND fr_hits >= es_hits)
             |      AND es_hits <= en_hits) AS is_en
             |  FROM (SELECT doc_id,
             |      len(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
             |          x -> x IN ('the','a','of','and','is'))) AS en_hits,
             |      len(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
             |          x -> x IN ('der','die','das','und','ist'))) AS de_hits,
             |      len(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
             |          x -> x IN ('le','la','les','et','est'))) AS fr_hits,
             |      len(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
             |          x -> x IN ('el','los','las','y','es'))) AS es_hits,
             |      length(regexp_replace(text, '[^一-鿿]', '', 'g')) AS cjk_cnt
             |    FROM documents) t),
             |elig AS (SELECT d.doc_id, d.text FROM documents d
             |  JOIN qual q ON d.doc_id = q.doc_id
             |  JOIN lang l ON d.doc_id = l.doc_id
             |  WHERE q.n_tokens >= 20 AND q.stop_milli BETWEEN 10 AND 500
             |    AND l.is_en),
             |ex AS (SELECT min(doc_id) AS doc_id FROM elig GROUP BY text),
             |cands AS (SELECT d.doc_id, d.text FROM documents d
             |  WHERE d.doc_id IN (SELECT doc_id FROM ex)),
             |${pairOracleCtes("cands")},
             |p AS (SELECT da, db FROM i
             |      JOIN z za ON i.da = za.doc_id JOIN z zb ON i.db = zb.doc_id
             |      WHERE CAST(inter AS DOUBLE) / (za.n + zb.n - inter) >= 0.9),
             |ed AS (SELECT da AS u, db AS v FROM p UNION ALL SELECT db, da FROM p),
             |reach(u, root) AS (
             |  SELECT DISTINCT u, u FROM ed
             |  UNION
             |  SELECT ed.v, reach.root FROM reach JOIN ed ON ed.u = reach.u),
             |clus AS (SELECT u AS doc_id, min(root) AS cluster_id FROM reach GROUP BY u),
             |kept AS (SELECT doc_id FROM ex WHERE doc_id NOT IN
             |  (SELECT doc_id FROM clus WHERE doc_id != cluster_id))
             |SELECT d.source, count(*) AS n_docs,
             |  CAST(sum(q.n_tokens) AS BIGINT) AS sum_tokens
             |FROM kept k JOIN documents d ON k.doc_id = d.doc_id
             |JOIN qual q ON k.doc_id = q.doc_id
             |GROUP BY d.source ORDER BY d.source""".stripMargin)),

    // ---- q425: DEDUP THRESHOLD SWEEP — the q34 pair space read at
    //      four Jaccard cut points (0.5/0.7/0.8/0.9): pair counts and
    //      distinct docs touched per threshold — the tuning curve a
    //      dedup run reads before committing to a cut. ONE pair-space
    //      pass (checkpointed), four bounded readouts. Oracle replays
    //      the pairs (string shingles) and every cut. ----
    "q425_dedup_threshold_sweep" -> Q(
      (s, d) => {
        val pairs = Dedup.jaccardPairs(s,
            docs(s, d).select(col("doc_id").as("id"), col("text")),
            minJaccard = 0.0)
          .select(col("ida"), col("idb"), col("jac"))
          .localCheckpoint(true)
        Seq(0.5, 0.7, 0.8, 0.9).map { t =>
          val p = pairs.filter(col("jac") >= t)
          p.agg(count(lit(1)).as("n_pairs"))
            .crossJoin(broadcast(
              p.select(explode(array(col("ida"), col("idb"))).as("i"))
                .agg(countDistinct(col("i")).as("n_docs"))))
            .select(lit(math.round(t * 1000)).as("threshold_milli"),
              col("n_pairs"), col("n_docs"))
        }.reduce(_ unionAll _).orderBy("threshold_milli")
      },
      Some {
        def cut(t: String): String =
          s"""SELECT CAST(${(t.toDouble * 1000).toLong} AS BIGINT)
             |    AS threshold_milli,
             |  CAST(count(*) AS BIGINT) AS n_pairs,
             |  CAST((SELECT count(DISTINCT i) FROM (
             |    SELECT da AS i FROM pj WHERE jac >= $t
             |    UNION ALL SELECT db FROM pj WHERE jac >= $t) u)
             |    AS BIGINT) AS n_docs
             |FROM pj WHERE jac >= $t""".stripMargin
        s"""WITH ${pairOracleCtes()},
           |pj AS (SELECT da, db,
           |    CAST(inter AS DOUBLE) / (za.n + zb.n - inter) AS jac
           |  FROM i JOIN z za ON i.da = za.doc_id
           |  JOIN z zb ON i.db = zb.doc_id)
           |${Seq("0.5", "0.7", "0.8", "0.9").map(cut)
            .mkString("\nUNION ALL\n")}
           |ORDER BY threshold_milli""".stripMargin
      }),

    // ---- q414: CROSS-SOURCE DUPLICATION MATRIX — the q34 pair space
    //      at Jaccard ≥ 0.5 rolled up by (source, source), sources
    //      least/greatest-ordered. The oracle replays the capped-
    //      shingle pairs (string shingles vs Spark's hashes — the q34
    //      collision contract) and the rollup. ----
    "q414_source_dup_matrix" -> Q(
      (s, d) => Dedup.sourceDupMatrix(s, docs(s, d), minJaccard = 0.5),
      Some(s"""WITH ${pairOracleCtes()},
             |p AS (SELECT da, db FROM i
             |  JOIN z za ON i.da = za.doc_id JOIN z zb ON i.db = zb.doc_id
             |  WHERE CAST(inter AS DOUBLE) / (za.n + zb.n - inter) >= 0.5),
             |ps AS (SELECT least(a.source, b.source) AS src_a,
             |    greatest(a.source, b.source) AS src_b
             |  FROM p JOIN documents a ON a.doc_id = p.da
             |  JOIN documents b ON b.doc_id = p.db)
             |SELECT src_a, src_b, count(*) AS n_pairs
             |FROM ps GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // ---- q416: SOURCE-PRIORITY DEDUP — the q34/q60 near-dup clusters
    //      resolved by (priority(source), doc_id) argmin instead of
    //      min-id: keep the curated mirror, drop the crawl. Priority
    //      here is the deterministic src-number mod 3. The oracle
    //      replays pairs (string shingles), the recursive component
    //      closure, the priority argmin, and the per-source rollup. ----
    "q416_priority_dedup" -> Q(
      (s, d) => Dedup.priorityDedup(s, docs(s, d),
        prio = expr("cast(substring(source, 4) as bigint) % 3"),
        minJaccard = 0.9),
      Some(s"""WITH RECURSIVE
             |${pairOracleCtes()},
             |p AS (SELECT da, db FROM i
             |  JOIN z za ON i.da = za.doc_id JOIN z zb ON i.db = zb.doc_id
             |  WHERE CAST(inter AS DOUBLE) / (za.n + zb.n - inter) >= 0.9),
             |ed AS (SELECT da AS u, db AS v FROM p
             |  UNION ALL SELECT db, da FROM p),
             |reach(u, root) AS (
             |  SELECT DISTINCT u, u FROM ed
             |  UNION
             |  SELECT ed.v, reach.root FROM reach JOIN ed ON ed.u = reach.u),
             |clus AS (SELECT u AS id, min(root) AS comp FROM reach
             |  GROUP BY u),
             |mem AS (SELECT c.id, c.comp,
             |    CAST(substr(d.source, 4) AS BIGINT) % 3 AS pr
             |  FROM clus c JOIN documents d ON d.doc_id = c.id),
             |w AS (SELECT id FROM (SELECT id, row_number() OVER (
             |    PARTITION BY comp ORDER BY pr, id) AS rn FROM mem)
             |  WHERE rn = 1),
             |drp AS (SELECT id FROM mem
             |  WHERE id NOT IN (SELECT id FROM w))
             |SELECT d.source, count(*) AS n_docs,
             |  CAST(count(drp.id) AS BIGINT) AS n_dropped,
             |  CAST(count(*) - count(drp.id) AS BIGINT) AS n_kept
             |FROM documents d LEFT JOIN drp ON drp.id = d.doc_id
             |GROUP BY d.source ORDER BY d.source""".stripMargin)),

    // ---- substring-level exact dedup (Lee et al. ACL 2022,
    //      ExactSubstr): merged per-doc spans of 8-grams occurring ≥2×
    //      corpus-wide, over documents ∪ planted shifted copies (docs
    //      0-9 minus their first token, id+100000 — long shared
    //      substrings by construction; natural within-doc repeats count
    //      too). The oracle recomputes with STRING grams and a
    //      gaps-and-islands interval merge — Spark compares 64-bit FNV
    //      hashes, so a collision flips this red (q34/q73's contract).
    //      ----
    "q83_repeated_substrings" -> Q(
      (s, d) => {
        val base = docs(s, d).select(col("doc_id"), col("text"))
        val corpus = base.unionByName(docs(s, d).filter(col("doc_id") < 10)
          .select((col("doc_id") + 100000L).as("doc_id"),
            regexp_replace(col("text"), "^\\S+\\s+", "").as("text")))
        Dedup.repeatedSpans(s, corpus, k = 8, id = "doc_id")
          .select(col("doc_id"), col("n_spans"), col("n_repeated_tokens"),
            col("max_span_tokens"))
          .orderBy("doc_id")
      },
      Some("""WITH corpus AS (
             |  SELECT doc_id, text FROM documents
             |  UNION ALL
             |  SELECT doc_id + 100000, regexp_replace(text, '^\S+\s+', '')
             |  FROM documents WHERE doc_id < 10),
             |t AS (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS w
             |  FROM corpus),
             |gg AS (SELECT doc_id, u.pos AS pos, u.gram AS gram FROM (
             |    SELECT doc_id, unnest(list_transform(range(1, len(w) - 6),
             |      i -> {'pos': i, 'gram': array_to_string(w[i:i+7], ' ')})) AS u
             |    FROM t WHERE len(w) >= 8) x),
             |heavy AS (SELECT gram FROM gg GROUP BY gram HAVING count(*) >= 2),
             |m AS (SELECT doc_id, pos FROM gg JOIN heavy USING (gram)),
             |isl AS (SELECT doc_id, pos,
             |    CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
             |           OR pos > lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) + 8
             |         THEN 1 ELSE 0 END AS brk
             |  FROM m),
             |grp AS (SELECT doc_id, pos,
             |    sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
             |      ROWS UNBOUNDED PRECEDING) AS g
             |  FROM isl),
             |spans AS (SELECT doc_id, g, min(pos) AS st, max(pos) + 7 AS en
             |  FROM grp GROUP BY doc_id, g)
             |SELECT doc_id, count(*) AS n_spans,
             |  CAST(sum(en - st + 1) AS BIGINT) AS n_repeated_tokens,
             |  CAST(max(en - st + 1) AS BIGINT) AS max_span_tokens
             |FROM spans GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // ---- LINE-level exact dedup (the C4 move at line granularity):
    //      every exact line keeps only its first corpus-wide occurrence
    //      — repeated boilerplate (the injected nav/footer lines, plus
    //      every line of an exact-dup doc) drops everywhere else. The
    //      FULL cleaned text of every doc is hash-compared; the oracle
    //      replays chunking, first-occurrence choice, and reassembly
    //      with string lines where Spark dedups by xxhash64 (a
    //      collision goes red — the q34 contract). ----
    "q97_line_dedup" -> Q(
      (s, d) => Dedup.dedupLines(s, lineDocs(s, d), id = "doc_id")
        .orderBy("doc_id"),
      Some("""WITH ld AS (SELECT doc_id, array_to_string(
             |    CASE WHEN doc_id % 3 = 0 THEN ['home about contact subscribe']
             |         ELSE []::VARCHAR[] END ||
             |    list_transform(range(1, CAST(ceil(len(t)/8.0) AS INT) + 1),
             |      i -> array_to_string(t[(i-1)*8+1:(i-1)*8+8], ' ')) ||
             |    CASE WHEN doc_id % 2 = 0
             |         THEN ['copyright 2026 example corp all rights reserved']
             |         ELSE []::VARCHAR[] END, chr(10)) AS text
             |  FROM (SELECT doc_id,
             |      regexp_split_to_array(trim(lower(text)), '\s+') AS t
             |    FROM documents) x),
             |lines AS (SELECT doc_id, u.line_no, u.line FROM (
             |    SELECT doc_id, unnest(list_transform(range(1, len(l)+1),
             |      i -> {'line_no': i - 1, 'line': l[i]})) AS u
             |    FROM (SELECT doc_id, string_split(text, chr(10)) AS l
             |          FROM ld) y) x),
             |r AS (SELECT doc_id, line_no, line,
             |    row_number() OVER (PARTITION BY line ORDER BY doc_id, line_no) AS rn
             |  FROM lines),
             |k AS (SELECT doc_id, count(*) AS n_kept,
             |    string_agg(line, chr(10) ORDER BY line_no) AS clean_text
             |  FROM r WHERE rn = 1 GROUP BY doc_id)
             |SELECT ld.doc_id,
             |  CAST(len(string_split(ld.text, chr(10))) AS BIGINT) AS n_lines,
             |  CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept,
             |  coalesce(k.clean_text, '') AS clean_text
             |FROM ld LEFT JOIN k USING (doc_id)
             |ORDER BY ld.doc_id""".stripMargin)),

    // ---- SEMANTIC dedup (SemDeDup-shaped): per-cluster doc/dup counts.
    //      Deterministic k-means + exact in-cluster cosine → pinned
    //      VALUES (fixture-guarded, the q72 pattern). ----
    "q92_semdedup" -> Q(
      (s, d) => {
        Tables.requirePinnedFixture(s, d, "embeddings",
          Tables.Sf001EmbeddingsFp, "q92_semdedup")
        val e = embs(s, d).select(col("vec_id").as("id"), col("embedding").as("vec"))
        semDedup(s, e)
          .groupBy("cell")
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("dup_of").isNotNull, 1L).otherwise(0L)).as("n_dups"))
          .orderBy("cell")
      },
      Some("""SELECT cell, CAST(n_docs AS BIGINT) AS n_docs,
             |  CAST(n_dups AS BIGINT) AS n_dups
             |FROM (VALUES (0, 33, 1), (1, 30, 3), (2, 32, 0), (3, 31, 3),
             |  (4, 37, 1), (5, 33, 3), (6, 28, 0), (7, 36, 0), (8, 40, 0),
             |  (9, 27, 1), (10, 36, 1), (11, 27, 2), (12, 24, 0), (13, 27, 2),
             |  (14, 31, 2), (15, 28, 1)) AS t(cell, n_docs, n_dups)
             |ORDER BY cell""".stripMargin)),

    // ---- semDedup soundness + recall vs the EXACT global near-dup set
    //      at the same threshold: every flagged dup must be a true dup
    //      (n_correct = n_found — the in-cluster cosine is exact), and
    //      clustering costs recall 20/53 = 0.377 HERE because this
    //      synthetic corpus has no true near-dups, only weak 0.4-cosine
    //      pairs that scatter across clusters; SemDeDup's regime is
    //      0.95+ near-identical docs, which co-cluster (SemDedupSpec
    //      proves planted near-dups are always caught). ----
    "q92_semdedup_sound" -> Q(
      (s, d) => {
        Tables.requirePinnedFixture(s, d, "embeddings",
          Tables.Sf001EmbeddingsFp, "q92_semdedup_sound")
        val e = embs(s, d).select(col("vec_id").as("id"), col("embedding").as("vec"))
        val found = semDedup(s, e)
          .filter(col("dup_of").isNotNull).select(col("id").as("ib"))
          .localCheckpoint()
        val a = e.select(col("id").as("ia"), col("vec").as("va"))
        val b = e.select(col("id").as("ib"), col("vec").as("vb"))
        val truth = a.join(b, col("ia") < col("ib"))
          .withColumn("cos",
            graft.functions.VecFunctions.vecCosine(s, col("va"), col("vb")))
          .filter(col("cos") >= 0.4)
          .select(col("ib")).distinct()
          .localCheckpoint()
        val nTrue = truth.count()
        val nFound = found.count()
        val nCorrect = found.join(truth, "ib").count()
        import s.implicits._
        Seq((nTrue, nFound, nCorrect, nCorrect * 1000L / nTrue))
          .toDF("n_true", "n_found", "n_correct", "recall_milli")
      },
      Some("""SELECT CAST(53 AS BIGINT) AS n_true, CAST(20 AS BIGINT) AS n_found,
             |  CAST(20 AS BIGINT) AS n_correct,
             |  CAST(377 AS BIGINT) AS recall_milli""".stripMargin)),
  )
}
