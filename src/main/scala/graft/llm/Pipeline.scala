package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.rel.RelQueries.Q
import graft.rel.Tables

/** END-TO-END RETRIEVAL PIPELINE — the composed chain a RAG/search
  * deployment actually runs, built entirely from the engine's own
  * stages: token-window CHUNK ([[Chunk.chunkDocuments]]) → BM25 over
  * chunks ([[Lexical.bm25Scores]]) collapsed to documents → RRF fusion
  * with the dense ANN ranking ([[Fusion.rrfFuse]]) → MMR
  * diversification ([[Mmr.mmrFromRanked]]-family) → ranking metrics
  * ([[Eval.rankingMetrics]]). Each stage is individually green
  * (q267/q102/q106/q272/q233); these entries exist to catch the
  * COMPOSITION drift the unit pins cannot — the q246 ER-pipeline and
  * q60 curation-pipeline precedent.
  *
  * Chunk-level lexical retrieval is the standard long-document shape:
  * BM25's length normalization saturates on long documents, so the
  * match signal lives in the best-matching WINDOW; scoring chunks and
  * taking each document's best chunk (max score) restores it.
  *
  * Scale shape (100 TB): chunking is one narrow pass; chunk-BM25
  * postings exist only for query terms (the broadcast-filter
  * discipline of [[Lexical.bm25TopK]]); the chunk→doc collapse is a
  * map-side-combinable max; every ranking is a bounded heap; fusion
  * and MMR touch |queries|·k rows. Nothing in the chain scales past
  * the corpus scan.
  *
  * Cross-engine determinism: every stage keeps its own contract
  * (rounded-before-rank scores, integer ranks, id tie-breaks), so the
  * fused ranking replays bit-for-bit in SQL; the MMR tail is the one
  * greedy stage with no SQL form — its entry VALUES-pins under the
  * fixture guard, exactly like q272.
  */
object Pipeline {

  /** Hybrid chunk-lexical + dense retrieval, RRF-fused.
    *
    * @param docs     (`id`, `text`) document table
    * @param queries  (qid, terms) lexical query batch
    * @param emb      (`id`, `vec`) embedding table sharing `docs`' id space
    * @param qvecs    (qid, qvec) dense query batch — SAME qid space as
    *                 `queries` (a system missing a qid simply
    *                 contributes nothing for it, RRF's absent-rank rule)
    * @param window   chunk window in tokens
    * @param stride   chunk stride in tokens
    * @param kPerSystem per-system ranking depth entering fusion
    * @param kFused   fused results per query
    * @return (qid int, rn, doc_id, rrf_r6) — [[Fusion.rrfFuse]]'s shape
    *
    * Chunk ids are doc_id·10⁶ + chunk_idx — valid while documents stay
    * under ~3·10⁷ tokens (10⁶ chunks at stride 30); the div recovers
    * the document for the collapse.
    */
  def hybridChunkRetrieve(s: SparkSession, docs: DataFrame,
      queries: Seq[(Int, Seq[String])], emb: DataFrame, qvecs: DataFrame,
      window: Int = 40, stride: Int = 30,
      kPerSystem: Int = 10, kFused: Int = 10,
      id: String = "doc_id", text: String = "text",
      embId: String = "id", embVec: String = "vec"): DataFrame = {
    val chunks = cidChunks(docs, window, stride, id, text)
    val chunkScores = Lexical.bm25Scores(s, chunks, queries,
      id = "cid", text = "chunk_text")
    val lexRank = lexDocRank(chunkScores, kPerSystem, id)
    val denseRank = Ann.cosineTopK(s, emb, qvecs, kPerSystem,
        id = embId, vec = embVec)
      .withColumnRenamed(embId, id)
    fuseRanked(lexRank, denseRank, kFused, id)
  }

  /** (cid, chunk_text) token windows with the doc_id·10⁶ + chunk_idx
    * cid packing — the one chunking both the scan path and the
    * persisted chunk index derive from, so their postings agree.
    */
  private def cidChunks(docs: DataFrame, window: Int, stride: Int,
      id: String, text: String): DataFrame =
    Chunk.chunkDocuments(docs, window, stride, id, text)
      // loud guard, not silent collision: a ≥10⁶-chunk document would
      // alias into the next doc_id's cid range
      .select(when(col("chunk_idx") >= 1000000L,
          raise_error(concat(lit("hybridChunkRetrieve: document "),
            col(id).cast("string"),
            lit(" exceeds 1e6 chunks — the doc_id*1e6+chunk_idx cid " +
              "packing would collide; raise the stride or re-pack"))))
          .otherwise(col(id) * 1000000L + col("chunk_idx")).as("cid"),
        col("chunk_text"))

  /** chunk scores → document's best window → bounded per-query ranking */
  private def lexDocRank(chunkScores: DataFrame, kPerSystem: Int,
      id: String): DataFrame = {
    val docScores = chunkScores
      .select(col("qid"), expr("cid div 1000000").as(id), col("score_r6"))
      .groupBy("qid", id).agg(max("score_r6").as("best_r6"))
    graft.functions.TopK.perKeyTopK(docScores, kPerSystem, "qid", id, "best_r6")
  }

  private def fuseRanked(lexRank: DataFrame, denseRank: DataFrame,
      kFused: Int, id: String): DataFrame =
    Fusion.rrfFuse(Seq(lexRank, denseRank), kFused, id = id)
      .select(col("qid").cast("int").as("qid"), col("rn"), col(id),
        col("rrf_r6"))
      .orderBy("qid", "rn")

  /** Persist the CHUNK-level lexical index the probe-served pipeline
    * reads: the corpus is chunked once (same cid packing as
    * [[hybridChunkRetrieve]]) and [[Lexical.saveLexical]] lays the
    * chunk postings out bucket-partitioned. Build once, probe per
    * query batch — the index replaces the per-batch corpus
    * re-tokenization, which is the whole serving case at 100 TB.
    */
  def saveChunkLexical(s: SparkSession, docs: DataFrame, dir: String,
      window: Int = 40, stride: Int = 30, buckets: Int = 64,
      id: String = "doc_id", text: String = "text"): Unit =
    Lexical.saveLexical(s, cidChunks(docs, window, stride, id, text), dir,
      buckets, id = "cid", text = "chunk_text")

  /** Streaming MAINTENANCE of the chunk index: NEW documents chunk
    * with the same cid packing and append through
    * [[Lexical.appendLexicalStream]] — the full at-least-once /
    * compaction contract of the lexical lifecycle applies verbatim
    * (probe-side (term, cid) dedup; [[Lexical.compactLexical]] with
    * id = "cid" to refresh stats).
    */
  def appendChunkLexicalStream(s: SparkSession, stream: DataFrame,
      dir: String, checkpoint: String, window: Int = 40, stride: Int = 30,
      buckets: Int = 64, id: String = "doc_id", text: String = "text")
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val chunks = cidChunks(batch, window, stride, id, text)
        Lexical.appendLexicalBatch(s, chunks, dir, buckets,
          id = "cid", text = "chunk_text")
      }
      .option("checkpointLocation", checkpoint)
      .start()

  /** The SERVED form of [[hybridChunkRetrieve]]: lexical from a
    * persisted chunk index ([[saveChunkLexical]] →
    * [[Lexical.probeBm25Scores]] — only the query terms' bucket
    * partitions are read), dense from a persisted IVF index
    * ([[AnnIndex.saveIvf]] → [[AnnIndex.probeIvf]] — only the probed
    * cell partitions are read). Neither side touches the corpus: the
    * pipeline a RAG deployment actually serves, where the index build
    * is amortized across every query batch.
    *
    * Determinism: at `nProbe` ≥ the index's cell count the dense rung
    * scans every cell and is bit-identical to [[Ann.cosineTopK]], so
    * the whole fused output equals the scan-path pipeline
    * (PipelineProbeSpec pins it); at partial `nProbe` only dense POOL
    * MEMBERSHIP can differ — scores, collapse, fusion and tie-breaks
    * are the same code paths.
    */
  def hybridProbeRetrieve(s: SparkSession, lexDir: String, annDir: String,
      queries: Seq[(Int, Seq[String])], qvecs: DataFrame,
      kPerSystem: Int = 10, kFused: Int = 10, nProbe: Int = 6,
      buckets: Int = 64, id: String = "doc_id",
      qid: String = "qid", qvec: String = "qvec"): DataFrame =
    hybridProbeRetrieveFrom(s, lexDir, queries,
      AnnIndex.probeIvf(s, annDir, qvecs, kPerSystem, nProbe,
        qid = qid, qvec = qvec),
      kPerSystem, kFused, buckets, id)

  /** [[hybridProbeRetrieve]] with the dense rung pooled from a
    * persisted BINARY (1-bit) index — the smaller-footprint serving
    * rung ([[BinaryAnn.probeBinary]]: Hamming shortlist of `rerank`,
    * exact cosine re-rank). Pool membership is the only degree of
    * freedom vs the IVF or brute rungs, exactly as documented there.
    */
  def hybridProbeRetrieveBinary(s: SparkSession, lexDir: String,
      binDir: String, queries: Seq[(Int, Seq[String])], qvecs: DataFrame,
      kPerSystem: Int = 10, kFused: Int = 10, rerank: Int = 50,
      buckets: Int = 64, id: String = "doc_id"): DataFrame =
    hybridProbeRetrieveFrom(s, lexDir, queries,
      BinaryAnn.probeBinary(s, binDir, qvecs, kPerSystem, rerank),
      kPerSystem, kFused, buckets, id)

  /** the shared served composition over ANY dense ranking (qid, rn,
    * id, …) — the source-parameterized form the r11 verdict asked for:
    * brute ([[hybridChunkRetrieve]]), IVF, or binary rungs all fuse
    * through one code path
    */
  def hybridProbeRetrieveFrom(s: SparkSession, lexDir: String,
      queries: Seq[(Int, Seq[String])], denseRank0: DataFrame,
      kPerSystem: Int, kFused: Int, buckets: Int,
      id: String): DataFrame = {
    val chunkScores = Lexical.probeBm25Scores(s, lexDir, queries,
      buckets, id = "cid")
    val lexRank = lexDocRank(chunkScores, kPerSystem, id)
    val denseRank = denseRank0.withColumnRenamed("id", id)
    fuseRanked(lexRank, denseRank, kFused, id)
  }

  /** The served full chain: [[hybridProbeRetrieve]] → MMR (diversity
    * vectors from the IVF index's own id→vec store, never the corpus)
    * → ranking metrics. The probe-served twin of
    * [[retrieveDiversifyEval]], same integer-micro relevance and
    * left-join diversity-neutral rule.
    */
  def retrieveDiversifyEvalProbe(s: SparkSession, lexDir: String,
      annDir: String, queries: Seq[(Int, Seq[String])], qvecs: DataFrame,
      qrels: DataFrame, k: Int, lambdaMilli: Int = 700,
      kPerSystem: Int = 10, kFused: Int = 10, nProbe: Int = 6,
      buckets: Int = 64, id: String = "doc_id"): DataFrame = {
    val fused = hybridProbeRetrieve(s, lexDir, annDir, queries, qvecs,
      kPerSystem, kFused, nProbe, buckets, id)
    // multi-assignment stores one (id, vec) row per cell — bit-identical
    // copies, collapsed so the pool join can't duplicate a candidate
    val vectors = s.read.parquet(s"$annDir/assignments")
      .select(col("id"), col("vec")).dropDuplicates("id")
    val pool = fused.select(col("qid").cast("long").as("qid"),
        col(id).cast("long").as("id"),
        round(col("rrf_r6") * 1000000, 0).cast("long").as("rel_milli"))
      .join(vectors, Seq("id"), "left")
      .withColumn("vec", coalesce(col("vec"), array().cast("array<float>")))
    val picked = Mmr.mmrSelect(s, pool, k, lambdaMilli)
      .select(col("qid"), col("id").as(id), col("pick_rank").as("rn"))
    Eval.rankingMetrics(s, picked, qrels, k, id)
  }

  /** The diversify-and-measure tail: MMR over the fused pool (relevance
    * = RRF score in integer MICRO-units — RRF scores live in
    * [1/(c+k), systems/c], so milli quantization would collapse them),
    * then ranking metrics of the diversified list.
    * Returns (qid, n_rel, prec_r6, rec_r6, mrr_r6, ndcg_r6).
    */
  def retrieveDiversifyEval(s: SparkSession, docs: DataFrame,
      queries: Seq[(Int, Seq[String])], emb: DataFrame, qvecs: DataFrame,
      qrels: DataFrame, k: Int, lambdaMilli: Int = 700,
      window: Int = 40, stride: Int = 30,
      kPerSystem: Int = 10, kFused: Int = 10,
      id: String = "doc_id", text: String = "text",
      embId: String = "id", embVec: String = "vec"): DataFrame = {
    val fused = hybridChunkRetrieve(s, docs, queries, emb, qvecs,
      window, stride, kPerSystem, kFused, id, text, embId, embVec)
    val pool = fused.select(col("qid").cast("long").as("qid"),
        col(id).cast("long").as("id"),
        round(col("rrf_r6") * 1000000, 0).cast("long").as("rel_milli"))
      // LEFT join (the mmrFromRanked rule): a lexical-only hit with no
      // embedding row enters the MMR stage diversity-neutral rather
      // than silently dropping out of the final ranking
      .join(emb.select(col(embId).as("id"), col(embVec).as("vec")),
        Seq("id"), "left")
      .withColumn("vec", coalesce(col("vec"), array().cast("array<float>")))
    val picked = Mmr.mmrSelect(s, pool, k, lambdaMilli)
      .select(col("qid"), col("id").as(id), col("pick_rank").as("rn"))
    Eval.rankingMetrics(s, picked, qrels, k, id)
  }

  // ------------------------------------------------------------------
  // driver entries
  // ------------------------------------------------------------------

  private def queryBatch = Lexical.demoQueries

  private def denseQueries(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d).filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))

  /** one chunk-lexical + IVF index build per dataset for q342 (the
    * q103 `indexDirFor` pattern)
    */
  private val builtIdx = scala.collection.concurrent.TrieMap[String, String]()
  private val ServedCells = 16

  private def servedDirsFor(s: SparkSession, d: String): String =
    builtIdx.getOrElseUpdate(d, {
      val work = java.nio.file.Files.createTempDirectory("graft-q342")
      sys.addShutdownHook {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm))
          f.delete(); ()
        }
        rm(work.toFile)
      }
      saveChunkLexical(s,
        Tables.documents(s, d).select(col("doc_id"), col("text")),
        s"$work/lex")
      AnnIndex.saveIvf(s,
        Tables.embeddings(s, d)
          .select(col("vec_id").as("id"), col("embedding").as("vec")),
        s"$work/ann", cells = ServedCells)
      work.toString
    })

  /** the shared q275/q342 oracle: replays chunking, chunk-BM25,
    * best-window collapse, exact dense ranking and RRF arithmetic —
    * q342's full-probe serve is bit-identical to the scan path by
    * construction, so one SQL replays both
    */
  private val pipelineOracleSql =
    """WITH t AS (SELECT doc_id,
             |    regexp_split_to_array(trim(text), '\s+') AS toks
             |  FROM documents),
             |c AS (SELECT doc_id, toks, len(toks) AS n, u.s AS s
             |  FROM t, UNNEST(range(0, len(toks), 30)) AS u(s)),
             |ck AS (SELECT doc_id, s // 30 AS chunk_idx,
             |    list_filter(list_transform(toks[s + 1 : least(s + 40, n)],
             |      x -> lower(x)), x -> len(x) > 0) AS w
             |  FROM c),
             |dl AS (SELECT doc_id, chunk_idx, len(w) AS len, w FROM ck),
             |stats AS (SELECT count(*) AS n_docs, avg(len) AS avg_len FROM dl),
             |post AS (SELECT term, doc_id, chunk_idx, len, count(*) AS tf
             |  FROM (SELECT doc_id, chunk_idx, len, unnest(w) AS term FROM dl) u
             |  WHERE term IN ('join','hash','vector','scan','filter','customer')
             |  GROUP BY term, doc_id, chunk_idx, len),
             |dfd AS (SELECT term, count(*) AS df FROM post GROUP BY term),
             |q(qid, term) AS (VALUES (0,'join'),(0,'hash'),(1,'vector'),
             |  (1,'scan'),(1,'filter'),(2,'customer')),
             |sc AS (SELECT q.qid, p.doc_id, p.chunk_idx,
             |    round(sum(ln(1.0 + (s.n_docs - d.df + 0.5)/(d.df + 0.5))
             |      * (p.tf * 2.2)
             |      / (p.tf + 1.2 * (0.25 + 0.75 * p.len / s.avg_len))), 6)
             |      AS score_r6
             |  FROM post p JOIN dfd d USING (term) JOIN q USING (term)
             |  CROSS JOIN stats s
             |  GROUP BY q.qid, p.doc_id, p.chunk_idx),
             |dc AS (SELECT qid, doc_id, max(score_r6) AS best_r6
             |  FROM sc GROUP BY 1, 2),
             |lexr AS (SELECT qid, doc_id,
             |    row_number() OVER (PARTITION BY qid
             |      ORDER BY best_r6 DESC, doc_id) AS rn
             |  FROM dc),
             |vecr AS (SELECT qid, vec_id,
             |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rn
             |  FROM (SELECT q.vec_id AS qid, e.vec_id,
             |      list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))
             |      / (sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])))
             |         * sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))) AS cos
             |    FROM embeddings q JOIN embeddings e
             |      ON q.vec_id < 3 AND e.vec_id != q.vec_id) s0),
             |u2 AS (SELECT qid, doc_id, rn FROM lexr WHERE rn <= 10
             |  UNION ALL SELECT qid, vec_id AS doc_id, rn FROM vecr WHERE rn <= 10),
             |f AS (SELECT qid, doc_id,
             |    round(sum(CAST(1.0 AS DOUBLE) / (60 + rn)), 6) AS rrf_r6
             |  FROM u2 GROUP BY qid, doc_id),
             |r AS (SELECT qid, doc_id, rrf_r6,
             |    row_number() OVER (PARTITION BY qid
             |      ORDER BY rrf_r6 DESC, doc_id) AS rn
             |  FROM f)
             |SELECT CAST(qid AS INT) AS qid, CAST(rn AS INT) AS rn, doc_id, rrf_r6
             |FROM r WHERE rn <= 10 ORDER BY qid, rn""".stripMargin

  val all: ListMap[String, Q] = ListMap(
    // ---- q275: the replayable half of the pipeline — chunk → BM25
    //      over chunks → best-window doc collapse → RRF with the exact
    //      dense ranking. ONE nested SQL oracle replays every stage:
    //      the q267 chunk CTE feeding the q102 BM25 chain feeding the
    //      q106 fusion arithmetic. ----
    "q275_retrieval_pipeline" -> Q(
      (s, d) => hybridChunkRetrieve(s,
        Tables.documents(s, d).select(col("doc_id"), col("text")),
        queryBatch,
        Tables.embeddings(s, d).select(col("vec_id"), col("embedding")),
        denseQueries(s, d), embId = "vec_id", embVec = "embedding"),
      Some(pipelineOracleSql)),

    // ---- q342: the SERVED pipeline — the same retrieve, pooling
    //      lexical from the persisted chunk index and dense from the
    //      persisted IVF index, probing ALL cells so the dense rung is
    //      exact and the q275 oracle replays the whole fused output
    //      bit-for-bit. What the entry proves: the serve path (pruned
    //      bucket reads + pruned cell reads, corpus never touched)
    //      reproduces the scan path exactly. ----
    "q342_retrieval_pipeline_served" -> Q(
      (s, d) => {
        val work = servedDirsFor(s, d)
        hybridProbeRetrieve(s, s"$work/lex", s"$work/ann", queryBatch,
          denseQueries(s, d), nProbe = ServedCells)
      },
      Some(pipelineOracleSql)),

    // ---- q276: the full chain's tail — MMR diversification of the
    //      q275 pool (λ=0.7, k=5, RRF-micro relevance) measured by
    //      rankingMetrics@5 against the q233 term-match qrels. The
    //      greedy MMR stage has no SQL replay, so the 3-row metric dump
    //      VALUES-pins under BOTH fixture guards (q272's rule). ----
    "q276_retrieval_pipeline_mmr" -> Q(
      (s, d) => {
        Tables.requirePinnedFixture(s, d, "documents",
          Tables.Sf001DocumentsFp, "q276_retrieval_pipeline_mmr")
        Tables.requirePinnedFixture(s, d, "embeddings",
          Tables.Sf001EmbeddingsFp, "q276_retrieval_pipeline_mmr")
        val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
        retrieveDiversifyEval(s, docs, queryBatch,
          Tables.embeddings(s, d).select(col("vec_id"), col("embedding")),
          denseQueries(s, d),
          Eval.termMatchQrels(s, docs, queryBatch), k = 5,
          embId = "vec_id", embVec = "embedding")
      },
      Some("""SELECT qid, n_rel, CAST(p AS DOUBLE) AS prec_r6,
             |  CAST(r AS DOUBLE) AS rec_r6, CAST(m AS DOUBLE) AS mrr_r6,
             |  CAST(n AS DOUBLE) AS ndcg_r6
             |FROM (VALUES (0, 322, 0.6, 0.009317, 1.0, 0.759964),
             |  (1, 280, 1.0, 0.017857, 1.0, 1.0),
             |  (2, 394, 1.0, 0.01269, 1.0, 1.0))
             |  AS t(qid, n_rel, p, r, m, n)
             |ORDER BY qid""".stripMargin)),

    // ---- q351: the SERVED full chain — q276's retrieve → MMR →
    //      metrics, pooling from the persisted indexes (diversity
    //      vectors from the IVF id→vec store, never the corpus). At
    //      full probe the pools equal the scan path's, MMR relevance
    //      uses the same fused RRF micros, and the metric rows land on
    //      q276's exact VALUES pins — the composed serve is
    //      end-to-end indistinguishable from the batch chain. ----
    "q351_retrieval_pipeline_served_mmr" -> Q(
      (s, d) => {
        Tables.requirePinnedFixture(s, d, "documents",
          Tables.Sf001DocumentsFp, "q351_retrieval_pipeline_served_mmr")
        Tables.requirePinnedFixture(s, d, "embeddings",
          Tables.Sf001EmbeddingsFp, "q351_retrieval_pipeline_served_mmr")
        val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
        val work = servedDirsFor(s, d)
        retrieveDiversifyEvalProbe(s, s"$work/lex", s"$work/ann",
          queryBatch, denseQueries(s, d),
          Eval.termMatchQrels(s, docs, queryBatch), k = 5,
          nProbe = ServedCells)
      },
      Some("""SELECT qid, n_rel, CAST(p AS DOUBLE) AS prec_r6,
             |  CAST(r AS DOUBLE) AS rec_r6, CAST(m AS DOUBLE) AS mrr_r6,
             |  CAST(n AS DOUBLE) AS ndcg_r6
             |FROM (VALUES (0, 322, 0.6, 0.009317, 1.0, 0.759964),
             |  (1, 280, 1.0, 0.017857, 1.0, 1.0),
             |  (2, 394, 1.0, 0.01269, 1.0, 1.0))
             |  AS t(qid, n_rel, p, r, m, n)
             |ORDER BY qid""".stripMargin)))
}
