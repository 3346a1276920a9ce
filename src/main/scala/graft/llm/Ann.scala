package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Library-shaped similarity search over caller DataFrames — the public
  * API behind the q37/q38 driver entries. Inputs: `emb` with (`id`:
  * long, `vec`: array<float>) and `queries` with (`qid`: long, `qvec`:
  * array<float>); column names are parameters so existing tables plug in
  * unrenamed. The query side is broadcast in all paths — ANN serves many
  * small probe batches against one large corpus.
  */
object Ann {

  private def cosine(s: SparkSession, a: Column, b: Column): Column =
    graft.functions.VecFunctions.vecCosine(s, a, b)

  /** Exact cosine top-k per query: broadcast nested-loop over the corpus
    * + bounded-heap per-query top-k ([[graft.functions.TopK]] — map-side
    * partial selection, no per-query global sort). The O(n·q) baseline
    * every approximate path is measured against; right whenever q is
    * small.
    *
    * `excludeSelfId` (default true) drops corpus rows whose `id` equals
    * the probing `qid` — correct when queries ARE corpus members (the
    * self-match is a trivial cos=1). Pass false when query ids live in
    * an independent namespace, or an unrelated corpus row that happens
    * to share the id number would be silently excluded.
    */
  def cosineTopK(s: SparkSession, emb: DataFrame, queries: DataFrame, k: Int,
      id: String = "id", vec: String = "vec",
      qid: String = "qid", qvec: String = "qvec",
      excludeSelfId: Boolean = true): DataFrame = {
    val cond = if (excludeSelfId) col(id) =!= col(qid) else lit(true)
    val scored = broadcast(queries.select(col(qid), col(qvec)))
      .join(emb.select(col(id), col(vec)), cond)
      .withColumn("cos", cosine(s, col(qvec), col(vec)))
    graft.functions.TopK.perKeyTopK(scored, k, qid, id, "cos")
      .orderBy(qid, "rn")
  }

  /** Approximate cosine top-k via the multi-table hyperplane LSH family
    * (8 tables × 4 planes, SketchOps.annSigs): candidates collide with
    * the query's bucket in ≥1 table, then re-rank by exact cosine.
    * Measured recall@5 = 0.875 on a near-uniform corpus (AnnRecallSpec);
    * higher on clustered real embeddings. Scales as one explode + one
    * bucket equi-join — the n² pair space is never formed.
    */
  def lshTopK(s: SparkSession, emb: DataFrame, queries: DataFrame, k: Int,
      id: String = "id", vec: String = "vec",
      qid: String = "qid", qvec: String = "qvec",
      excludeSelfId: Boolean = true): DataFrame = {
    import s.implicits._
    val sigged = emb.select(col(id), col(vec)).as[(Long, Seq[Float])]
      .map { case (i, v) => (i, SketchOps.annSigs(v)) }
      .toDF(id, "sigs")
      .select(col(id), posexplode(col("sigs")).as(Seq("t", "bucket")))
    val probes = queries.select(col(qid), col(qvec)).as[(Long, Seq[Float])]
      .flatMap { case (q, v) =>
        SketchOps.annSigs(v).zipWithIndex.map { case (b, t) => (q, t, b) }
      }
      .toDF(qid, "t", "bucket")
    val cand = broadcast(probes).join(sigged, Seq("t", "bucket"))
      .filter(if (excludeSelfId) col(id) =!= col(qid) else lit(true))
      .select(col(qid), col(id)).distinct()
    val scored = cand.join(emb.select(col(id), col(vec)), id)
      .join(broadcast(queries.select(col(qid), col(qvec))), qid)
      .withColumn("cos", cosine(s, col(qvec), col(vec)))
    graft.functions.TopK.perKeyTopK(scored, k, qid, id, "cos")
      .orderBy(qid, "rn")
  }

  /** Approximate cosine top-k via IVF cell pruning ([[IvfOps.ivfTopK]]):
    * distributed k-means coarse quantizer, multiple assignment, probe of
    * the `nProbe` nearest cells, exact re-rank of the survivors. The
    * facade keeps one front door for every search strategy — parameters
    * and output schema (qid, rn, id, cos, n_candidates) are the kernel's.
    */
  def ivfTopK(s: SparkSession, emb: DataFrame, queries: DataFrame, k: Int,
      cells: Int = 16, iters: Int = 3, nProbe: Int = 6, multiAssign: Int = 2,
      id: String = "id", vec: String = "vec",
      qid: String = "qid", qvec: String = "qvec",
      excludeSelfId: Boolean = true): DataFrame =
    IvfOps.ivfTopK(s, emb, queries, k, cells, iters, nProbe, multiAssign,
      excludeSelfId, id, vec, qid, qvec)

  /** Approximate cosine top-k via product quantization + ADC scan with
    * exact re-rank ([[PqOps.pqTopK]]) — the compression path: 8-byte
    * codes instead of full vectors, for corpora whose vectors don't fit
    * but whose codes do. Output: (qid, rn, id, cos, n_candidates).
    */
  def pqTopK(s: SparkSession, emb: DataFrame, queries: DataFrame, k: Int,
      subQ: Int = 8, codes: Int = 16, iters: Int = 3, rerank: Int = 100,
      excludeSelfId: Boolean = true, maxProbeBatch: Int = 4096,
      id: String = "id", vec: String = "vec",
      qid: String = "qid", qvec: String = "qvec"): DataFrame =
    PqOps.pqTopK(s, emb, queries, k, subQ, codes, iters, rerank,
      excludeSelfId, maxProbeBatch, id, vec, qid, qvec)

  /** Approximate cosine top-k via OPTIMIZED product quantization
    * ([[OpqOps.opqTopK]]): a learned orthogonal rotation (trained on the
    * deterministic sample by alternating codebook fit and a Procrustes
    * step) applied before the PQ split, so cross-subspace correlation is
    * captured instead of wasted. Same output shape as [[pqTopK]].
    */
  def opqTopK(s: SparkSession, emb: DataFrame, queries: DataFrame, k: Int,
      subQ: Int = 8, codes: Int = 16, iters: Int = 3, rerank: Int = 100,
      opqIters: Int = 8,
      excludeSelfId: Boolean = true, maxProbeBatch: Int = 4096,
      id: String = "id", vec: String = "vec",
      qid: String = "qid", qvec: String = "qvec"): DataFrame =
    OpqOps.opqTopK(s, emb, queries, k, subQ, codes, iters, rerank, opqIters,
      excludeSelfId, maxProbeBatch, id, vec, qid, qvec)

  /** Approximate cosine top-k via IVFADC ([[IvfPqOps.ivfPqTopK]]): IVF
    * cell pruning composed with PQ residual codes — the 10⁹-vector
    * architecture (prune the scan AND compress what's scanned). Output:
    * (qid, rn, id, cos, n_candidates).
    */
  def ivfPqTopK(s: SparkSession, emb: DataFrame, queries: DataFrame, k: Int,
      cells: Int = 16, coarseIters: Int = 3, nProbe: Int = 6, multiAssign: Int = 2,
      subQ: Int = 8, codes: Int = 16, pqIters: Int = 3, rerank: Int = 100,
      excludeSelfId: Boolean = true, maxProbeBatch: Int = 4096,
      id: String = "id", vec: String = "vec",
      qid: String = "qid", qvec: String = "qvec"): DataFrame =
    IvfPqOps.ivfPqTopK(s, emb, queries, k, cells, coarseIters, nProbe,
      multiAssign, subQ, codes, pqIters, rerank, excludeSelfId,
      maxProbeBatch, id, vec, qid, qvec)

  /** Persist an IVF index (centroids + cell-partitioned assignments)
    * for the serving path ([[AnnIndex.saveIvf]]).
    */
  def saveIvfIndex(s: SparkSession, emb: DataFrame, dir: String,
      cells: Int = 16, iters: Int = 3, multiAssign: Int = 2,
      id: String = "id", vec: String = "vec"): Unit =
    AnnIndex.saveIvf(s, emb, dir, cells, iters, multiAssign, id, vec)

  /** Probe a saved IVF index — bit-identical to [[ivfTopK]] with the
    * same build parameters, but reads only the probed cells' partitions
    * ([[AnnIndex.probeIvf]]).
    */
  def probeIvfIndex(s: SparkSession, dir: String, queries: DataFrame, k: Int,
      nProbe: Int = 6, excludeSelfId: Boolean = true,
      id: String = "id", vec: String = "vec",
      qid: String = "qid", qvec: String = "qvec"): DataFrame =
    AnnIndex.probeIvf(s, dir, queries, k, nProbe, excludeSelfId, id, vec, qid, qvec)

  /** Persist an IVFADC index (coarse centroids, residual-PQ codebooks,
    * cell-partitioned codes, re-rank vectors, optional OPQ rotation)
    * ([[AnnIndex.saveIvfPq]]).
    */
  def saveIvfPqIndex(s: SparkSession, emb: DataFrame, dir: String,
      cells: Int = 16, coarseIters: Int = 3, multiAssign: Int = 2,
      subQ: Int = 8, codes: Int = 16, pqIters: Int = 3,
      id: String = "id", vec: String = "vec", opqIters: Int = 0): Unit =
    AnnIndex.saveIvfPq(s, emb, dir, cells, coarseIters, multiAssign,
      subQ, codes, pqIters, id, vec, opqIters)

  /** Probe a saved IVFADC index — bit-identical to [[ivfPqTopK]] with
    * the same build parameters ([[AnnIndex.probeIvfPq]]).
    */
  def probeIvfPqIndex(s: SparkSession, dir: String, queries: DataFrame, k: Int,
      nProbe: Int = 6, rerank: Int = 100, excludeSelfId: Boolean = true,
      maxProbeBatch: Int = 4096,
      id: String = "id", vec: String = "vec",
      qid: String = "qid", qvec: String = "qvec"): DataFrame =
    AnnIndex.probeIvfPq(s, dir, queries, k, nProbe, rerank, excludeSelfId,
      maxProbeBatch, id, vec, qid, qvec)

  /** Persist a flat-PQ index (codebooks + codes + re-rank vectors +
    * optional OPQ rotation) ([[AnnIndex.savePq]]).
    */
  def savePqIndex(s: SparkSession, emb: DataFrame, dir: String,
      subQ: Int = 8, codes: Int = 16, iters: Int = 3, opqIters: Int = 0,
      id: String = "id", vec: String = "vec"): Unit =
    AnnIndex.savePq(s, emb, dir, subQ, codes, iters, opqIters, id, vec)

  /** Probe a saved flat-PQ index — bit-identical to [[pqTopK]] (or
    * [[opqTopK]] when the index was saved with a rotation) with the
    * same build parameters ([[AnnIndex.probePq]]).
    */
  def probePqIndex(s: SparkSession, dir: String, queries: DataFrame, k: Int,
      rerank: Int = 100, excludeSelfId: Boolean = true,
      maxProbeBatch: Int = 4096,
      id: String = "id", vec: String = "vec",
      qid: String = "qid", qvec: String = "qvec"): DataFrame =
    AnnIndex.probePq(s, dir, queries, k, rerank, excludeSelfId,
      maxProbeBatch, id, vec, qid, qvec)
}
