package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.rel.RelQueries.Q
import graft.rel.Tables

/** MAXIMAL MARGINAL RELEVANCE re-ranking (Carbonell & Goldstein,
  * SIGIR'98): from a relevance-ranked candidate pool, greedily select k
  * results maximizing λ·rel(c) − (1−λ)·max_{s∈S} sim(c, s) — the
  * standard RAG/search diversifier (near-duplicate top hits collapse to
  * one representative; coverage of distinct result modes wins).
  *
  * Exactness discipline: relevance and pairwise similarity are rounded
  * to integer MILLI-units once, and the greedy recurrence runs in pure
  * integer arithmetic with ties broken by candidate id — bit-identical
  * on any engine/JVM, so the driver entry is VALUES-pinnable.
  *
  * Scale shape (100 TB): the candidate pool per query is a bounded
  * top-N heap over the corpus scan (never the corpus itself); the
  * greedy selection touches only N ≤ a few dozen rows per query,
  * grouped per qid on executors — no driver loop, no cross-query
  * state. Work per query is O(N·k) similarity probes over vectors that
  * arrived with the candidates.
  */
object Mmr {

  /** Greedy MMR over per-query candidate pools.
    *
    * @param cands (qid, id, relMilli, vec) candidate rows — relevance
    *              already in milli-units (e.g. `round(1000·cos)`), each
    *              row carrying its embedding for the diversity probes
    * @param k     results to select per query
    * @param lambdaMilli λ in milli-units (700 = 0.7 relevance weight)
    * @return (qid, pick_rank, id, mmr_milli) — pick_rank 1..k in
    *         selection order; mmr_milli the integer score at selection
    *         time (rank-1 score = λ·rel since S is empty)
    */
  def mmrSelect(s: SparkSession, cands: DataFrame, k: Int,
      lambdaMilli: Int = 700, qid: String = "qid", id: String = "id",
      relMilli: String = "rel_milli", vec: String = "vec"): DataFrame = {
    require(lambdaMilli >= 0 && lambdaMilli <= 1000,
      s"lambdaMilli in [0,1000]: $lambdaMilli")
    import s.implicits._
    val rows = cands
      .select(col(qid).cast("long"), col(id).cast("long"),
        col(relMilli).cast("long"), col(vec).cast("array<float>"))
      .as[(Long, Long, Long, Seq[Float])]
    rows.groupByKey(_._1)
      .flatMapGroups { (q, it) =>
        // candidate order is made canonical (by id) so the greedy scan
        // is deterministic regardless of arrival order
        val cs = it.map { case (_, i, r, v) => (i, r, v.toArray) }
          .toArray.sortBy(_._1)
        val n = cs.length
        def simMilli(a: Array[Float], b: Array[Float]): Long = {
          if (a.isEmpty || b.isEmpty) return 0L // vector-less candidate
          var d = 0.0; var na = 0.0; var nb = 0.0; var j = 0
          while (j < a.length) {
            d += a(j).toDouble * b(j); na += a(j).toDouble * a(j)
            nb += b(j).toDouble * b(j); j += 1
          }
          if (na == 0 || nb == 0) 0L
          else math.round(1000.0 * d / (math.sqrt(na) * math.sqrt(nb)))
        }
        val picked = new Array[Int](math.min(k, n))
        val maxSim = Array.fill(n)(0L)  // max sim to the selected set
        val used = new Array[Boolean](n)
        val out = Seq.newBuilder[(Long, Int, Long, Long)]
        var r = 0
        while (r < picked.length) {
          var best = -1; var bestScore = Long.MinValue
          var i = 0
          while (i < n) {
            if (!used(i)) {
              val sc = lambdaMilli * cs(i)._2 -
                (if (r == 0) 0L else (1000L - lambdaMilli) * maxSim(i))
              // strict > with an id-ascending scan = smallest id wins ties
              if (sc > bestScore) { bestScore = sc; best = i }
            }
            i += 1
          }
          used(best) = true
          picked(r) = best
          out += ((q, r + 1, cs(best)._1, bestScore))
          i = 0
          while (i < n) {
            if (!used(i)) {
              val sm = simMilli(cs(i)._3, cs(best)._3)
              if (sm > maxSim(i)) maxSim(i) = sm
            }
            i += 1
          }
          r += 1
        }
        out.result().iterator
      }
      .toDF(qid, "pick_rank", id, "mmr_milli")
  }

  /** Convenience: brute top-N relevance pool → MMR top-k, for queries
    * and corpus in one embedding table layout (id, vec).
    */
  def mmrTopK(s: SparkSession, emb: DataFrame, queries: DataFrame,
      k: Int, poolSize: Int, lambdaMilli: Int = 700,
      id: String = "id", vec: String = "vec",
      qid: String = "qid", qvec: String = "qvec"): DataFrame =
    mmrFromRanked(s,
      Ann.cosineTopK(s, emb, queries, poolSize,
        id = id, vec = vec, qid = qid, qvec = qvec),
      emb, k, lambdaMilli, id = id, vec = vec, qid = qid)

  /** The SERVING form: MMR over ANY relevance-ranked pool (`qid`, `id`,
    * `cos`) — typically a persisted-index probe ([[AnnIndex.probeIvf]],
    * [[BinaryAnn.probeBinary]]), whose bounded top-`poolSize` output
    * already carries exact cosine relevance; `vectors` supplies the
    * embeddings for the diversity probes (the index's own id→vec store,
    * so serving never touches the training corpus). Pool membership is
    * the only thing that can differ from the brute path — at equal
    * pools the selection is bit-identical (MmrSpec pins it).
    */
  def mmrFromRanked(s: SparkSession, ranked: DataFrame, vectors: DataFrame,
      k: Int, lambdaMilli: Int = 700, id: String = "id",
      vec: String = "vec", qid: String = "qid"): DataFrame = {
    val pool = ranked
      .select(col(qid), col(id),
        round(col("cos") * 1000, 0).cast("long").as("rel_milli"))
      // LEFT join: a ranked candidate missing from the vector store
      // stays in the pool as diversity-neutral (empty vec → sim 0 — the
      // zero-norm rule in mmrSelect) instead of silently vanishing from
      // the diversified list
      .join(vectors.select(col(id), col(vec)), Seq(id), "left")
      .withColumn(vec, coalesce(col(vec), array().cast("array<float>")))
    mmrSelect(s, pool, k, lambdaMilli, qid = qid, id = id, vec = vec)
      .orderBy(qid, "pick_rank")
  }

  /** MMR pooled from a persisted binary (1-bit) ANN index probe —
    * diversity vectors read from the index's `vectors/` store.
    */
  def mmrProbeBinary(s: SparkSession, dir: String, queries: DataFrame,
      k: Int, poolSize: Int, rerank: Int, lambdaMilli: Int = 700): DataFrame =
    mmrFromRanked(s, BinaryAnn.probeBinary(s, dir, queries, poolSize, rerank),
      s.read.parquet(s"$dir/vectors"), k, lambdaMilli)

  /** MMR pooled from a persisted IVF index probe — diversity vectors
    * read from the index's cell-partitioned assignments store.
    */
  def mmrProbeIvf(s: SparkSession, dir: String, queries: DataFrame,
      k: Int, poolSize: Int, nProbe: Int = 6, lambdaMilli: Int = 700): DataFrame =
    mmrFromRanked(s, AnnIndex.probeIvf(s, dir, queries, poolSize, nProbe),
      // multi-assignment stores one (id, vec) row per cell — the copies
      // are bit-identical, collapsed so the pool join can't duplicate a
      // candidate into two greedy slots
      s.read.parquet(s"$dir/assignments").select(col("id"), col("vec"))
        .dropDuplicates("id"),
      k, lambdaMilli)

  val all: ListMap[String, Q] = ListMap(
    // ---- q272: MMR-diversified retrieval — queries vec_id < 5, pool =
    //      exact top-20 by cosine, λ = 0.7, select 8. Integer-milli
    //      greedy recurrence (ties → smaller id) makes the 40-row dump
    //      VALUES-pinnable under the embeddings fixture guard; the
    //      greedy semantics are spec-pinned on constructed fixtures
    //      (MmrSpec), including the λ=1000 ≡ plain top-k identity. ----
    "q272_mmr_rerank" -> Q(
      (s, d) => {
        Tables.requirePinnedFixture(s, d, "embeddings",
          Tables.Sf001EmbeddingsFp, "q272_mmr_rerank")
        val e = Tables.embeddings(s, d)
          .select(col("vec_id").as("id"), col("embedding").as("vec"))
        val q = Tables.embeddings(s, d).filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        mmrTopK(s, e, q, k = 8, poolSize = 20)
      },
      Some("""SELECT qid, pick_rank, id, mmr_milli FROM (VALUES
             |  (0, 1, 365, 259000), (0, 2, 73, 195100),
             |  (0, 3, 387, 190300), (0, 4, 483, 179900),
             |  (0, 5, 334, 171600), (0, 6, 423, 170700),
             |  (0, 7, 464, 154000), (0, 8, 320, 133500),
             |  (1, 1, 386, 259700), (1, 2, 407, 203100),
             |  (1, 3, 363, 182000), (1, 4, 402, 181600),
             |  (1, 5, 27, 181200), (1, 6, 64, 160600),
             |  (1, 7, 312, 154300), (1, 8, 195, 140900),
             |  (2, 1, 117, 222600), (2, 2, 450, 179600),
             |  (2, 3, 112, 171500), (2, 4, 97, 155700),
             |  (2, 5, 188, 145700), (2, 6, 145, 141800),
             |  (2, 7, 459, 126100), (2, 8, 320, 124500),
             |  (3, 1, 130, 280000), (3, 2, 149, 216000),
             |  (3, 3, 343, 205400), (3, 4, 207, 184300),
             |  (3, 5, 315, 181500), (3, 6, 231, 167600),
             |  (3, 7, 463, 147900), (3, 8, 174, 126100),
             |  (4, 1, 114, 279300), (4, 2, 408, 222200),
             |  (4, 3, 496, 197300), (4, 4, 249, 196000),
             |  (4, 5, 89, 167900), (4, 6, 482, 131600),
             |  (4, 7, 257, 130700), (4, 8, 269, 128200))
             |  AS t(qid, pick_rank, id, mmr_milli)
             |ORDER BY qid, pick_rank""".stripMargin)))
}
