package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.rel.RelQueries.Q
import graft.rel.Tables

/** CONTRASTIVE MINING + EMBEDDING-GRAPH operators — the training-data
  * side of the ANN stack: hard-negative mining for contrastive /
  * retrieval training, the exact mutual-kNN graph, semantic clustering
  * (components of that graph), and the IVF-bucketed approximate graph
  * for the 100 TB path.
  *
  * Scale shapes:
  *  - `hardNegatives` broadcasts the (small) query set and streams the
  *    corpus once through a bounded top-k heap — no corpus shuffle, no
  *    n² pair space (the q37 brute pattern with a label anti-filter).
  *  - `mutualKnn` (exact) IS all-pairs — it exists as the oracle anchor
  *    and small-corpus path; the 100 TB path is [[knnEdgesIvf]], whose
  *    pair space is the union of per-cell blocks (the same bucketed
  *    discipline as the LSH/IVF dedup entries: candidates share a
  *    coarse-quantizer cell, the cross-corpus n² is never formed).
  *  - `semanticClusters` feeds the (sparse, fragmented) mutual graph to
  *    the O(log n) star-contraction components machinery
  *    ([[graft.graph.ConnectedComponents]]) — cluster ids for semantic
  *    dedup at corpus scale.
  */
object Mining {

  private def cosine(s: SparkSession, a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column) =
    graft.functions.VecFunctions.vecCosine(s, a, b)

  /** Per query, the k most-similar corpus vectors whose label DIFFERS
    * from the query's — hard negatives for contrastive training
    * (in-batch negatives are easy; the near-miss other-class neighbors
    * carry the gradient). Queries ride a broadcast; the corpus is
    * scanned once into a bounded per-query heap.
    * Output: (qid, rn, id, cos).
    */
  def hardNegatives(s: SparkSession, emb: DataFrame, queries: DataFrame,
      k: Int, id: String = "id", vec: String = "vec",
      label: String = "label", qid: String = "qid", qvec: String = "qvec",
      qlabel: String = "qlabel"): DataFrame = {
    val scored = broadcast(queries.select(col(qid), col(qvec), col(qlabel)))
      .join(emb.select(col(id), col(vec), col(label)),
        col(id) =!= col(qid) && col(label) =!= col(qlabel))
      .withColumn("cos", cosine(s, col(qvec), col(vec)))
    graft.functions.TopK.perKeyTopK(scored, k, qid, id, "cos")
      .orderBy(qid, "rn")
  }

  /** Directed exact kNN edges (src, dst, rn) over one embedding table —
    * ties broken by dst id, same total order as the TopK aggregator and
    * the DuckDB `row_number` oracles. All-pairs: the oracle anchor and
    * small-corpus path; see [[knnEdgesIvf]] for the bucketed shape.
    */
  def knnEdges(s: SparkSession, emb: DataFrame, k: Int,
      id: String = "id", vec: String = "vec"): DataFrame =
    Ann.cosineTopK(s, emb,
        emb.select(col(id).as("__qid"), col(vec).as("__qvec")), k,
        id = id, vec = vec, qid = "__qid", qvec = "__qvec")
      .select(col("__qid").as("src"), col(id).as("dst"), col("rn"))

  /** Mutual-ize a directed (src, dst, rn) edge table: undirected edges
    * u < v where each endpoint lies in the other's top-k — one
    * self-equi-join on the (already k-bounded) edge set, so the join
    * input is n·k rows regardless of corpus size.
    */
  private def mutualize(e: DataFrame): DataFrame =
    e.as("l").join(e.as("r"),
        col("l.src") === col("r.dst") && col("l.dst") === col("r.src") &&
          col("l.src") < col("l.dst"))
      .select(col("l.src").as("u"), col("l.dst").as("v"),
        col("l.rn").as("rank_uv"), col("r.rn").as("rank_vu"))

  /** Mutual-kNN graph: undirected edges u < v where each endpoint lies
    * in the other's top-k. Output: (u, v, rank_uv, rank_vu) — pure
    * integers, fully portable across engines.
    */
  def mutualKnn(s: SparkSession, emb: DataFrame, k: Int,
      id: String = "id", vec: String = "vec"): DataFrame =
    mutualize(knnEdges(s, emb, k, id, vec))

  /** Mutual-ized [[knnEdgesIvf]] — the 100 TB mutual graph: per-cell
    * candidate pairs, bounded heaps, then the same n·k-bounded
    * mutualizing self-join as the exact path.
    */
  def mutualKnnIvf(s: SparkSession, emb: DataFrame, k: Int,
      cells: Int = 16, iters: Int = 3, multiAssign: Int = 2,
      id: String = "id", vec: String = "vec"): DataFrame =
    mutualize(knnEdgesIvf(s, emb, k, cells, iters, multiAssign, id, vec))

  /** IVF-bucketed approximate kNN edges — the 100 TB all-pairs shape:
    * train a coarse quantizer, multi-assign every vector to its
    * `multiAssign` nearest cells, and form candidate pairs ONLY inside
    * a cell (a self-equi-join on the cell key — per-cell blocks, the
    * cross-corpus n² never materializes; the same bucketed discipline
    * as the LSH dedup band join). Exact cosine re-rank inside the
    * bounded per-src top-k heap. Output: (src, dst, rn).
    *
    * SIZING: `cells` must grow with the corpus — cells ≈ n/B for a
    * target per-cell block B of a few hundred keeps the per-cell pair
    * space (multiAssign·n/cells)² CONSTANT per cell and the total pair
    * count LINEAR in n. A fixed cell count re-creates the quadratic
    * blow-up this operator exists to avoid (StressProbe measured 365 s
    * vs 15 s at 10× sf0.1 volume with cells frozen vs cells ∝ n — a
    * 24× wall from the sizing rule alone).
    */
  def knnEdgesIvf(s: SparkSession, emb: DataFrame, k: Int,
      cells: Int = 16, iters: Int = 3, multiAssign: Int = 2,
      id: String = "id", vec: String = "vec"): DataFrame = {
    val norm = IvfOps.normalized(s, emb, id, vec).cache()
    val cents = IvfOps.trainCentroids(s, norm, cells, iters)
    norm.unpersist()
    val assigned = IvfOps.assignRows(s, emb, cents, multiAssign, id, vec)
    val cand = assigned.as("a").join(assigned.as("b"),
        col("a.cell") === col("b.cell") &&
          col("a." + id) =!= col("b." + id))
      .select(col("a." + id).as("src"), col("b." + id).as("dst"),
        cosine(s, col("a." + vec), col("b." + vec)).as("cos"))
      // a pair can share several cells under multi-assignment —
      // bit-identical copies, collapsed map-side before the heap
      .groupBy("src", "dst").agg(max("cos").as("cos"))
    graft.functions.TopK.perKeyTopK(cand, k, "src", "dst", "cos")
      .select(col("src"), col("dst"), col("rn"))
  }

  /** Semantic clusters: connected components of the mutual-kNN graph,
    * singletons included (nodes in no mutual edge form their own
    * cluster). The mutual condition keeps the graph sparse and
    * fragmented — exactly the regime where cluster ids carry signal
    * for semantic dedup. Output: (node, comp_id, comp_size), comp_id =
    * min node id in the cluster.
    */
  def semanticClusters(s: SparkSession, emb: DataFrame, k: Int,
      id: String = "id", vec: String = "vec"): DataFrame =
    semanticClustersFromEdges(s, emb, mutualKnn(s, emb, k, id, vec), id)

  /** Semantic clusters over the IVF-bucketed mutual graph — the shape a
    * 100 TB corpus actually runs ([[mutualKnnIvf]] edges, same
    * star-contraction CC): the exact path's all-pairs scoring (and its
    * whole-corpus query broadcast) never happens. q274 pins cluster
    * agreement vs the exact path; MiningSpec pins exact ≡ IVF on
    * planted pods.
    */
  def semanticClustersIvf(s: SparkSession, emb: DataFrame, k: Int,
      cells: Int = 16, iters: Int = 3, multiAssign: Int = 2,
      id: String = "id", vec: String = "vec"): DataFrame =
    semanticClustersFromEdges(s, emb,
      mutualKnnIvf(s, emb, k, cells, iters, multiAssign, id, vec), id)

  /** THRESHOLD-ATTACH edges for corpus growth: undirected pairs u < v
    * with cosine ≥ tauMilli/1000 and AT LEAST ONE endpoint in `batch`
    * — the incremental-maintenance edge producer. Mutual-kNN RANKS
    * cannot be maintained incrementally (a new vector can evict an old
    * top-k member, so rank mutuality is non-monotone under appends); a
    * similarity THRESHOLD is monotone — appending vectors only ADDS
    * edges — which is exactly the merge-only contract
    * [[graft.graph.ConnectedComponents.incrementalComponents]] needs.
    * This is the production semantic-dedup maintenance pattern:
    * bootstrap clusters from the mutual graph, attach arrivals by
    * threshold, rebuild periodically to re-fragment.
    *
    * Brute form — pair space is |batch|·(n+|batch|) by construction
    * (the batch rides a broadcast; the corpus is scanned once), never
    * corpus n². Exact and SQL-replayable; the 100 TB shape for LARGE
    * batches is [[attachEdgesIvf]].
    */
  def attachEdges(s: SparkSession, corpus: DataFrame, batch: DataFrame,
      tauMilli: Int, id: String = "id", vec: String = "vec"): DataFrame = {
    require(tauMilli >= 0 && tauMilli <= 1000,
      s"tauMilli in [0,1000]: $tauMilli")
    val all = corpus.select(col(id), col(vec))
      .unionAll(batch.select(col(id), col(vec)))
    broadcast(batch.select(col(id).as("__bid"), col(vec).as("__bvec")))
      .join(all, col(id) =!= col("__bid"))
      .filter(cosine(s, col("__bvec"), col(vec)) >=
        lit(tauMilli).cast("double") / 1000)
      .select(least(col("__bid"), col(id)).cast("long").as("u"),
        greatest(col("__bid"), col(id)).cast("long").as("v"))
      // batch-batch pairs surface once from each endpoint's broadcast row
      .distinct()
  }

  /** IVF-bucketed [[attachEdges]] — the large-batch shape: corpus∪batch
    * multi-assigned to coarse cells, batch rows joined only against
    * their own cells' blocks (the [[knnEdgesIvf]] discipline and the
    * same cells ∝ n sizing rule), threshold filter inside the cell
    * join. Approximate exactly like the IVF graph: a pair whose
    * endpoints share no cell is missed — MiningSpec pins parity with
    * the brute form on planted pods.
    */
  def attachEdgesIvf(s: SparkSession, corpus: DataFrame, batch: DataFrame,
      tauMilli: Int, cells: Int = 16, iters: Int = 3, multiAssign: Int = 2,
      id: String = "id", vec: String = "vec"): DataFrame = {
    require(tauMilli >= 0 && tauMilli <= 1000,
      s"tauMilli in [0,1000]: $tauMilli")
    val all = corpus.select(col(id), col(vec))
      .unionAll(batch.select(col(id), col(vec)))
    val norm = IvfOps.normalized(s, all, id, vec).cache()
    val cents = IvfOps.trainCentroids(s, norm, cells, iters)
    norm.unpersist()
    val allA = IvfOps.assignRows(s, all, cents, multiAssign, id, vec)
    val batchA = IvfOps.assignRows(s, batch, cents, multiAssign, id, vec)
      .select(col("cell"), col(id).as("__bid"), col(vec).as("__bvec"))
    batchA.join(allA, Seq("cell"))
      .filter(col(id) =!= col("__bid") &&
        cosine(s, col("__bvec"), col(vec)) >=
          lit(tauMilli).cast("double") / 1000)
      .select(least(col("__bid"), col(id)).cast("long").as("u"),
        greatest(col("__bid"), col(id)).cast("long").as("v"))
      .distinct()
  }

  /** INCREMENTAL cluster maintenance: fold a new-embedding batch into
    * existing labels without re-clustering the corpus — batch nodes
    * enter as singletons, the attach edges merge components through
    * the quotient-sized
    * [[graft.graph.ConnectedComponents.incrementalComponents]] fold
    * (iterative work bounded by the BATCH's edge count, the corpus
    * label table touched by two hash joins). The result is exactly
    * CC over (bootstrap edges ∪ attach edges) — spec-pinned, and the
    * q277 oracle replays that union closure in SQL.
    */
  def clustersDeltaFromEdges(s: SparkSession, labels: DataFrame,
      batch: DataFrame, edges: DataFrame, id: String = "id"): DataFrame = {
    val lab = labels.select(col("node").cast("long").as("node"),
      col("comp_id").cast("long").as("comp_id"))
    val newNodes = batch.select(col(id).cast("long").as("node"))
      .join(lab.select("node"), Seq("node"), "left_anti")
      .select(col("node"), col("node").as("comp_id"))
    graft.graph.ConnectedComponents.incrementalComponents(s,
      lab.unionAll(newNodes), edges.select(col("u"), col("v")))
  }

  /** [[clustersDeltaFromEdges]] with brute [[attachEdges]] — the exact
    * small-batch path (and the q277 oracle anchor). */
  def clustersDelta(s: SparkSession, labels: DataFrame, corpus: DataFrame,
      batch: DataFrame, tauMilli: Int, id: String = "id",
      vec: String = "vec"): DataFrame =
    clustersDeltaFromEdges(s, labels, batch,
      attachEdges(s, corpus, batch, tauMilli, id, vec), id)

  /** [[clustersDeltaFromEdges]] with [[attachEdgesIvf]] — the 100 TB
    * large-batch path (same sizing rule as [[knnEdgesIvf]]). */
  def clustersDeltaIvf(s: SparkSession, labels: DataFrame,
      corpus: DataFrame, batch: DataFrame, tauMilli: Int,
      cells: Int = 16, iters: Int = 3, multiAssign: Int = 2,
      id: String = "id", vec: String = "vec"): DataFrame =
    clustersDeltaFromEdges(s, labels, batch,
      attachEdgesIvf(s, corpus, batch, tauMilli, cells, iters,
        multiAssign, id, vec), id)

  /** SemDeDup-style THRESHOLD CLUSTERING (Abbas et al., 2023: cluster
    * by embedding similarity, keep one representative per cluster):
    * components of the cos ≥ tauMilli/1000 graph over the WHOLE table,
    * with the keep rule surfaced as a column (`keep` = node is its
    * cluster's min id — the deterministic representative). Brute edge
    * scoring IS all-pairs: this form is the oracle anchor and
    * small-corpus path, exactly like [[mutualKnn]]; the 100 TB shape
    * is [[thresholdClustersIvf]].
    * Output: (node, comp_id, comp_size, keep).
    */
  def thresholdClusters(s: SparkSession, emb: DataFrame, tauMilli: Int,
      id: String = "id", vec: String = "vec"): DataFrame =
    withKeep(semanticClustersFromEdges(s, emb,
      attachEdges(s, emb.where(lit(false)), emb, tauMilli, id, vec), id))

  /** The 100 TB threshold clustering: IVF-celled edge scoring (the
    * [[attachEdgesIvf]] per-cell discipline under the cells ∝ n sizing
    * rule) into the same star-contraction CC — no all-pairs scoring,
    * no whole-corpus broadcast. MiningSpec pins parity with the brute
    * form on planted pods.
    */
  def thresholdClustersIvf(s: SparkSession, emb: DataFrame, tauMilli: Int,
      cells: Int = 16, iters: Int = 3, multiAssign: Int = 2,
      id: String = "id", vec: String = "vec"): DataFrame =
    withKeep(semanticClustersFromEdges(s, emb,
      attachEdgesIvf(s, emb.where(lit(false)), emb, tauMilli,
        cells, iters, multiAssign, id, vec), id))

  private def withKeep(clusters: DataFrame): DataFrame =
    clusters.withColumn("keep", col("node") === col("comp_id"))

  /** Components of ANY undirected (u, v) edge set over `emb`'s id
    * domain, singletons included — the edge source is the pluggable
    * part (exact mutual graph, IVF mutual graph, or a caller-built
    * similarity graph); the clustering is always the O(log n)
    * star-contraction.
    */
  def semanticClustersFromEdges(s: SparkSession, emb: DataFrame,
      edges: DataFrame, id: String = "id"): DataFrame = {
    val cc = graft.graph.ConnectedComponents.connectedComponents(s,
      edges.select(col("u"), col("v")))
    emb.select(col(id).cast("long").as("node"))
      .join(cc.withColumnRenamed("node", "__n"),
        col("node") === col("__n"), "left")
      .select(col("node"),
        coalesce(col("comp_id"), col("node")).cast("long").as("comp_id"),
        coalesce(col("comp_size"), lit(1L)).cast("long").as("comp_size"))
  }

  // ------------------------------------------------------------------
  // driver entries
  // ------------------------------------------------------------------

  private def embs(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)

  /** the exact-side SQL the q269/q270/q277 oracles share (and Eval's
    * q279 borrows): directed kNN ranks over the embeddings table
    * (row_number ties broken by vec_id — the TopK aggregator's total
    * order). `extra` restricts the pair domain (q277 ranks only the
    * pre-batch corpus). */
  private[llm] def knnRankSql(extra: String = "") = {
    val cos = """list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
      / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
         * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))))"""
    s"""r AS (
       |  SELECT a.vec_id AS src, b.vec_id AS dst,
       |    row_number() OVER (PARTITION BY a.vec_id
       |      ORDER BY $cos DESC, b.vec_id) AS rn
       |  FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id$extra)""".stripMargin
  }

  val all: ListMap[String, Q] = ListMap(
    // ---- q268: hard-negative mining — per query (vec_id < 8), the 5
    //      most-similar OTHER-label vectors; the contrastive-training
    //      negative sampler. Exact oracle, q37's IEEE-identical cosine
    //      chain with the label anti-filter. ----
    "q268_hard_negatives" -> Q(
      (s, d) => {
        val e = embs(s, d)
        val q = e.filter(col("vec_id") < 8)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"),
            col("label").as("qlabel"))
        hardNegatives(s,
          e.select(col("vec_id").as("id"), col("embedding").as("vec"),
            col("label")), q, 5)
      },
      Some("""SELECT qid, rn, id, cos FROM (
             |  SELECT q.vec_id AS qid, e.vec_id AS id,
             |    list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))
             |      / (sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])))
             |         * sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))) AS cos,
             |    row_number() OVER (PARTITION BY q.vec_id ORDER BY
             |      list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))
             |      / (sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])))
             |         * sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))) DESC,
             |      e.vec_id) AS rn
             |  FROM embeddings q JOIN embeddings e
             |    ON q.vec_id < 8 AND e.vec_id != q.vec_id AND e.label != q.label) t
             |WHERE rn <= 5 ORDER BY qid, rn""".stripMargin)),

    // ---- q269: exact mutual-3NN graph — integer-only output (ids +
    //      both directed ranks); the window oracle replays the same
    //      total order. ----
    "q269_mutual_knn" -> Q(
      (s, d) => mutualKnn(s,
          embs(s, d).select(col("vec_id").as("id"), col("embedding").as("vec")),
          3).orderBy("u", "v"),
      Some(s"""WITH ${knnRankSql()}
             |SELECT l.src AS u, l.dst AS v,
             |  CAST(l.rn AS INT) AS rank_uv, CAST(r2.rn AS INT) AS rank_vu
             |FROM r l JOIN r r2 ON l.src = r2.dst AND l.dst = r2.src
             |WHERE l.rn <= 3 AND r2.rn <= 3 AND l.src < l.dst
             |ORDER BY u, v""".stripMargin)),

    // ---- q270: semantic clusters — components of the mutual-2NN
    //      graph (k=2 keeps it fragmented: 98 clusters, max 14 nodes at
    //      sf0.01), singletons included. Oracle: recursive-CTE closure
    //      over the same SQL-computed mutual edges, min reachable id. ----
    "q270_semantic_clusters" -> Q(
      (s, d) => semanticClusters(s,
          embs(s, d).select(col("vec_id").as("id"), col("embedding").as("vec")),
          2).orderBy("node"),
      Some(s"""WITH RECURSIVE ${knnRankSql()},
             |me AS (SELECT l.src AS u, l.dst AS v
             |  FROM r l JOIN r r2 ON l.src = r2.dst AND l.dst = r2.src
             |  WHERE l.rn <= 2 AND r2.rn <= 2 AND l.src < l.dst),
             |sym AS (SELECT u, v FROM me UNION SELECT v, u FROM me),
             |reach(u, v) AS (
             |  SELECT u, v FROM sym
             |  UNION
             |  SELECT r3.u, s.v FROM reach r3 JOIN sym s ON r3.v = s.u),
             |allr AS (SELECT DISTINCT u, v FROM (
             |  SELECT u, v FROM reach
             |  UNION ALL SELECT u, u FROM sym)),
             |comp AS (SELECT u AS node, min(v) AS comp_id FROM allr GROUP BY u),
             |sz AS (SELECT comp_id, count(*) AS n FROM comp GROUP BY 1)
             |SELECT CAST(e.vec_id AS BIGINT) AS node,
             |  CAST(coalesce(c.comp_id, e.vec_id) AS BIGINT) AS comp_id,
             |  CAST(coalesce(sz.n, 1) AS BIGINT) AS comp_size
             |FROM embeddings e
             |LEFT JOIN comp c ON c.node = e.vec_id
             |LEFT JOIN sz ON sz.comp_id = c.comp_id
             |ORDER BY node""".stripMargin)),

    // ---- q271: the IVF-bucketed graph's recall vs the exact mutual
    //      graph — ONE integer row (exact edges, ivf edges, recovered:
    //      485/509 = 0.953 edge recall at 4-way cell assignment),
    //      VALUES-pinned under the embeddings fixture guard (the
    //      approximate side has no SQL replay; the exact side is q269).
    //      The analytic truth (per-cell pair space, recall level) is
    //      spec-pinned in MiningSpec. ----
    "q271_knn_graph_recall" -> Q(
      (s, d) => {
        Tables.requirePinnedFixture(s, d, "embeddings",
          Tables.Sf001EmbeddingsFp, "q271_knn_graph_recall")
        val e = embs(s, d).select(col("vec_id").as("id"),
          col("embedding").as("vec"))
        val exact = mutualKnn(s, e, 3).select("u", "v")
        val approx = {
          val a = knnEdgesIvf(s, e, 3, multiAssign = 4)
          a.as("l").join(a.as("r"),
              col("l.src") === col("r.dst") && col("l.dst") === col("r.src") &&
                col("l.src") < col("l.dst"))
            .select(col("l.src").as("u"), col("l.dst").as("v"))
        }
        val hit = exact.join(approx, Seq("u", "v"), "left_semi")
        exact.agg(count(lit(1)).as("n_exact"))
          .crossJoin(approx.agg(count(lit(1)).as("n_ivf")))
          .crossJoin(hit.agg(count(lit(1)).as("n_hit")))
          .select(col("n_exact").cast("long"), col("n_ivf").cast("long"),
            col("n_hit").cast("long"))
      },
      Some("""SELECT n_exact, n_ivf, n_hit FROM (VALUES (509, 514, 485))
             |  AS t(n_exact, n_ivf, n_hit)""".stripMargin)),

    // ---- q274: the 100 TB clustering path's agreement with the exact
    //      one — semanticClustersIvf (IVF mutual graph at 4-way cell
    //      assignment, k=2, the q270 parameters) vs semanticClusters
    //      (exact all-pairs), compared at the co-clustered-PAIR level
    //      (the label-free way to compare clusterings): ONE integer
    //      row. The diagnostic pair join is per-cluster quadratic —
    //      fine here because the mutual-kNN regime keeps clusters
    //      fragmented by construction (q270: max 14 nodes) and the
    //      entry is fixture-guarded; the OPERATOR under test carries no
    //      such join. VALUES-pinned like q271 (the approximate side has
    //      no SQL replay; the exact side replays as q270). ----
    "q274_semantic_clusters_ivf" -> Q(
      (s, d) => {
        Tables.requirePinnedFixture(s, d, "embeddings",
          Tables.Sf001EmbeddingsFp, "q274_semantic_clusters_ivf")
        val e = embs(s, d).select(col("vec_id").as("id"),
          col("embedding").as("vec"))
        def coPairs(c: DataFrame): DataFrame = c.as("a").join(c.as("b"),
            col("a.comp_id") === col("b.comp_id") &&
              col("a.node") < col("b.node"))
          .select(col("a.node").as("u"), col("b.node").as("v"))
        val exact = coPairs(semanticClusters(s, e, 2))
        val ivf = coPairs(semanticClustersIvf(s, e, 2, multiAssign = 4))
        val both = exact.join(ivf, Seq("u", "v"), "left_semi")
        exact.agg(count(lit(1)).as("n_pairs_exact"))
          .crossJoin(ivf.agg(count(lit(1)).as("n_pairs_ivf")))
          .crossJoin(both.agg(count(lit(1)).as("n_pairs_both")))
          .select(col("n_pairs_exact").cast("long"),
            col("n_pairs_ivf").cast("long"), col("n_pairs_both").cast("long"),
            expr("n_pairs_both * 1000 div n_pairs_exact")
              .cast("long").as("pair_recall_milli"))
      },
      Some("""SELECT n_pairs_exact, n_pairs_ivf, n_pairs_both,
             |  pair_recall_milli
             |FROM (VALUES (976, 1016, 910, 932))
             |  AS t(n_pairs_exact, n_pairs_ivf, n_pairs_both, pair_recall_milli)""".stripMargin)),

    // ---- q277: INCREMENTAL cluster maintenance under corpus growth —
    //      bootstrap mutual-2NN clusters on the pre-batch corpus
    //      (vec_id < 450, the q270 operator), then fold the 50-vector
    //      arrival batch in by threshold attach (τ = 0.35) through the
    //      quotient-sized incrementalComponents fold. Fully exact: the
    //      oracle replays BOTH edge sources in SQL (base-restricted
    //      mutual ranks; cos ≥ 350/1000 pairs touching the batch) and
    //      closes over their union — the fold must be
    //      indistinguishable from a full recompute on the union graph
    //      (the q244 contract, on the semantic tier). ----
    "q277_clusters_delta" -> Q(
      (s, d) => {
        val e = embs(s, d).select(col("vec_id").as("id"),
          col("embedding").as("vec"))
        val base = e.filter(col("id") < 450)
        val batch = e.filter(col("id") >= 450)
        val boot = semanticClusters(s, base, 2)
        clustersDelta(s, boot.select("node", "comp_id"), base, batch, 350)
          .orderBy("node")
      },
      Some(deltaClosureOracle)),

    // ---- q278: STREAMING cluster maintenance — the q277 fold driven
    //      through the real engine (file source, the arrival batch
    //      split into two trigger files by id parity, the second
    //      REPLAYED for at-least-once delivery; threshold-attach edges
    //      are deterministic and merges idempotent, so the replay must
    //      be a label-level no-op). Each fold's corpus is everything
    //      absorbed so far (labels ⋉ embeddings), which makes
    //      per-batch attach edge sets UNION to the one-shot batch's —
    //      so the streamed result lands on the SAME closure oracle as
    //      q277, shared verbatim (the q244/q245 precedent on the
    //      semantic tier). Labels live in A/B parquet generations. ----
    "q278_stream_clusters_delta" -> Q(
      (s, d) => {
        val e = embs(s, d).select(col("vec_id").as("id"),
          col("embedding").as("vec"))
        val base = e.filter(col("id") < 450)
        val work = java.nio.file.Files.createTempDirectory("graft-q278")
          .toString
        val in = s"$work/in"
        val arr = e.filter(col("id") >= 450)
        arr.filter(col("id") % 2 === 0).coalesce(1)
          .write.mode("append").parquet(in)
        val odd = arr.filter(col("id") % 2 === 1)
        odd.coalesce(1).write.mode("append").parquet(in)
        odd.coalesce(1).write.mode("append").parquet(in) // replay
        val sch = s.read.parquet(in).schema
        val src = s.readStream.schema(sch)
          .option("maxFilesPerTrigger", 1).parquet(in)
        val stateA = s"$work/state_a"; val stateB = s"$work/state_b"
        def statePath(gen: Long) = if (gen % 2 == 0) stateA else stateB
        semanticClusters(s, base, 2)
          .select("node", "comp_id")
          .write.mode("overwrite").parquet(stateA)
        var gen = 1L
        val q = src.writeStream
          .option("checkpointLocation", s"$work/ckpt")
          .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
            val lab = s.read.parquet(statePath(gen - 1))
            val corpus = e.join(lab.select(col("node").as("id")),
              Seq("id"), "left_semi")
            clustersDeltaFromEdges(s, lab, batch.toDF(),
                attachEdges(s, corpus, batch.toDF(), 350))
              .select("node", "comp_id")
              .write.mode("overwrite").parquet(statePath(gen))
            gen += 1
          }
          .start()
        try q.processAllAvailable() finally q.stop()
        require(gen >= 4, s"expected >= 3 micro-batches, got ${gen - 1}")
        val lab = s.read.parquet(statePath(gen - 1))
        val sizes = lab.groupBy("comp_id")
          .agg(count(lit(1)).as("comp_size"))
        lab.join(sizes, "comp_id")
          .select(col("node").cast("long"), col("comp_id").cast("long"),
            col("comp_size").cast("long"))
          .orderBy("node")
      },
      Some(deltaClosureOracle)),

    // ---- q280: SemDeDup threshold clustering over the whole corpus —
    //      components of the cos ≥ 350/1000 graph, keep-one-per-
    //      cluster rule surfaced (keep = min-id representative; at
    //      sf0.01: 338 nodes in 75 non-trivial clusters, 162
    //      singletons → 237 keepers). Exact SQL replay: threshold
    //      pairs + one recursive closure. ----
    "q280_threshold_clusters" -> Q(
      (s, d) => thresholdClusters(s,
          embs(s, d).select(col("vec_id").as("id"),
            col("embedding").as("vec")), 350)
        .orderBy("node"),
      Some("""WITH RECURSIVE att AS (SELECT a.vec_id AS u, b.vec_id AS v
             |  FROM embeddings a JOIN embeddings b
             |    ON a.vec_id < b.vec_id
             |  WHERE list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
             |    / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
             |       * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))))
             |    >= CAST(350 AS DOUBLE) / 1000),
             |sym AS (SELECT u, v FROM att UNION SELECT v, u FROM att),
             |reach(u, v) AS (
             |  SELECT u, v FROM sym
             |  UNION
             |  SELECT r3.u, s.v FROM reach r3 JOIN sym s ON r3.v = s.u),
             |allr AS (SELECT DISTINCT u, v FROM (
             |  SELECT u, v FROM reach
             |  UNION ALL SELECT u, u FROM sym)),
             |comp AS (SELECT u AS node, min(v) AS comp_id FROM allr GROUP BY u),
             |sz AS (SELECT comp_id, count(*) AS n FROM comp GROUP BY 1)
             |SELECT CAST(e.vec_id AS BIGINT) AS node,
             |  CAST(coalesce(c.comp_id, e.vec_id) AS BIGINT) AS comp_id,
             |  CAST(coalesce(sz.n, 1) AS BIGINT) AS comp_size,
             |  coalesce(c.comp_id, e.vec_id) = e.vec_id AS keep
             |FROM embeddings e
             |LEFT JOIN comp c ON c.node = e.vec_id
             |LEFT JOIN sz ON sz.comp_id = c.comp_id
             |ORDER BY node""".stripMargin)))

  /** q277's full-chain closure oracle — shared verbatim by q278: the
    * streaming fold must be indistinguishable from the one-shot fold,
    * which must be indistinguishable from a full recompute on the
    * union graph. */
  private def deltaClosureOracle: String =
    s"""WITH RECURSIVE ${knnRankSql(" AND a.vec_id < 450 AND b.vec_id < 450")},
             |me AS (SELECT l.src AS u, l.dst AS v
             |  FROM r l JOIN r r2 ON l.src = r2.dst AND l.dst = r2.src
             |  WHERE l.rn <= 2 AND r2.rn <= 2 AND l.src < l.dst),
             |att AS (SELECT a.vec_id AS u, b.vec_id AS v
             |  FROM embeddings a JOIN embeddings b
             |    ON a.vec_id < b.vec_id
             |   AND (a.vec_id >= 450 OR b.vec_id >= 450)
             |  WHERE list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
             |    / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
             |       * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))))
             |    >= CAST(350 AS DOUBLE) / 1000),
             |alle AS (SELECT u, v FROM me UNION SELECT u, v FROM att),
             |sym AS (SELECT u, v FROM alle UNION SELECT v, u FROM alle),
             |reach(u, v) AS (
             |  SELECT u, v FROM sym
             |  UNION
             |  SELECT r3.u, s.v FROM reach r3 JOIN sym s ON r3.v = s.u),
             |allr AS (SELECT DISTINCT u, v FROM (
             |  SELECT u, v FROM reach
             |  UNION ALL SELECT u, u FROM sym)),
             |comp AS (SELECT u AS node, min(v) AS comp_id FROM allr GROUP BY u),
             |sz AS (SELECT comp_id, count(*) AS n FROM comp GROUP BY 1)
             |SELECT CAST(e.vec_id AS BIGINT) AS node,
             |  CAST(coalesce(c.comp_id, e.vec_id) AS BIGINT) AS comp_id,
             |  CAST(coalesce(sz.n, 1) AS BIGINT) AS comp_size
             |FROM embeddings e
             |LEFT JOIN comp c ON c.node = e.vec_id
             |LEFT JOIN sz ON sz.comp_id = c.comp_id
             |ORDER BY node""".stripMargin
}
