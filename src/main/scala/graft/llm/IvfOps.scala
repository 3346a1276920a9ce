package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.rel.RelQueries.Q
import graft.rel.Tables

/** IVF (inverted-file) ANN — the centroid-quantizer scale path next to
  * the hyperplane-LSH one (SketchOps): a small k-means codebook is
  * trained distributively, every vector is assigned to its nearest
  * centroid cells, and a query probes only the `nProbe` nearest cells,
  * re-ranking candidates by exact cosine.
  *
  * Scale notes (100 TB): training touches the data `iters` times as
  * narrow map + one shuffle per iteration, with only cells×dim doubles
  * ever on the driver (bounded by the codebook size, NOT by data — this
  * is the AQE-stats-sized exception to the no-collect rule, documented
  * where it happens). Search is a broadcast of the probe list + an
  * equi-join on `cell` — candidates ≈ multiAssign·nProbe/cells of the
  * corpus, never the n² space.
  *
  * Recall at a fixed probe budget is lifted by MULTIPLE ASSIGNMENT
  * (Jégou et al., "Product quantization for nearest neighbor search",
  * §V): every vector is indexed under its `multiAssign` nearest cells,
  * not just the nearest one. The vectors a single-assignment probe
  * misses are exactly the near-Voronoi-boundary ones, and those are the
  * ones whose second-nearest cell catches them. Index size is
  * multiAssign×n rows (ids only — payloads are joined, not duplicated).
  *
  * Determinism (so the recall oracle can pin results): codebook seeds
  * come from greedy k-center over a hash-ordered sample (id-set
  * agnostic — no dense-id assumption, see trainCentroids), per-cell
  * sums folded in ascending id order (no reduce-order variance), ties
  * broken by lowest cell index.
  */
object IvfOps {

  private def sq(x: Double): Double = x * x

  /** index of the nearest centroid (L2 on unit vectors ≡ cosine order) */
  private[llm] def nearestCell(cents: Array[Array[Double]], v: Array[Double]): Int = {
    var best = 0; var bestD = Double.MaxValue
    var c = 0
    while (c < cents.length) {
      var d = 0.0
      var j = 0
      while (j < v.length) { d += sq(cents(c)(j) - v(j)); j += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** the `m` nearest centroid indices, ascending distance, ties by lowest
    * cell index — deterministic for the pinned recall oracle */
  private[graft] def nearestCells(cents: Array[Array[Double]], v: Array[Double], m: Int): Array[Int] = {
    val byDist = Array.tabulate(cents.length) { c =>
      var d = 0.0
      var j = 0
      while (j < v.length) { d += sq(cents(c)(j) - v(j)); j += 1 }
      (d, c)
    }
    byDist.sortBy(t => (t._1, t._2)).take(math.min(m, cents.length)).map(_._2)
  }

  private[llm] def normalized(s: SparkSession, df: DataFrame, id: String, vec: String) = {
    import s.implicits._
    df.select(col(id), col(vec)).as[(Long, Seq[Float])]
      .map { case (i, v) =>
        var n = 0.0
        var j = 0
        while (j < v.length) { n += sq(v(j).toDouble); j += 1 }
        val inv = if (n == 0) 0.0 else 1.0 / math.sqrt(n)
        (i, Array.tabulate(v.length)(j => v(j).toDouble * inv))
      }
  }

  /** Lloyd iterations with deterministic per-cell accumulation. Only the
    * codebook (≤ cells×dim doubles) is ever collected — bounded by the
    * codebook size, not by data. `e` must be the (cached) normalized
    * corpus: training reuses one materialization across all iterations.
    *
    * Seeding is greedy k-center (farthest-point) over a deterministic
    * sample — the max(4·cells, 256) members with the smallest
    * (splitmix64(id), id), one TakeOrdered pass, no dense-id assumption.
    * A plain random sample of `cells` seeds leaves some natural clusters
    * unseeded (coupon-collector), and Lloyd cannot split a merged cell;
    * farthest-point seeding covers every cluster the sample touches
    * (measured: on a 16-cluster corpus random seeding left cells spanning
    * clusters and probes pulled 79% of the corpus; k-center alignment
    * brings nProbe=2/16 down to the two relevant cells —
    * IvfClusteredSpec). Driver-side cost: sampleN × cells distance evals.
    */
  private[llm] def trainCentroids(
      s: SparkSession,
      e: org.apache.spark.sql.Dataset[(Long, Array[Double])],
      cells: Int, iters: Int): Array[Array[Double]] = {
    import s.implicits._
    val sampleN = math.max(4 * cells, 256)
    val sample = e.map { case (i, v) => (SketchOps.splitmix64(i), i, v) }
      .orderBy(col("_1"), col("_2")).limit(sampleN)
      .collect()
    require(sample.nonEmpty, "IVF needs a non-empty corpus")
    val pts = sample.sortBy(t => (t._1, t._2))
    val k = math.min(cells, pts.length)
    val chosen = scala.collection.mutable.ArrayBuffer(0)
    val minD = Array.fill(pts.length)(Double.MaxValue)
    while (chosen.length < k) {
      val last = pts(chosen.last)._3
      var best = -1
      var bestD = -1.0
      var p = 0
      while (p < pts.length) {
        var d = 0.0
        var j = 0
        while (j < last.length) { d += sq(pts(p)._3(j) - last(j)); j += 1 }
        if (d < minD(p)) minD(p) = d
        // strict > : ties resolve to the lowest (hash, id) position
        if (minD(p) > bestD) { bestD = minD(p); best = p }
        p += 1
      }
      chosen += best
    }
    var cents = chosen.map(i => pts(i)._3).toArray
    (1 to iters).foreach { _ =>
      val bc = s.sparkContext.broadcast(cents)
      val updated = e
        .map { case (id, v) => (nearestCell(bc.value, v), id, v) }
        .groupByKey(_._1)
        .mapGroups { (cell, it) =>
          // ascending-id fold: float accumulation order is fixed
          val rows = it.toArray.sortBy(_._2)
          val dim = rows(0)._3.length
          val sum = new Array[Double](dim)
          rows.foreach { r =>
            var j = 0
            while (j < dim) { sum(j) += r._3(j); j += 1 }
          }
          (cell, sum.map(_ / rows.length))
        }
        .collect().toMap
      cents = Array.tabulate(k)(c => updated.getOrElse(c, cents(c)))
    }
    cents
  }

  /** per-row assignment against a fixed codebook: normalize for the
    * cell lookup, keep the ORIGINAL f32 vector so downstream cosine
    * re-ranks are exact (shared by [[ivfTopK]] and [[AnnIndex.saveIvf]])
    */
  private[llm] def assignRows(s: SparkSession, df: DataFrame,
      cents: Array[Array[Double]], multiAssign: Int,
      id: String, vec: String): DataFrame = {
    import s.implicits._
    val bc = s.sparkContext.broadcast(cents)
    df.select(col(id), col(vec)).as[(Long, Seq[Float])]
      .flatMap { case (i, v) =>
        var n = 0.0
        var j = 0
        while (j < v.length) { n += v(j).toDouble * v(j); j += 1 }
        val inv = if (n == 0) 0.0 else 1.0 / math.sqrt(n)
        val nv = Array.tabulate(v.length)(j => v(j) * inv)
        val fv = v.toArray
        nearestCells(bc.value, nv, multiAssign).iterator.map(c => (i, fv, c))
      }
      .toDF(id, vec, "cell")
  }

  /** Approximate cosine top-k per query via IVF: train, multi-assign the
    * corpus, probe the `nProbe` nearest cells per query, re-rank the
    * candidate union by exact cosine. Library-shaped: caller DataFrames,
    * parameterized column names — the IVF sibling of [[Ann.cosineTopK]]
    * and [[Ann.lshTopK]]. Output: (qid, rn, id, cos, n_candidates).
    */
  def ivfTopK(s: SparkSession, emb: DataFrame, queries: DataFrame, k: Int,
      cells: Int = 16, iters: Int = 3, nProbe: Int = 6, multiAssign: Int = 2,
      excludeSelfId: Boolean = true,
      id: String = "id", vec: String = "vec",
      qid: String = "qid", qvec: String = "qvec"): DataFrame = {
    import s.implicits._
    // ONE cached normalized corpus feeds training (its repeated
    // consumer); released below once the codebook is on the driver —
    // the assignment map then recomputes the narrow normalization once
    // at execution instead of pinning the corpus for the session
    val norm = normalized(s, emb, id, vec).cache()
    val cents = trainCentroids(s, norm, cells, iters)
    norm.unpersist()
    val bc = s.sparkContext.broadcast(cents)
    // multiple assignment: each vector is listed under its multiAssign
    // nearest cells (original f32 vec riding along), so probing nProbe
    // cells also reaches the near-boundary vectors a primary-cell-only
    // index would miss
    val cellsDf = assignRows(s, emb, cents, multiAssign, id, vec)
    // probe list: the nProbe nearest cells per (normalized) query vector
    val probes = normalized(s, queries, qid, qvec)
      .flatMap { case (q, v) =>
        nearestCells(bc.value, v, nProbe).map(c => (q, c))
      }
      .toDF(qid, "cell")
    // score DURING the assignment pass (the probeIvf/AnnBench lesson:
    // joining candidates back to the corpus by id shuffles the corpus;
    // scoring inline ships nothing but (qid, id, cos) rows)
    val q = queries.select(col(qid), col(qvec))
    val scored = cellsDf.join(broadcast(probes), "cell")
      .filter(if (excludeSelfId) col(id) =!= col(qid) else lit(true))
      .join(broadcast(q), qid)
      .withColumn("cos",
        graft.functions.VecFunctions.vecCosine(s, col(qvec), col(vec)))
      .select(col(qid), col(id), col("cos"))
    // a vector can reach one query through several of its assigned
    // cells — bit-identical copies, collapsed map-side; candidates are
    // a set, n_candidates counts vectors
    val dedup = scored.groupBy(col(qid), col(id)).agg(max(col("cos")).as("cos"))
    val nc = dedup.groupBy(qid).agg(count(lit(1)).as("n_candidates"))
    graft.functions.TopK.perKeyTopK(dedup, k, qid, id, "cos")
      .join(broadcast(nc), qid)
      .select(col(qid), col("rn"), col(id), col("cos"), col("n_candidates"))
      .orderBy(qid, "rn")
  }

  /** the q47 driver shape: top-5 for queries vec_id < 8 over the
    * embeddings table */
  private def ivfTop5(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val q = e.filter(col("id") < 8)
      .select(col("id").as("qid"), col("vec").as("qvec"))
    ivfTopK(s, e, q, k = 5)
      .select(col("qid"), col("rn"), col("id").as("nn_id"), col("cos"),
        col("n_candidates"))
  }

  /** the measured-and-pinned IVF recall@5 — shared verbatim by the q47
    * and q65 oracles. MUST be declared before `all` (vals initialize in
    * declaration order; `all` captures it eagerly).
    */
  private[llm] val ivfRecallOracle: String =
    """SELECT qid, n_hits, CAST(recall AS DOUBLE) AS recall_at_5
      |FROM (VALUES (0, 3, 0.6), (1, 4, 0.8), (2, 5, 1.0), (3, 4, 0.8),
      |  (4, 4, 0.8), (5, 5, 1.0), (6, 5, 1.0), (7, 5, 1.0))
      |  AS t(qid, n_hits, recall)
      |ORDER BY qid""".stripMargin

  val all: ListMap[String, Q] = ListMap(
    // ---- IVF ANN: probe nProbe of 16 centroid cells (2-way multiple
    //      assignment), exact re-rank ----
    "q47_ivf_ann" -> Q((s, d) => AnnPin.pinnable(s, d, ivfTop5(s, d), "q47_ivf_ann"),
      Some("""SELECT qid, rn, nn_id, cos_milli, n_candidates FROM (VALUES
             |  (0, 1, 365, 370, 316), (0, 2, 334, 363, 316),
             |  (0, 3, 423, 297, 316), (0, 4, 190, 282, 316),
             |  (0, 5, 464, 277, 316), (1, 1, 386, 371, 310),
             |  (1, 2, 27, 348, 310), (1, 3, 195, 323, 310),
             |  (1, 4, 64, 316, 310), (1, 5, 124, 303, 310),
             |  (2, 1, 117, 318, 284), (2, 2, 450, 266, 284),
             |  (2, 3, 145, 263, 284), (2, 4, 188, 263, 284),
             |  (2, 5, 320, 255, 284), (3, 1, 130, 400, 296),
             |  (3, 2, 343, 308, 296), (3, 3, 174, 304, 296),
             |  (3, 4, 231, 299, 296), (3, 5, 207, 292, 296),
             |  (4, 1, 114, 399, 313), (4, 2, 496, 341, 313),
             |  (4, 3, 408, 323, 313), (4, 4, 280, 280, 313),
             |  (4, 5, 249, 280, 313), (5, 1, 404, 328, 301),
             |  (5, 2, 419, 319, 301), (5, 3, 157, 311, 301),
             |  (5, 4, 33, 311, 301), (5, 5, 359, 306, 301),
             |  (6, 1, 350, 325, 294), (6, 2, 430, 323, 294),
             |  (6, 3, 145, 298, 294), (6, 4, 437, 283, 294),
             |  (6, 5, 386, 275, 294), (7, 1, 340, 493, 320),
             |  (7, 2, 425, 408, 320), (7, 3, 209, 394, 320),
             |  (7, 4, 334, 357, 320), (7, 5, 381, 345, 320))
             |  AS t(qid, rn, nn_id, cos_milli, n_candidates)
             |ORDER BY qid, rn""".stripMargin)),

    // ---- recall vs the exact top-5 (same ground truth as q38_recall);
    //      oracle = the measured per-query hits, deterministic by the
    //      seeded init + ordered accumulation above (verified stable
    //      across independent runs). Honest reading: avg 0.875 at 6/16
    //      cells probed with 2-way multiple assignment and k-center
    //      seeding (candidates ≈60% of this 500-vector corpus; single
    //      assignment with random seeds was 0.65 at ≈37%). This corpus is
    //      near-uniform, so its k-means cells are arbitrary Voronoi
    //      regions and candidate fraction buys recall near-linearly; on
    //      REAL embedding corpora, which cluster, the same probe budget
    //      covers a far smaller fraction. The multi-table LSH (q38) sits
    //      at 0.875 — both paths stay because which one wins is
    //      data-dependent. ----
    "q47_ivf_recall" -> Q(
      (s, d) => recallVsExact(s, d,
        ivfTop5(s, d).select(col("qid"), col("nn_id").as("vec_id"))),
      Some(ivfRecallOracle)),
  )

  /** recall@5 of `approx` (qid, vec_id) vs the exact top-5 — ONE
    * definition shared by q47 and q65, whose results (and pinned
    * oracles) must stay equal: probing a saved index is bit-identical
    * to train-and-probe
    */
  private[llm] def recallVsExact(s: SparkSession, d: String, approx: DataFrame): DataFrame =
    SketchOps.exactTop5(s, d)
      .join(approx.withColumn("hit", lit(1)), Seq("qid", "vec_id"), "left")
      .groupBy("qid")
      .agg(sum(coalesce(col("hit"), lit(0))).as("n_hits"))
      .select(col("qid"), col("n_hits"),
        (col("n_hits").cast("double") / 5).as("recall_at_5"))
      .orderBy("qid")
}
