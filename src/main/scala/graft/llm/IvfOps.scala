package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.rel.RelQueries.Q
import graft.rel.Tables

/** IVF (inverted-file) ANN — the centroid-quantizer scale path next to
  * the hyperplane-LSH one (SketchOps): a small k-means codebook is
  * trained distributively, every vector is assigned to its nearest
  * centroid cell, and a query probes only the `NProbe` nearest cells,
  * re-ranking candidates by exact cosine.
  *
  * Scale notes (100 TB): training touches the data `Iters` times as
  * narrow map + one shuffle per iteration, with only K×dim doubles ever
  * on the driver (bounded by K, NOT by data size — this is the
  * AQE-stats-sized exception to the no-collect rule, documented where it
  * happens). Search is a broadcast of ≤K cell ids + an equi-join on
  * `cell` — candidates ≈ NProbe/K of the corpus, never the n² space.
  *
  * Recall at a fixed probe budget is lifted by MULTIPLE ASSIGNMENT
  * (Jégou et al., "Product quantization for nearest neighbor search",
  * §V): every vector is indexed under its `MultiAssign` nearest cells,
  * not just the nearest one. The vectors a single-assignment probe
  * misses are exactly the near-Voronoi-boundary ones, and those are the
  * ones whose second-nearest cell catches them. Index size is
  * MultiAssign×n rows (ids only — payloads are joined, not duplicated).
  *
  * Determinism (so the recall oracle can pin results): seeded spread
  * initialization (every (n/K)-th vector), per-cell sums folded in
  * ascending vec_id order (no reduce-order variance), ties broken by
  * lowest cell index.
  */
object IvfOps {

  private val Dim = 64
  private val K = 16
  private val Iters = 3
  private val NProbe = 6
  private val Queries = 8
  private val MultiAssign = 2

  private def sq(x: Double): Double = x * x

  /** index of the nearest centroid (L2 on unit vectors ≡ cosine order) */
  private def nearestCell(cents: Array[Array[Double]], v: Array[Double]): Int = {
    var best = 0; var bestD = Double.MaxValue
    var c = 0
    while (c < cents.length) {
      var d = 0.0
      var j = 0
      while (j < Dim) { d += sq(cents(c)(j) - v(j)); j += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** the `m` nearest centroid indices, ascending distance, ties by lowest
    * cell index — deterministic for the pinned recall oracle */
  private def nearestCells(cents: Array[Array[Double]], v: Array[Double], m: Int): Array[Int] = {
    val byDist = Array.tabulate(cents.length) { c =>
      var d = 0.0
      var j = 0
      while (j < Dim) { d += sq(cents(c)(j) - v(j)); j += 1 }
      (d, c)
    }
    byDist.sortBy(t => (t._1, t._2)).take(math.min(m, cents.length)).map(_._2)
  }

  private def normalized(s: SparkSession, d: String) = {
    import s.implicits._
    Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])]
      .map { case (id, v) =>
        var n = 0.0
        var j = 0
        while (j < Dim) { n += sq(v(j).toDouble); j += 1 }
        val inv = if (n == 0) 0.0 else 1.0 / math.sqrt(n)
        (id, Array.tabulate(Dim)(j => v(j).toDouble * inv))
      }
  }

  /** Lloyd iterations with deterministic per-cell accumulation. Only the
    * codebook (≤K×Dim doubles) is ever collected — bounded by K, not by
    * data. `e` must be the (cached) normalized corpus: training reuses
    * one materialization across all iterations.
    */
  private def trainCentroids(
      s: SparkSession,
      e: org.apache.spark.sql.Dataset[(Long, Array[Double])]): Array[Array[Double]] = {
    val n = e.count()
    require(n >= 1, "IVF needs a non-empty corpus")
    val stride = math.max(1L, n / K)
    // spread init: every stride-th vector by id (ids are dense 0..n-1);
    // a corpus smaller or sparser than K yields a smaller codebook
    // rather than crashing
    var cents = e.filter(t => t._1 % stride == 0 && t._1 / stride < K)
      .collect().sortBy(_._1).map(_._2)
    require(cents.nonEmpty, "IVF spread init found no seed vectors (sparse ids?)")
    val k = cents.length
    import s.implicits._
    (1 to Iters).foreach { _ =>
      val bc = s.sparkContext.broadcast(cents)
      val updated = e
        .map { case (id, v) => (nearestCell(bc.value, v), id, v) }
        .groupByKey(_._1)
        .mapGroups { (cell, it) =>
          // ascending-id fold: float accumulation order is fixed
          val rows = it.toArray.sortBy(_._2)
          val sum = new Array[Double](Dim)
          rows.foreach { r =>
            var j = 0
            while (j < Dim) { sum(j) += r._3(j); j += 1 }
          }
          (cell, sum.map(_ / rows.length))
        }
        .collect().toMap
      cents = Array.tabulate(k)(c => updated.getOrElse(c, cents(c)))
    }
    cents
  }

  /** approximate top-5 per query via NProbe nearest cells + exact cosine */
  private def ivfTop5(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    // ONE cached normalized corpus feeds training (its repeated
    // consumer); released below once the codebook is on the driver —
    // cells/probes then recompute the narrow normalization map once each
    // at execution instead of pinning the corpus for the session
    val norm = normalized(s, d).cache()
    val cents = trainCentroids(s, norm)
    norm.unpersist()
    val bc = s.sparkContext.broadcast(cents)
    // multiple assignment: each vector is listed under its MultiAssign
    // nearest cells, so probing NProbe cells also reaches the
    // near-boundary vectors a primary-cell-only index would miss
    val cells = norm
      .flatMap { case (id, v) =>
        nearestCells(bc.value, v, MultiAssign).map(c => (id, c))
      }
      .toDF("vec_id", "cell")
    val e = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    // probe list: the NProbe nearest cells per query vector
    val probes = norm.filter(_._1 < Queries)
      .flatMap { case (id, v) =>
        val byDist = bc.value.zipWithIndex.map { case (ct, ci) =>
          var dd = 0.0
          var j = 0
          while (j < Dim) { dd += sq(ct(j) - v(j)); j += 1 }
          (dd, ci)
        }.sortBy(t => (t._1, t._2)).take(NProbe)
        byDist.map { case (_, ci) => (id, ci) }
      }
      .toDF("qid", "cell")
    // distinct: a vector can reach one query through both of its assigned
    // cells — candidates are a set, and n_candidates counts vectors
    val cand = broadcast(probes).join(cells, "cell")
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id")).distinct()
    val q = e.filter(col("vec_id") < Queries)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val nc = cand.groupBy("qid").agg(count(lit(1)).as("n_candidates"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
    cand.join(e, "vec_id")
      .join(broadcast(q), "qid")
      .withColumn("cos",
        graft.functions.VecFunctions.vecCosine(s, col("qv"), col("embedding")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .join(broadcast(nc), "qid")
      .select(col("qid"), col("rn"), col("vec_id").as("nn_id"), col("cos"),
        col("n_candidates"))
      .orderBy("qid", "rn")
  }

  val all: ListMap[String, Q] = ListMap(
    // ---- IVF ANN: probe NProbe of K centroid cells, exact re-rank ----
    "q47_ivf_ann" -> Q((s, d) => ivfTop5(s, d), None),

    // ---- recall vs the exact top-5 (same ground truth as q38_recall);
    //      oracle = the measured per-query hits, deterministic by the
    //      seeded init + ordered accumulation above (verified stable
    //      across independent runs). Honest reading: avg 0.925 at 6/16
    //      cells probed with 2-way multiple assignment (candidates ≈62%
    //      of this 500-vector corpus; single assignment was 0.65 at
    //      ≈37%). This corpus is near-uniform, so its k-means cells are
    //      arbitrary Voronoi regions and candidate fraction buys recall
    //      near-linearly; on REAL embedding corpora, which cluster, the
    //      same probe budget covers a far smaller fraction. The
    //      multi-table LSH (q38) sits at 0.875 — both paths stay because
    //      which one wins is data-dependent. ----
    "q47_ivf_recall" -> Q(
      (s, d) => {
        val approx = ivfTop5(s, d).select(col("qid"), col("nn_id").as("vec_id"))
        SketchOps.exactTop5(s, d)
          .join(approx.withColumn("hit", lit(1)), Seq("qid", "vec_id"), "left")
          .groupBy("qid")
          .agg(sum(coalesce(col("hit"), lit(0))).as("n_hits"))
          .select(col("qid"), col("n_hits"),
            (col("n_hits").cast("double") / 5).as("recall_at_5"))
          .orderBy("qid")
      },
      Some("""SELECT qid, n_hits, CAST(recall AS DOUBLE) AS recall_at_5
             |FROM (VALUES (0, 5, 1.0), (1, 5, 1.0), (2, 5, 1.0), (3, 4, 0.8),
             |  (4, 4, 0.8), (5, 5, 1.0), (6, 4, 0.8), (7, 5, 1.0))
             |  AS t(qid, n_hits, recall)
             |ORDER BY qid""".stripMargin)),
  )
}
