package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.rel.RelQueries.Q
import graft.rel.Tables

/** PCA over an embedding column — dimensionality reduction ahead of
  * ANN indexing / clustering / near-dup (the classical alternative to
  * [[OpqOps]]' learned rotation: project onto the top-p eigenvectors of
  * the covariance, keep most of the variance at a fraction of the
  * dimension).
  *
  * Scale shape (100 TB): the FIT is driver-local on the deterministic
  * hash-ordered sample (the [[OpqOps.orderedSample]] / PQ-training
  * move) — covariance and Jacobi eigendecomposition touch d×d state
  * only, never the corpus; the PROJECTION is a pure narrow map with
  * the (p×d) components broadcast as literals, zero shuffles, inside
  * expression eval per row.
  *
  * Determinism: the sample is hash-ordered (splitmix64, id tie-break),
  * the mean/covariance fold in sample order, the eigendecomposition is
  * the fixed-sweep cyclic Jacobi ([[OpqOps.svdSquare]]), components
  * sort by (eigenvalue desc, column index) and each is sign-fixed so
  * its largest-|·| entry (first index on ties) is positive — the fitted
  * model is a pure function of the data, byte-stable across runs and
  * partitionings.
  */
object Pca {

  /** mean (d), components (p×d, orthonormal rows, variance-descending),
    * eigenvalues (p, population covariance of the sample), and the
    * total variance (trace of the covariance) for explained-variance
    * ratios
    */
  case class PcaModel(mean: Array[Double], comps: Array[Array[Double]],
      eigvals: Array[Double], varTotal: Double)

  /** the hash-ordered deterministic sample, UNnormalized (PCA centers;
    * unit-norm would distort the covariance)
    */
  private def sampleFor(s: SparkSession, emb: DataFrame, id: String,
      vec: String, n: Int): Array[Array[Double]] = {
    import s.implicits._
    emb.select(col(id), col(vec)).as[(Long, Seq[Float])]
      .map { case (i, v) =>
        (SketchOps.splitmix64(i), i, v.toArray.map(_.toDouble))
      }
      .orderBy(col("_1"), col("_2")).limit(n)
      .collect().sortBy(t => (t._1, t._2)).map(_._3)
  }

  def fitPca(s: SparkSession, emb: DataFrame, p: Int, sampleCap: Int = 65536,
      id: String = "vec_id", vec: String = "embedding"): PcaModel = {
    require(p > 0, s"need p > 0 components: $p")
    require(sampleCap > 1, s"need a sample of at least 2: $sampleCap")
    val pts = sampleFor(s, emb, id, vec, sampleCap)
    require(pts.nonEmpty, "fitPca on an empty embedding table")
    val n = pts.length
    val d = pts(0).length
    require(p <= d, s"p=$p exceeds dimension d=$d")
    val mean = new Array[Double](d)
    pts.foreach { x =>
      var i = 0; while (i < d) { mean(i) += x(i); i += 1 }
    }
    var i = 0; while (i < d) { mean(i) /= n; i += 1 }
    // population covariance of the centered sample, folded in sample order
    val cov = Array.ofDim[Double](d, d)
    pts.foreach { x =>
      var a = 0
      while (a < d) {
        val xa = x(a) - mean(a)
        var b = a
        while (b < d) { cov(a)(b) += xa * (x(b) - mean(b)); b += 1 }
        a += 1
      }
    }
    var a = 0
    while (a < d) {
      var b = a
      while (b < d) { cov(a)(b) /= n; cov(b)(a) = cov(a)(b); b += 1 }
      a += 1
    }
    val varTotal = (0 until d).map(j => cov(j)(j)).sum
    // symmetric PSD: left singular vectors are the eigenvectors
    val (u, sigma, _) = OpqOps.svdSquare(cov)
    val order = (0 until d).sortBy(j => (-sigma(j), j)).take(p)
    val comps = order.map { j =>
      val c = Array.tabulate(d)(r => u(r)(j))
      // sign convention: largest-|entry| (first on ties) positive
      var best = 0
      var r = 1
      while (r < d) { if (math.abs(c(r)) > math.abs(c(best))) best = r; r += 1 }
      if (c(best) < 0) { r = 0; while (r < d) { c(r) = -c(r); r += 1 } }
      c
    }.toArray
    PcaModel(mean, comps, order.map(sigma).toArray, varTotal)
  }

  /** component j's projection of `vec`: Σᵢ vecᵢ·compᵢ − ⟨mean, comp⟩ —
    * the corpus sees the model only as literals in a narrow map
    */
  private def projCol(vec: Column, m: PcaModel, j: Int): Column = {
    val comp = m.comps(j)
    val offset = comp.indices.map(i => comp(i) * m.mean(i)).sum
    aggregate(
      zip_with(vec.cast("array<double>"), typedLit(comp.toSeq), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x) - lit(offset)
  }

  /** (id, proj array<double> of length p): zero-shuffle projection */
  def projectPca(s: SparkSession, emb: DataFrame, m: PcaModel,
      id: String = "vec_id", vec: String = "embedding"): DataFrame =
    emb.select(col(id),
      array(m.comps.indices.map(j => projCol(col(vec), m, j)): _*).as("proj"))

  /** PCA-SCREENED kNN — the composition PCA exists for in an ANN stack:
    * generate candidates with cosine in the REDUCED space (p-dim dots,
    * a d/p-fold cheaper scan), then re-rank only the `candMult`·k
    * survivors per query with the exact full-space cosine. Exact at the
    * top where it matters, approximate only in who gets scored — the
    * same screen-then-verify shape as [[PqOps]]' ADC scan, with PCA
    * instead of quantization as the cheap metric.
    *
    * Scale shape (100 TB): fit is sample-bounded ([[fitPca]]); both
    * projections are zero-shuffle narrow maps; the reduced scan is the
    * [[Ann.cosineTopK]] broadcast-queries + bounded-heap shape; the
    * re-rank joins a |queries|·candMult·k candidate set (broadcast-
    * small by construction) back to the corpus.
    */
  def pcaTopK(s: SparkSession, emb: DataFrame, queries: DataFrame, k: Int,
      p: Int, candMult: Int = 4, sampleCap: Int = 65536,
      id: String = "vec_id", vec: String = "embedding",
      qid: String = "qid", qvec: String = "qvec"): DataFrame = {
    require(k > 0 && candMult > 0, s"need k > 0 and candMult > 0: k=$k candMult=$candMult")
    val m = fitPca(s, emb, p, sampleCap, id, vec)
    val red = projectPca(s, emb, m, id, vec)
      .select(col(id), col("proj").cast("array<float>").as("rvec"))
    val redQ = projectPca(s, queries, m, qid, qvec)
      .select(col(qid), col("proj").cast("array<float>").as("rqvec"))
    val cand = Ann.cosineTopK(s, red, redQ, candMult * k,
        id = id, vec = "rvec", qid = qid, qvec = "rqvec")
      .select(col(qid), col(id))
    val scored = cand
      .join(emb.select(col(id), col(vec)), id)
      .join(broadcast(queries.select(col(qid), col(qvec))), qid)
      .withColumn("cos",
        graft.functions.VecFunctions.vecCosine(s, col(qvec), col(vec)))
    graft.functions.TopK.perKeyTopK(scored, k, qid, id, "cos")
      .orderBy(qid, "rn")
  }

  /** q109: fit p=4 on the full sf0.01 embeddings (500 ≤ sampleCap, so
    * the "sample" is the exact corpus in hash order), project, emit the
    * first 10 vectors' rounded coordinates. The oracle pins the values
    * (no eigensolver in SQL), so the fixture guard fails loud off
    * sf0.01.
    */
  private def q109(s: SparkSession, d: String): DataFrame = {
    Tables.requirePinnedFixture(s, d, "embeddings", Tables.Sf001EmbeddingsFp,
      "q109_pca_project")
    val m = fitPca(s, Tables.embeddings(s, d), p = 4)
    projectPca(s, Tables.embeddings(s, d), m)
      .filter(col("vec_id") < 10)
      .select(col("vec_id") +:
        (0 until 4).map(j => round(element_at(col("proj"), j + 1), 6).as(s"pc$j")): _*)
      .orderBy("vec_id")
  }

  // pinned from the deterministic fit on sf0.01 (see q109 scaladoc);
  // explicit casts keep DuckDB off DECIMAL inference for the literals
  private val q109Oracle =
    """SELECT CAST(vec_id AS BIGINT) AS vec_id, CAST(pc0 AS DOUBLE) AS pc0,
      |  CAST(pc1 AS DOUBLE) AS pc1, CAST(pc2 AS DOUBLE) AS pc2,
      |  CAST(pc3 AS DOUBLE) AS pc3
      |FROM (VALUES
      |  (0, -0.06554, -0.093383, 0.027411, -0.087522),
      |  (1, 0.079066, -0.185852, 0.069619, 0.032252),
      |  (2, -0.271894, 0.03889, -0.202708, -0.070552),
      |  (3, 0.298928, 0.093886, 0.09467, -0.151753),
      |  (4, 0.05815, -0.004503, 0.00299, 0.217792),
      |  (5, 0.265174, -0.2261, -0.14197, -0.047271),
      |  (6, -0.039262, 0.185098, -0.004824, 0.130037),
      |  (7, -0.108215, -0.189659, -0.109897, 0.327907),
      |  (8, 0.214502, 0.173495, -0.03988, -0.050519),
      |  (9, -0.098492, 0.05571, -0.210585, 0.079352)
      |) t(vec_id, pc0, pc1, pc2, pc3) ORDER BY vec_id""".stripMargin

  /** q111: PCA-screened top-5 for the 8 standard ANN probe queries
    * (p=32 of d=64, candMult=8) vs the exact top-5 — per-query hit
    * counts pinned (deterministic: fixed sample order, fixed Jacobi;
    * a regression pin, not an analytic truth). [[SketchOps.exactTop5]]
    * carries the fixture guard.
    */
  private def q111(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
    val q = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val approx = pcaTopK(s, e, q, k = 5, p = 32, candMult = 8)
      .select(col("qid"), col("vec_id"))
    val hits = SketchOps.exactTop5(s, d)
      .join(approx.withColumn("hit", lit(1)), Seq("qid", "vec_id"), "left")
      .groupBy("qid")
      .agg(sum(coalesce(col("hit"), lit(0))).as("n_hits"))
    hits.select(col("qid"), col("n_hits"),
        (col("n_hits").cast("double") / 5).as("recall_at_5"))
      .orderBy("qid")
  }

  val all: ListMap[String, Q] = ListMap(
    "q109_pca_project" -> Q(q109, Some(q109Oracle)),
    "q111_pca_screen_recall" -> Q(q111,
      Some("""SELECT qid, n_hits, CAST(recall AS DOUBLE) AS recall_at_5
             |FROM (VALUES (0, 5, 1.0), (1, 5, 1.0), (2, 5, 1.0), (3, 4, 0.8),
             |  (4, 5, 1.0), (5, 5, 1.0), (6, 5, 1.0), (7, 5, 1.0))
             |  AS t(qid, n_hits, recall)
             |ORDER BY qid""".stripMargin)))
}
