package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.rel.RelQueries.Q
import graft.rel.Tables

/** Optimized Product Quantization (Ge, He, Ke, Sun, "Optimized product
  * quantization for approximate nearest neighbor search", CVPR 2013) —
  * PQ's blind spot is its FIXED subspace split: correlated dimensions
  * that land in different subspaces are quantized independently and the
  * correlation is wasted. OPQ learns an orthogonal rotation R and
  * quantizes R·x instead, alternating (non-parametric variant):
  *
  *   1. fix R: train per-subspace codebooks on the rotated sample
  *   2. fix codebooks: R ← argmin_R Σ‖R·x − c(R·x)‖² — the orthogonal
  *      Procrustes problem, solved by R = U·Vᵀ from the SVD of
  *      M = Σ y·xᵀ (y = the reconstruction of the current rotation's
  *      codes)
  *
  * Because R is orthogonal it preserves dot products, so ADC scores in
  * the rotated space approximate the ORIGINAL cosine — search is
  * [[PqOps.pqTopK]] unchanged, just handed `rotation = Some(R)`.
  *
  * Everything here is deterministic and pure-JVM: the training sample is
  * the same hash-ordered cut PQ uses, the local Lloyd folds in sample
  * order, and the SVD is cyclic one-sided Jacobi with a fixed sweep
  * order — no randomized init anywhere, so the q69 recall oracle pins
  * exact per-query hit counts.
  *
  * Scale notes (100 TB): rotation training is DRIVER-LOCAL over the
  * bounded sample (d×d work, d = 64 here — microseconds); the corpus
  * only ever sees R as a broadcast applied in the same narrow map that
  * normalizes, and the final codebooks still train distributed on the
  * rotated data inside pqTopK. Nothing new touches the driver at corpus
  * scale.
  */
object OpqOps {

  /** R·v for a row-major square matrix */
  private[graft] def matVec(m: Array[Array[Double]], v: Array[Double]): Array[Double] = {
    val d = m.length
    require(v.length == d, s"rotation is ${d}x$d but vector has dim ${v.length}")
    val out = new Array[Double](d)
    var i = 0
    while (i < d) {
      val row = m(i)
      var s = 0.0
      var j = 0
      while (j < d) { s += row(j) * v(j); j += 1 }
      out(i) = s
      i += 1
    }
    out
  }

  /** One-sided cyclic Jacobi SVD of a square matrix: A = U·diag(σ)·Vᵀ.
    * Deterministic (fixed (p,q) sweep order, fixed convergence test).
    * Rank-deficient columns of U are completed by Gram-Schmidt over the
    * standard basis so U is always a full orthogonal matrix.
    */
  private[graft] def svdSquare(a0: Array[Array[Double]])
      : (Array[Array[Double]], Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    // column-major copies: acol(j) is column j of A, vcol(j) of V
    val acol = Array.tabulate(d, d)((j, i) => a0(i)(j))
    val vcol = Array.tabulate(d, d)((j, i) => if (i == j) 1.0 else 0.0)
    def dot(x: Array[Double], y: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < d) { s += x(i) * y(i); i += 1 }
      s
    }
    val eps = 1e-14
    var sweep = 0
    var rotated = true
    while (rotated && sweep < 64) {
      rotated = false
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val app = dot(acol(p), acol(p))
          val aqq = dot(acol(q), acol(q))
          val apq = dot(acol(p), acol(q))
          if (math.abs(apq) > eps * math.sqrt(app * aqq) && apq != 0.0) {
            rotated = true
            val zeta = (aqq - app) / (2.0 * apq)
            val t = math.signum(zeta) / (math.abs(zeta) + math.sqrt(1.0 + zeta * zeta))
            val c = 1.0 / math.sqrt(1.0 + t * t)
            val sn = c * t
            var i = 0
            while (i < d) {
              val ap = acol(p)(i); val aq = acol(q)(i)
              acol(p)(i) = c * ap - sn * aq
              acol(q)(i) = sn * ap + c * aq
              val vp = vcol(p)(i); val vq = vcol(q)(i)
              vcol(p)(i) = c * vp - sn * vq
              vcol(q)(i) = sn * vp + c * vq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    val sigma = Array.tabulate(d)(j => math.sqrt(dot(acol(j), acol(j))))
    val tol = 1e-12 * (1.0 max sigma.max)
    val ucol = Array.ofDim[Double](d, d)
    var j = 0
    while (j < d) {
      if (sigma(j) > tol) {
        var i = 0
        while (i < d) { ucol(j)(i) = acol(j)(i) / sigma(j); i += 1 }
      } else {
        // rank-deficient: complete with the first standard basis vector
        // that survives orthogonalization against the columns so far
        var k = 0
        var done = false
        while (!done && k < d) {
          val cand = Array.tabulate(d)(i => if (i == k) 1.0 else 0.0)
          var jj = 0
          while (jj < j) {
            val pr = dot(ucol(jj), cand)
            var i = 0
            while (i < d) { cand(i) -= pr * ucol(jj)(i); i += 1 }
            jj += 1
          }
          val n = math.sqrt(dot(cand, cand))
          if (n > 0.5) {
            var i = 0
            while (i < d) { ucol(j)(i) = cand(i) / n; i += 1 }
            done = true
          }
          k += 1
        }
        require(done, "SVD basis completion failed")
      }
      j += 1
    }
    // back to row-major U, V
    val u = Array.tabulate(d, d)((i, jj) => ucol(jj)(i))
    val v = Array.tabulate(d, d)((i, jj) => vcol(jj)(i))
    (u, sigma, v)
  }

  /** deterministic local Lloyd per subspace over the (rotated) sample:
    * k-center seeds, assignments fold in sample order
    */
  private def localBooks(pts: Array[Array[Double]], subQ: Int, codes: Int,
      iters: Int): Array[Array[Array[Double]]] = {
    val dim = pts(0).length
    val sub = dim / subQ
    Array.tabulate(subQ) { qi =>
      val sv = pts.map(v => java.util.Arrays.copyOfRange(v, qi * sub, (qi + 1) * sub))
      var cents = PqOps.kCenter(sv, codes)
      (1 to iters).foreach { _ =>
        val acc = Array.ofDim[Double](cents.length, sub)
        val cnt = new Array[Int](cents.length)
        sv.foreach { v =>
          val c = PqOps.nearestCode(cents, v, 0)
          cnt(c) += 1
          var j = 0
          while (j < sub) { acc(c)(j) += v(j); j += 1 }
        }
        cents = Array.tabulate(cents.length)(c =>
          if (cnt(c) == 0) cents(c) else acc(c).map(_ / cnt(c)))
      }
      cents
    }
  }

  /** reconstruction of (already-rotated) `v` from its per-subspace codes */
  private def reconstruct(books: Array[Array[Array[Double]]], v: Array[Double])
      : Array[Double] = {
    val sub = books(0)(0).length
    val out = new Array[Double](v.length)
    var qi = 0
    while (qi < books.length) {
      val cent = books(qi)(PqOps.nearestCode(books(qi), v, qi * sub))
      System.arraycopy(cent, 0, out, qi * sub, sub)
      qi += 1
    }
    out
  }

  /** total squared quantization error of the sample under rotation `r`
    * with codebooks trained locally on the rotated sample — the OPQ
    * objective, exposed for the spec's OPQ-beats-PQ assertion
    */
  private[graft] def sampleQuantError(pts: Array[Array[Double]],
      r: Array[Array[Double]], subQ: Int, codes: Int, lloydIters: Int): Double = {
    val rot = pts.map(matVec(r, _))
    val books = localBooks(rot, subQ, codes, lloydIters)
    rot.map { v =>
      val y = reconstruct(books, v)
      var e = 0.0
      var j = 0
      while (j < v.length) { val dlt = v(j) - y(j); e += dlt * dlt; j += 1 }
      e
    }.sum
  }

  /** Train the OPQ rotation on sample points (driver-local, bounded):
    * `opqIters` alternations of local codebook fit + Procrustes update.
    * Returns the row-major orthogonal d×d matrix.
    */
  private[graft] def trainRotation(pts: Array[Array[Double]], subQ: Int,
      codes: Int, opqIters: Int = 8, lloydIters: Int = 4): Array[Array[Double]] = {
    require(pts.nonEmpty, "OPQ needs a non-empty sample")
    val d = pts(0).length
    require(d % subQ == 0, s"dim $d not divisible into $subQ subspaces")
    var r = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    (1 to opqIters).foreach { _ =>
      val rot = pts.map(matVec(r, _))
      val books = localBooks(rot, subQ, codes, lloydIters)
      // M = Σ y·xᵀ over ORIGINAL points x and reconstructions y of R·x
      val m = Array.ofDim[Double](d, d)
      var p = 0
      while (p < pts.length) {
        val x = pts(p)
        val y = reconstruct(books, rot(p))
        var i = 0
        while (i < d) {
          val yi = y(i)
          var j = 0
          while (j < d) { m(i)(j) += yi * x(j); j += 1 }
          i += 1
        }
        p += 1
      }
      val (u, _, v) = svdSquare(m)
      // R = U·Vᵀ maximizes tr(Rᵀ·M) — the Procrustes optimum
      r = Array.tabulate(d, d) { (i, j) =>
        var s = 0.0
        var k = 0
        while (k < d) { s += u(i)(k) * v(j)(k); k += 1 }
        s
      }
    }
    r
  }

  /** the same hash-ordered deterministic sample cut PQ training uses */
  private[llm] def orderedSample(s: SparkSession, emb: DataFrame,
      id: String, vec: String, n: Int): Array[Array[Double]] = {
    import s.implicits._
    PqOps.normalized(s, emb, id, vec)
      .map { case (i, v) => (SketchOps.splitmix64(i), i, v) }
      .orderBy(col("_1"), col("_2")).limit(n)
      .collect().sortBy(t => (t._1, t._2)).map(_._3)
  }

  /** OPQ ANN: train the rotation on the deterministic sample, then run
    * the full PQ/ADC pipeline ([[PqOps.pqTopK]]) in the rotated space.
    */
  def opqTopK(s: SparkSession, emb: DataFrame, queries: DataFrame, k: Int,
      subQ: Int = 8, codes: Int = 16, iters: Int = 3, rerank: Int = 100,
      opqIters: Int = 8,
      excludeSelfId: Boolean = true, maxProbeBatch: Int = 4096,
      id: String = "id", vec: String = "vec",
      qid: String = "qid", qvec: String = "qvec"): DataFrame = {
    val sampleN = math.max(4 * codes, 256)
    val pts = orderedSample(s, emb, id, vec, sampleN)
    val r = trainRotation(pts, subQ, codes, opqIters)
    PqOps.pqTopK(s, emb, queries, k, subQ, codes, iters, rerank,
      excludeSelfId, maxProbeBatch, id, vec, qid, qvec, rotation = Some(r))
  }

  private def opqTop5(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val q = e.filter(col("id") < 8)
      .select(col("id").as("qid"), col("vec").as("qvec"))
    opqTopK(s, e, q, k = 5)
      .select(col("qid"), col("rn"), col("id").as("nn_id"), col("cos"),
        col("n_candidates"))
  }

  val all: ListMap[String, Q] = ListMap(
    // ---- OPQ ANN: learned-rotation PQ, 8×16 codebooks, top-100 re-rank ----
    "q69_opq_ann" -> Q((s, d) => AnnPin.pinnable(s, d, opqTop5(s, d), "q69_opq_ann"),
      Some("""SELECT qid, rn, nn_id, cos_milli, n_candidates FROM (VALUES
             |  (0, 1, 365, 370, 100), (0, 2, 334, 363, 100),
             |  (0, 3, 387, 331, 100), (0, 4, 73, 295, 100),
             |  (0, 5, 7, 293, 100), (1, 1, 386, 371, 100),
             |  (1, 2, 27, 348, 100), (1, 3, 407, 327, 100),
             |  (1, 4, 195, 323, 100), (1, 5, 64, 316, 100),
             |  (2, 1, 117, 318, 100), (2, 2, 450, 266, 100),
             |  (2, 3, 145, 263, 100), (2, 4, 320, 255, 100),
             |  (2, 5, 418, 254, 100), (3, 1, 130, 400, 100),
             |  (3, 2, 149, 330, 100), (3, 3, 343, 308, 100),
             |  (3, 4, 174, 304, 100), (3, 5, 207, 292, 100),
             |  (4, 1, 114, 399, 100), (4, 2, 496, 341, 100),
             |  (4, 3, 408, 323, 100), (4, 4, 482, 314, 100),
             |  (4, 5, 280, 280, 100), (5, 1, 404, 328, 100),
             |  (5, 2, 419, 319, 100), (5, 3, 157, 311, 100),
             |  (5, 4, 33, 311, 100), (5, 5, 316, 291, 100),
             |  (6, 1, 350, 325, 100), (6, 2, 430, 323, 100),
             |  (6, 3, 437, 283, 100), (6, 4, 386, 275, 100),
             |  (6, 5, 268, 260, 100), (7, 1, 340, 493, 100),
             |  (7, 2, 425, 408, 100), (7, 3, 209, 394, 100),
             |  (7, 4, 334, 357, 100), (7, 5, 381, 345, 100))
             |  AS t(qid, rn, nn_id, cos_milli, n_candidates)
             |ORDER BY qid, rn""".stripMargin)),

    // ---- recall vs the exact top-5 (same ground truth as q55). The
    //      pinned hits are deterministic: hash-ordered sample, k-center
    //      seeds, cyclic Jacobi, ordered folds — a regression pin.
    //      Measured 0.875 avg vs plain PQ's 0.9 on THIS corpus: the
    //      fixture's dims are near-independent, so rotation has nothing
    //      to exploit and the retrained split lands in a slightly
    //      different local optimum — the honest result. OpqSpec proves
    //      the cases OPQ exists for: the rotation is orthogonal,
    //      dot-preserving, and on a fixture with cross-subspace
    //      correlated dims the OPQ objective strictly beats unrotated
    //      PQ. ----
    "q69_opq_recall" -> Q(
      (s, d) => {
        val approx = opqTop5(s, d).select(col("qid"), col("nn_id").as("vec_id"))
        SketchOps.exactTop5(s, d)
          .join(approx.withColumn("hit", lit(1)), Seq("qid", "vec_id"), "left")
          .groupBy("qid")
          .agg(sum(coalesce(col("hit"), lit(0))).as("n_hits"))
          .select(col("qid"), col("n_hits"),
            (col("n_hits").cast("double") / 5).as("recall_at_5"))
          .orderBy("qid")
      },
      Some("""SELECT qid, n_hits, CAST(recall AS DOUBLE) AS recall_at_5
             |FROM (VALUES (0, 4, 0.8), (1, 5, 1.0), (2, 4, 0.8), (3, 4, 0.8),
             |  (4, 5, 1.0), (5, 4, 0.8), (6, 4, 0.8), (7, 5, 1.0))
             |  AS t(qid, n_hits, recall)
             |ORDER BY qid""".stripMargin)),
  )
}
