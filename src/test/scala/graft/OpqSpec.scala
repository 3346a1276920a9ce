package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.llm.OpqOps

/** The OPQ machinery, session-free: Jacobi SVD reconstructs and is
  * orthonormal, the trained rotation is orthogonal (hence
  * dot-preserving), training is deterministic, and on data with
  * cross-subspace correlated dimensions the OPQ objective strictly
  * beats the unrotated PQ split — the case the rotation exists for.
  */
class OpqSpec extends AnyFunSuite {

  private val d = 16

  private def identity(n: Int) =
    Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)

  private def maxAbsDiff(a: Array[Array[Double]], b: Array[Array[Double]]): Double =
    a.zip(b).map { case (ra, rb) => ra.zip(rb).map(t => math.abs(t._1 - t._2)).max }.max

  private def mul(a: Array[Array[Double]], b: Array[Array[Double]]) = {
    val n = a.length
    Array.tabulate(n, n)((i, j) => (0 until n).map(k => a(i)(k) * b(k)(j)).sum)
  }

  private def transpose(a: Array[Array[Double]]) =
    Array.tabulate(a.length, a.length)((i, j) => a(j)(i))

  /** deterministic pseudo-random sample with STRONG cross-subspace
    * correlation: dim 2k+1 = dim 2k + small noise, and the pairs are
    * STRIDED so each correlated pair straddles the subQ=4 subspace
    * boundary under the natural split — the worst case for fixed-split
    * PQ, the best case for a learned rotation.
    */
  private def correlated(n: Int): Array[Array[Double]] = {
    val r = new scala.util.Random(12345)
    Array.fill(n) {
      val g = Array.fill(d / 2)(r.nextGaussian())
      // interleave: v(i) = g(i % (d/2)) + tiny noise on the second copy
      Array.tabulate(d)(i =>
        if (i < d / 2) g(i) else g(i - d / 2) + 0.05 * r.nextGaussian())
    }
  }

  test("svdSquare: A = U diag(sigma) V^T with orthonormal U, V") {
    val r = new scala.util.Random(7)
    val a = Array.fill(d, d)(r.nextGaussian())
    val (u, s, v) = OpqOps.svdSquare(a)
    assert(maxAbsDiff(mul(u, transpose(u)), identity(d)) < 1e-9, "U not orthonormal")
    assert(maxAbsDiff(mul(v, transpose(v)), identity(d)) < 1e-9, "V not orthonormal")
    val usv = mul(u, mul(
      Array.tabulate(d, d)((i, j) => if (i == j) s(i) else 0.0), transpose(v)))
    assert(maxAbsDiff(usv, a) < 1e-9, "U S V^T != A")
    assert(s.forall(_ >= 0), "negative singular value")
  }

  test("svdSquare completes the basis on rank-deficient input") {
    val a = Array.tabulate(d, d)((i, j) => if (i == 0 && j == 0) 3.0 else 0.0)
    val (u, s, _) = OpqOps.svdSquare(a)
    assert(maxAbsDiff(mul(u, transpose(u)), identity(d)) < 1e-9)
    assert(math.abs(s.max - 3.0) < 1e-9 && s.count(_ > 1e-9) == 1)
  }

  test("trained rotation is orthogonal and preserves dot products") {
    val pts = correlated(200)
    val rot = OpqOps.trainRotation(pts, subQ = 4, codes = 8)
    assert(maxAbsDiff(mul(rot, transpose(rot)), identity(d)) < 1e-9,
      "R R^T != I")
    val x = pts(0); val y = pts(1)
    def dot(a: Array[Double], b: Array[Double]) =
      a.zip(b).map(t => t._1 * t._2).sum
    val dxy = dot(x, y)
    val drot = dot(OpqOps.matVec(rot, x), OpqOps.matVec(rot, y))
    assert(math.abs(dxy - drot) < 1e-9, s"dot not preserved: $dxy vs $drot")
  }

  test("training is deterministic") {
    val pts = correlated(150)
    val r1 = OpqOps.trainRotation(pts, subQ = 4, codes = 8)
    val r2 = OpqOps.trainRotation(pts, subQ = 4, codes = 8)
    assert(maxAbsDiff(r1, r2) == 0.0)
  }

  test("OPQ objective strictly beats unrotated PQ on cross-subspace-correlated data") {
    val pts = correlated(300)
    val rot = OpqOps.trainRotation(pts, subQ = 4, codes = 8)
    val errPq = OpqOps.sampleQuantError(pts, identity(d), subQ = 4, codes = 8, lloydIters = 4)
    val errOpq = OpqOps.sampleQuantError(pts, rot, subQ = 4, codes = 8, lloydIters = 4)
    assert(errOpq < 0.8 * errPq,
      f"OPQ error $errOpq%.3f not clearly below PQ error $errPq%.3f")
  }
}
