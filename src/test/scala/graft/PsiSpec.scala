package graft

import org.apache.spark.sql.functions._
import graft.rel.Quality

/** PSI drift monitor (rel/Quality.psi): exact zero on identical
  * distributions, detection of a shifted one, swap symmetry, and the
  * bin clamping.
  */
class PsiSpec extends SparkSpec {

  private def frame(ref: Seq[Long], cur: Seq[Long]) = {
    val s = spark
    import s.implicits._
    (ref.map(v => (1L, v)) ++ cur.map(v => (0L, v))).toDF("r", "v")
  }

  test("identical distributions score exactly zero") {
    val vs = Seq(5L, 15L, 25L, 25L, 35L, 45L)
    val got = Quality.psi(frame(vs, vs), col("r") === 1L, col("v"),
      binWidth = 10L, bins = 5).collect()(0)
    assert(got.getDouble(3) == 0.0 && !got.getBoolean(4), s"$got")
    assert(got.getLong(0) == 6L && got.getLong(1) == 6L)
  }

  test("a shifted distribution drifts") {
    val ref = Seq.fill(50)(5L) ++ Seq.fill(50)(15L)
    val cur = Seq.fill(50)(35L) ++ Seq.fill(50)(45L)
    val got = Quality.psi(frame(ref, cur), col("r") === 1L, col("v"),
      binWidth = 10L, bins = 5).collect()(0)
    assert(got.getDouble(3) > 0.2 && got.getBoolean(4), s"$got")
  }

  test("PSI is symmetric under window swap") {
    val ref = Seq.fill(30)(5L) ++ Seq.fill(10)(25L)
    val cur = Seq.fill(10)(5L) ++ Seq.fill(25)(25L) ++ Seq.fill(5)(45L)
    val a = Quality.psi(frame(ref, cur), col("r") === 1L, col("v"),
      10L, 5).collect()(0).getDouble(3)
    val b = Quality.psi(frame(cur, ref), col("r") === 1L, col("v"),
      10L, 5).collect()(0).getDouble(3)
    assert(a == b, s"$a vs $b")
  }

  test("values clamp into the first and last bins") {
    val got = Quality.psi(frame(Seq(-5L, 999L), Seq(-7L, 888L)),
      col("r") === 1L, col("v"), 10L, 5).collect()(0)
    // all four rows land in bins {0, 4}: identical shares, psi 0
    assert(got.getDouble(3) == 0.0, s"$got")
  }
}
