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

  test("a bin empty in BOTH windows still carries its smoothed share") {
    // ref fills only bin 0 with 3 rows, cur with 1; bins 1 and 2 are
    // empty in BOTH windows. They must still contribute their smoothed
    // (1/(n+B)) shares — dropping them leaves p/q summing past 1 and
    // under-reports n_bins (the pre-fix bug)
    val got = Quality.psi(frame(Seq(5L, 5L, 5L), Seq(5L)),
      col("r") === 1L, col("v"), binWidth = 10L, bins = 3).collect()(0)
    assert(got.getLong(2) == 3L, s"n_bins must be the configured 3: $got")
    def term(c1: Long, c2: Long) = {
      val p = (c1 + 1).toDouble / (3 + 3)
      val q = (c2 + 1).toDouble / (1 + 3)
      (p - q) * math.log(p / q)
    }
    val expected = term(3, 1) + term(0, 0) + term(0, 0)
    assert(math.abs(got.getDouble(3) - expected) < 2e-6,
      s"$got vs $expected")
  }

  test("values clamp into the first and last bins") {
    val got = Quality.psi(frame(Seq(-5L, 999L), Seq(-7L, 888L)),
      col("r") === 1L, col("v"), 10L, 5).collect()(0)
    // all four rows land in bins {0, 4}: identical shares, psi 0
    assert(got.getDouble(3) == 0.0, s"$got")
  }
}
