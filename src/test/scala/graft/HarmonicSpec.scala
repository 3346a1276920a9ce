package graft

import graft.graph.Anf

/** Harmonic centrality (graph/Anf.scala): hand-checked exact values on
  * a path, horizon truncation, HyperBall rank agreement with the exact
  * rung on a separable star, and determinism.
  */
class HarmonicSpec extends SparkSpec {

  private def edges(pairs: (Long, Long)*) = {
    val s = spark
    import s.implicits._
    pairs.toDF("u", "v")
  }

  private val path = Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L)

  test("exact harmonic on the 5-path: hand values, truncating 1e6 div d") {
    val got = Anf.harmonicExact(spark, edges(path: _*), maxT = 4, k = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(
      3L -> 3000000L,
      2L -> 2833333L, 4L -> 2833333L,
      1L -> 2083333L, 5L -> 2083333L), s"got $got")
  }

  test("the horizon truncates: maxT=1 is degree in micro") {
    val got = Anf.harmonicExact(spark, edges(path: _*), maxT = 1, k = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1000000L, 2L -> 2000000L, 3L -> 2000000L,
      4L -> 2000000L, 5L -> 1000000L), s"got $got")
  }

  test("hyperball ranks the star hub first, within the HLL band") {
    val star = (1L to 8L).map(i => 100L -> i)
    val exact = Anf.harmonicExact(spark, edges(star: _*), maxT = 2, k = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val approx = Anf.harmonicHyperball(spark, edges(star: _*), maxT = 2,
      k = 10).collect()
    assert(approx(0).getLong(0) == 100L,
      s"hub must rank first: ${approx.toSeq}")
    val hHub = approx(0).getLong(1).toDouble
    assert(math.abs(hHub - exact(100L).toDouble) / exact(100L) < 0.25,
      s"hub estimate $hHub vs exact ${exact(100L)}")
  }

  test("hyperball re-runs bit-deterministically") {
    val a = Anf.harmonicHyperball(spark, edges(path: _*), maxT = 3, k = 10)
      .collect().map(_.toSeq).toSeq
    val b = Anf.harmonicHyperball(spark, edges(path: _*), maxT = 3, k = 10)
      .collect().map(_.toSeq).toSeq
    assert(a == b)
  }
}
