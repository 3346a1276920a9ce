package graft

import graft.graph.LinkPrediction

/** Link prediction scores (graph/LinkPrediction.scala): hand cases on
  * a path, a triangle (no candidates), a square, a star, and the hub
  * cap; plus orientation/duplicate tolerance of the edge input.
  */
class LinkPredictionSpec extends SparkSpec {

  private def scores(edges: Seq[(Long, Long)], degCap: Long = 4096L) = {
    val s = spark
    import s.implicits._
    LinkPrediction.linkPredictionScores(s, edges.toDF("a", "b"), degCap)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
  }

  test("path 1-2-3: the single wedge predicts (1,3) with ra = 10^6/2") {
    val got = scores(Seq((1L, 2L), (2L, 3L)))
    assert(got === Map((1L, 3L) -> ((1L, 500000L))))
  }

  test("triangle: every distance-2 pair is already an edge -> empty") {
    assert(scores(Seq((1L, 2L), (2L, 3L), (1L, 3L))).isEmpty)
  }

  test("square 1-2-3-4: both diagonals score cn=2, ra=2*(10^6/2)") {
    val got = scores(Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)))
    assert(got === Map(
      (1L, 3L) -> ((2L, 1000000L)),
      (2L, 4L) -> ((2L, 1000000L))))
  }

  test("star: every leaf pair shares only the center, ra = 10^6/degree") {
    val star = (1L to 5L).map(i => (0L, i))
    val got = scores(star)
    assert(got.size === 10)
    assert(got.values.forall(_ == ((1L, 200000L))))
  }

  test("hub cap excludes the star center entirely") {
    val star = (1L to 5L).map(i => (0L, i))
    assert(scores(star, degCap = 4L).isEmpty)
  }

  test("duplicate and reversed edges collapse before scoring") {
    val got = scores(Seq((1L, 2L), (2L, 1L), (2L, 3L), (2L, 3L), (3L, 3L)))
    assert(got === Map((1L, 3L) -> ((1L, 500000L))))
  }
}
