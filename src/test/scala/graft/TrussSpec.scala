package graft

import org.apache.spark.sql.DataFrame
import graft.graph.Truss

class TrussSpec extends SparkSpec {

  private def edges(rows: Seq[(Long, Long)]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("a", "b")
  }

  private def truss(rows: Seq[(Long, Long)], k: Int, maxRounds: Int = 8)
      : Seq[(Long, Long, Long)] =
    Truss.kTruss(spark, edges(rows), k, maxRounds).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  private val k4: Seq[(Long, Long)] = for {
    i <- 1L to 4L; j <- (i + 1) to 4L
  } yield (i, j)

  test("a clique K4 survives the 4-truss intact with support 2 everywhere") {
    val got = truss(k4, k = 4)
    assert(got.size == 6 && got.forall(_._3 == 2L))
  }

  test("pendant edges and the tail of a lollipop peel away") {
    // K4 plus a tail 4-5-6: tail edges close no triangles
    val got = truss(k4 ++ Seq((4L, 5L), (5L, 6L)), k = 3)
    assert(got.map(t => (t._1, t._2)).toSet == k4.toSet)
  }

  test("cascading peel: removing one edge's support collapses the chain") {
    // two triangles sharing edge (2,3): 1-2-3 and 2-3-4, plus edge (4,5).
    // k=4: every edge has support 1 < 2 -> empty truss after cascade
    val g = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L), (4L, 5L))
    assert(truss(g, k = 4).isEmpty)
    // k=3: the two triangles survive, (4,5) peels
    val t3 = truss(g, k = 3)
    assert(t3.map(t => (t._1, t._2)).toSet ==
      Set((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L)))
    // the shared edge (2,3) closes both triangles
    assert(t3.find(t => t._1 == 2L && t._2 == 3L).get._3 == 2L)
  }

  test("instability within maxRounds raises loudly") {
    // triangle staircase: at k=4 the rung edges (support 1) drop in
    // round 1, stranding the path edges for round 2 — 1 round cannot
    // reach the (empty) fixed point
    val stairs = (1L to 10L).flatMap(i => Seq((i, i + 1), (i, i + 2)))
    val e = intercept[IllegalStateException](truss(stairs, k = 4, maxRounds = 1))
    assert(e.getMessage.contains("not stable"), e.getMessage)
    // with budget it reaches the empty fixed point cleanly
    assert(truss(stairs, k = 4, maxRounds = 8).isEmpty)
  }

  test("k below 3 is rejected") {
    intercept[IllegalArgumentException](truss(Seq((1L, 2L)), k = 2))
  }
}
