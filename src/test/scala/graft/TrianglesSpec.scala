package graft

import graft.graph.Triangles

class TrianglesSpec extends SparkSpec {

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val s = spark
    import s.implicits._
    Triangles.triangleCounts(s, edges.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private def brute(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val und = edges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct.toSet
    val nodes = und.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val tris = for {
      i <- nodes; j <- nodes if i < j && und((i, j))
      k <- nodes if j < k && und((j, k)) && und((i, k))
    } yield (i, j, k)
    tris.flatMap(t => Seq(t._1, t._2, t._3)).groupBy(identity)
      .map { case (n, xs) => n -> xs.size.toLong }
  }

  test("K4: every node sits in 3 of the 4 triangles") {
    val nodes = Seq(0L, 1L, 2L, 3L)
    val edges = for { a <- nodes; b <- nodes if a < b } yield (a, b)
    assert(run(edges) == nodes.map(_ -> 3L).toMap)
  }

  test("a star has no triangles; adding one rim edge makes exactly one") {
    val star = (1L to 6L).map(i => (0L, i))
    assert(run(star) == Map.empty)
    val got = run(star :+ (1L, 2L))
    assert(got == Map(0L -> 1L, 1L -> 1L, 2L -> 1L))
  }

  test("self-loops, duplicates and reversed duplicates are ignored") {
    val edges = Seq((0L, 1L), (1L, 0L), (1L, 1L), (1L, 2L), (2L, 0L), (0L, 2L))
    assert(run(edges) == Map(0L -> 1L, 1L -> 1L, 2L -> 1L))
  }

  test("matches brute force on a random graph (property)") {
    val rnd = new scala.util.Random(11)
    val edges = (0 until 300)
      .map(_ => (rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
    assert(run(edges) == brute(edges))
  }

  test("ids that overflow the 31-bit orientation pack fail loud") {
    intercept[IllegalArgumentException] {
      run(Seq((0L, 1L << 31)))
    }
  }
}
