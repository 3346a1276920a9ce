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

  private def bruteEdge(edges: Seq[(Long, Long)]): Map[(Long, Long), Long] = {
    val und = edges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct.toSet
    val nb = und.toSeq.flatMap(e => Seq(e._1 -> e._2, e._2 -> e._1))
      .groupBy(_._1).map { case (n, xs) => n -> xs.map(_._2).toSet }
    und.toSeq.map { case (a, b) => (a, b) -> (nb(a) & nb(b)).size.toLong }
      .filter(_._2 > 0).toMap
  }

  test("per-edge counts (common neighbors of an existing edge) match " +
      "brute-force neighborhood intersection") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(23)
    val edges = (0 until 300)
      .map(_ => (rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
    val got = Triangles.edgeTriangleCounts(s, edges.toDF("a", "b"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == bruteEdge(edges))
    // consistency with the per-node counter: each node's triangle count
    // is half the sum of its incident edges' counts (each triangle at a
    // node covers exactly two incident edges)
    val perNode = run(edges)
    val fromEdges = got.toSeq
      .flatMap { case ((a, b), c) => Seq(a -> c, b -> c) }
      .groupBy(_._1).map { case (n, xs) => n -> xs.map(_._2).sum / 2 }
    assert(fromEdges == perNode)
  }

  test("per-edge path honors the loud adjacency-row guard") {
    val s = spark
    import s.implicits._
    val edges = (0 until 200)
      .map(i => (i.toLong, ((i + 1) % 200).toLong)).toDF("a", "b")
    val e = intercept[IllegalArgumentException] {
      Triangles.edgeTriangleCounts(s, edges, adjRowBytesCap = 8L)
    }
    assert(e.getMessage.contains("adjacency rows"))
  }

  test("clustering coefficients: clique 1.0, mixed node, pendant excluded") {
    val sp = spark
    import sp.implicits._
    // triangle {1,2,3} with a pendant 4 hanging off node 3
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
      .toDF("a", "b")
    val got = Triangles.clusteringCoefficients(sp, edges)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got(1L) == ((2L, 1L, 1.0)))          // closed neighborhood
    assert(got(2L) == ((2L, 1L, 1.0)))
    assert(got(3L) == ((3L, 1L, 0.333333)))     // 2·1/(3·2)
    assert(!got.contains(4L))                   // degree 1: undefined
    // triangle-free node with degree >= 2 reports coefficient 0
    val path = Seq((10L, 11L), (11L, 12L)).toDF("a", "b")
    val mid = Triangles.clusteringCoefficients(sp, path).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(mid == Map(11L -> 0.0))
  }
}
