package graft

import graft.graph.Bfs

class BfsSpec extends SparkSpec {

  private def run(edges: Seq[(Long, Long)], seeds: Seq[Long], hops: Int): Map[Long, Long] = {
    val s = spark
    import s.implicits._
    Bfs.boundedDistances(s, edges.toDF("u", "v"), seeds.toDF("node"), hops)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("line graph: distances count hops and stop at the cap") {
    val line = (0L until 5L).map(i => (i, i + 1)) // directed 0→1→2→3→4→5
    assert(run(line, Seq(0L), 3) ==
      Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L)) // 4, 5 beyond the cap
  }

  test("multiple seeds take the minimum; converging paths take the shortest") {
    val edges = Seq((0L, 2L), (1L, 2L), (2L, 3L), (0L, 3L)) // 3 via 0 direct or via 2
    val got = run(edges, Seq(0L, 1L), 3)
    assert(got == Map(0L -> 0L, 1L -> 0L, 2L -> 1L, 3L -> 1L))
  }

  test("direction matters; unreachable nodes are absent") {
    val edges = Seq((1L, 0L), (2L, 3L)) // both edges point away from reach
    assert(run(edges, Seq(0L), 3) == Map(0L -> 0L))
  }

  test("a seed outside the edge set still reports itself at distance 0") {
    assert(run(Seq((1L, 2L)), Seq(99L), 2) == Map(99L -> 0L))
  }
}
