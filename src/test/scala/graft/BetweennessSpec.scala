package graft

import graft.graph.Betweenness

/** Brandes betweenness (graph/Betweenness.scala): hand-checked path
  * and diamond dependencies, multi-source additivity, and the horizon
  * truncation semantics.
  */
class BetweennessSpec extends SparkSpec {

  private def undirected(pairs: (Long, Long)*) = {
    val s = spark
    import s.implicits._
    val e = pairs.toDF("u", "v")
    e.unionAll(e.select(e("v").as("u"), e("u").as("v")))
  }

  private def seeds(ns: Long*) = {
    val s = spark
    import s.implicits._
    ns.toDF("node")
  }

  private def run(edges: org.apache.spark.sql.DataFrame,
      src: org.apache.spark.sql.DataFrame, h: Int): Map[Long, Long] =
    Betweenness.betweenness(spark, edges, src, h)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("path graph from one end: classic 3-2-1 dependencies") {
    val got = run(undirected(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L),
      seeds(1L), h = 4)
    assert(got == Map(2L -> 3000000L, 3L -> 2000000L, 4L -> 1000000L),
      s"got $got")
  }

  test("diamond: two shortest paths split the dependency") {
    val got = run(undirected(1L -> 2L, 1L -> 3L, 2L -> 4L, 3L -> 4L),
      seeds(1L), h = 2)
    assert(got == Map(2L -> 500000L, 3L -> 500000L), s"got $got")
  }

  test("multiple sources add their dependencies") {
    val got = run(undirected(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L),
      seeds(1L, 5L), h = 4)
    assert(got == Map(2L -> 4000000L, 3L -> 4000000L, 4L -> 4000000L),
      s"got $got")
  }

  test("the horizon truncates dependencies past it") {
    val got = run(undirected(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L),
      seeds(1L), h = 2)
    assert(got == Map(2L -> 1000000L), s"got $got")
  }
}
