package graft

import org.apache.spark.sql.functions._
import graft.graph.{LabelProp, Louvain}

/** Deterministic synchronous Louvain local moving (q352). */
class LouvainSpec extends SparkSpec {

  test("planted partition: local moving recovers the blocks and scores strongly modular") {
    val s = spark
    import s.implicits._
    val blocks = (0 until 4).map(b => (0 until 6).map(i => b * 10L + i))
    val inEdges = blocks.flatMap(ns =>
      for (i <- ns.indices; j <- i + 1 until ns.size) yield (ns(i), ns(j)))
    val bridges = (0 until 3).map(b => (b * 10L + 5, (b + 1) * 10L))
    val e = (inEdges ++ bridges).toDF("u", "v")
    val report = Louvain.louvainCommunities(s, e, rounds = 8).collect()
    val q = report.head.getDouble(5)
    assert(q > 0.5, s"found partition must be strongly modular: $q")
    val sizes = report.map(_.getLong(1)).sorted.toSeq
    assert(sizes == Seq(6L, 6L, 6L, 6L), sizes)
    // and it matches the LPA detector's quality on this easy fixture —
    // two independent detectors, one quality functional (q344/q352)
    val qLpa = LabelProp.lpaCommunities(s, e, rounds = 5)
      .collect().head.getDouble(5)
    assert(q >= qLpa - 1e-9, s"louvain $q vs lpa $qLpa")
  }

  test("two cliques with a bridge land in two communities; run is deterministic") {
    val s = spark
    import s.implicits._
    val cl = Seq((1L, 2L), (1L, 3L), (2L, 3L), (10L, 11L), (10L, 12L),
      (11L, 12L), (3L, 10L))
    val e = cl.toDF("u", "v")
    val got = Louvain.localMove(s, e, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Set(1L, 2L, 3L).map(got).size == 1, got)
    assert(Set(10L, 11L, 12L).map(got).size == 1, got)
    assert(got(1L) != got(10L), s"bridge must not merge the cliques: $got")
    val again = Louvain.localMove(s, e, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == again, "synchronous rounds must be a pure function")
  }

  test("coloring schedule: a lone pair merges in one round and stays merged") {
    val s = spark
    import s.implicits._
    // path 1-2: round 1 moves the odd class only — node 1 joins node
    // 2's community (gain 2m·1 − 1·1 = 1 > stay 0) while 2 holds; the
    // swap livelock of fully-synchronous moving cannot happen
    val e = Seq((1L, 2L)).toDF("u", "v")
    val got = Louvain.localMove(s, e, rounds = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L, 2L -> 2L), got)
    // round 2 (even class): 2's only option is its own community — stable
    val got2 = Louvain.localMove(s, e, rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got2 == got, s"merged pair must be a fixed point: $got2")
  }

  test("two-level: aggregation + re-move never scores below one-level") {
    val s = spark
    import s.implicits._
    // the planted 4-block fixture, but only TWO level-1 rounds — the
    // coarse pass must pick up whatever the truncated move phase left
    val blocks = (0 until 4).map(b => (0 until 6).map(i => b * 10L + i))
    val inEdges = blocks.flatMap(ns =>
      for (i <- ns.indices; j <- i + 1 until ns.size) yield (ns(i), ns(j)))
    val bridges = (0 until 3).map(b => (b * 10L + 5, (b + 1) * 10L))
    val e = (inEdges ++ bridges).toDF("u", "v")
    def q(labels: org.apache.spark.sql.DataFrame): Double =
      graft.graph.Modularity.modularity(s,
        e.select(col("u").as("a"), col("v").as("b")),
        labels.select(col("node"),
          col("community").cast("string").as("community")))
        .collect().head.getDouble(5)
    val qOne = q(Louvain.localMove(s, e, rounds = 2))
    val qTwo = q(Louvain.louvainTwoLevel(s, e, rounds1 = 2, rounds2 = 4))
    assert(qTwo >= qOne - 1e-12, s"two-level $qTwo must not score below one-level $qOne")
    // and on the two-clique bridge the quotient pass lands exactly two
    // communities (the weighted self-loop arithmetic keeps them apart)
    val cl = Seq((1L, 2L), (1L, 3L), (2L, 3L), (10L, 11L), (10L, 12L),
      (11L, 12L), (3L, 10L)).toDF("u", "v")
    val two = Louvain.louvainTwoLevel(s, cl, rounds1 = 2, rounds2 = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Set(1L, 2L, 3L).map(two).size == 1, two)
    assert(Set(10L, 11L, 12L).map(two).size == 1, two)
    assert(two(1L) != two(10L), s"bridge must not merge the cliques: $two")
  }
}
