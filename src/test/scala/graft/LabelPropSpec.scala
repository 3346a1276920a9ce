package graft

import org.apache.spark.sql.functions._
import graft.graph.{Bfs, LabelProp}

/** Deterministic LPA (q164) and weighted Bellman-Ford (q163) semantics. */
class LabelPropSpec extends SparkSpec {

  test("two cliques bridged by one edge converge to two communities") {
    val s = spark
    import s.implicits._
    // cliques {1,2,3} and {10,11,12}, bridge 3-10, symmetrized
    val cl = Seq((1L, 2L), (1L, 3L), (2L, 3L), (10L, 11L), (10L, 12L),
      (11L, 12L), (3L, 10L))
    val edges = (cl ++ cl.map(_.swap)).toDF("u", "v")
    val got = LabelProp.propagate(s, edges, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // deterministic 3-round fixpoint: the left clique settles on 1; the
    // right clique settles on 3 (the bridge imports 3 into node 10 in
    // round 1 via the min tie-break, and it propagates)
    assert(Set(1L, 2L, 3L).map(got) == Set(1L), got)
    assert(Set(10L, 11L, 12L).map(got) == Set(3L), got)
  }

  test("planted partition: LPA communities score at least the perturbed planting (q344 quality pin)") {
    val s = spark
    import s.implicits._
    // planted partition: 4 cliques of 6 nodes (blocks 0-3), one bridge
    // edge between consecutive blocks — dense inside, sparse across
    val blocks = (0 until 4).map(b => (0 until 6).map(i => b * 10L + i))
    val inEdges = blocks.flatMap(ns =>
      for (i <- ns.indices; j <- i + 1 until ns.size) yield (ns(i), ns(j)))
    val bridges = (0 until 3).map(b => (b * 10L + 5, (b + 1) * 10L))
    val e = (inEdges ++ bridges).toDF("u", "v")
    val report = LabelProp.lpaCommunities(s, e, rounds = 5)
      .collect()
    val qFound = report.head.getDouble(5)
    // the planted labeling, perturbed: one node per block misassigned
    // to the neighbor block — the quality bar LPA must clear
    val planted = blocks.zipWithIndex.flatMap { case (ns, b) =>
      ns.map(n => (n, if (n % 10 == 5) ((b + 1) % 4).toString else b.toString))
    }.toDF("node", "community")
    val canon = e.select(col("u").as("a"), col("v").as("b"))
    val qPerturbed = graft.graph.Modularity.modularity(s, canon, planted)
      .collect().head.getDouble(5)
    assert(qFound > 0.5, s"found partition must be strongly modular: $qFound")
    assert(qFound >= qPerturbed,
      s"LPA partition ($qFound) must score >= the perturbed planting ($qPerturbed)")
    // and LPA actually recovers the planted blocks (4 communities of 6)
    val sizes = report.map(r => r.getLong(1)).sorted.toSeq
    assert(sizes == Seq(6L, 6L, 6L, 6L), sizes)
  }

  test("weighted distances relax through cheaper multi-hop paths") {
    val s = spark
    import s.implicits._
    // direct 1->3 costs 100; 1->2->3 costs 10+10=20
    val edges = Seq((1L, 3L, 100L), (1L, 2L, 10L), (2L, 3L, 10L)).toDF("u", "v", "w")
    val seeds = Seq(1L).toDF("node")
    val got = Bfs.weightedDistances(s, edges, seeds, maxHops = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 2L -> 10L, 3L -> 20L), got)
    // with 1 hop only, the expensive direct edge wins
    val one = Bfs.weightedDistances(s, edges, seeds, maxHops = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(one(3L) == 100L, one)
  }
}
