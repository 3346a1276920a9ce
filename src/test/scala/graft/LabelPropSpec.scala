package graft

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
