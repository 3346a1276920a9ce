package graft

import graft.graph.KCore

class KCoreSpec extends SparkSpec {

  private def run(edges: Seq[(Long, Long)], k: Int, maxRounds: Int = 20): Map[Long, Long] = {
    val s = spark
    import s.implicits._
    KCore.kCore(s, edges.toDF("a", "b"), k, maxRounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("clique plus pendant chain: the 3-core is exactly the clique") {
    // K4 on {0,1,2,3}; chain 3-4-5 hangs off it
    val k4 = for (i <- 0L to 3L; j <- (i + 1) to 3L) yield (i, j)
    val got = run(k4 ++ Seq((3L, 4L), (4L, 5L)), k = 3)
    assert(got == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
  }

  test("peel cascade: removing one node drags its neighbors below k") {
    // cycle 0-1-2-3-0 (all deg 2) plus pendant 4 on node 0.
    // k=2: pendant 4 peels; the cycle survives with core_deg 2.
    val got = run(Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L), (0L, 4L)), k = 2)
    assert(got == Map(0L -> 2L, 1L -> 2L, 2L -> 2L, 3L -> 2L))
    // k=3: everything peels (cycle is only 2-regular)
    assert(run(Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L), (0L, 4L)), k = 3).isEmpty)
  }

  test("duplicate, reversed, and self-loop edges do not inflate degrees") {
    val noisy = Seq((0L, 1L), (1L, 0L), (0L, 1L), (1L, 1L), (1L, 2L), (2L, 0L))
    // triangle 0-1-2; every node core_deg 2 at k=2 despite the noise
    assert(run(noisy, k = 2) == Map(0L -> 2L, 1L -> 2L, 2L -> 2L))
  }

  test("non-convergence within maxRounds throws instead of returning a superset") {
    // path 0-1-2-...-6: k=2 peels one endpoint pair per round (3 rounds
    // to empty + 1 to observe the fixpoint); maxRounds=2 must throw.
    val path = (0L until 6L).map(i => (i, i + 1))
    val e = intercept[IllegalArgumentException](run(path, k = 2, maxRounds = 2))
    assert(e.getMessage.contains("did not stabilize"))
    assert(run(path, k = 2, maxRounds = 10).isEmpty)
  }
}
