package graft

import org.apache.spark.sql.functions._
import graft.graph.ConnectedComponents

/** Large-star/small-star connected components vs a brute-force
  * union-find, plus the pin that justifies the algorithm's existence
  * next to q49's min-label propagation: logarithmic rounds on a path
  * graph, where per-hop propagation would need diameter rounds.
  */
class CcSpec extends SparkSpec {
  private def s = spark

  private def unionFind(n: Seq[Long], edges: Seq[(Long, Long)])
      : Map[Long, Long] = {
    val parent = scala.collection.mutable.Map(n.map(x => x -> x): _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // canonical label = min member id, which find() preserves because
    // unions always root at the smaller representative
    n.map(x => x -> find(x)).toMap
  }

  private def run(edges: Seq[(Long, Long)]): (Map[Long, (Long, Long)], Int) = {
    val sp = s
    import sp.implicits._
    val (df, rounds) = ConnectedComponents.ccWithRounds(
      sp, edges.toDF("u", "v"))
    (df.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap, rounds)
  }

  test("path graph: one component, min label, LOGARITHMIC rounds") {
    val edges = (1L until 64L).map(i => (i, i + 1))
    val (got, rounds) = run(edges)
    assert(got.size == 64)
    assert(got.values.forall { case (c, n) => c == 1L && n == 64L })
    // diameter 63; the star alternation must close far faster
    assert(rounds <= 8, s"expected <= 8 rounds on a 64-path, got $rounds")
  }

  test("fragmented graph matches brute-force union-find") {
    // deterministic pseudo-random sparse graph: multiple components,
    // cycles, a star, an isolated edge
    val rnd = new scala.util.Random(42)
    val edges = (Seq.tabulate(40)(_ =>
        (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      ++ Seq((100L, 101L), (200L, 201L), (201L, 202L), (202L, 200L)))
      .filter { case (a, b) => a != b }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val want = unionFind(nodes, edges)
    val sizes = want.groupBy(_._2).map { case (c, m) => c -> m.size.toLong }
    val (got, _) = run(edges)
    assert(got.keySet == nodes.toSet)
    nodes.foreach { n =>
      assert(got(n)._1 == want(n), s"node $n: ${got(n)._1} != ${want(n)}")
      assert(got(n)._2 == sizes(want(n)), s"size of $n's component")
    }
  }

  test("duplicates, reversed duplicates, and self-loops are ignored") {
    val (got, _) = run(Seq((1L, 2L), (2L, 1L), (1L, 2L), (3L, 3L), (2L, 3L)))
    assert(got == Map(1L -> (1L, 3L), 2L -> (1L, 3L), 3L -> (1L, 3L)))
  }

  test("incremental fold over a delta batch equals full recompute") {
    val sp = s
    import sp.implicits._
    val rnd = new scala.util.Random(7)
    val base = Seq.tabulate(30)(_ =>
        (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter { case (a, b) => a != b }
    // delta: bridges between existing components, brand-new nodes,
    // a new-to-new edge, and a no-op duplicate of a base edge
    val delta = Seq.tabulate(15)(_ =>
        (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter { case (a, b) => a != b } ++
      Seq((100L, 101L), (101L, 5L), (200L, 201L), base.head)
    val labels = ConnectedComponents
      .connectedComponents(sp, base.toDF("u", "v"))
      .select("node", "comp_id")
    val inc = ConnectedComponents
      .incrementalComponents(sp, labels, delta.toDF("u", "v"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val full = ConnectedComponents
      .connectedComponents(sp, (base ++ delta).toDF("u", "v"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(inc == full)
  }

  test("incremental with an empty delta is the identity labeling") {
    val sp = s
    import sp.implicits._
    val labels = ConnectedComponents
      .connectedComponents(sp, Seq((1L, 2L), (3L, 4L)).toDF("u", "v"))
      .select("node", "comp_id")
    val out = ConnectedComponents.incrementalComponents(sp, labels,
        Seq.empty[(Long, Long)].toDF("u", "v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set((1L, 1L, 2L), (2L, 1L, 2L), (3L, 3L, 2L), (4L, 3L, 2L)))
  }

  test("empty edge list yields empty result without iterating") {
    val sp = s
    import sp.implicits._
    val (df, rounds) = ConnectedComponents.ccWithRounds(sp,
      Seq.empty[(Long, Long)].toDF("u", "v"))
    assert(df.isEmpty && rounds == 0)
  }
}
