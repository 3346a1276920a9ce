package graft

import scala.collection.mutable
import scala.util.Random
import graft.graph.Scc

class SccSpec extends SparkSpec {

  /** driver-side Kosaraju for the brute-force ground truth:
    * node -> (scc_id = min member, scc_size)
    */
  private def brute(edges: Seq[(Long, Long)]): Map[Long, (Long, Long)] = {
    val g = edges.groupMap(_._1)(_._2).withDefaultValue(Seq.empty)
    val gr = edges.groupMap(_._2)(_._1).withDefaultValue(Seq.empty)
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val seen = mutable.Set.empty[Long]
    val order = mutable.ArrayBuffer.empty[Long]
    def dfs(x: Long): Unit = {
      val stack = mutable.Stack((x, g(x).iterator)); seen += x
      while (stack.nonEmpty) {
        val (n, it) = stack.top
        it.find(!seen.contains(_)) match {
          case Some(w) => seen += w; stack.push((w, g(w).iterator))
          case None => order += n; stack.pop()
        }
      }
    }
    nodes.foreach(x => if (!seen(x)) dfs(x))
    val comp = mutable.Map.empty[Long, Long]
    for (x <- order.reverseIterator if !comp.contains(x)) {
      val members = mutable.ArrayBuffer(x)
      val st = mutable.Stack(x); comp(x) = x
      while (st.nonEmpty) {
        val n = st.pop()
        for (w <- gr(n) if !comp.contains(w)) {
          comp(w) = x; members += w; st.push(w)
        }
      }
      val id = members.min
      members.foreach(m => comp(m) = id)
    }
    val sizes = comp.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    comp.map { case (n, c) => n -> (c, sizes(c)) }.toMap
  }

  private def run(edges: Seq[(Long, Long)]): Map[Long, (Long, Long)] = {
    val s = spark
    import s.implicits._
    Scc.scc(s, edges.toDF("u", "v"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
  }

  test("two cycles joined by a one-way bridge stay separate SCCs") {
    val edges = Seq[(Long, Long)](
      (1, 2), (2, 3), (3, 1),     // cycle A
      (3, 4),                      // one-way bridge
      (4, 5), (5, 6), (6, 4))      // cycle B
    assert(run(edges) == Map(
      1L -> (1L, 3L), 2L -> (1L, 3L), 3L -> (1L, 3L),
      4L -> (4L, 3L), 5L -> (4L, 3L), 6L -> (4L, 3L)))
  }

  test("a DAG is all singletons") {
    val edges = Seq[(Long, Long)]((1, 2), (1, 3), (2, 4), (3, 4))
    assert(run(edges) == Map(
      1L -> (1L, 1L), 2L -> (2L, 1L), 3L -> (3L, 1L), 4L -> (4L, 1L)))
  }

  test("matches Kosaraju on random digraphs (property)") {
    val rnd = new Random(42)
    for (trial <- 0 until 5) {
      val n = 8 + trial * 2
      val edges = (0 until n * 2).map { _ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
      }.filter(e => e._1 != e._2).distinct
      if (edges.nonEmpty)
        assert(run(edges) == brute(edges), s"trial $trial edges $edges")
    }
  }
}
