package graft

import org.apache.spark.sql.functions._
import graft.graph.Walks
import graft.llm.TextRank

/** Node-embedding axis (graph/Walks.nodeEmbeddingAxis): composition
  * pin — must equal ppmiAxis over pair/occurrence counts hand-derived
  * from the collected walk table — plus determinism.
  */
class NodeEmbeddingSpec extends SparkSpec {

  private def ring(n: Long) = {
    val s = spark
    import s.implicits._
    val e = (1L to n).flatMap(i => Seq(i -> (i % n + 1), i -> (i % n + 2)))
      .map { case (a, b) => (a, if (b > n) b - n else b) }.toDF("u", "v")
    e.unionAll(e.select(e("v").as("u"), e("u").as("v")))
  }

  private def seeds(ns: Seq[Long]) = {
    val s = spark
    import s.implicits._
    ns.toDF("node")
  }

  test("composition pin: equals ppmiAxis over hand-derived walk pairs") {
    val s = spark
    import s.implicits._
    val ed = ring(12)
    val sd = seeds(1L to 12L)
    val wk = Walks.deterministicWalks(spark, ed, sd, steps = 6,
      salt = "x").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val byStart = wk.groupBy(_._1).view.mapValues(
      _.sortBy(_._2).map(_._3)).toMap
    val pairs = scala.collection.mutable.Map[(Long, Long), Long]()
    for (walk <- byStart.values; o <- 1 to 2;
         i <- walk.indices if i + o < walk.length) {
      val (x, y) = (walk(i), walk(i + o))
      if (x != y) {
        val k = (math.min(x, y), math.max(x, y))
        pairs(k) = pairs.getOrElse(k, 0L) + 1L
      }
    }
    val pcDf = pairs.toSeq.filter(_._2 >= 2L)
      .map { case ((a, b), c) => (a, b, c) }.toDF("a", "b", "c2")
    val ucDf = wk.groupBy(_._3).view.mapValues(_.length.toLong).toSeq
      .toDF("tok", "c1")
    val want = TextRank.ppmiAxis(spark, pcDf, ucDf, iters = 5, k = 100)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = Walks.nodeEmbeddingAxis(spark, ed, sd, steps = 6,
      salt = "x", minCount = 2, iters = 5, k = 100)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want, s"got $got want $want")
    assert(got.nonEmpty, "the ring walk corpus must produce an axis")
  }

  test("re-running is bit-deterministic") {
    val ed = ring(10)
    val a = Walks.nodeEmbeddingAxis(spark, ed, seeds(1L to 10L),
      steps = 5, salt = "d").collect().map(_.toSeq).toSeq
    val b = Walks.nodeEmbeddingAxis(spark, ed, seeds(1L to 10L),
      steps = 5, salt = "d").collect().map(_.toSeq).toSeq
    assert(a == b)
  }
}
