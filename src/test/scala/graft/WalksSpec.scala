package graft

import graft.graph.Walks

/** Deterministic walk corpus (graph/Walks.scala): the md5 argmin step
  * replayed by hand, walk validity (every hop is an edge), sink
  * death, and salt-keyed reproducibility.
  */
class WalksSpec extends SparkSpec {

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def edges(pairs: (Long, Long)*) = {
    val s = spark
    import s.implicits._
    pairs.toDF("u", "v")
  }

  private def seeds(ns: Long*) = {
    val s = spark
    import s.implicits._
    ns.toDF("node")
  }

  test("each step is the hand-computed md5 argmin over out-neighbors") {
    // node 1 has three out-neighbors; replay the draw in plain Scala
    val es = Seq(1L -> 2L, 1L -> 3L, 1L -> 4L, 2L -> 1L, 3L -> 1L, 4L -> 1L)
    val got = Walks.deterministicWalks(spark, edges(es: _*), seeds(1L),
      steps = 2, salt = "t").collect()
      .map(r => (r.getInt(1), r.getLong(2))).toMap
    val first = Seq(2L, 3L, 4L).minBy(v => (md5Hex(s"t-1-1-$v"), v))
    assert(got(1) == first, s"step 1: $got expected $first")
    // step 2 from `first` goes back to 1 (its only neighbor)
    assert(got(2) == 1L, s"step 2: $got")
    assert(got(0) == 1L)
  }

  test("every consecutive hop is an edge of the graph") {
    val es = Seq(1L -> 2L, 2L -> 3L, 3L -> 1L, 2L -> 1L, 3L -> 2L,
      1L -> 3L)
    val rows = Walks.deterministicWalks(spark, edges(es: _*),
      seeds(1L, 2L), steps = 4, salt = "v").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val eset = es.toSet
    rows.groupBy(_._1).values.foreach { walk =>
      val ordered = walk.sortBy(_._2).map(_._3)
      ordered.zip(ordered.tail).foreach { case (a, b) =>
        assert(eset.contains(a -> b), s"$a->$b not an edge in $walk")
      }
    }
  }

  test("a walk dies at a sink") {
    val got = Walks.deterministicWalks(spark, edges(1L -> 2L), seeds(1L),
      steps = 3, salt = "s").collect().map(_.getInt(1)).sorted.toSeq
    assert(got == Seq(0, 1), s"got $got")
  }

  test("the same salt reproduces the corpus bit-for-bit") {
    val es = Seq(1L -> 2L, 1L -> 3L, 2L -> 3L, 3L -> 1L, 2L -> 1L,
      3L -> 2L)
    val a = Walks.deterministicWalks(spark, edges(es: _*), seeds(1L, 2L, 3L),
      steps = 5, salt = "r").collect().map(_.toSeq).toSeq
    val b = Walks.deterministicWalks(spark, edges(es: _*), seeds(1L, 2L, 3L),
      steps = 5, salt = "r").collect().map(_.toSeq).toSeq
    assert(a == b)
  }
}
