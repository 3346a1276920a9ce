package graft

import graft.rel.Tree

/** Boosted regression stumps (rel/Tree.boostedStumps): hand-checked
  * two-level fixture (perfect fit in one round, zero-gain stall
  * after), deterministic feature tie-break, and RMSE descent on a
  * structured fixture.
  */
class BoostedStumpsSpec extends SparkSpec {

  test("a separable step function fits perfectly in one round") {
    val s = spark
    import s.implicits._
    val df = Seq((0L, 10L), (0L, 10L), (1L, 20L), (1L, 20L))
      .toDF("x", "ym")
    val got = Tree.boostedStumps(df, Seq("x"), rounds = 2).collect()
    // F0 = 15; round 1: split x<=0, leaves (-5, +5), gain 100, rmse 0
    val r1 = got(0)
    assert(r1.getString(1) == "x" && r1.getLong(2) == 0L)
    assert(r1.getLong(4) == -5L && r1.getLong(5) == 5L)
    assert(r1.getDouble(6) == 100.0 && r1.getDouble(7) == 0.0, s"$r1")
    // round 2: nothing left — zero gain, zero leaves, rmse stays 0
    val r2 = got(1)
    assert(r2.getDouble(6) == 0.0 && r2.getLong(4) == 0L
      && r2.getLong(5) == 0L && r2.getDouble(7) == 0.0, s"$r2")
  }

  test("tied features break to the lexicographically first") {
    val s = spark
    import s.implicits._
    val df = Seq((0L, 0L, 10L), (0L, 0L, 10L), (1L, 1L, 20L), (1L, 1L, 20L))
      .toDF("b", "a", "ym")
    val got = Tree.boostedStumps(df, Seq("b", "a"), rounds = 1).collect()
    assert(got(0).getString(1) == "a", s"${got(0)}")
  }

  test("rmse descends across rounds on a two-factor fixture") {
    val s = spark
    import s.implicits._
    // ym = 100*q + 10*d: round 1 splits q, later rounds pick up d
    val df = (for (q <- 1 to 4; d <- 0 to 3; _ <- 1 to 5)
      yield (q.toLong, d.toLong, 100L * q + 10L * d))
      .toDF("q", "d", "ym")
    val rs = Tree.boostedStumps(df, Seq("d", "q"), rounds = 4)
      .collect().map(_.getDouble(7))
    assert(rs.zip(rs.tail).forall { case (a, b) => b <= a + 1e-9 },
      s"rmse not descending: ${rs.toSeq}")
    assert(rs.last < rs.head, s"no progress: ${rs.toSeq}")
  }

  test("re-running is bit-deterministic") {
    val s = spark
    import s.implicits._
    val df = (for (q <- 1 to 4; d <- 0 to 3)
      yield (q.toLong, d.toLong, 37L * q + 7L * d))
      .toDF("q", "d", "ym")
    val a = Tree.boostedStumps(df, Seq("d", "q"), rounds = 3)
      .collect().map(_.toSeq).toSeq
    val b = Tree.boostedStumps(df, Seq("d", "q"), rounds = 3)
      .collect().map(_.toSeq).toSeq
    assert(a == b)
  }
}
