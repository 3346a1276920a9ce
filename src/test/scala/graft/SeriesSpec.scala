package graft

import graft.rel.Series

class SeriesSpec extends SparkSpec {

  private def run(rows: Seq[(Long, Long, Long)], num: Long, den: Long): Map[(Long, Long), Long] = {
    val s = spark
    import s.implicits._
    Series.ewmaFixedPoint(rows.toDF("k", "t", "x"), "k", "t", "x", num, den)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
  }

  test("alpha=1/4 recurrence matches hand computation") {
    // s1=100; s2=(200+300)/4=125; s3=(40+375)/4=103
    val got = run(Seq((1L, 1L, 100L), (1L, 2L, 200L), (1L, 3L, 40L)), 1, 4)
    assert(got == Map((1L, 1L) -> 100L, (1L, 2L) -> 125L, (1L, 3L) -> 103L))
  }

  test("state resets at key boundaries even when keys share a partition") {
    val rows = (1L to 5L).flatMap(k => Seq((k, 1L, 80L), (k, 2L, 0L)))
    val got = run(rows, 1, 2)
    // every key independently: s1=80, s2=(0+80)/2=40
    (1L to 5L).foreach { k =>
      assert(got((k, 1L)) == 80L && got((k, 2L)) == 40L)
    }
  }

  test("negative values use floor division (DuckDB // semantics)") {
    // s1=-3; s2=(1*(-2)+1*(-3)) floorDiv 2 = -5 floorDiv 2 = -3
    val got = run(Seq((7L, 1L, -3L), (7L, 2L, -2L)), 1, 2)
    assert(got((7L, 2L)) == -3L)
  }

  test("rows arrive unordered; the operator imposes (key, ord) order") {
    val got = run(Seq((1L, 3L, 40L), (1L, 1L, 100L), (1L, 2L, 200L)), 1, 4)
    assert(got((1L, 3L)) == 103L)
  }

  test("alpha outside (0,1) is rejected") {
    intercept[IllegalArgumentException](run(Seq((1L, 1L, 1L)), 4, 4))
    intercept[IllegalArgumentException](run(Seq((1L, 1L, 1L)), 0, 4))
  }

  test("plan shape: the recurrence costs exactly one shuffle") {
    val s = spark
    import s.implicits._
    val df = (1L to 100L).map(i => (i % 7, i, i * 3)).toDF("k", "t", "x")
    val plan = Series.ewmaFixedPoint(df, "k", "t", "x", 1, 4)
      .queryExecution.executedPlan.toString
    val exchanges = "(?m)^\\s*\\+?-? ?Exchange ".r.findAllIn(plan).length
    assert(exchanges == 1, s"plan:\n$plan")
  }
}
