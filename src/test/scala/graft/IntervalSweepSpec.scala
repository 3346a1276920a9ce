package graft

import org.apache.spark.sql.functions._
import graft.rel.Intervals

/** Sweep-line runs vs a brute-force overlap count, plus the inclusive-
  * boundary semantics and the cross-partition prefix handoff.
  */
class IntervalSweepSpec extends SparkSpec {

  private def runsOf(iv: Seq[(Long, Long)]): Seq[(Long, Long, Long, Option[Long])] = {
    val s = spark
    import s.implicits._
    Intervals.withSweepRuns(s, iv.toDF("start_us", "end_us")) { runs =>
      runs.orderBy("ordk").collect().toSeq.map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3))))
    }
  }

  private def brute(iv: Seq[(Long, Long)], t: Long): Long =
    iv.count { case (a, b) => a <= t && t <= b }.toLong

  test("runs match brute-force concurrency at every start boundary") {
    val rng = new scala.util.Random(7)
    val iv = Seq.fill(200) {
      val a = rng.nextInt(1000).toLong; a -> (a + rng.nextInt(100).toLong)
    }
    val rs = runsOf(iv)
    // after a start-boundary row (even ordk), run == intervals covering t
    rs.filter(_._1 % 2 == 0).foreach { case (ordk, _, run, _) =>
      assert(run == brute(iv, ordk / 2), s"at ${ordk / 2}")
    }
    // runs end balanced: final running value is 0
    assert(rs.last._3 == 0L)
    // nxt chain: each row's nxt is the following row's ordk
    rs.zip(rs.drop(1)).foreach { case ((_, _, _, nxt), (o2, _, _, _)) =>
      assert(nxt.contains(o2))
    }
    assert(rs.last._4.isEmpty)
  }

  test("intervals touching at a single instant overlap there") {
    // [0,10] and [10,20]: at t=10 both are open -> peak 2
    val rs = runsOf(Seq((0L, 10L), (10L, 20L)))
    assert(rs.map(_._3).max == 2L)
    // half-open-style disjoint [0,9],[10,20] never reach 2
    assert(runsOf(Seq((0L, 9L), (10L, 20L))).map(_._3).max == 1L)
  }

  test("coverage gaps reconstruct the union length") {
    // union of [0,10],[5,20],[40,50] = 21 + 11 points -> 30 us of gaps
    val rs = runsOf(Seq((0L, 10L), (5L, 20L), (40L, 50L)))
    val covered = rs.collect {
      case (o, _, run, Some(nxt)) if run > 0 => nxt / 2 - o / 2
    }.sum
    assert(covered == 30L, s"covered $covered")
  }
}
