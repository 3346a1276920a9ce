package graft

import org.apache.spark.sql.functions._
import graft.llm.Fusion

/** Reciprocal-rank fusion ([[graft.llm.Fusion.rrfFuse]]). Pins the RRF
  * arithmetic against hand-computed values, the absent-from-one-system
  * semantics (absence contributes nothing — no imputed rank), the
  * (score desc, id asc) tie-break, and parity with a brute-force local
  * computation on random rankings across 1/2/3 systems.
  */
class FusionSpec extends SparkSpec {
  import spark.implicits._

  private def rank(rows: (Int, Long, Int)*) =
    rows.toDF("qid", "doc_id", "rn")

  test("hand-computed fusion: overlap beats single-system, absence adds nothing") {
    val a = rank((0, 10L, 1), (0, 11L, 2), (0, 12L, 3))
    val b = rank((0, 11L, 1), (0, 13L, 2), (0, 10L, 3))
    val got = Fusion.rrfFuse(Seq(a, b), k = 4)
      .orderBy("rn")
      .as[(Long, Int, Long, Double)].collect().toSeq
    def rr(r: Int) = 1.0 / (60 + r)
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    // doc 11: ranks (2, 1); doc 10: ranks (1, 3); doc 12: only rank 3;
    // doc 13: only rank 2
    val exp = Seq(
      (0L, 1, 11L, r6(rr(2) + rr(1))),
      (0L, 2, 10L, r6(rr(1) + rr(3))),
      (0L, 3, 13L, r6(rr(2))),
      (0L, 4, 12L, r6(rr(3))))
    assert(got == exp)
  }

  test("equal fused scores break ties to the lower id") {
    // two docs each ranked 1 by exactly one system -> identical scores
    val a = rank((0, 42L, 1))
    val b = rank((0, 7L, 1))
    val got = Fusion.rrfFuse(Seq(a, b), k = 2)
      .orderBy("rn").select("doc_id").as[Long].collect().toSeq
    assert(got == Seq(7L, 42L))
  }

  test("parity with brute-force fusion on random rankings, 1-3 systems") {
    val r = new scala.util.Random(106)
    for (systems <- 1 to 3) {
      val ranks: Seq[Seq[(Int, Long, Int)]] = (0 until systems).map { _ =>
        (0 until 4).flatMap { q =>
          r.shuffle((0L until 30L).toList).take(10).zipWithIndex
            .map { case (d, i) => (q, d, i + 1) }
        }
      }
      val got = Fusion.rrfFuse(ranks.map(rank(_: _*)), k = 5, c = 60)
        .orderBy("qid", "rn")
        .as[(Long, Int, Long, Double)].collect().toSeq
      val brute = ranks.flatten
        .groupBy { case (q, d, _) => (q, d) }
        .map { case ((q, d), rs) =>
          val s = rs.map { case (_, _, rn) => 1.0 / (60 + rn) }.sum
          (q.toLong, d, math.rint(s * 1e6) / 1e6)
        }.toSeq
        .groupBy(_._1).toSeq.flatMap { case (q, ds) =>
          ds.sortBy { case (_, d, s) => (-s, d) }.take(5).zipWithIndex
            .map { case ((_, d, s), i) => (q, i + 1, d, s) }
        }.sortBy { case (q, rn, _, _) => (q, rn) }
      assert(got == brute, s"systems=$systems")
    }
  }
}
