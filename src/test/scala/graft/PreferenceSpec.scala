package graft

import org.apache.spark.sql.DataFrame
import graft.rel.Preference

class PreferenceSpec extends SparkSpec {

  private def duels(rows: Seq[(String, String)]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("w", "l")
  }

  private def fit(rows: Seq[(String, String)], iters: Int = 10)
      : Seq[(String, Long, Long, Long)] =
    Preference.bradleyTerry(duels(rows), iters = iters).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq

  test("shutout: the loser fixes at the MLE boundary 0, winner at 10^6") {
    val got = fit(Seq(("a", "b"), ("a", "b"), ("a", "b")))
    assert(got == Seq(("a", 1000000L, 3L, 3L), ("b", 0L, 0L, 3L)))
  }

  test("2-1 split converges to the 1/2 strength ratio") {
    val got = fit(Seq(("a", "b"), ("a", "b"), ("b", "a")))
    val a = got.find(_._1 == "a").get
    val b = got.find(_._1 == "b").get
    assert(a._2 == 1000000L && math.abs(b._2 - 500000L) <= 2L,
      s"a=${a._2} b=${b._2}")
    assert(a._3 == 2L && b._3 == 1L && a._4 == 3L && b._4 == 3L)
  }

  test("transitive chain ranks a > b > c") {
    // a beats b twice, b beats c twice, a beats c once
    val got = fit(Seq(("a", "b"), ("a", "b"), ("b", "c"), ("b", "c"),
      ("a", "c")))
    assert(got.map(_._1) == Seq("a", "b", "c"))
    assert(got.head._2 == 1000000L)
    assert(got(1)._2 > got(2)._2)
  }

  test("disconnected islands stay deterministic; within-island order holds") {
    val got = fit(Seq(("a", "b"), ("a", "b"), ("c", "d")))
    val m = got.map(t => t._1 -> t._2).toMap
    assert(m("a") > m("b") && m("c") > m("d"))
    assert(m("c") == 1000000L && m("d") == 0L)
  }

  test("self-comparisons raise loudly") {
    val e = intercept[Exception](fit(Seq(("a", "a"))))
    assert(e.getMessage != null && e.getMessage.contains("self-comparison"),
      e.getMessage)
  }

  test("more rounds refine toward the MLE, never past the max-norm bound") {
    val rows = Seq.fill(3)(("a", "b")) ++ Seq.fill(1)(("b", "a")) ++
      Seq.fill(2)(("b", "c")) ++ Seq.fill(1)(("c", "b"))
    val r3 = fit(rows, iters = 3).map(t => t._1 -> t._2).toMap
    val r12 = fit(rows, iters = 12).map(t => t._1 -> t._2).toMap
    assert(r12.values.max == 1000000L && r12.values.forall(_ >= 0L))
    // the MLE satisfies p_a/(p_a+p_b) = 3/4 within truncation noise
    val ratio = r12("a").toDouble / (r12("a") + r12("b")).toDouble
    assert(math.abs(ratio - 0.75) < 0.01, s"$r3 -> $r12")
  }
}
