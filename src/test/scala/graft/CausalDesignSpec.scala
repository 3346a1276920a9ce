package graft

import org.apache.spark.sql.functions._
import graft.rel.{Causal, Raking}

/** Diff-in-diff (q358) and IPF raking (q359) semantics. */
class CausalDesignSpec extends SparkSpec {

  test("DiD recovers a planted effect the naive post-difference misses") {
    val s = spark
    import s.implicits._
    val r = new scala.util.Random(31)
    // treated group has a +30 baseline; the treatment adds +10 in post
    val rows = (1 to 2000).map { i =>
      val t = i % 2; val p = (i / 2) % 2
      val y = 50L + 30L * t + 5L * p + (if (t == 1 && p == 1) 10L else 0L) +
        r.nextInt(5)
      (t.toLong, p.toLong, y)
    }
    val got = Causal.diffInDiff(rows.toDF("treat", "period", "y"))
      .collect().head
    val did = got.getDouble(4)
    assert(math.abs(did - 10.0) < 1.0, s"DiD must land near +10: $did")
    // naive post-only difference would read ~+40 (baseline + effect)
    assert(got.getLong(0) > 0 && got.getDouble(5) > 0.0)
  }

  test("DiD guards: bad period code, singleton cell") {
    val s = spark
    import s.implicits._
    intercept[Exception] {
      Causal.diffInDiff(Seq((0L, 2L, 1L)).toDF("treat", "period", "y"))
        .collect()
    }
    val ex = intercept[Exception] {
      Causal.diffInDiff(Seq((1L, 1L, 5L), (1L, 0L, 5L), (1L, 0L, 6L),
        (0L, 0L, 5L), (0L, 0L, 6L), (0L, 1L, 5L), (0L, 1L, 6L))
        .toDF("treat", "period", "y")).collect()
    }
    assert(ex.getMessage.contains("< 2 units"), ex.getMessage)
  }

  test("raking lands the weighted marginals on the targets") {
    val s = spark
    import s.implicits._
    // skewed 2x2 cells; consistent targets (rows 100/100, cols 120/80)
    val units = (Seq.fill(70)(("a", "x")) ++ Seq.fill(10)(("a", "y")) ++
      Seq.fill(30)(("b", "x")) ++ Seq.fill(90)(("b", "y")))
      .toDF("r", "c")
    val rt = Seq(("a", 100L), ("b", 100L)).toDF("r", "t")
    val ct = Seq(("x", 120L), ("y", 80L)).toDF("c", "t")
    val w = Raking.rake(units, "r", "c", rt, ct, iters = 8)
      .collect().map(r0 => (r0.getString(0), r0.getString(1),
        r0.getLong(2), r0.getLong(3)))
    def margin(f: ((String, String, Long, Long)) => Boolean): Double =
      w.filter(f).map(x => x._3 * x._4 / 1e6).sum
    assert(math.abs(margin(_._1 == "a") - 100.0) < 0.01)
    assert(math.abs(margin(_._1 == "b") - 100.0) < 0.01)
    // the LAST step was the column step, so columns are exact-first
    assert(math.abs(margin(_._2 == "x") - 120.0) < 0.001)
    assert(math.abs(margin(_._2 == "y") - 80.0) < 0.001)
  }

  test("raking raises when a data margin is missing from the targets") {
    val s = spark
    import s.implicits._
    val units = Seq(("a", "x"), ("b", "x")).toDF("r", "c")
    val rt = Seq(("a", 10L)).toDF("r", "t") // 'b' uncovered
    val ct = Seq(("x", 10L)).toDF("c", "t")
    val ex = intercept[Exception] {
      Raking.rake(units, "r", "c", rt, ct, iters = 1).collect()
    }
    assert(ex.getMessage.contains("not in the targets"), ex.getMessage)
  }
}
