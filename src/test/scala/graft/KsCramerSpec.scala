package graft

import org.apache.spark.sql.functions._
import graft.rel.{Categorical, Quality}

/** KS drift (rel/Quality.ksDrift) and Cramér's V
  * (rel/Categorical.cramersV): hand-checked sup statistic, the
  * extremes (identical, disjoint; perfect association, independence),
  * and the loud degenerate guards.
  */
class KsCramerSpec extends SparkSpec {

  private def frame(ref: Seq[Long], cur: Seq[Long]) = {
    val s = spark
    import s.implicits._
    (ref.map(v => (1L, v)) ++ cur.map(v => (0L, v))).toDF("r", "v")
  }

  test("ks: identical windows score zero; disjoint windows score one") {
    val same = Quality.ksDrift(frame(Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)),
      col("r") === 1L, col("v")).collect()(0)
    assert(same.getDouble(2) == 0.0, s"$same")
    val disj = Quality.ksDrift(frame(Seq(1L, 2L), Seq(10L, 11L)),
      col("r") === 1L, col("v")).collect()(0)
    assert(disj.getDouble(2) == 1.0 && disj.getLong(3) == 2L, s"$disj")
  }

  test("ks: hand-checked sup and its location") {
    val got = Quality.ksDrift(frame(Seq(1L, 2L), Seq(2L, 3L)),
      col("r") === 1L, col("v")).collect()(0)
    assert(got.getDouble(2) == 0.5 && got.getLong(3) == 1L, s"$got")
  }

  test("ks: an empty window raises") {
    val ex = intercept[Exception] {
      Quality.ksDrift(frame(Seq(1L), Seq.empty), col("r") === 1L,
        col("v")).collect()
    }
    assert(ex.getMessage.contains("non-empty"), ex.getMessage)
  }

  private def cat(rows: (String, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("a", "b")
  }

  test("cramers v: perfect association scores one, independence zero") {
    val perfect = Categorical.cramersV(
      cat(("x", "p"), ("x", "p"), ("y", "q"), ("y", "q")), "a", "b")
      .collect()(0)
    assert(perfect.getDouble(4) == 1.0, s"$perfect")
    val indep = Categorical.cramersV(
      cat(("x", "p"), ("x", "q"), ("y", "p"), ("y", "q")), "a", "b")
      .collect()(0)
    assert(indep.getDouble(3) == 0.0 && indep.getDouble(4) == 0.0,
      s"$indep")
  }

  test("cramers v: a single-level axis raises") {
    val ex = intercept[Exception] {
      Categorical.cramersV(cat(("x", "p"), ("x", "q")), "a", "b")
        .collect()
    }
    assert(ex.getMessage.contains("single-level"), ex.getMessage)
  }
}
