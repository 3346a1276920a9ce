package graft

import org.apache.spark.sql.functions._
import graft.rel.Linkage
import graft.rel.Linkage.FieldCompare

/** Fellegi–Sunter scoring: milli-bit weight constants, exact long
  * summation, classification thresholds, and the parameter guards.
  */
class LinkageSpec extends SparkSpec {
  private def s = spark

  test("milli-bit weights match the closed forms") {
    val f = FieldCompare("x", lit(true), 0.8, 0.05)
    assert(f.agreeMilli == 4000L)    // log2(16) = 4 exactly
    assert(f.disagreeMilli == -2248L) // log2(0.2/0.95) = -2.2479 → -2248
    val g = FieldCompare("y", lit(true), 0.95, 0.20)
    assert(g.agreeMilli == 2248L)    // symmetry: log2(4.75) = 2.2479
  }

  test("scores sum exactly and classify against both thresholds") {
    val sp = s
    import sp.implicits._
    val pairs = Seq(
      (1L, 2L, true, true),   // both agree
      (1L, 3L, true, false),  // mixed
      (1L, 4L, false, false)  // both disagree
    ).toDF("id_a", "id_b", "ag1", "ag2")
    val f1 = FieldCompare("f1", col("ag1"), 0.8, 0.05)  // +4000 / -2248
    val f2 = FieldCompare("f2", col("ag2"), 0.95, 0.20) // +2248 / -4000
    val got = Linkage.fellegiSunterScore(pairs, Seq(f1, f2),
        upperMilli = 6000L, lowerMilli = -4000L)
      .collect().map(r => r.getLong(1) -> (r.getLong(4), r.getString(5)))
      .toMap
    assert(got(2L) == ((6248L, "match")))
    assert(got(3L) == ((0L, "possible")))
    assert(got(4L) == ((-6248L, "nonmatch")))
  }

  test("degenerate m/u and inverted thresholds are rejected") {
    intercept[IllegalArgumentException](FieldCompare("x", lit(true), 0.2, 0.8))
    intercept[IllegalArgumentException](FieldCompare("x", lit(true), 1.0, 0.5))
    val sp = s
    import sp.implicits._
    val pairs = Seq((1L, 2L, true)).toDF("id_a", "id_b", "ag")
    intercept[IllegalArgumentException](
      Linkage.fellegiSunterScore(pairs,
        Seq(FieldCompare("f", col("ag"), 0.8, 0.1)), 0L, 0L))
  }
}
