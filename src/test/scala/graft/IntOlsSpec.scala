package graft

import org.apache.spark.sql.functions._
import graft.functions.IntOls

/** The integer-exact OLS discipline's primitives (functions/IntOls.scala):
  * micro-snap of ln and the exact rational round-half-up, including the
  * negative-numerator cases the degree power-law (q419) and Zipf (q366)
  * slopes exercise.
  */
class IntOlsSpec extends SparkSpec {

  test("lnMicro: pinned snapped literals") {
    val s = spark
    import s.implicits._
    val got = Seq(1L, 3L, 1000000L).toDF("v")
      .select(IntOls.lnMicro(col("v"))).collect().map(_.getLong(0)).toSeq
    // ln(1)=0; ln(3)=1.0986122886…; ln(1e6)=13.815510557…
    assert(got == Seq(0L, 1098612L, 13815511L), got)
  }

  test("rhu: exact round-half-up for both signs, exact halves up") {
    val s = spark
    import s.implicits._
    val cases = Seq(
      (7L, 2L, 4L),    // 3.5 -> 4 (half rounds up)
      (-7L, 2L, -3L),  // -3.5 -> -3 (floor(-3.5 + .5) = -3)
      (6L, 4L, 2L),    // 1.5 -> 2
      (5L, 4L, 1L),    // 1.25 -> 1
      (-5L, 4L, -1L),  // -1.25 -> -1
      (0L, 5L, 0L),
      (999999L, 1000000L, 1L), // just under 1 -> 1 (>= .5)
      (499999L, 1000000L, 0L)) // just under .5 -> 0
    val got = cases.toDF("p", "q", "want")
      .select(IntOls.rhu(col("p"), col("q")).as("got"), col("want"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    got.foreach { case (g, w) => assert(g == w, s"rhu: got $g want $w") }
  }

  test("rhu survives the q410-scale magnitudes without overflow") {
    val s = spark
    import s.implicits._
    // num*1e6 ~ 4e23 over den ~ 2e17: decimal(38,0) territory
    val df = Seq(Tuple1(1L)).toDF("x")
      .select(IntOls.rhu(
        lit("400000000000000000000000").cast("decimal(38,0)"),
        lit("200000000000000000").cast("decimal(38,0)")).as("r"))
    assert(df.collect()(0).getLong(0) == 2000000L)
  }
}
