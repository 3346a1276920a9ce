package graft

import org.apache.spark.sql.DataFrame
import graft.llm.Eval

/** Krippendorff's alpha (llm/Eval.scala): pinned against an independent
  * exact-BigInt reference over the classical formulas, plus the
  * conventions (perfect agreement, D_e = 0, negative alpha, missing
  * ratings) and the loud guards.
  */
class KrippendorffSpec extends SparkSpec {

  private def df(rows: Seq[(Long, String, String)]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("unit", "rater", "value")
  }

  private def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)
  private def lcm(a: Long, b: Long): Long = a / gcd(a, b) * b

  /** independent exact reference: (do_milli, de_milli, alpha_milli) */
  private def refAlpha(rows: Seq[(Long, String, String)]): (Long, Long, Long) = {
    val byUnit = rows.groupBy(_._1).values
      .map(rs => rs.groupBy(_._3).map { case (v, xs) => v -> xs.size.toLong })
      .filter(_.values.sum >= 2).toSeq
    val mMax = byUnit.map(_.values.sum).max
    val l = BigInt((1L until mMax).foldLeft(1L)(lcm))
    val donum = byUnit.map { nu =>
      val m = nu.values.sum; val s2 = nu.values.map(x => x * x).sum
      BigInt(m * m - s2) * l / BigInt(m - 1)
    }.sum
    val nc = byUnit.flatMap(_.toSeq).groupBy(_._1).values
      .map(_.map(_._2).sum).toSeq
    val n = BigInt(nc.sum)
    val s2c = nc.map(c => BigInt(c) * BigInt(c)).sum
    val de = (n * n) - s2c
    val alpha = if (de == 0) BigInt(1000)
      else (BigInt(1000) * ((l * de) - ((n - 1) * donum))) / (l * de)
    ((BigInt(1000) * donum / (l * n)).toLong,
      (BigInt(1000) * de / (n * (n - 1))).toLong, alpha.toLong)
  }

  private def run(rows: Seq[(Long, String, String)]) = {
    val r = Eval.krippendorffAlpha(spark, df(rows)).collect().head
    (r.getLong(3), r.getLong(4), r.getLong(5))
  }

  test("matches the exact reference on a 3-rater fixture with missing ratings and up to 4 values") {
    val rows = Seq(
      (1L, "a", "x"), (1L, "b", "x"), (1L, "c", "x"),
      (2L, "a", "x"), (2L, "b", "y"),                    // c missing
      (3L, "a", "y"), (3L, "b", "y"), (3L, "c", "z"),
      (4L, "a", "w"), (4L, "b", "x"), (4L, "c", "y"),
      (5L, "a", "z"), (5L, "c", "z"),                    // b missing
      (6L, "a", "x"))                                    // unpairable -> drops
    assert(run(rows) == refAlpha(rows))
    val r = Eval.krippendorffAlpha(spark, df(rows)).collect().head
    assert(r.getLong(0) == 5)  // unit 6 dropped
    assert(r.getLong(1) == 13) // pairable ratings
    assert(r.getInt(2) == 3)
  }

  test("perfect agreement across raters gives alpha = 1000, D_o = 0") {
    val rows = (1L to 8L).flatMap(u =>
      Seq("a", "b", "c").map(r => (u, r, if (u % 2 == 0) "x" else "y")))
    val (d0, _, a) = run(rows)
    assert(d0 == 0 && a == 1000)
  }

  test("a single value everywhere (D_e = 0) lands alpha = 1000 by convention") {
    val rows = (1L to 4L).flatMap(u => Seq(("a", "x"), ("b", "x"))
      .map { case (r, v) => (u, r, v) })
    val r = Eval.krippendorffAlpha(spark, df(rows)).collect().head
    assert(r.getLong(4) == 0)    // de_milli
    assert(r.getLong(5) == 1000)
  }

  test("systematic disagreement drives alpha negative, matching the reference") {
    val rows = (1L to 6L).flatMap(u => Seq((u, "a", "x"), (u, "b", "y")))
    val got = run(rows)
    assert(got == refAlpha(rows))
    assert(got._3 < 0, s"alpha ${got._3} should be negative")
  }

  test("missing ratings change the statistic (vs dropping incomplete units)") {
    val full = Seq(
      (1L, "a", "x"), (1L, "b", "x"), (1L, "c", "x"),
      (2L, "a", "x"), (2L, "b", "y"), (2L, "c", "y"))
    val withPartial = full ++ Seq((3L, "a", "y"), (3L, "b", "x"))
    assert(run(full) != run(withPartial))
    assert(run(withPartial) == refAlpha(withPartial))
  }

  test("guards: duplicate rating, no pairable unit, too many raters per unit") {
    intercept[Exception] {
      Eval.krippendorffAlpha(spark,
        df(Seq((1L, "a", "x"), (1L, "a", "y"), (1L, "b", "x")))).collect()
    }
    intercept[IllegalArgumentException] {
      Eval.krippendorffAlpha(spark, df(Seq((1L, "a", "x"), (2L, "b", "y"))))
    }
    intercept[IllegalArgumentException] {
      Eval.krippendorffAlpha(spark,
        df((1 to 14).map(i => (1L, s"r$i", "x")) ++
          Seq((2L, "r1", "x"), (2L, "r2", "y"))))
    }
  }
}
