package graft

import graft.rel.Gram

/** Gram matrix + ridge solve (rel/Gram.scala): hand-checked sums, the
  * exact-recovery law at lambda = 0, shrinkage at lambda > 0, the
  * intercept exemption, and the loud guards.
  */
class GramSpec extends SparkSpec {

  test("gram table matches hand sums on a small fixture") {
    val s = spark
    import s.implicits._
    val rows = Seq((1L, 2L, 5L), (3L, 4L, 25L), (5L, 6L, 45L))
    val got = Gram.gramMatrix(rows.toDF("a", "b", "c"), Seq("a", "b", "c"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)) ->
        (r.getLong(2), r.getDecimal(3).longValueExact())).toMap
    val cols = Seq(rows.map(_._1), rows.map(_._2), rows.map(_._3))
    for (i <- 0 until 3; j <- i until 3) {
      val expect = cols(i).zip(cols(j)).map { case (x, y) => x * y }.sum
      assert(got((i, j)) == (3L, expect), s"($i,$j)")
    }
  }

  test("lambda = 0 on an exactly consistent system recovers the coefficients") {
    val s = spark
    import s.implicits._
    // y = 7 + 2*x1 + 3*x2 exactly
    val rows = (1L to 20L).map(i => (1L, i, (i * i) % 13,
      7L + 2 * i + 3 * ((i * i) % 13)))
    val gram = Gram.gramMatrix(rows.toDF("x0", "x1", "x2", "y"),
      Seq("x0", "x1", "x2", "y"))
    val beta = Gram.ridgeSolveFromGram(gram, lambdaMilli = 0)
    assert(math.abs(beta(0) - 7.0) < 1e-8)
    assert(math.abs(beta(1) - 2.0) < 1e-8)
    assert(math.abs(beta(2) - 3.0) < 1e-8)
  }

  test("ridge shrinks non-intercept coefficients; the intercept exemption holds") {
    val s = spark
    import s.implicits._
    val rows = (1L to 30L).map(i => (1L, i % 7, 10L + 5 * (i % 7) + (i % 3)))
    val gram = Gram.gramMatrix(rows.toDF("x0", "x1", "y"),
      Seq("x0", "x1", "y"))
    val b0 = Gram.ridgeSolveFromGram(gram, 0, interceptIdx = 0)
    val bR = Gram.ridgeSolveFromGram(gram, 5000L, interceptIdx = 0)
    assert(math.abs(bR(1)) < math.abs(b0(1)), "slope must shrink under ridge")
  }

  test("correlation matrix from the gram: exact +/-1 lines, a hand value, and the zero-variance null") {
    val s = spark
    import s.implicits._
    // x2 = 2*x1 (r = 1), x3 = 10 - x1 (r = -1), x4 constant (undefined)
    val rows = (1L to 9L).map(i => (1L, i, 2 * i, 10 - i, 4L))
    val gram = Gram.gramMatrix(rows.toDF("x0", "x1", "x2", "x3", "x4"),
      Seq("x0", "x1", "x2", "x3", "x4"))
    val got = Gram.corrFromGram(gram).collect()
      .map(r => (r.getInt(0), r.getInt(1)) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(got((1, 2)) == Some(1.0))
    assert(got((1, 3)) == Some(-1.0))
    assert(got((2, 3)) == Some(-1.0))
    assert(got((1, 4)) == None && got((2, 4)) == None && got((3, 4)) == None)
    // hand Pearson on a non-degenerate pair
    val xs = Seq(1.0, 2.0, 4.0, 9.0); val ys = Seq(2.0, 1.0, 7.0, 8.0)
    val g2 = Gram.gramMatrix(
      xs.zip(ys).map { case (a, b) => (1L, a.toLong, b.toLong) }
        .toDF("x0", "x1", "x2"), Seq("x0", "x1", "x2"))
    val n = xs.size.toDouble
    val num = n * xs.zip(ys).map { case (a, b) => a * b }.sum -
      xs.sum * ys.sum
    val den = math.sqrt(n * xs.map(a => a * a).sum - xs.sum * xs.sum) *
      math.sqrt(n * ys.map(b => b * b).sum - ys.sum * ys.sum)
    val want = math.rint(num / den * 1e6) / 1e6
    assert(math.abs(Gram.corrFromGram(g2).collect().head.getDouble(3)
      - want) < 1e-9)
  }

  test("spearman: monotone-nonlinear pairs hit exactly +/-1; ties match the average-rank reference") {
    val s = spark
    import s.implicits._
    // f2 = f1^3 (monotone, nonlinear -> rho = 1 while Pearson < 1);
    // f3 reversed with TIES
    val rows = Seq((1L, 1L, 1L, 9L), (2L, 2L, 8L, 7L), (3L, 3L, 27L, 7L),
      (4L, 5L, 125L, 7L), (5L, 8L, 512L, 2L))
    val got = Gram.spearmanPairs(rows.toDF("id", "f1", "f2", "f3"),
      "id", Seq("f1", "f2", "f3")).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(3)).toMap
    assert(got((1, 2)) == 1.0)
    // independent average-rank reference for the tied pair (f1, f3)
    def avgRanks(xs: Seq[Long]): Seq[Double] = {
      val sorted = xs.sorted.zipWithIndex
      val byV = sorted.groupBy(_._1)
        .map { case (v, g) => v -> g.map(_._2 + 1).sum.toDouble / g.size }
      xs.map(byV)
    }
    def pearson(a: Seq[Double], b: Seq[Double]): Double = {
      val n = a.size.toDouble
      val num = n * a.zip(b).map { case (x, y) => x * y }.sum - a.sum * b.sum
      val den = math.sqrt(n * a.map(x => x * x).sum - a.sum * a.sum) *
        math.sqrt(n * b.map(y => y * y).sum - b.sum * b.sum)
      num / den
    }
    val want = pearson(avgRanks(rows.map(_._2)), avgRanks(rows.map(_._4)))
    assert(math.abs(got((1, 3)) - math.rint(want * 1e6) / 1e6) < 1e-6)
    assert(got((1, 3)) < 0)
  }

  test("guards: dimension cap, magnitude cap, singular system") {
    val s = spark
    import s.implicits._
    intercept[IllegalArgumentException] {
      Gram.gramMatrix(Seq(1L).toDF("a"), (0 to 32).map(_ => "a"))
    }
    intercept[Exception] {
      Gram.gramMatrix(Seq(4000000000L).toDF("a"), Seq("a")).collect()
    }
    // duplicate column -> XtX singular
    val g = Gram.gramMatrix(Seq((2L, 2L, 4L), (3L, 3L, 6L)).toDF("a", "b", "y"),
      Seq("a", "b", "y"))
    intercept[IllegalArgumentException] { Gram.ridgeSolveFromGram(g, 0) }
  }
}
