package graft

import graft.rel.Robust

/** Exact-median helper + MAD modified-z outliers (rel/Robust.scala):
  * lower-median convention on odd/even/duplicate/zero inputs, the
  * Iglewicz-Hoaglin hand case, and the mad = 0 degeneration.
  */
class RobustSpec extends SparkSpec {

  private def df(xs: Seq[Long]) = {
    val s = spark
    import s.implicits._
    xs.toDF("c")
  }

  test("exactMedianNonNeg matches the lower-median on odd, even, duplicated, and zero-heavy inputs") {
    val cases = Seq(
      Seq(5L, 1L, 3L),                      // odd
      Seq(4L, 1L, 3L, 2L),                  // even -> lower middle = 2
      Seq(7L, 7L, 7L, 7L),                  // constant
      Seq(0L, 0L, 0L, 5L, 9L),              // zeros in the 0-bucket
      Seq(0L, 1L, 2L),                      // spans the shared width-1 bucket
      (1L to 1000L).map(_ * 3),             // wide range, many buckets
      Seq(1L << 40, (1L << 40) + 5, 2L))    // huge values
    for (xs <- cases) {
      val sorted = xs.sorted
      val expect = sorted(((xs.size + 1) / 2) - 1)
      val (n, med) = Robust.exactMedianNonNeg(df(xs), "c")
      assert(n == xs.size)
      assert(med == expect, s"input $xs: got $med want $expect")
    }
  }

  test("empty input fails loudly") {
    intercept[IllegalArgumentException] {
      Robust.exactMedianNonNeg(df(Seq.empty), "c")
    }
  }

  test("MAD summary reproduces the hand case {1,2,3,4,5,100}") {
    // lower median = 3; devs {2,1,0,1,2,97} -> sorted {0,1,1,2,2,97},
    // mad = 3rd smallest = 1; outliers: 6745*d > 35000 -> d >= 6 -> {97};
    // max modified z = 0.6745*97/1 = 65.4265
    val r = Robust.madOutlierSummary(spark, df(Seq(1L, 2L, 3L, 4L, 5L, 100L)), "c")
      .collect().head
    assert(r.getLong(0) == 6)
    assert(r.getLong(1) == 3)
    assert(r.getLong(2) == 1)
    assert(r.getLong(3) == 1)
    assert(math.abs(r.getDouble(4) - 65.4265) < 1e-9)
  }

  test("mad = 0 degenerates: every off-median value flags, score is null") {
    val r = Robust.madOutlierSummary(spark, df(Seq(5L, 5L, 5L, 5L, 9L, 2L)), "c")
      .collect().head
    assert(r.getLong(2) == 0)      // mad
    assert(r.getLong(3) == 2)      // 9 and 2
    assert(r.isNullAt(4))
  }

  private def gdf(rows: Seq[(String, Long)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("g", "c")
  }

  test("groupedExactKth matches per-group sorted ranks for several k rules") {
    val rows = (1L to 200L).map(i => (s"g${i % 3}", (i * 37) % 97)) ++
      Seq(("g0", 0L), ("g0", 0L)) // zeros in the shared width-1 bucket
    val byG = rows.groupBy(_._1).map { case (g, xs) =>
      g -> xs.map(_._2).sorted }
    for (kOf <- Seq[Long => Long](n => (n + 1) / 2, _ => 1L, n => n,
      n => math.max(1L, (n * 9) / 10))) {
      val got = Robust.groupedExactKth(gdf(rows), "g", "c", kOf)
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      for ((g, sorted) <- byG) {
        val n = sorted.size.toLong
        val k = kOf(n)
        assert(got(g) == (n, k, sorted((k - 1).toInt)), s"group $g k=$k")
      }
    }
  }

  test("groupedExactQuantiles: every (group, q) matches the sorted rank in one histogram pass") {
    val rows = (1L to 151L).map(i => (s"g${i % 2}", (i * 53) % 1009))
    val qs = Seq(0L, 250L, 500L, 900L, 1000L)
    val got = Robust.groupedExactQuantiles(gdf(rows), "g", "c", qs)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3))
      .toMap
    for ((g, xs) <- rows.groupBy(_._1); q <- qs) {
      val sorted = xs.map(_._2).sorted
      val k = (q * (sorted.size - 1)) / 1000 + 1
      assert(got((g, q)) == sorted((k - 1).toInt), s"group $g q=$q")
    }
  }

  test("conformal threshold picks the ceil((1-alpha)(n+1))-th score and covers") {
    val scores = (1L to 19L).map(i => ("a", i * 10))
    val r = Robust.conformalThresholds(gdf(scores), "g", "c", 100L)
      .collect().head
    // n=19: k = min(19, (900*20+999)//1000) = 18 -> 18th smallest = 180
    assert(r.getLong(1) == 19 && r.getLong(2) == 18 && r.getLong(3) == 180)
    val covered = scores.count(_._2 <= r.getLong(3))
    assert(covered >= 18)
    intercept[IllegalArgumentException] {
      Robust.conformalThresholds(gdf(scores), "g", "c", 0L)
    }
  }

  test("winsorizedSummary matches hand clamp/trim at exact quantile bounds") {
    // group a: 1..10 in cents*100 plus one huge outlier; p100/p900 of
    // n=11 -> k = (q*(n-1))//1000 + 1 -> k_lo=2, k_hi=10
    val rows = ((1L to 10L).map(i => ("a", i * 100L)) :+ ("a", 1000000L)) ++
      (1L to 5L).map(i => ("b", i * 100L))
    val got = Robust.winsorizedSummary(gdf(rows), "g", "c", 100L, 900L)
      .collect().map(r => r.getString(0) -> r).toMap
    def hand(xs: Seq[Long]) = {
      val sorted = xs.sorted
      val n = sorted.size
      val lo = sorted(((100L * (n - 1)) / 1000L).toInt)
      val hi = sorted(((900L * (n - 1)) / 1000L).toInt)
      val wins = sorted.map(v => math.min(math.max(v, lo), hi))
      val trim = sorted.filter(v => v >= lo && v <= hi)
      (n.toLong, lo, hi, wins.sum.toDouble / n / 100.0,
        trim.size.toLong, trim.sum.toDouble / trim.size / 100.0)
    }
    for ((g, xs) <- rows.groupBy(_._1)) {
      val (n, lo, hi, wm, nt, tm) = hand(xs.map(_._2))
      val r = got(g)
      assert(r.getLong(1) == n && r.getLong(2) == lo && r.getLong(3) == hi,
        s"group $g bounds")
      assert(math.abs(r.getDouble(4) - wm) < 5e-7, s"group $g wins mean")
      assert(r.getLong(5) == nt)
      assert(math.abs(r.getDouble(6) - tm) < 5e-7, s"group $g trim mean")
    }
    // the outlier is clamped, not counted: group a trim excludes it
    assert(got("a").getLong(5) == 9L)
  }
}
