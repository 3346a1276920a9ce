package graft

import org.apache.spark.sql.functions._
import graft.rel.{Distribution, Tables}

/** The q209–q213 distribution tier: brute-force ground truths for the
  * rank-sum U and the moment formulas, plus structural invariants the
  * oracles also enforce (digit-permille totals, histogram bounds).
  */
class DistributionSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q210: doubled U statistics match the brute-force pair count") {
    val s = spark
    val rows = Tables.orders(s, sf)
      .join(Tables.customer(s, sf), col("o_custkey") === col("c_custkey"))
      .filter(col("c_mktsegment").isin("AUTOMOBILE", "BUILDING"))
      .select(round(col("o_totalprice") * 100, 0).cast("long").as("v"),
        (col("c_mktsegment") === "AUTOMOBILE").as("is_a"))
      .collect()
    val a = rows.filter(_.getBoolean(1)).map(_.getLong(0))
    val b = rows.filterNot(_.getBoolean(1)).map(_.getLong(0))
    // 2*U1 = sum over cross pairs of 2*[a>b] + [a==b]
    var twoU1 = 0L
    for (x <- a; y <- b) twoU1 += (if (x > y) 2L else if (x == y) 1L else 0L)
    val got = Distribution.all("q210_mannwhitney").fn(s, sf).collect().head
    assert(got.getLong(0) == a.length.toLong)
    assert(got.getLong(1) == b.length.toLong)
    assert(got.getLong(2) == twoU1)
    assert(got.getLong(3) == 2L * a.length * b.length - twoU1)
  }

  test("q212: signed g1^2 and excess kurtosis match direct computation") {
    val s = spark
    val qs = Tables.lineitem(s, sf)
      .select(col("l_returnflag"), col("l_quantity").cast("long"))
      .collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(1))).toMap
    val got = Distribution.all("q212_moments").fn(s, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    for ((flag, xs) <- qs) {
      val n = xs.length.toDouble
      val mean = xs.sum.toDouble / n
      val m2 = xs.map(x => math.pow(x - mean, 2)).sum / n
      val m3 = xs.map(x => math.pow(x - mean, 3)).sum / n
      val m4 = xs.map(x => math.pow(x - mean, 4)).sum / n
      val g1sq = math.signum(m3) * (m3 * m3) / (m2 * m2 * m2)
      val kurt = m4 / (m2 * m2) - 3.0
      val (gn, gMean, gSkew, gKurt) = got(flag)
      assert(gn == xs.length.toLong)
      assert(math.abs(gMean - mean) < 1e-5, s"$flag mean")
      assert(math.abs(gSkew - g1sq) < 1e-4, s"$flag skew: $gSkew vs $g1sq")
      assert(math.abs(gKurt - kurt) < 1e-4, s"$flag kurt: $gKurt vs $kurt")
    }
  }

  test("q209: digit counts total the positive orders; permilles sum to ~1000") {
    val s = spark
    val rows = Distribution.all("q209_benford").fn(s, sf).collect()
    val total = Tables.orders(s, sf)
      .filter(round(col("o_totalprice") * 100, 0).cast("long") > 0).count()
    assert(rows.map(_.getLong(1)).sum == total)
    val permille = rows.map(_.getDouble(2)).sum
    assert(math.abs(permille - 1000.0) < 1e-3)
    assert(rows.map(_.getLong(0)).forall(d => d >= 1 && d <= 9))
  }

  test("q213: buckets partition the orders and bound their values") {
    val s = spark
    val rows = Distribution.all("q213_log2_histogram").fn(s, sf).collect()
    val cents = Tables.orders(s, sf)
      .select(round(col("o_totalprice") * 100, 0).cast("long").as("c"))
      .filter(col("c") > 0).collect().map(_.getLong(0))
    assert(rows.map(_.getLong(1)).sum == cents.length.toLong)
    assert(rows.last.getLong(2) == cents.length.toLong) // cumulative total
    for (r <- rows) {
      val (bucket, lo, hi) = (r.getLong(0), r.getLong(3), r.getLong(4))
      assert(lo == 1L << (bucket - 1) && hi == (1L << bucket) - 1)
      val inBucket = cents.count(c => c >= lo && c <= hi)
      assert(inBucket.toLong == r.getLong(1), s"bucket $bucket")
    }
  }

  test("q229: welchPairs matches hand-computed Welch t on analytic groups") {
    val s = spark
    import s.implicits._
    // A=[1,2,3]: mean 2, var 1; B=[2,4,6]: mean 4, var 4
    //   t = (2-4)/sqrt(1/3 + 4/3) = -1.5491933384829668 -> -1.549193
    // C=[10,10,11] vs D=[1,1,2]: t = 19.091883092036646 -> 19.091883
    val vals = Seq(
      ("A", 1L), ("A", 2L), ("A", 3L), ("B", 2L), ("B", 4L), ("B", 6L),
      ("C", 10L), ("C", 10L), ("C", 11L), ("D", 1L), ("D", 1L), ("D", 2L)
    ).toDF("seg", "v")
    val rows = Distribution.welchPairs(vals).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4), r.getBoolean(5))).toMap
    assert(rows.size == 6) // all 4C2 pairs, seg_a < seg_b
    assert(rows(("A", "B")) == ((3L, 3L, -1.549193, false)))
    assert(rows(("C", "D")) == ((3L, 3L, 19.091883, true)))
    // antisymmetry through the pair order: D vs C never appears
    assert(!rows.contains(("D", "C")))
  }

  test("q229: welchPairs drops degenerate groups instead of emitting NaN/Inf") {
    val s = spark
    import s.implicits._
    val vals = Seq(
      ("A", 1L), ("A", 2L), ("A", 3L), // healthy
      ("S", 7L),                       // n = 1: (n-1) division would be /0
      ("Z1", 5L), ("Z1", 5L),          // zero variance...
      ("Z2", 9L), ("Z2", 9L)           // ...paired with zero variance: se2 = 0
    ).toDF("seg", "v")
    val rows = Distribution.welchPairs(vals).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    // S never appears (n < 2); the Z1-Z2 pair is dropped (se2 = 0); the
    // zero-variance groups still pair with A (A's variance carries se2)
    assert(rows == Set(("A", "Z1"), ("A", "Z2")))
    Distribution.welchPairs(vals).collect().foreach { r =>
      val t = r.getDouble(4)
      assert(!t.isNaN && !t.isInfinite, s"non-finite t in $r")
    }
  }

  test("mann-kendall: monotone series hits the closed form; ties and constants behave") {
    val sp = spark
    import sp.implicits._
    // strictly increasing, n=10: S = C(10,2) = 45; no ties ->
    // var18 = 10*9*25 = 2250, Var = 125, z = 44/sqrt(125)
    val up = (1L to 10L).map(i => ("up", i, i * 100))
    // constant, n=6: tie_corr = 6*5*17 = n(n-1)(2n+5) -> var18 = 0, z = 0
    val flat = (1L to 6L).map(i => ("flat", i, 7L))
    // strictly decreasing, n=10: S = -45, z = -44/sqrt(125)
    val down = (1L to 10L).map(i => ("down", i, 1000 - i * 10))
    val got = Distribution.mannKendall((up ++ flat ++ down).toDF("grp", "x", "y"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
          r.getBoolean(5))).toMap
    val zUp = math.rint(44.0 / math.sqrt(2250.0 / 18.0) * 1e6) / 1e6
    assert(got("up") == (10L, 45L, 2250L, zUp, true))
    assert(got("down") == (10L, -45L, 2250L, -zUp, true))
    assert(got("flat") == (6L, 0L, 0L, 0.0, false))
  }
}
