package graft

import org.apache.spark.sql.functions._
import graft.rel.Inference

/** Nonparametric / multiple-testing inference (rel/Inference.scala):
  * Kruskal–Wallis vs an independent rank implementation, the
  * randomization test vs a driver-side replay of the hash permutation,
  * BH step-up on textbook families (including the all-reject step-up
  * case), MDE hand arithmetic, and the loud guards.
  */
class InferenceSpec extends SparkSpec {

  // ---------- Kruskal–Wallis ----------

  /** independent KW (average ranks + tie correction), plain Scala */
  private def handKw(rows: Seq[(String, Long)]): (Double, Double) = {
    val n = rows.size.toDouble
    val cnt = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val avgRank = {
      var below = 0L
      cnt.keys.toSeq.sorted.map { v =>
        val t = cnt(v)
        val r = below + (t + 1) / 2.0
        below += t
        v -> r
      }.toMap
    }
    val byG = rows.groupBy(_._1)
    val sum2 = byG.values.map { g =>
      val s = g.map(r => avgRank(r._2)).sum
      s * s / g.size
    }.sum
    val h = 12.0 / (n * (n + 1)) * sum2 - 3 * (n + 1)
    val ties = cnt.values.map(t => t * t * t - t).sum.toDouble
    (h, h / (1.0 - ties / (n * n * n - n)))
  }

  test("kruskalWallis matches an independent rank implementation, with ties") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      ("a", 10L), ("a", 20L), ("a", 20L), ("a", 45L),
      ("b", 20L), ("b", 30L), ("b", 50L), ("b", 50L), ("b", 70L),
      ("c", 5L), ("c", 20L), ("c", 80L), ("c", 90L))
    val (h, hTie) = handKw(rows)
    val got = Inference.kruskalWallis(rows.toDF("g", "v"), "g", "v").head
    assert(got.getLong(0) === rows.size.toLong)
    assert(got.getLong(1) === 3L)
    assert(math.abs(got.getDouble(2) - h) < 5e-7, s"h: ${got.getDouble(2)} vs $h")
    assert(math.abs(got.getDouble(3) - hTie) < 5e-7)
    // df = 2 critical literal
    assert(math.abs(got.getDouble(4) - 5.991464547107979) < 1e-12)
  }

  test("kruskalWallis flags a clearly separated design") {
    val s = spark
    import s.implicits._
    // three groups with disjoint value ranges: maximal rank separation
    val rows = (1L to 30L).map(i => ("g" + (i - 1) / 10, i * 100L))
    val got = Inference.kruskalWallis(rows.toDF("g", "v"), "g", "v").head
    assert(got.getBoolean(5), "disjoint groups must reject at 5%")
    val (_, hTie) = handKw(rows)
    assert(math.abs(got.getDouble(3) - hTie) < 5e-7)
  }

  test("kruskalWallis all-values-equal degenerates to null h_tie") {
    val s = spark
    import s.implicits._
    val rows = Seq(("a", 7L), ("a", 7L), ("b", 7L), ("b", 7L))
    val got = Inference.kruskalWallis(rows.toDF("g", "v"), "g", "v").head
    assert(got.isNullAt(3) && got.isNullAt(5))
  }

  // ---------- randomization test ----------

  /** driver-side replay of the hash permutation */
  private def handPerm(rows: Seq[(Long, Long, Long)], reps: Int): Long = {
    def mean(xs: Seq[Long]): Double = xs.sum.toDouble / xs.size.toDouble
    val dObs = math.abs(
      mean(rows.filter(_._3 == 0L).map(_._2)) -
        mean(rows.filter(_._3 == 1L).map(_._2)))
    1L + (0 until reps).count { rep =>
      val sides = rows.map { case (id, v, _) =>
        val h = (id * 2654435761L + (rep + 1L) * 940572985L) % 2147483648L
        (v, h >= 1073741824L)
      }
      val a = sides.filter(!_._2).map(_._1)
      val b = sides.filter(_._2).map(_._1)
      a.isEmpty || b.isEmpty || math.abs(mean(a) - mean(b)) >= dObs
    }
  }

  test("permutationPValues matches a driver-side replay of the hash") {
    val s = spark
    import s.implicits._
    // a real mean gap: A around 100, B around 500
    val rows = (1L to 12L).map(i =>
      (i, if (i <= 6) 100L + i else 450L + i, if (i <= 6) 0L else 1L))
    val expected = handPerm(rows, reps = 99)
    val got = Inference.permutationPValues(rows.toDF("id", "v", "sb"),
      lit("t0"), col("id"), col("v"), col("sb"), reps = 99).head
    assert(got.getLong(1) === 6L && got.getLong(2) === 6L)
    assert(got.getLong(3) === expected, s"p_num ${got.getLong(3)} vs $expected")
    assert(got.getLong(4) === 100L)
  }

  test("permutationPValues: identical groups give p = 1") {
    val s = spark
    import s.implicits._
    // every unit identical -> every permuted diff is 0 = observed diff,
    // so every replicate counts as extreme
    val rows = (1L to 10L).map(i => (i, 42L, i % 2))
    val got = Inference.permutationPValues(rows.toDF("id", "v", "sb"),
      lit("t0"), col("id"), col("v"), col("sb"), reps = 49).head
    assert(got.getLong(3) === 50L && got.getLong(4) === 50L)
  }

  test("permutationPValues fails loudly on a one-sided test") {
    val s = spark
    import s.implicits._
    val rows = Seq((1L, 5L, 0L), (2L, 6L, 0L))
    val ex = intercept[Exception] {
      Inference.permutationPValues(rows.toDF("id", "v", "sb"),
        lit("t0"), col("id"), col("v"), col("sb"), reps = 19).collect()
    }
    assert(ex.getMessage.contains("one-sided"))
  }

  // ---------- BH step-up ----------

  private def bhOn(ps: Seq[Long], den: Long): Seq[(String, Boolean)] = {
    val s = spark
    import s.implicits._
    val df = ps.zipWithIndex
      .map { case (p, i) => (s"t$i", p, den) }
      .toDF("test", "p_num", "p_den")
    Inference.bhStepUp(df, "test", "p_num", "p_den", alphaMilli = 50L)
      .orderBy("bh_rank")
      .collect().map(r => (r.getString(0), r.getBoolean(4))).toSeq
  }

  test("bhStepUp: textbook family rejects exactly the step-up prefix") {
    // p = .005 .009 .05 .2 .9, m=5, alpha=.05: thresholds i*.01 ->
    // ranks 1,2 pass, 3 fails (.05 > .03), step-up K=2
    val got = bhOn(Seq(5L, 9L, 50L, 200L, 900L), den = 1000L)
    assert(got.map(_._2) === Seq(true, true, false, false, false))
  }

  test("bhStepUp: the step-up surprise — a passing last rank rejects all") {
    // p = .01 .02 .03 .04 .05: every rank i satisfies p_(i) <= i*.01,
    // so K = 5 and ALL are rejected (the step-up, not step-down, rule)
    val got = bhOn(Seq(10L, 20L, 30L, 40L, 50L), den = 1000L)
    assert(got.map(_._2) === Seq(true, true, true, true, true))
  }

  test("bhStepUp: nothing passes -> nothing rejected") {
    val got = bhOn(Seq(300L, 500L, 900L), den = 1000L)
    assert(got.map(_._2) === Seq(false, false, false))
  }

  // ---------- MDE ----------

  test("mdeTwoSample matches hand arithmetic") {
    val s = spark
    import s.implicits._
    val rows = Seq((0L, 1000L), (0L, 2000L), (0L, 3000L),
      (1L, 2000L), (1L, 4000L))
    val v0 = 1000000.0 // sample var of 1000,2000,3000
    val v1 = 2000000.0 // sample var of 2000,4000
    val mde = 2.8015852181129683 * math.sqrt(v0 / 3.0 + v1 / 2.0)
    val got = Inference.mdeTwoSample(rows.toDF("variant", "y")).head
    assert(got.getLong(0) === 3L && got.getLong(1) === 2L)
    assert(math.abs(got.getDouble(2) - 2.0) < 1e-9)
    assert(math.abs(got.getDouble(3) - mde / 1000.0) < 5e-7)
    assert(math.abs(got.getDouble(4) - mde / 2000.0) < 5e-7)
  }

  test("mdeTwoSample fails loudly below 2 units per variant") {
    val s = spark
    import s.implicits._
    val ex = intercept[Exception] {
      Inference.mdeTwoSample(
        Seq((0L, 1000L), (0L, 2000L), (1L, 500L)).toDF("variant", "y"))
        .collect()
    }
    assert(ex.getMessage.contains("2 units"))
  }
}
