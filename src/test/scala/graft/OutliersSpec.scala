package graft

import org.apache.spark.sql.functions._
import graft.llm.Outliers

class OutliersSpec extends SparkSpec {

  test("known geometry: the far point ranks first, exact integer key") {
    val s = spark
    import s.implicits._
    def v(xs: Double*): Seq[Float] = xs.map(_.toFloat)
    // label 0: three points at x = 0, 0, 3 → milli 0, 0, 3000; n = 3,
    // S = 3000. keys: (3·0 − 3000)² = 9e6 (twice), (3·3000 − 3000)² =
    // 36e6 → id 2 first, then ids 0, 1 by the tie rule
    val e = Seq(
      (0L, v(0.0), 0), (1L, v(0.0), 0), (2L, v(3.0), 0),
      (3L, v(1.0), 1), (4L, v(-1.0), 1)
    ).toDF("id", "vec", "label")
    val got = Outliers.centroidOutliers(spark, e, 3)
      .orderBy("label", "rn")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (0, 1, 2L, 36000000L), (0, 2, 0L, 9000000L), (0, 3, 1L, 9000000L),
      // label 1: symmetric pair, equal keys (2·±1000 ∓ 0)² = 4e6,
      // smaller id first
      (1, 1, 3L, 4000000L), (1, 2, 4L, 4000000L)))
  }

  test("k bounds the per-group output; a singleton group has key 0") {
    val s = spark
    import s.implicits._
    def v(xs: Double*): Seq[Float] = xs.map(_.toFloat)
    val e = (0L until 10L).map(i => (i, v(i.toDouble), 0))
      .toDF("id", "vec", "label")
      .union(Seq((99L, v(7.0), 5)).toDF("id", "vec", "label"))
    val got = Outliers.centroidOutliers(spark, e, 2).collect()
    assert(got.count(_.getInt(0) == 0) == 2)
    val lone = got.filter(_.getInt(0) == 5)
    assert(lone.length == 1 && lone.head.getLong(3) == 0L)  // 1·µ − S = 0
  }

  test("unnormalized embeddings raise loudly when the observed µ " +
      "magnitudes could wrap the integer key, well below the row cap") {
    val s = spark
    import s.implicits._
    def v(xs: Double*): Seq[Float] = xs.map(_.toFloat)
    // components ~3.4e7 → µ ~3.4e10 milli; with n = 3 the per-dim bound
    // (2·3·3.4e10)² ≈ 4.2e22 > 2⁶³ — the silent-wrap case the n-only
    // cap (150000 default) never sees
    val big = 3.4e7
    val e = Seq((0L, v(big), 0), (1L, v(-big), 0), (2L, v(big / 2), 0))
      .toDF("id", "vec", "label")
    val ex = intercept[Exception] {
      Outliers.centroidOutliers(spark, e, 2).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(ex).exists(m => m != null && m.contains("Long.MaxValue")))
  }

  test("plan: bounded-heap long top-k — no Window node, partial " +
      "ObjectHashAggregate pair (r10 verdict item 2)") {
    val s = spark
    import s.implicits._
    def v(xs: Double*): Seq[Float] = xs.map(_.toFloat)
    val e = (0L until 20L).map(i => (i, v(i.toDouble), (i % 2).toInt))
      .toDF("id", "vec", "label")
    val plan = Outliers.centroidOutliers(spark, e, 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2, plan)
  }

  test("group-size cap raises loudly instead of wrapping") {
    val s = spark
    import s.implicits._
    def v(xs: Double*): Seq[Float] = xs.map(_.toFloat)
    val e = (0L until 5L).map(i => (i, v(1.0), 0)).toDF("id", "vec", "label")
    val ex = intercept[Exception] {
      Outliers.centroidOutliers(spark, e, 2, groupSizeCap = 3).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(ex).exists(m => m != null && m.contains("groupSizeCap")))
  }
}
