package graft

import org.apache.spark.sql.functions._
import graft.rel.Quality

class QualitySpec extends SparkSpec {

  test("one-pass audit counts each rule independently") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, 10.0, 0.1), (2L, -5.0, 0.2), (3L, 0.0, 1.5), (4L, 7.0, -0.1))
      .toDF("k", "qty", "disc")
    val got = Quality.audit(df, Seq(
        "nonpos_qty" -> (col("qty") <= 0),
        "disc_range" -> (col("disc") < 0 || col("disc") > 1)))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("nonpos_qty" -> 2L, "disc_range" -> 2L))
    // single scan: the plan contains exactly one aggregate over the input
    val plan = Quality.audit(df, Seq("a" -> (col("qty") < 0),
      "b" -> (col("disc") > 1))).queryExecution.optimizedPlan
    val nAgg = plan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }.length
    assert(nAgg == 1, s"row-local rules must fold into one pass, got $nAgg aggregates")
  }

  test("duplicate keys and orphans count exactly") {
    val s = spark
    import s.implicits._
    val child = Seq((1L, "a"), (1L, "a"), (1L, "a"), (2L, "b"), (9L, "x"))
      .toDF("k", "v")
    val parent = Seq((1L, "p"), (2L, "p")).toDF("pk", "v")
    val dup = Quality.duplicateKeys(child, "dups", Seq("k", "v")).collect().head
    assert(dup.getString(0) == "dups" && dup.getLong(1) == 2L)
    val orph = Quality.orphans(child, "orph", "k", parent, "pk").collect().head
    assert(orph.getString(0) == "orph" && orph.getLong(1) == 1L)
    // clean child: zero, not null
    val clean = Quality.duplicateKeys(parent, "d0", Seq("pk")).collect().head
    assert(clean.getLong(1) == 0L)
  }

  test("fdAudit: holding and violated dependencies with exact fan-outs") {
    val sp = spark
    import sp.implicits._
    val df = Seq(
      (1L, "r1", "a"), (1L, "r1", "b"), // x=1 -> one region, two segs
      (2L, "r1", "a"), (2L, "r1", "a"),
      (3L, "r2", "a"), (3L, "r2", "b"), (3L, "r2", "c")
    ).toDF("x", "region", "seg")
    val holds = Quality.fdAudit("x->region", df, Seq("x"), "region")
      .collect().head
    assert(holds.getLong(1) == 3L && holds.getLong(2) == 0L
      && holds.getLong(3) == 1L && holds.getBoolean(4))
    val broken = Quality.fdAudit("x->seg", df, Seq("x"), "seg")
      .collect().head
    // x=1 (2 segs) and x=3 (3 segs) violate; worst fan-out 3
    assert(broken.getLong(1) == 3L && broken.getLong(2) == 2L
      && broken.getLong(3) == 3L && !broken.getBoolean(4))
  }

  test("benford: dense digit domain, missing digits owe their chi2 term") {
    val s = spark
    import s.implicits._
    // every value starts with 1: 8 digits have zero observations but
    // still appear with their expected term driving chi2 up
    val df = ((1L to 48L).map(k => 100L + k) ++ Seq(0L, -7L)).toDF("v")
    val got = Quality.benfordAudit(df, "v").collect()
    assert(got.length == 9)
    val byDigit = got.map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2))).toMap
    assert(byDigit(1L) == ((48L, 1000L))) // zero/negative excluded
    (2L to 9L).foreach(dd => assert(byDigit(dd) == ((0L, 0L))))
    // d=1 term alone: (48 - 48*0.30103)^2 / (48*0.30103) ~ 78 >> crit
    assert(!got.head.getBoolean(5)) // wildly non-benford
    // constant columns identical on every row
    assert(got.map(_.getDouble(4)).distinct.length == 1)
  }

  test("benford: no positive values raises instead of dividing by zero") {
    val s = spark
    import s.implicits._
    val e = intercept[Exception](
      Quality.benfordAudit(Seq(0L, -3L).toDF("v"), "v").collect())
    assert(e.getMessage != null && e.getMessage.contains("no positive values"),
      e.getMessage)
  }

  test("benford: the counts/readout split composes to the one-shot audit") {
    val s = spark
    import s.implicits._
    val df = ((1L to 48L).map(k => 100L + k) ++ Seq(900L, 77L)).toDF("v")
    val once = Quality.benfordAudit(df, "v").collect().map(_.toSeq).toSeq
    val split = Quality.benfordFromCounts(Quality.benfordCounts(df, "v"))
      .collect().map(_.toSeq).toSeq
    assert(once == split)
  }

  test("benford: a log-uniform sample conforms") {
    val s = spark
    import s.implicits._
    // 10^(k/97) for k = 0..96*3 spans three decades nearly log-uniform
    val vals = (0 until 291).map(k => math.pow(10.0, 2 + k / 97.0).toLong)
    val got = Quality.benfordAudit(vals.toDF("v"), "v").collect()
    assert(got.head.getBoolean(5),
      s"chi2 = ${got.head.getDouble(4)} should conform")
  }
}
