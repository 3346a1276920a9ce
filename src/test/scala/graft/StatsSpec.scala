package graft

import org.apache.spark.sql.functions._

/** Analytic fixtures for the experiment-stats tier (q154/q155/q156). */
class StatsSpec extends SparkSpec {

  private def writeEvents(work: String, rows: Seq[(Long, Long, Long, String, Double)]): Unit = {
    val s = spark
    import s.implicits._
    rows.toDF("event_id", "tsl", "user_id", "event_type", "value")
      .select(col("event_id"), timestamp_micros(col("tsl")).as("ts"),
        col("user_id"), col("event_type"), col("value"), lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$work/events.parquet")
  }

  test("last-touch attribution credits the latest touch at-or-before each purchase") {
    val work = java.nio.file.Files.createTempDirectory("attr").toString
    writeEvents(work, Seq(
      // user 1: click@10, view@20, purchase@30 (5.00) -> view
      (1L, 10L, 1L, "click", 0.0), (2L, 20L, 1L, "view", 0.0),
      (3L, 30L, 1L, "purchase", 5.0),
      // user 2: touch tie at the same instant -> max event_id wins (signup)
      (4L, 40L, 2L, "click", 0.0), (5L, 40L, 2L, "signup", 0.0),
      (6L, 41L, 2L, "purchase", 7.0),
      // user 3: purchase with no prior touch -> none
      (7L, 50L, 3L, "purchase", 1.0),
      // user 4: touch AT the purchase instant is credited (inclusive)
      (8L, 60L, 4L, "click", 0.0), (9L, 60L, 4L, "purchase", 2.0)))
    val got = SparkEntry.queries("q154_attribution")(spark, work)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map(
      "view" -> (1L, 500L), "signup" -> (1L, 700L),
      "none" -> (1L, 100L), "click" -> (1L, 200L)), s"got $got")
  }

  test("chi-squared: balanced conversions score 0, skewed split scores the analytic value") {
    val work = java.nio.file.Files.createTempDirectory("chisq").toString
    // 4 users: 0,2 even (grp A), 1,3 odd (grp B); one converter per group
    writeEvents(work, Seq(
      (1L, 10L, 0L, "purchase", 1.0), (2L, 11L, 2L, "view", 0.0),
      (3L, 12L, 1L, "purchase", 1.0), (4L, 13L, 3L, "view", 0.0)))
    val r = SparkEntry.queries("q155_ab_chisq")(spark, work).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) == (2L, 1L, 2L, 1L))
    assert(r.getDouble(4) == 0.0 && !r.getBoolean(5))

    // all 10 even users convert, none of the 10 odd ones: chi2 = N = 20
    writeEvents(work, (0L until 10L).map(u =>
        (u + 1, 10L + u, u * 2, "purchase", 1.0)) ++
      (0L until 10L).map(u => (u + 11, 30L + u, u * 2 + 1, "view", 0.0)))
    val r2 = SparkEntry.queries("q155_ab_chisq")(spark, work).collect()(0)
    assert(r2.getDouble(4) == 20.0 && r2.getBoolean(5), s"got $r2")
  }

  test("ACF of an alternating series is -1 at lag 1 and +1 at lag 2") {
    val s = spark
    import s.implicits._
    val work = java.nio.file.Files.createTempDirectory("acf").toString
    // daily revenue alternates 100.00 / 200.00 over 12 consecutive days
    val day0 = 19700L // days since epoch, arbitrary
    (0 until 12).map { i =>
      (i.toLong, i.toLong, "O", if (i % 2 == 0) 100.0 else 200.0,
        (day0 + i) * 86400000000L, "P")
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "tsl", "o_orderpriority")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), timestamp_micros(col("tsl")).as("o_orderdate"),
        col("o_orderpriority"))
      .write.mode("overwrite").parquet(s"$work/orders.parquet")
    val got = SparkEntry.queries("q156_acf")(spark, work)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got(1L) == -1.0 && got(2L) == 1.0 && got(3L) == -1.0, s"got $got")
  }
}
