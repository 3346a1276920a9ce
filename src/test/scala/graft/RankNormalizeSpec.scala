package graft

import org.apache.spark.sql.functions._

/** q148 rank normalization and q149 winsorized mean on constructed
  * groups with analytic values.
  */
class RankNormalizeSpec extends SparkSpec {

  private def fixture(rows: Seq[(Long, String, Double)]): String = {
    val s = spark
    import s.implicits._
    val work = java.nio.file.Files.createTempDirectory("ranknorm").toString
    rows.map { case (id, et, v) => (id, id * 1000L, 1L, et, v) }
      .toDF("event_id", "tsl", "user_id", "event_type", "value")
      .select(col("event_id"), timestamp_micros(col("tsl")).as("ts"),
        col("user_id"), col("event_type"), col("value"), lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$work/events.parquet")
    work
  }

  test("ranks span exactly 0..1000; singleton groups pin to 0") {
    val rows = (1L to 5L).map(i => (i, "a", i * 1.0)) :+ ((9L, "solo", 7.0))
    val got = graft.SparkEntry.queries("q148_rank_normalize")(spark, fixture(rows))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got == Map(1L -> 0L, 2L -> 250L, 3L -> 500L, 4L -> 750L,
      5L -> 1000L, 9L -> 0L))
  }

  test("winsorized mean clamps the outlier; bounds are the rank order stats") {
    // 21 values: 1..20 cents plus one 10000-cent outlier. n=21:
    // lo rank = (5*20)//100+1 = 2 -> lo = 2 cents
    // hi rank = (95*20)//100+1 = 20 -> hi = 20 cents
    // clamped sum = 2 + 2..20 (19 vals) + 20 = 2 + 209 + 20 = 231
    val rows = (1L to 20L).map(i => (i, "t", i / 100.0)) :+ ((21L, "t", 100.0))
    val got = graft.SparkEntry.queries("q149_winsorized_mean")(spark, fixture(rows))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).head
    val (n, lo, hi, wmean) = got
    assert(n == 21L && lo == 2L && hi == 20L)
    assert(math.abs(wmean - 231.0 / 21.0) < 1e-9, s"wmean=$wmean")
    // the raw mean would be (210 + 10000)/21 ≈ 486 — the clamp is doing
    // real work
  }
}
