package graft

import org.apache.spark.sql.functions._

/** q138's OLS on constructed daily series with known closed forms. */
class TrendOlsSpec extends SparkSpec {

  private def run(rows: Seq[(Long, Long, Long, String, Double)]):
      Map[String, (Long, Long, Long, Double)] = {
    val s = spark
    import s.implicits._
    val work = java.nio.file.Files.createTempDirectory("trend").toString
    rows.toDF("event_id", "tsl", "user_id", "event_type", "value")
      .select(col("event_id"), timestamp_micros(col("tsl")).as("ts"),
        col("user_id"), col("event_type"), col("value"),
        lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$work/events.parquet")
    graft.SparkEntry.queries("q138_trend_ols")(s, work)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toMap
  }

  private val day = 86400000000L // micros

  test("a perfectly linear daily series recovers its slope exactly") {
    // type "up": daily cents 100, 200, 300 over days 0,1,2 -> slope 100
    // cents/day; type "flat": constant 500 -> slope 0
    val rows = (0 to 2).map(i =>
      (i.toLong + 1, i * day, 1L, "up", (i + 1) * 1.00)) ++
      (0 to 2).map(i => (i.toLong + 10, i * day, 1L, "flat", 5.00))
    val got = run(rows)
    val (nU, numU, denU, slopeU) = got("up")
    assert(nU == 3L && slopeU == 100.0 && numU == 100L * denU / 1L)
    val (nF, _, _, slopeF) = got("flat")
    assert(nF == 3L && slopeF == 0.0)
  }

  test("within-day events aggregate before the fit") {
    // two events on day 0 (total 300 cents), one on day 1 (500) ->
    // points (d0,300),(d1,500): slope 200 cents/day
    val rows = Seq((1L, 0L, 1L, "t", 1.00), (2L, 1000L, 2L, "t", 2.00),
      (3L, day, 1L, "t", 5.00))
    val got = run(rows)
    assert(got("t")._4 == 200.0)
  }
}
