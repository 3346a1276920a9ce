package graft

import org.apache.spark.sql.functions._

/** q144's time-weighted average on constructed holding periods. */
class TwapSpec extends SparkSpec {

  private def run(rows: Seq[(Long, Long, Long, Double)]): Map[Long, (Long, Long, Long, Double)] = {
    val s = spark
    import s.implicits._
    val work = java.nio.file.Files.createTempDirectory("twap").toString
    rows.toDF("event_id", "tsl", "user_id", "value")
      .select(col("event_id"), timestamp_micros(col("tsl")).as("ts"),
        col("user_id"), lit("tick").as("event_type"), col("value"),
        lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$work/events.parquet")
    graft.SparkEntry.queries("q144_twap")(s, work)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toMap
  }

  private val sec = 1000000L

  test("holding durations weight the average; plain AVG would differ") {
    // user 1: value 1.00 held 9s, then 10.00 held 1s, then a terminal
    // event (no duration). TWAP = (100*9 + 1000*1)/10 = 190 cents;
    // plain avg of values would be (100+1000+500)/3 = 533
    val rows = Seq(
      (1L, 0L, 1L, 1.00), (2L, 9 * sec, 1L, 10.00), (3L, 10 * sec, 1L, 5.00))
    val got = run(rows)
    assert(got(1L) == (2L, 10L, 1900L, 190.0))
  }

  test("zero-span users are excluded, sub-second gaps floor to zero") {
    // user 2: two events 0.4s apart -> dt_s = 0 -> dur 0 -> excluded
    // user 3: one event -> no interval -> excluded
    val rows = Seq(
      (1L, 0L, 2L, 1.0), (2L, 400000L, 2L, 2.0),
      (3L, 0L, 3L, 7.0),
      // user 4 spans exactly 1s + a 0s interval inside it
      (4L, 0L, 4L, 3.00), (5L, 400000L, 4L, 5.00), (6L, 1400000L, 4L, 9.00))
    val got = run(rows)
    assert(!got.contains(2L) && !got.contains(3L))
    // user 4: dt for e4 = floor(0.4s)=0, e5 = floor(1.0s)=1:
    // num = 300*0 + 500*1 = 500, dur 1 -> twap 500
    assert(got(4L) == (2L, 1L, 500L, 500.0))
  }
}
