package graft

import org.apache.spark.sql.functions._

/** q151's exact-integer KS statistic on constructed eras. */
class KsDriftSpec extends SparkSpec {

  private val day = 86400000000L

  private def run(rows: Seq[(Long, String, Double)]): Map[String, (Long, Long, Long, Double)] = {
    val s = spark
    import s.implicits._
    val work = java.nio.file.Files.createTempDirectory("ks").toString
    rows.zipWithIndex.map { case ((tsl, et, v), i) => (i.toLong, tsl, 1L, et, v) }
      .toDF("event_id", "tsl", "user_id", "event_type", "value")
      .select(col("event_id"), timestamp_micros(col("tsl")).as("ts"),
        col("user_id"), col("event_type"), col("value"), lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$work/events.parquet")
    graft.SparkEntry.queries("q151_ks_drift")(s, work)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toMap
  }

  test("identical eras score 0; disjoint supports score 1") {
    // days 0..3, cut=1: early days 0-1, late days 2-3
    val same = for (di <- 0 to 3; v <- Seq(1.0, 2.0, 3.0)) yield (di * day, "same", v)
    // "shift": early all at 1.0, late all at 9.0 -> CDFs never overlap -> D=1
    val shift = Seq((0L, "shift", 1.0), (day, "shift", 1.0),
      (2 * day, "shift", 9.0), (3 * day, "shift", 9.0))
    val got = run(same ++ shift)
    assert(got("same") == (6L, 6L, 0L, 0.0))
    assert(got("shift") == (2L, 2L, 4L, 1.0), s"got ${got("shift")}")
  }

  test("partial overlap gives the analytic sup distance") {
    // early: {1, 2}; late: {2, 3}. At v=1: |1/2 - 0| = 1/2 (the sup).
    val rows = Seq((0L, "t", 0.01), (0L, "t", 0.02),
      (2 * day, "t", 0.02), (2 * day, "t", 0.03),
      // pin the global day span so the cut stays at day 1 regardless
      (0L, "anchor", 1.0), (3 * day, "anchor", 1.0))
    val got = run(rows)
    val (n1, n2, dnum, ks) = got("t")
    assert(n1 == 2L && n2 == 2L && dnum == 2L && ks == 0.5, s"got ${got("t")}")
  }
}
