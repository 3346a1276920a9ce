package graft

import org.apache.spark.sql.functions._

/** q142's Pearson correlation on constructed series with known r. */
class SeriesCorrSpec extends SparkSpec {

  private val day = 86400000000L

  private def run(rows: Seq[(Long, String, Double)]): Map[(String, String), Double] = {
    val s = spark
    import s.implicits._
    val work = java.nio.file.Files.createTempDirectory("scorr").toString
    rows.zipWithIndex.map { case ((tsl, et, v), i) => (i.toLong, tsl, 1L, et, v) }
      .toDF("event_id", "tsl", "user_id", "event_type", "value")
      .select(col("event_id"), timestamp_micros(col("tsl")).as("ts"),
        col("user_id"), col("event_type"), col("value"), lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$work/events.parquet")
    graft.SparkEntry.queries("q142_series_corr")(s, work)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(6))
      .toMap
  }

  test("perfectly correlated, anti-correlated, and uncorrelated series") {
    // days 0..3; "a" rises 1,2,3,4; "b" = 2*a (r=1); "c" falls 4,3,2,1
    // (r=-1 vs a); "d" = 3,1,3,1 with corr(a,d)=... compute: a=(1,2,3,4)
    // d=(3,1,3,1): cov = mean(ad)-mean(a)mean(d) = (3+2+9+4)/4 - 2.5*2
    //  = 4.5-5 = -0.5; var(a)=1.25, var(d)=1 -> r = -0.4472136
    val rows = (0 to 3).flatMap { i =>
      Seq((i * day, "a", (i + 1) * 1.0), (i * day, "b", (i + 1) * 2.0),
        (i * day, "c", (4 - i) * 1.0),
        (i * day, "d", if (i % 2 == 0) 3.0 else 1.0))
    }
    val got = run(rows)
    assert(got(("a", "b")) == 1.0)
    assert(got(("a", "c")) == -1.0)
    assert(math.abs(got(("a", "d")) - -0.447214) < 1e-9)
  }

  test("only shared days enter the sums") {
    // "a" has days 0..2, "b" only days 0..1: n=2, and on those days the
    // two series are proportional -> r = 1
    val rows = Seq((0L, "a", 1.0), (day, "a", 2.0), (2 * day, "a", 9.0),
      (0L, "b", 5.0), (day, "b", 10.0))
    val got = run(rows)
    assert(got(("a", "b")) == 1.0)
  }
}
