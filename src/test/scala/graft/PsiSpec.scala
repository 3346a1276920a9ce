package graft

import org.apache.spark.sql.functions._

/** q141's PSI on constructed eras with analytic bin distributions. */
class PsiSpec extends SparkSpec {

  private val day = 86400000000L

  private def run(rows: Seq[(Long, Long, String, Double)]): Map[String, (Long, Long, Long, Double)] = {
    val s = spark
    import s.implicits._
    val work = java.nio.file.Files.createTempDirectory("psi").toString
    rows.zipWithIndex.map { case ((tsl, uid, et, v), i) => (i.toLong, tsl, uid, et, v) }
      .toDF("event_id", "tsl", "user_id", "event_type", "value")
      .select(col("event_id"), timestamp_micros(col("tsl")).as("ts"),
        col("user_id"), col("event_type"), col("value"), lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$work/events.parquet")
    graft.SparkEntry.queries("q141_psi_drift")(s, work)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toMap
  }

  test("identical distributions score zero; a shifted one scores the analytic PSI") {
    // days 0..3, cut = (0+3) div 2 = 1: early = days 0-1, late = days 2-3.
    // type "same": values 10 and 60 in both eras -> psi 0.
    val same = for (di <- 0 to 3; v <- Seq(10.0, 60.0))
      yield (di * day, 1L, "same", v)
    // type "shift": early all in bin 0 (v=10) plus one in bin 1 (60);
    // late flipped: one in bin 0, three in bin 1.
    val shift = Seq(
      (0L * day, 1L, "shift", 10.0), (0L * day, 1L, "shift", 10.0),
      (1L * day, 1L, "shift", 10.0), (1L * day, 1L, "shift", 60.0),
      (2L * day, 1L, "shift", 10.0), (2L * day, 1L, "shift", 60.0),
      (3L * day, 1L, "shift", 60.0), (3L * day, 1L, "shift", 60.0))
    val got = run(same ++ shift)
    assert(got("same") == (4L, 4L, 2L, 0.0))
    val (ne, nl, nb, psi) = got("shift")
    assert(ne == 4L && nl == 4L && nb == 2L)
    // analytic: pe=(3/4,1/4), pl=(1/4,3/4): psi = 2 * (1/2 * ln 3)
    val want = math.rint((0.75 - 0.25) * math.log(3.0) * 2 * 1e6) / 1e6
    assert(math.abs(psi - want) < 1e-9, s"psi=$psi want=$want")
  }

  test("bins empty in one era are excluded, not epsilon-fudged") {
    // early only bin 0; late has bins 0 and 9 -> only bin 0 contributes
    val rows = Seq((0L, 1L, "t", 10.0), (0L, 1L, "t", 10.0),
      (3L * day, 1L, "t", 10.0), (3L * day, 1L, "t", 480.0))
    val got = run(rows)
    val (ne, nl, nb, psi) = got("t")
    assert(ne == 2L && nl == 2L && nb == 1L)
    // contribution of bin 0: (1 - 1/2) * ln(2) rounded to 6
    val want = math.rint(0.5 * math.log(2.0) * 1e6) / 1e6
    assert(math.abs(psi - want) < 1e-9)
  }
}
