package graft

import org.apache.spark.sql.functions._

/** q137's per-user rare-transition signals on a constructed log with an
  * analytic transition matrix.
  */
class RareTransitionsSpec extends SparkSpec {

  private def run(rows: Seq[(Long, Long, Long, String)]): Map[Long, (Long, Long, Long)] = {
    val s = spark
    import s.implicits._
    val work = java.nio.file.Files.createTempDirectory("raretr").toString
    rows.toDF("event_id", "tsl", "user_id", "event_type")
      .select(col("event_id"), timestamp_micros(col("tsl")).as("ts"),
        col("user_id"), col("event_type"),
        lit(0.0).as("value"), lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$work/events.parquet")
    graft.SparkEntry.queries("q137_rare_transitions")(s, work)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
  }

  test("flags the user who took the rare path") {
    // 19 users go a->b; one goes a->c. From a: b has p=950 milli,
    // c has p=50 milli (rare, < 100).
    var eid = 0L
    val common = (1L to 19L).flatMap { u =>
      eid += 2; Seq((eid - 1, 100L, u, "a"), (eid, 200L, u, "b"))
    }
    val rare = { eid += 2; Seq((eid - 1, 100L, 20L, "a"), (eid, 200L, 20L, "c")) }
    val got = run(common ++ rare)
    assert(got(1L) == (1L, 0L, 950L))
    assert(got(20L) == (1L, 1L, 50L))
  }

  test("multi-step paths count every transition; min is over the path") {
    // one user: a->b->a->b (3 transitions); matrix from this single
    // user: a->b p=1000, b->a p=1000 — nothing rare
    val rows = Seq((1L, 10L, 1L, "a"), (2L, 20L, 1L, "b"),
      (3L, 30L, 1L, "a"), (4L, 40L, 1L, "b"))
    val got = run(rows)
    assert(got(1L) == (3L, 0L, 1000L))
  }
}
