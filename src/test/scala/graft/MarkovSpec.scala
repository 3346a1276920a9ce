package graft

import org.apache.spark.sql.functions._

/** q135's transition matrix on a constructed event log with known
  * transitions, including the (ts, event_id) tie-break and the
  * per-user sequence boundary (no cross-user transitions).
  */
class MarkovSpec extends SparkSpec {

  private def run(rows: Seq[(Long, Long, Long, String)]): Map[(String, String), (Long, Long)] = {
    val s = spark
    import s.implicits._
    val work = java.nio.file.Files.createTempDirectory("markov").toString
    rows.toDF("event_id", "tsl", "user_id", "event_type")
      .select(col("event_id"), timestamp_micros(col("tsl")).as("ts"),
        col("user_id"), col("event_type"),
        lit(0.0).as("value"), lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$work/events.parquet")
    graft.SparkEntry.queries("q135_markov_transitions")(s, work)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
  }

  test("counts transitions per user in (ts, event_id) order; exact milli probabilities") {
    val rows = Seq(
      // user 1: view -> click -> view   (ts order)
      (1L, 100L, 1L, "view"), (2L, 200L, 1L, "click"), (3L, 300L, 1L, "view"),
      // user 2: view -> view (tie on ts broken by event_id: 4 then 5)
      (4L, 100L, 2L, "view"), (5L, 100L, 2L, "view"),
      // user 3: a single event -> no transition
      (6L, 50L, 3L, "purchase"))
    val got = run(rows)
    // from view: view->click (u1), view->view (u2) ... and u1's click->view
    assert(got == Map(
      ("view", "click") -> (1L, 500L),
      ("view", "view") -> (1L, 500L),
      ("click", "view") -> (1L, 1000L)))
  }

  test("no transitions cross user boundaries") {
    val rows = Seq(
      (1L, 100L, 1L, "a"), (2L, 200L, 2L, "b"),
      (3L, 300L, 1L, "c"), (4L, 400L, 2L, "d"))
    val got = run(rows)
    assert(got == Map(("a", "c") -> (1L, 1000L), ("b", "d") -> (1L, 1000L)))
  }
}
