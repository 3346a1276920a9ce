package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamingOps

/** The q219 per-key quota core: first-come-first-served admission with
  * state carried across micro-batches, and the monotone-delivery guard.
  */
class StreamQuotaSpec extends SparkSpec {

  test("quota admits first k per key across batch boundaries") {
    val s = spark
    import s.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Long, Long)] // (user, eventId, micros, cents)
    val q = StreamingOps.quotaStream(mem.toDS(), k = 3)
      .toDF("user_id", "event_id", "cents")
      .writeStream.format("memory").queryName("quota_t1")
      .outputMode("append").start()
    try {
      // batch 1: user 1 has 2 events (room 3), user 2 has 4 (admit 3)
      mem.addData((1L, 10L, 100L, 5L), (1L, 11L, 200L, 6L),
        (2L, 20L, 100L, 1L), (2L, 21L, 150L, 2L), (2L, 22L, 160L, 3L),
        (2L, 23L, 170L, 4L))
      q.processAllAvailable()
      // batch 2: user 1 gets 3 more (room 1 -> admit earliest by ts),
      // user 2 is exhausted
      mem.addData((1L, 13L, 400L, 8L), (1L, 12L, 300L, 7L), (1L, 14L, 500L, 9L),
        (2L, 24L, 400L, 9L))
      q.processAllAvailable()
      val got = s.table("quota_t1").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == Set(
        (1L, 10L, 5L), (1L, 11L, 6L), (1L, 12L, 7L),
        (2L, 20L, 1L), (2L, 21L, 2L), (2L, 22L, 3L)))
    } finally q.stop()
  }

  test("non-monotone delivery fails loud instead of mis-admitting") {
    val s = spark
    import s.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Long, Long)]
    val q = StreamingOps.quotaStream(mem.toDS(), k = 3)
      .toDF("user_id", "event_id", "cents")
      .writeStream.format("memory").queryName("quota_t2")
      .outputMode("append").start()
    try {
      mem.addData((1L, 10L, 1000L, 5L))
      q.processAllAvailable()
      mem.addData((1L, 11L, 500L, 6L)) // travels back in time
      val ex = intercept[Exception] { q.processAllAvailable() }
      assert(ex.getMessage.contains("out-of-order") ||
        Option(ex.getCause).exists(_.getMessage.contains("out-of-order")))
    } finally q.stop()
  }
}
