package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._
import graft.rel.Scd

class ScdSpec extends SparkSpec {

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")

  test("collapses consecutive equal states into validity intervals") {
    val s = spark
    import s.implicits._
    val ev = Seq(
      (1L, "A", ts(0), 0L), (1L, "A", ts(1), 1L), (1L, "B", ts(2), 2L),
      (1L, "A", ts(3), 3L), // back to A: a NEW run, not merged
      (2L, "X", ts(0), 4L))
      .toDF("user_id", "state_in", "t", "eid")
    val got = Scd.scd2(s, ev, "user_id", "state_in", "t", "eid")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2),
        Option(r.getTimestamp(3)), r.getLong(4))).toSet
    assert(got == Set(
      (1L, "A", ts(0), Some(ts(2)), 2L),
      (1L, "B", ts(2), Some(ts(3)), 1L),
      (1L, "A", ts(3), None, 1L),
      (2L, "X", ts(0), None, 1L)))
  }

  test("null is a state; same-timestamp rows break ties by the tie column") {
    val s = spark
    import s.implicits._
    val ev = Seq(
      (1L, Some("A"), ts(0), 0L), (1L, None, ts(1), 1L), (1L, None, ts(2), 2L),
      (1L, Some("A"), ts(3), 3L),
      // user 2: two rows at the SAME timestamp — eid order decides
      (2L, Some("P"), ts(0), 10L), (2L, Some("Q"), ts(0), 11L))
      .toDF("user_id", "state_in", "t", "eid")
    val got = Scd.scd2(s, ev, "user_id", "state_in", "t", "eid")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)),
        r.getTimestamp(2), Option(r.getTimestamp(3)), r.getLong(4))).toSet
    assert(got == Set(
      (1L, Some("A"), ts(0), Some(ts(1)), 1L),
      (1L, None, ts(1), Some(ts(3)), 2L), // null run collapsed
      (1L, Some("A"), ts(3), None, 1L),
      (2L, Some("P"), ts(0), Some(ts(0)), 1L),
      (2L, Some("Q"), ts(0), None, 1L)))
  }

  test("sessionize splits on gaps strictly greater than the threshold") {
    val s = spark
    import s.implicits._
    val gap = 10L * 60 * 1000000 // 10 minutes in micros
    val ev = Seq(
      (1L, ts(0), 0L), (1L, ts(5), 1L), (1L, ts(15), 2L), // 10m gap == NOT greater
      (1L, ts(26), 3L), // 11m gap -> new session
      (2L, ts(0), 4L))
      .toDF("user_id", "t", "eid")
    val got = graft.rel.Scd.sessionize(s, ev, "user_id", "t", "eid", gap)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
        r.getLong(3))).toSet
    assert(got == Set(
      (1L, ts(0), ts(15), 3L), // exactly-10m gap stays in-session
      (1L, ts(26), ts(26), 1L),
      (2L, ts(0), ts(0), 1L)))
  }

  test("the whole build plans exactly ONE shuffle (windows + islands share the key partitioning)") {
    val s = spark
    import s.implicits._
    val ev = (0 until 100).map(i => ((i % 7).toLong, s"s${i % 3}", ts(i % 50), i.toLong))
      .toDF("user_id", "state_in", "t", "eid")
    val plan: SparkPlan = Scd.scd2(s, ev, "user_id", "state_in", "t", "eid")
      .queryExecution.executedPlan
    val n = "(?m)^\\s*\\+?-? ?Exchange ".r.findAllIn(plan.toString).length
    assert(n == 1, s"plan:\n$plan")
  }
}
