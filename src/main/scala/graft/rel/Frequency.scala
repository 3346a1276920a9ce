package graft.rel

import org.apache.spark.sql.{Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.functions.MgAgg
import graft.rel.RelQueries.Q
import graft.rel.Tables

/** FREQUENCY ANALYSIS over unbounded key domains: deterministic
  * two-pass heavy hitters (Misra-Gries candidates + exact recount) and
  * float-free HDR percentiles — the observability pair (top talkers,
  * latency quantiles) every large pipeline runs on its own telemetry.
  */
object Frequency {

  val all: ListMap[String, Q] = ListMap(
    // ---- q224: TWO-PASS EXACT HEAVY HITTERS — find every user with
    //      > 1/125 of all events, exactly, without a full per-key agg
    //      being the DELIVERABLE: pass 1 folds the stream into a
    //      125-counter Misra-Gries summary (guaranteed superset of all
    //      true hitters; O(k) state, mergeable across executors), whose
    //      ≤ 125 candidate ids come to the driver; pass 2 recounts ONLY
    //      the candidates (broadcast isin filter → tiny agg) and keeps
    //      those strictly above threshold. Output is order-independent
    //      — MG's order-dependent counter values never leave pass 1 —
    //      so an exact GROUP BY/HAVING oracle checks an approximate-
    //      sketch pipeline bit-for-bit. Scale: pass 2's agg is over
    //      candidate rows only; at 100 TB the win is that the full
    //      (key, count) table — far larger than 125 entries — is never
    //      materialized or shuffled. ----
    "q224_mg_heavy_hitters" -> Q(
      (s, d) => {
        val k = 125
        val mg = udaf(new MgAgg(k), Encoders.scalaLong)
        val ev = Tables.events(s, d)
          .select(col("user_id").cast("long").as("uid"))
        val pass1 = ev.agg(mg(col("uid")).as("summary"),
          count(lit(1)).as("n")).collect().head
        val summary = pass1.getAs[Row]("summary")
        val cands = summary.getSeq[Long](0)
        val total = pass1.getAs[Long]("n")
        require(cands.length <= k, s"MG summary overflow: ${cands.length}")
        ev.filter(col("uid").isin(cands: _*))
          .groupBy(col("uid").as("user_id"))
          .agg(count(lit(1)).as("n_events"))
          .filter(col("n_events") * k > lit(total))
          .orderBy("user_id")
      },
      Some("""WITH c AS (SELECT user_id, count(*) AS n_events
             |  FROM events GROUP BY 1),
             |t AS (SELECT count(*) AS n FROM events)
             |SELECT CAST(user_id AS BIGINT) AS user_id, n_events
             |FROM c, t WHERE n_events * 125 > n
             |ORDER BY user_id""".stripMargin)),

    // ---- q225: HDR (LOG-LINEAR) PERCENTILES — p50/p95/p99 of event
    //      value cents per type from a fixed-size histogram, the
    //      HdrHistogram/DDSketch idea with ZERO floating point: bucket
    //      = (bitlength e, next-2-bits m), i.e. value range
    //      [(4+m)·2^(e-3), (5+m)·2^(e-3)), giving ≤ 25% relative error
    //      with ≤ 4·64 buckets however wide the domain. Bitlength comes
    //      from binary-string length (the q213 trick), sub-bucket from
    //      integer shifts, rank targets from ceil(q·n) = (q·n+99) div
    //      100 — every step replayable in both engines exactly, so an
    //      APPROXIMATE quantile operator gets a hash-exact oracle.
    //      Scale: one narrow map, a (types × ≤256)-row agg, windows
    //      over that bucket table only. ----
    "q225_hdr_percentiles" -> Q(
      (s, d) => {
        val buckets = Tables.events(s, d)
          .select(col("event_type"),
            round(col("value") * 100, 0).cast("long").as("c"))
          .filter(col("c") >= 8) // e >= 4 keeps the 2-bit mantissa total
          .withColumn("e", length(bin(col("c"))).cast("long"))
          .withColumn("m", expr("shiftright(c, cast(e - 3 AS int)) & 3L"))
          .withColumn("idx", col("e") * 4 + col("m"))
          .withColumn("lo", expr("shiftleft(4L + m, cast(e - 3 AS int))"))
          .groupBy("event_type", "idx", "lo")
          .agg(count(lit(1)).as("cnt"))
        val w = Window.partitionBy("event_type").orderBy("idx")
          .rowsBetween(Window.unboundedPreceding, 0)
        val cum = buckets
          .withColumn("cum", sum("cnt").over(w))
          .withColumn("n", sum("cnt").over(Window.partitionBy("event_type")))
        cum.groupBy("event_type")
          .agg(max("n").as("n"),
            min(when(col("cum") * 100 >= col("n") * 50, col("lo"))).as("p50_est"),
            min(when(col("cum") * 100 >= col("n") * 95, col("lo"))).as("p95_est"),
            min(when(col("cum") * 100 >= col("n") * 99, col("lo"))).as("p99_est"))
          .orderBy("event_type")
      },
      Some("""WITH v AS (SELECT event_type,
             |    CAST(round(value * 100) AS BIGINT) AS c
             |  FROM events WHERE CAST(round(value * 100) AS BIGINT) >= 8),
             |b0 AS (SELECT event_type, c,
             |    CAST(length(format('{:b}', c)) AS BIGINT) AS e
             |  FROM v),
             |b AS (SELECT event_type,
             |    e * 4 + ((c >> CAST(e - 3 AS INT)) & 3) AS idx,
             |    (4 + ((c >> CAST(e - 3 AS INT)) & 3)) << CAST(e - 3 AS INT)
             |      AS lo
             |  FROM b0),
             |g AS (SELECT event_type, idx, lo, count(*) AS cnt
             |  FROM b GROUP BY 1, 2, 3),
             |cumt AS (SELECT event_type, idx, lo, cnt,
             |    sum(cnt) OVER (PARTITION BY event_type ORDER BY idx
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             |    sum(cnt) OVER (PARTITION BY event_type) AS n
             |  FROM g)
             |SELECT event_type, CAST(max(n) AS BIGINT) AS n,
             |  CAST(min(CASE WHEN cum * 100 >= n * 50 THEN lo END) AS BIGINT)
             |    AS p50_est,
             |  CAST(min(CASE WHEN cum * 100 >= n * 95 THEN lo END) AS BIGINT)
             |    AS p95_est,
             |  CAST(min(CASE WHEN cum * 100 >= n * 99 THEN lo END) AS BIGINT)
             |    AS p99_est
             |FROM cumt GROUP BY event_type ORDER BY event_type""".stripMargin))
  )
}
