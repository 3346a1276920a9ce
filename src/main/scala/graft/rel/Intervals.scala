package graft.rel

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.rel.RelQueries.Q
import graft.rel.Tables

/** SWEEP-LINE INTERVAL ANALYTICS — the classic event-boundary scan that
  * answers "how many intervals overlap at once" (capacity planning,
  * concurrency limits) and "how much of the timeline is covered by at
  * least one interval" (utilization / busy-time), both EXACTLY.
  *
  * A sweep line is a global prefix sum over boundary events — a
  * NON-ASSOCIATIVE running state, like the q124 EWMA recurrence, so it
  * cannot be a plain aggregate. The engine's distributed shape:
  *
  *   1. boundary points (+1 at start, -1 after end) are AGGREGATED BY
  *      INSTANT first (one hash shuffle) — this both shrinks the data
  *      and makes every later step deterministic, because the sweep key
  *      (`ordk` = 2·t_us + {0 starts, 1 ends}) becomes UNIQUE;
  *   2. the aggregated points are range-partitioned and sorted by ordk;
  *   3. pass 1 computes each partition's net delta and first key
  *      (#partitions rows to the driver — bounded, never data-sized);
  *   4. pass 2 re-scans each sorted partition once, seeded with the
  *      exclusive prefix of partition nets, emitting the exact running
  *      count per boundary plus the next boundary key (partition-edge
  *      lookahead comes from the pass-1 table, a halo exchange).
  *
  * At 100 TB the cost is two shuffles of the DEDUPLICATED boundary set
  * and one tiny collect; running state is O(1) per partition. Encoding
  * starts at 2t and inclusive ends at 2t+1 makes "starts count before
  * ends at the same instant" a property of integer order, so two
  * intervals touching only at a point DO overlap there — and because
  * every +1 at an instant folds into one row, the running value after
  * that row is exactly the point-level concurrency peak.
  */
object Intervals {

  /** Exact running concurrency per boundary instant of `[start_us,
    * end_us]` (inclusive, microseconds) intervals. Returns
    * (ordk, net, run, nxt): `run` = open-interval count after the
    * boundary, `nxt` = next boundary key (null at the end of time).
    * `f` receives the runs table while its partitioned parent is
    * cached; the cache is dropped before return.
    */
  def withSweepRuns[T](s: SparkSession, intervals: DataFrame)(f: DataFrame => T): T = {
    import s.implicits._
    val pts = intervals.select(
        explode(array(
          struct((col("start_us") * 2).as("ordk"), lit(1L).as("delta")),
          struct((col("end_us") * 2 + 1).as("ordk"), lit(-1L).as("delta")))).as("p"))
      .select(col("p.ordk"), col("p.delta"))
    val np = s.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val parted = pts.groupBy("ordk").agg(sum("delta").as("net"))
      .as[(Long, Long)]
      .repartitionByRange(np, col("ordk")).sortWithinPartitions("ordk")
      .persist()
    try {
      // pass 1: (pid, net sum, first key) — one bounded row per partition
      val partAgg = parted.mapPartitions { it =>
        val pid = TaskContext.getPartitionId()
        var sumNet = 0L; var first = 0L; var n = 0L
        it.foreach { case (ordk, net) =>
          if (n == 0L) first = ordk
          sumNet += net; n += 1L
        }
        if (n == 0L) Iterator.empty else Iterator((pid, sumNet, first))
      }.collect().sortBy(_._1)
      // exclusive prefix of nets = the running count entering each
      // partition; firstOf feeds the partition-edge lookahead
      var acc = 0L
      val offsets = partAgg.map { case (pid, net, _) =>
        val o = acc; acc += net; pid -> o
      }.toMap
      val nextFirst = partAgg.zip(partAgg.drop(1)).map {
        case ((pid, _, _), (_, _, firstOfNext)) => pid -> firstOfNext
      }.toMap
      val bc = s.sparkContext.broadcast((offsets, nextFirst))
      val runs = parted.mapPartitions { it =>
        val pid = TaskContext.getPartitionId()
        val (off, nf) = bc.value
        var run = off.getOrElse(pid, 0L)
        val buf = it.map { case (ordk, net) => run += net; (ordk, net, run) }.buffered
        new Iterator[(Long, Long, Long, java.lang.Long)] {
          def hasNext: Boolean = buf.hasNext
          def next(): (Long, Long, Long, java.lang.Long) = {
            val (ordk, net, r) = buf.next()
            val nxt: java.lang.Long =
              if (buf.hasNext) java.lang.Long.valueOf(buf.head._1)
              else nf.get(pid).map(java.lang.Long.valueOf).orNull
            (ordk, net, r, nxt)
          }
        }
      }.toDF("ordk", "net", "run", "nxt")
      f(runs)
    } finally parted.unpersist()
  }

  /** 30-minute sessions over the events stream as [start,end] µs
    * intervals — the shared input of both entries (the q120 gap rule).
    */
  private def sessionIntervals(s: SparkSession, d: String): DataFrame =
    Scd.sessionize(s, Tables.events(s, d), "user_id", "ts", "event_id",
        gapMicros = 30L * 60 * 1000000)
      .select(unix_micros(col("session_start")).as("start_us"),
        unix_micros(col("session_end")).as("end_us"))

  /** q120's session chain replayed in SQL + the boundary-point algebra —
    * shared CTE prefix of both oracles.
    */
  private val sweepSql =
    """e AS (SELECT CAST(user_id AS BIGINT) AS user_id,
      |    CAST(ts AS TIMESTAMP) AS ts, event_id FROM events),
      |w AS (SELECT *, epoch_us(ts) -
      |      lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |    AS gap FROM e),
      |fl AS (SELECT *, CASE WHEN gap IS NULL OR gap > 1800000000
      |    THEN 1 ELSE 0 END AS chg FROM w),
      |i AS (SELECT *, sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS UNBOUNDED PRECEDING) AS isl FROM fl),
      |sess AS (SELECT user_id, min(ts) AS st, max(ts) AS en
      |  FROM i GROUP BY user_id, isl),
      |pts AS (SELECT epoch_us(st)*2 AS ordk, 1 AS delta FROM sess
      |  UNION ALL SELECT epoch_us(en)*2 + 1, -1 FROM sess),
      |g AS (SELECT ordk, CAST(sum(delta) AS BIGINT) AS net FROM pts GROUP BY ordk),
      |r AS (SELECT ordk,
      |    CAST(sum(net) OVER (ORDER BY ordk ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run,
      |    lead(ordk) OVER (ORDER BY ordk) AS nxt FROM g)""".stripMargin

  val all: ListMap[String, Q] = ListMap(
    // ---- q152: MAX CONCURRENT SESSIONS + the first instant it occurs.
    //      run after a start-boundary row IS the point-level peak
    //      (all same-instant starts folded, ends ordered after), so the
    //      max over runs is exact; ties share an ordk, so "first" is
    //      well defined despite running-order freedom inside a tie. ----
    "q152_sweep_concurrency" -> Q(
      (s, d) => {
        import s.implicits._
        val (mx, at) = withSweepRuns(s, sessionIntervals(s, d)) { runs =>
          val m = runs.agg(max(col("run"))).first().getLong(0)
          val a = runs.filter(col("run") === m).agg(min(col("ordk"))).first().getLong(0)
          (m, a)
        }
        Seq((mx, at))
          .toDF("max_concurrency", "at_us")
          .select(col("max_concurrency"),
            timestamp_micros(expr("at_us div 2")).cast("timestamp_ntz").as("at_ts"))
      },
      Some(s"""WITH $sweepSql
             |SELECT (SELECT max(run) FROM r) AS max_concurrency,
             |  make_timestamp(min(ordk) // 2) AS at_ts
             |FROM r WHERE run = (SELECT max(run) FROM r)""".stripMargin)),

    // ---- q153: TIMELINE COVERAGE — total time covered by ≥1 session
    //      (the union-of-intervals length), the span, and the busy
    //      ratio in exact integer milli-units. Each inter-boundary gap
    //      belongs to the settled run of its left boundary; same-instant
    //      boundaries contribute 0-length gaps, so tie order is moot. ----
    "q153_interval_coverage" -> Q(
      (s, d) => {
        import s.implicits._
        val iv = sessionIntervals(s, d)
        val (covered, nSess, span) = withSweepRuns(s, iv) { runs =>
          val c = runs.agg(coalesce(sum(when(col("run") > 0 && col("nxt").isNotNull,
              expr("nxt div 2") - expr("ordk div 2"))), lit(0L))).first().getLong(0)
          val r = iv.agg(count(lit(1)), max(col("end_us")) - min(col("start_us"))).first()
          (c, r.getLong(0), r.getLong(1))
        }
        Seq((covered, nSess, span, covered * 1000L / span))
          .toDF("covered_micros", "n_sessions", "span_micros", "busy_ratio_milli")
      },
      Some(s"""WITH $sweepSql,
             |cov AS (SELECT CAST(coalesce(sum(CASE WHEN run > 0 AND nxt IS NOT NULL
             |    THEN nxt // 2 - ordk // 2 ELSE 0 END), 0) AS BIGINT) AS covered_micros
             |  FROM r),
             |sp AS (SELECT count(*) AS n_sessions,
             |    max(epoch_us(en)) - min(epoch_us(st)) AS span_micros FROM sess)
             |SELECT covered_micros, n_sessions, span_micros,
             |  CAST(covered_micros * 1000 // span_micros AS BIGINT) AS busy_ratio_milli
             |FROM cov, sp""".stripMargin)),
  )
}
