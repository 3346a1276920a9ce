package graft.rel

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.rel.RelQueries.Q

/** SCD TYPE-2 STATE HISTORY — collapse an append-only event/attribute
  * log into the slowly-changing-dimension form: one row per (entity,
  * consecutive-run-of-equal-attribute) with a half-open validity
  * interval [valid_from, valid_to), valid_to NULL on each entity's
  * current row. The warehouse-classic "gaps and islands": runs are
  * identified by a change flag (null-safe inequality against the
  * previous row in event order) prefix-summed into an island id, then
  * one aggregation per island. The inverse of [[AsofJoin]]: as-of
  * probes a point in time against history; SCD2 BUILDS the history
  * table those probes (and plain BETWEEN joins) serve from.
  *
  * Event order must be TOTAL per entity — a timestamp plus an explicit
  * tiebreaker column (same-timestamp rows would otherwise make run
  * boundaries nondeterministic; the contract makes the caller name the
  * tiebreaker rather than silently relying on partition order).
  *
  * Scale shape (100 TB): one shuffle on the entity key; both window
  * passes and the island aggregation share that single partitioning
  * (Catalyst plans one Exchange). Per-entity history is processed
  * sequentially within its partition — the right trade for dimension
  * builds, where entities are many and per-entity histories are
  * bounded; a single entity whose history dominates a partition is a
  * data-model smell, not a plan smell. Null attributes are states
  * (null-safe comparison), not gaps.
  */
object Scd {

  /** Build the SCD2 table of `attr` runs per `key`, ordered by
    * (`ts`, `tie`). Output: (key, state, valid_from, valid_to,
    * n_events), valid_to = next run's valid_from or NULL (current).
    */
  def scd2(s: SparkSession, df: DataFrame, key: String, attr: String,
      ts: String, tie: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(ts), col(tie))
    val wr = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val flagged = df
      .withColumn("_chg",
        when(col(attr) <=> lag(col(attr), 1).over(w), 0L).otherwise(1L))
      .withColumn("_isl", sum(col("_chg")).over(wr))
    val runs = flagged
      .groupBy(col(key), col("_isl"))
      .agg(max(col(attr)).as("state"), // constant within a run
        min(col(ts)).as("valid_from"),
        count(lit(1)).as("n_events"))
    val wi = Window.partitionBy(col(key)).orderBy(col("_isl"))
    runs
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wi))
      .select(col(key), col("state"), col("valid_from"), col("valid_to"),
        col("n_events"))
  }

  /** BATCH SESSIONIZATION — the time-gap twin of [[scd2]]'s
    * state-change islands: a new session starts when the gap to the
    * previous event exceeds `gapMicros`. Same single-Exchange shape
    * (flag → prefix sum → one aggregation per island); gap arithmetic
    * is exact integer microseconds, not interval math, so the oracle
    * replays it with epoch_us. The batch complement of the streaming
    * event-time-timeout sessionizer (q20's streaming twin) — replaying
    * history through the batch form must agree with what the stream
    * computed live, which is why both exist.
    */
  def sessionize(s: SparkSession, df: DataFrame, key: String, ts: String,
      tie: String, gapMicros: Long): DataFrame = {
    require(gapMicros > 0, s"gapMicros must be > 0: $gapMicros")
    val w = Window.partitionBy(col(key)).orderBy(col(ts), col(tie))
    val wr = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val flagged = df
      .withColumn("_prev", lag(unix_micros(col(ts)), 1).over(w))
      .withColumn("_chg",
        when(col("_prev").isNull ||
          unix_micros(col(ts)) - col("_prev") > gapMicros, 1L).otherwise(0L))
      .withColumn("_isl", sum(col("_chg")).over(wr))
    flagged.groupBy(col(key), col("_isl"))
      .agg(min(col(ts)).as("session_start"), max(col(ts)).as("session_end"),
        count(lit(1)).as("n_events"))
      .select(col(key), col("session_start"), col("session_end"), col("n_events"))
  }

  /** q117: each user's event_type treated as a state machine — the
    * SCD2 table of state runs over (ts, event_id) order. The oracle
    * replays flag → prefix-sum → island aggregation → lead with the
    * identical window frames; timestamps go out as wall-clock
    * (timestamp_ntz vs DuckDB's TIMESTAMP cast, the q18 contract).
    */
  val all: ListMap[String, Q] = ListMap(
    "q117_scd2" -> Q(
      (s, d) => scd2(s, Tables.events(s, d), "user_id", "event_type",
          "ts", "event_id")
        .select(col("user_id").cast("long").as("user_id"), col("state"),
          col("valid_from").cast("timestamp_ntz").as("valid_from"),
          col("valid_to").cast("timestamp_ntz").as("valid_to"),
          col("n_events"))
        .orderBy("user_id", "valid_from"),
      Some("""WITH e AS (SELECT CAST(user_id AS BIGINT) AS user_id, event_type,
             |    CAST(ts AS TIMESTAMP) AS ts, event_id FROM events),
             |w AS (SELECT *, CASE WHEN event_type IS NOT DISTINCT FROM
             |      lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             |    THEN 0 ELSE 1 END AS chg FROM e),
             |i AS (SELECT *, sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |    ROWS UNBOUNDED PRECEDING) AS isl FROM w),
             |g AS (SELECT user_id, isl, max(event_type) AS state,
             |    min(ts) AS valid_from, count(*) AS n_events
             |  FROM i GROUP BY user_id, isl)
             |SELECT user_id, state, valid_from,
             |  lead(valid_from) OVER (PARTITION BY user_id ORDER BY isl) AS valid_to,
             |  n_events
             |FROM g ORDER BY user_id, valid_from""".stripMargin)),

    // ---- batch sessionization at a 30-minute gap: flag → prefix sum →
    //      per-island aggregate, gap compared in exact integer
    //      microseconds (epoch_us both sides, no interval arithmetic) ----
    "q120_sessionize" -> Q(
      (s, d) => sessionize(s, Tables.events(s, d), "user_id", "ts",
          "event_id", gapMicros = 30L * 60 * 1000000)
        .select(col("user_id").cast("long").as("user_id"),
          col("session_start").cast("timestamp_ntz").as("session_start"),
          col("session_end").cast("timestamp_ntz").as("session_end"),
          col("n_events"))
        .orderBy("user_id", "session_start"),
      Some("""WITH e AS (SELECT CAST(user_id AS BIGINT) AS user_id,
             |    CAST(ts AS TIMESTAMP) AS ts, event_id FROM events),
             |w AS (SELECT *, epoch_us(ts) -
             |      lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             |    AS gap FROM e),
             |f AS (SELECT *, CASE WHEN gap IS NULL OR gap > 1800000000
             |    THEN 1 ELSE 0 END AS chg FROM w),
             |i AS (SELECT *, sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |    ROWS UNBOUNDED PRECEDING) AS isl FROM f)
             |SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
             |  count(*) AS n_events
             |FROM i GROUP BY user_id, isl
             |ORDER BY user_id, session_start""".stripMargin)),

    // ---- point-in-time lookup: the SCD2 table SERVING its purpose —
    //      each (user, probe-instant) resolves to the state valid at
    //      that instant via the as-of join (intervals are contiguous,
    //      so as-of on valid_from IS containment; probes before a
    //      user's first interval resolve to NULL). Composition of
    //      q117's build with the q16-era AsofJoin; the oracle replays
    //      the islands chain and uses DuckDB's native ASOF LEFT JOIN ----
    "q121_pit_lookup" -> Q(
      (s, d) => {
        import s.implicits._
        val runs = scd2(s, Tables.events(s, d), "user_id", "event_type",
            "ts", "event_id")
          .select(col("user_id"), col("valid_from").as("ts"), col("state"))
        val probes = Tables.events(s, d).select(col("user_id")).distinct()
          .crossJoin(
            Seq("2024-01-02 00:00:00", "2024-01-04 12:00:00", "2024-01-07 00:00:00")
              .toDF("pt").select(to_timestamp(col("pt")).as("ts")))
        AsofJoin.asof(probes, runs, "user_id", "ts", Map("state" -> "state"))
          .select(col("user_id").cast("long").as("user_id"),
            col("ts").cast("timestamp_ntz").as("probe_ts"), col("state"))
          .orderBy("user_id", "probe_ts")
      },
      Some("""WITH e AS (SELECT CAST(user_id AS BIGINT) AS user_id, event_type,
             |    CAST(ts AS TIMESTAMP) AS ts, event_id FROM events),
             |w AS (SELECT *, CASE WHEN event_type IS NOT DISTINCT FROM
             |      lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             |    THEN 0 ELSE 1 END AS chg FROM e),
             |i AS (SELECT *, sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |    ROWS UNBOUNDED PRECEDING) AS isl FROM w),
             |runs AS (SELECT user_id, isl, max(event_type) AS state,
             |    min(ts) AS valid_from FROM i GROUP BY user_id, isl),
             |probes AS (SELECT u.user_id, v.t
             |  FROM (SELECT DISTINCT user_id FROM e) u,
             |    (VALUES (TIMESTAMP '2024-01-02 00:00:00'),
             |            (TIMESTAMP '2024-01-04 12:00:00'),
             |            (TIMESTAMP '2024-01-07 00:00:00')) v(t))
             |SELECT p.user_id AS user_id, p.t AS probe_ts, r.state
             |FROM probes p ASOF LEFT JOIN runs r
             |  ON p.user_id = r.user_id AND p.t >= r.valid_from
             |ORDER BY p.user_id, probe_ts""".stripMargin)),

    // ---- q227: BITEMPORAL AS-OF — the two-axis temporal query SCD2
    //      (q117, one axis) cannot answer: "what did we BELIEVE on
    //      transaction date T about facts VALID on date V". Corrections
    //      arrive retroactively: a version recorded later (tx_from =
    //      order date + 30d) amends a fact that was always valid from
    //      its original date — so at T, orders corrected BY T show
    //      amended cents, orders whose correction had not landed yet
    //      show the original. Resolution is latest-tx-wins per key
    //      among versions with tx_from ≤ T, restricted to valid_from ≤
    //      V — one window over the filtered versions (partition-bounded
    //      per key, the q117 scale argument). The audit/restatement
    //      read every finance pipeline needs. ----
    "q227_bitemporal" -> Q(
      (s, d) => {
        val t = lit("1997-01-01").cast("timestamp")
        val v = lit("1996-12-01").cast("timestamp")
        val base = Tables.orders(s, d).select(col("o_orderkey"),
          col("o_orderpriority"),
          round(col("o_totalprice") * 100, 0).cast("long").as("cents"),
          col("o_orderdate").as("valid_from"),
          col("o_orderdate").as("tx_from"))
        val corr = Tables.orders(s, d)
          .filter(col("o_orderkey") % 13 === 0)
          .select(col("o_orderkey"), col("o_orderpriority"),
            (round(col("o_totalprice") * 100, 0).cast("long") + 500L).as("cents"),
            col("o_orderdate").as("valid_from"),
            (col("o_orderdate") + expr("INTERVAL 30 DAYS")).as("tx_from"))
        val versions = base.unionAll(corr)
        val w = Window.partitionBy("o_orderkey").orderBy(col("tx_from").desc)
        versions
          .filter(col("tx_from") <= t && col("valid_from") <= v)
          .withColumn("_rn", row_number().over(w))
          .filter(col("_rn") === 1)
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n_orders"), sum("cents").as("sum_cents"))
          .orderBy("o_orderpriority")
      },
      Some("""WITH versions AS (
             |  SELECT o_orderkey, o_orderpriority,
             |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             |    o_orderdate AS valid_from, o_orderdate AS tx_from
             |  FROM orders
             |  UNION ALL
             |  SELECT o_orderkey, o_orderpriority,
             |    CAST(round(o_totalprice * 100) AS BIGINT) + 500 AS cents,
             |    o_orderdate AS valid_from,
             |    o_orderdate + INTERVAL 30 DAY AS tx_from
             |  FROM orders WHERE o_orderkey % 13 = 0),
             |belief AS (
             |  SELECT *, row_number() OVER (PARTITION BY o_orderkey
             |      ORDER BY tx_from DESC) AS rn
             |  FROM versions
             |  WHERE tx_from <= TIMESTAMP '1997-01-01'
             |    AND valid_from <= TIMESTAMP '1996-12-01')
             |SELECT o_orderpriority, count(*) AS n_orders,
             |  CAST(sum(cents) AS BIGINT) AS sum_cents
             |FROM belief WHERE rn = 1
             |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),
  )
}
