package graft.rel

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.rel.RelQueries.Q

/** PRODUCT-ANALYTICS OPERATORS over the event stream: ordered funnel
  * conversion and retention cohorts — the two queries every
  * behavioral-analytics engine is asked for first.
  *
  * Both are exact and engine-portable: timestamps are compared as
  * integer MICROSECONDS on both sides (Spark's native resolution;
  * `epoch_us` in the oracle), so the nanosecond fixture truncates
  * identically and strict `>` comparisons cannot diverge.
  *
  * Scale shape (100 TB): every stage is keyed by user_id — the funnel
  * is a chain of filter → per-user min reductions joined user-to-user
  * (co-partitioned, no second wide shuffle once AQE reuses the
  * exchange), retention is one distinct + one self-join on the same
  * key. Nothing is collected; counts are the only driver-bound rows.
  */
object Funnel {

  /** Strictly-ordered funnel: users whose first `steps(0)` precedes a
    * later `steps(1)`, precedes a later `steps(2)`, … Each stage finds
    * the earliest qualifying event AFTER the previous stage's time
    * (first-touch semantics). Returns (step, users) with steps
    * numbered so the funnel reads in order.
    */
  def funnelCounts(events: DataFrame, typeCol: String, userCol: String,
      tsMicrosCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val spark = events.sparkSession
    import spark.implicits._
    var reached = events.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(col(tsMicrosCol)).as("t"))
    var out = Seq((s"1_${steps.head}", reached.count()))
    steps.zipWithIndex.drop(1).foreach { case (st, i) =>
      val prev = reached
      reached = events.filter(col(typeCol) === st).as("e")
        .join(prev.as("p"), col(s"e.$userCol") === col(s"p.$userCol") &&
          col(s"e.$tsMicrosCol") > col("p.t"))
        .groupBy(col(s"e.$userCol").as(userCol))
        .agg(min(col(s"e.$tsMicrosCol")).as("t"))
      out = out :+ ((s"${i + 1}_$st", reached.count()))
    }
    out.toDF("step", "users")
  }

  /** Retention cohorts: users bucketed by first-active day; for each
    * (cohort day, day offset), how many of that cohort were active.
    * Offset 0 row is the cohort size.
    */
  def retentionCohorts(events: DataFrame, userCol: String, dayCol: String): DataFrame = {
    val userDays = events.select(col(userCol), col(dayCol)).distinct()
    val first = userDays.groupBy(col(userCol))
      .agg(min(col(dayCol)).as("cohort_day"))
    userDays.join(first, userCol)
      .groupBy(col("cohort_day"),
        datediff(col(dayCol), col("cohort_day")).cast("long").as("day_offset"))
      .agg(count(lit(1)).as("active_users"))
  }

  val all: ListMap[String, Q] = ListMap(
    // q128: the view → click → purchase funnel with first-touch
    // ordering. The driver compare needs a deterministic DataFrame, and
    // the stage counts are three driver-side longs by construction
    // (that is the operator's output, not a collect of data rows).
    "q128_funnel" -> Q(
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("event_type"), col("user_id"),
            unix_micros(col("ts")).as("tus"))
        funnelCounts(ev, "event_type", "user_id", "tus",
            Seq("view", "click", "purchase"))
          .orderBy("step")
      },
      Some("""WITH t1 AS (SELECT user_id, min(epoch_us(ts)) AS t
             |  FROM events WHERE event_type = 'view' GROUP BY 1),
             |t2 AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t
             |  FROM events e JOIN t1 ON e.user_id = t1.user_id
             |    AND epoch_us(e.ts) > t1.t
             |  WHERE e.event_type = 'click' GROUP BY 1),
             |t3 AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t
             |  FROM events e JOIN t2 ON e.user_id = t2.user_id
             |    AND epoch_us(e.ts) > t2.t
             |  WHERE e.event_type = 'purchase' GROUP BY 1)
             |SELECT step, users FROM (
             |  SELECT '1_view' AS step, count(*) AS users FROM t1
             |  UNION ALL SELECT '2_click', count(*) FROM t2
             |  UNION ALL SELECT '3_purchase', count(*) FROM t3)
             |ORDER BY step""".stripMargin)),

    // q129: daily retention cohorts over the event fixture (30 days,
    // 150 users → cohort 0 holds nearly everyone; the tail cohorts pin
    // the first-seen logic).
    "q129_retention" -> Q(
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"), to_date(date_trunc("DAY", col("ts"))).as("day"))
        retentionCohorts(ev, "user_id", "day")
          .orderBy("cohort_day", "day_offset")
      },
      Some("""WITH ud AS (SELECT DISTINCT user_id,
             |    CAST(date_trunc('day', ts) AS DATE) AS day FROM events),
             |f AS (SELECT user_id, min(day) AS cohort_day FROM ud GROUP BY 1)
             |SELECT f.cohort_day,
             |  CAST(date_diff('day', f.cohort_day, ud.day) AS BIGINT) AS day_offset,
             |  count(*) AS active_users
             |FROM ud JOIN f ON ud.user_id = f.user_id
             |GROUP BY 1, 2 ORDER BY cohort_day, day_offset""".stripMargin)),

    // ---- q135: first-order MARKOV TRANSITION MATRIX over per-user
    //      event sequences — the "what happens after X" primitive
    //      (next-action prediction features, anomalous-flow detection,
    //      behavioral clustering input). One shuffle: the lead() window
    //      keyed by user (the sessionize shape); the transition table
    //      is |event_type|²-bounded, so the probability normalization
    //      runs over a tiny aggregate. (ts, event_id) is a total order
    //      within a user, and probabilities are exact integer
    //      milli-units — both engines replay them bit-for-bit. ----
    "q135_markov_transitions" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val wf = Window.partitionBy(col("et_from"))
        Tables.events(s, d)
          .withColumn("et_to", lead(col("event_type"), 1).over(w))
          .filter(col("et_to").isNotNull)
          .groupBy(col("event_type").as("et_from"), col("et_to"))
          .agg(count(lit(1)).as("n"))
          .withColumn("tot", sum("n").over(wf))
          .select(col("et_from"), col("et_to"), col("n"),
            expr("(n * 1000) div tot").as("p_milli"))
          .orderBy("et_from", "et_to")
      },
      Some("""WITH e AS (SELECT event_type AS et_from,
             |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             |      AS et_to
             |  FROM events),
             |t AS (SELECT et_from, et_to, count(*) AS n FROM e
             |  WHERE et_to IS NOT NULL GROUP BY 1, 2)
             |SELECT et_from, et_to, CAST(n AS BIGINT) AS n,
             |  CAST((n * 1000) // sum(n) OVER (PARTITION BY et_from) AS BIGINT)
             |    AS p_milli
             |FROM t ORDER BY et_from, et_to""".stripMargin)),

    // ---- q137: RARE-TRANSITION flow anomaly signals — score each
    //      user's event sequence against the corpus transition matrix
    //      (q135's, self-trained): transition count, number of
    //      below-10% transitions, and the rarest transition taken. All
    //      integer milli-units, so bit-exact cross-engine. Scale shape:
    //      the per-user transition stream is computed ONCE (one window
    //      shuffle, checkpointed) and feeds both the matrix build and
    //      the scoring join; the matrix is |event_type|²-bounded and
    //      broadcast, so scoring is a narrow map + one user-keyed agg.
    //      This is the sequence-analytics twin of q108's in-domain
    //      perplexity: same train-on-self shape, exact arithmetic. ----
    "q137_rare_transitions" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val wf = Window.partitionBy(col("et_from"))
        val tr = Tables.events(s, d)
          .withColumn("et_to", lead(col("event_type"), 1).over(w))
          .filter(col("et_to").isNotNull)
          .select(col("user_id"), col("event_type").as("et_from"), col("et_to"))
          .localCheckpoint() // feeds the matrix build AND the scoring join
        val probs = tr.groupBy("et_from", "et_to").agg(count(lit(1)).as("n"))
          .withColumn("tot", sum("n").over(wf))
          .select(col("et_from"), col("et_to"), expr("(n * 1000) div tot").as("p_milli"))
        tr.join(broadcast(probs), Seq("et_from", "et_to"))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_trans"),
            sum(when(col("p_milli") < 100, 1L).otherwise(0L)).as("n_rare"),
            min("p_milli").as("min_p_milli"))
          .orderBy("user_id")
      },
      Some("""WITH e AS (SELECT user_id, event_type AS et_from,
             |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             |      AS et_to
             |  FROM events),
             |tr AS (SELECT user_id, et_from, et_to FROM e WHERE et_to IS NOT NULL),
             |t AS (SELECT et_from, et_to, count(*) AS n FROM tr GROUP BY 1, 2),
             |p AS (SELECT et_from, et_to,
             |    (n * 1000) // sum(n) OVER (PARTITION BY et_from) AS p_milli
             |  FROM t)
             |SELECT tr.user_id, count(*) AS n_trans,
             |  CAST(sum(CASE WHEN p.p_milli < 100 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_rare,
             |  CAST(min(p.p_milli) AS BIGINT) AS min_p_milli
             |FROM tr JOIN p USING (et_from, et_to)
             |GROUP BY tr.user_id ORDER BY tr.user_id""".stripMargin)),

    // ---- q138: per-event-type OLS TREND of daily revenue — least-
    //      squares slope/intercept computed from EXACT LONG moment sums
    //      (n, Σx, Σy, Σx², Σxy over epoch-day × daily cents), so the
    //      closed-form numerator/denominator are integers both engines
    //      pin bit-for-bit, and the only floating steps are two final
    //      divisions. The moment-sum formulation IS the scale design:
    //      one narrow pass + two map-side-combined aggs, no per-group
    //      sorting, no matrix library — regression over a 100 TB fact
    //      table reduced to five sums per key. ----
    "q138_trend_ols" -> Q(
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(col("event_type"),
            unix_date(to_date(date_trunc("DAY", col("ts")))).cast("long").as("x"))
          .agg(sum(round(col("value") * 100, 0).cast("long")).as("y"))
        daily.groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
            sum(col("x") * col("x")).as("sxx"), sum(col("x") * col("y")).as("sxy"))
          .select(col("event_type"), col("n"),
            (col("n") * col("sxy") - col("sx") * col("sy")).as("num"),
            (col("n") * col("sxx") - col("sx") * col("sx")).as("den"))
          .withColumn("slope_r6",
            round(col("num").cast("double") / col("den").cast("double"), 6))
          .orderBy("event_type")
      },
      Some("""WITH daily AS (SELECT event_type,
             |    CAST(CAST(date_trunc('day', ts) AS DATE) - DATE '1970-01-01' AS BIGINT)
             |      AS x,
             |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
             |  FROM events GROUP BY 1, 2),
             |m AS (SELECT event_type, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
             |    sum(x * x) AS sxx, sum(x * y) AS sxy
             |  FROM daily GROUP BY event_type)
             |SELECT event_type, n,
             |  CAST(n * sxy - sx * sy AS BIGINT) AS num,
             |  CAST(n * sxx - sx * sx AS BIGINT) AS den,
             |  round(CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE), 6)
             |    AS slope_r6
             |FROM m ORDER BY event_type""".stripMargin)),

    // ---- q142: PEARSON CORRELATION between event types' daily revenue
    //      series — the cross-metric co-movement diagnostic (do clicks
    //      and purchases move together?). Same exact-moment-sum
    //      discipline as q138: the daily series join on shared days,
    //      all five moment sums are exact longs, the numerator and the
    //      two variance terms are exact longs, and the only floating
    //      steps are one multiply, one sqrt (IEEE exactly-rounded, so
    //      cross-engine deterministic), one divide. Scale: one narrow
    //      pass + a day-keyed join of |types|·|days| aggregates —
    //      nothing data-sized past the first agg. Exactness bound:
    //      Σy² in long cents stays exact while per-(type,day) revenue
    //      < ~5×10⁸ cents over ~30 days (fits sf10⁺ here); past that,
    //      rescale the unit — and a silent long wrap cannot pass
    //      unnoticed, because the oracle's HUGEINT sums would go red.
    //      ----
    "q142_series_corr" -> Q(
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(col("event_type"),
            unix_date(to_date(date_trunc("DAY", col("ts")))).cast("long").as("day"))
          .agg(sum(round(col("value") * 100, 0).cast("long")).as("y"))
        val m = daily.as("a").join(daily.as("b"),
            col("a.day") === col("b.day") && col("a.event_type") < col("b.event_type"))
          .groupBy(col("a.event_type").as("ta"), col("b.event_type").as("tb"))
          .agg(count(lit(1)).as("n"),
            sum(col("a.y")).as("sx"), sum(col("b.y")).as("sy"),
            sum(col("a.y") * col("a.y")).as("sxx"),
            sum(col("b.y") * col("b.y")).as("syy"),
            sum(col("a.y") * col("b.y")).as("sxy"))
        m.select(col("ta"), col("tb"), col("n"),
            (col("n") * col("sxy") - col("sx") * col("sy")).as("num"),
            (col("n") * col("sxx") - col("sx") * col("sx")).as("dx"),
            (col("n") * col("syy") - col("sy") * col("sy")).as("dy"))
          .withColumn("corr_r6",
            round(col("num").cast("double") /
              sqrt(col("dx").cast("double") * col("dy").cast("double")), 6))
          .orderBy("ta", "tb")
      },
      Some("""WITH daily AS (SELECT event_type,
             |    CAST(CAST(date_trunc('day', ts) AS DATE) - DATE '1970-01-01' AS BIGINT)
             |      AS day,
             |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
             |  FROM events GROUP BY 1, 2),
             |m AS (SELECT a.event_type AS ta, b.event_type AS tb,
             |    count(*) AS n, sum(a.y) AS sx, sum(b.y) AS sy,
             |    sum(a.y * a.y) AS sxx, sum(b.y * b.y) AS syy,
             |    sum(a.y * b.y) AS sxy
             |  FROM daily a JOIN daily b
             |    ON a.day = b.day AND a.event_type < b.event_type
             |  GROUP BY 1, 2)
             |SELECT ta, tb, n,
             |  CAST(n * sxy - sx * sy AS BIGINT) AS num,
             |  CAST(n * sxx - sx * sx AS BIGINT) AS dx,
             |  CAST(n * syy - sy * sy AS BIGINT) AS dy,
             |  round(CAST(n * sxy - sx * sy AS DOUBLE) /
             |    sqrt(CAST(n * sxx - sx * sx AS DOUBLE) * CAST(n * syy - sy * sy AS DOUBLE)), 6)
             |    AS corr_r6
             |FROM m ORDER BY ta, tb""".stripMargin)),

    // ---- q144: TIME-WEIGHTED AVERAGE (TWAP) per user — each value
    //      weighted by how long it was "current" (until the user's next
    //      event): the financial/metering aggregate where plain AVG is
    //      simply wrong under irregular sampling. Exact to the bone:
    //      holding durations are integer seconds (floor of the micro
    //      difference), weights are cents·seconds in exact longs, and
    //      the single division is the output. Scale: one user-keyed
    //      window shuffle (the sessionize shape), then a map-side-
    //      combined agg; numerator stays exact past 10⁶ events/user at
    //      month-scale horizons (term ≤ 1.3e11 cents·s). Users whose
    //      observed span is zero (one event, or all inside one second)
    //      are excluded EXPLICITLY (dur_s > 0), never divided by zero.
    //      ----
    "q144_twap" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        Tables.events(s, d)
          .select(col("user_id"), col("ts"), col("event_id"),
            round(col("value") * 100, 0).cast("long").as("cents"))
          .withColumn("dt_s",
            expr("(unix_micros(lead(ts, 1) over (partition by user_id order by ts, event_id)) - unix_micros(ts)) div 1000000"))
          .filter(col("dt_s").isNotNull)
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_intervals"),
            sum("dt_s").as("dur_s"),
            sum(col("cents") * col("dt_s")).as("num"))
          .filter(col("dur_s") > 0)
          .select(col("user_id"), col("n_intervals"), col("dur_s"), col("num"),
            round(col("num").cast("double") / col("dur_s").cast("double"), 6)
              .as("twap_cents_r6"))
          .orderBy("user_id")
      },
      Some("""WITH e AS (SELECT user_id,
             |    CAST(round(value * 100) AS BIGINT) AS cents,
             |    (epoch_us(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
             |      - epoch_us(ts)) // 1000000 AS dt_s
             |  FROM events),
             |g AS (SELECT user_id, count(*) AS n_intervals,
             |    CAST(sum(dt_s) AS BIGINT) AS dur_s,
             |    CAST(sum(cents * dt_s) AS BIGINT) AS num
             |  FROM e WHERE dt_s IS NOT NULL GROUP BY user_id)
             |SELECT user_id, n_intervals, dur_s, num,
             |  round(CAST(num AS DOUBLE) / CAST(dur_s AS DOUBLE), 6) AS twap_cents_r6
             |FROM g WHERE dur_s > 0 ORDER BY user_id""".stripMargin)),

    // ---- q187: FUNNEL TRANSITION-TIME STATISTICS — how long do users
    //      take between funnel stages? Per transition of q128's
    //      first-touch chain: count, min/max gap, and the EXACT lower
    //      median gap as the order statistic at rank (n−1) div 2 + 1
    //      (micros; ties broken by user_id so the rank order is total).
    //      The product question behind every funnel: where do users
    //      stall, not just where do they drop. ----
    "q187_funnel_gap_stats" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val ev = Tables.events(s, d)
          .select(col("event_type"), col("user_id"),
            unix_micros(col("ts")).as("tus"))
        val t1 = ev.filter(col("event_type") === "view")
          .groupBy("user_id").agg(min("tus").as("t1"))
        val t2 = ev.filter(col("event_type") === "click").as("e")
          .join(t1.as("p"), col("e.user_id") === col("p.user_id") &&
            col("e.tus") > col("p.t1"))
          .groupBy(col("e.user_id").as("user_id"))
          .agg(min(col("e.tus")).as("t2"), min(col("p.t1")).as("t1"))
        val t3 = ev.filter(col("event_type") === "purchase").as("e")
          .join(t2.as("p"), col("e.user_id") === col("p.user_id") &&
            col("e.tus") > col("p.t2"))
          .groupBy(col("e.user_id").as("user_id"))
          .agg(min(col("e.tus")).as("t3"), min(col("p.t2")).as("t2"))
        def gapStats(df: DataFrame, from: String, to: String,
            tag: String): DataFrame = {
          val g = df.select(col("user_id"), (col(to) - col(from)).as("gap"))
          // global rank via the scale-safe decomposition (range-partitioned
          // sort + per-partition offsets) — bit-identical to row_number()
          // OVER (ORDER BY gap, user_id), no single-reducer window
          GlobalRank.byOrder(g, Seq(col("gap"), col("user_id")), "rk", "n")
            .groupBy()
            .agg(max("n").as("n_users"), min("gap").as("min_us"),
              max("gap").as("max_us"),
              min(when(expr("rk = (n - 1) div 2 + 1"), col("gap")))
                .as("median_us"))
            .select(lit(tag).as("transition"), col("n_users"),
              col("min_us"), col("median_us"), col("max_us"))
        }
        gapStats(t2, "t1", "t2", "1_view_to_click")
          .unionAll(gapStats(t3, "t2", "t3", "2_click_to_purchase"))
          .orderBy("transition")
      },
      Some("""WITH t1 AS (SELECT user_id, min(epoch_us(ts)) AS t
             |  FROM events WHERE event_type = 'view' GROUP BY 1),
             |t2 AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t2,
             |    min(t1.t) AS t1
             |  FROM events e JOIN t1 ON e.user_id = t1.user_id
             |    AND epoch_us(e.ts) > t1.t
             |  WHERE e.event_type = 'click' GROUP BY 1),
             |t3 AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t3,
             |    min(t2.t2) AS t2
             |  FROM events e JOIN t2 ON e.user_id = t2.user_id
             |    AND epoch_us(e.ts) > t2.t2
             |  WHERE e.event_type = 'purchase' GROUP BY 1),
             |g1 AS (SELECT user_id, t2 - t1 AS gap FROM t2),
             |g2 AS (SELECT user_id, t3 - t2 AS gap FROM t3),
             |s1 AS (SELECT gap, CAST(row_number() OVER (ORDER BY gap, user_id) AS BIGINT) AS rk,
             |    CAST(count(*) OVER () AS BIGINT) AS n FROM g1),
             |s2 AS (SELECT gap, CAST(row_number() OVER (ORDER BY gap, user_id) AS BIGINT) AS rk,
             |    CAST(count(*) OVER () AS BIGINT) AS n FROM g2)
             |SELECT transition, n_users, min_us, median_us, max_us FROM (
             |  SELECT '1_view_to_click' AS transition, max(n) AS n_users,
             |    min(gap) AS min_us,
             |    min(CASE WHEN rk = (n - 1) // 2 + 1 THEN gap END) AS median_us,
             |    max(gap) AS max_us FROM s1
             |  UNION ALL
             |  SELECT '2_click_to_purchase', max(n), min(gap),
             |    min(CASE WHEN rk = (n - 1) // 2 + 1 THEN gap END), max(gap)
             |  FROM s2)
             |ORDER BY transition""".stripMargin)),
  )
}
