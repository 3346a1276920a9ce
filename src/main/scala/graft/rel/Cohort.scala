package graft.rel

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.rel.RelQueries.Q
import graft.rel.Tables

/** BEHAVIORAL / LONGITUDINAL ANALYTICS — the cohort-retention matrix,
  * CUSUM changepoint scan, and calendar seasonality index: the three
  * standard longitudinal reads on an orders/revenue stream.
  *
  * Exactness discipline (the q138/q142 house rule): month arithmetic is
  * integer (y·12+m), revenue is exact cents, CUSUM is the n-scaled
  * integer partial sum (n·Σ_{i≤t}x_i − t·Σx — no division at all), and
  * the seasonality index is an integer milli-ratio. Every entry is
  * bit-replayable by the DuckDB oracle.
  */
object Cohort {

  /** Offline CUSUM changepoint statistic over an ordered series
    * (`ord`, `value`): S_t = Σ_{i≤t}(x_i − x̄) computed n-SCALED
    * (n·cum_t − t·total — exact longs, no division), so the peak
    * location is bit-exact on any engine. Output: every point with its
    * scaled statistic; callers rank by |cusum_scaled| for candidate
    * changepoints. `ord` must be a total order (a series key).
    *
    * Scale: rides [[GlobalRank.prefixSumByOrder]] — the repo's last
    * generic helper on an unpartitioned `Window.orderBy` was retired
    * here (r9 verdict item 8): the running sum, row index, and totals
    * all come from the range-partitioned offset decomposition, so no
    * single task ever sorts more than ~1/P of the series.
    */
  def cusumScan(df: org.apache.spark.sql.DataFrame, ord: String,
      value: String): org.apache.spark.sql.DataFrame = {
    // internal aliases are __cs-prefixed so a caller's own `cum`/`rk`
    // column names cannot collide with them
    GlobalRank.prefixSumByOrder(
        df.select(col(ord), col(value).cast("long").as("__cs_x")),
        Seq(col(ord)), col("__cs_x"),
        outCum = "__cs_cum", outRk = "__cs_t",
        outN = "__cs_n", outTotal = "__cs_total")
      .select(col(ord), col("__cs_x").as(value),
        (col("__cs_n") * col("__cs_cum") - col("__cs_t") * col("__cs_total"))
          .as("cusum_scaled"))
  }

  val all: ListMap[String, Q] = ListMap(
    // ---- q165: COHORT RETENTION MATRIX — customers grouped by
    //      first-order month; cell (cohort, k) counts cohort members
    //      who ordered again k months later. THE subscription/repeat-
    //      purchase health read. Month index is integer y·12+m, so both
    //      engines bin identically with no interval arithmetic. Scale:
    //      one shuffle on custkey for the first-order agg, one
    //      broadcast-out co-keyed join back (first-order table is
    //      |customers|, partitioned like orders), one matrix agg. ----
    "q165_cohort_retention" -> Q(
      (s, d) => {
        val om = Tables.orders(s, d).select(col("o_custkey"),
          (year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1)
            .cast("long").as("m"))
        val first = om.groupBy("o_custkey").agg(min(col("m")).as("m0"))
        om.join(first, "o_custkey")
          .groupBy(col("m0"), (col("m") - col("m0")).as("offset_months"))
          .agg(countDistinct(col("o_custkey")).as("n_customers"))
          .select(
            concat(format_string("%04d", (col("m0") / 12).cast("int")),
              lit("-"),
              format_string("%02d", (col("m0") % 12 + 1).cast("int")))
              .as("cohort_month"),
            col("offset_months"), col("n_customers"))
          .orderBy("cohort_month", "offset_months")
      },
      Some("""WITH om AS (
             |  SELECT o_custkey,
             |    CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS BIGINT) AS m
             |  FROM orders),
             |f AS (SELECT o_custkey, min(m) AS m0 FROM om GROUP BY o_custkey)
             |SELECT printf('%04d-%02d', CAST(m0 // 12 AS INT),
             |    CAST(m0 % 12 + 1 AS INT)) AS cohort_month,
             |  om.m - f.m0 AS offset_months,
             |  CAST(count(DISTINCT om.o_custkey) AS BIGINT) AS n_customers
             |FROM om JOIN f ON om.o_custkey = f.o_custkey
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // ---- q166: CUSUM CHANGEPOINT SCAN — where did the daily-revenue
    //      level shift? The classic offline CUSUM statistic
    //      S_t = Σ_{i≤t}(x_i − x̄) peaks at the changepoint; computed
    //      n-SCALED (n·cum_t − t·total, exact longs, division never
    //      happens) so the argmax is bit-exact across engines. Output:
    //      the 5 days with the largest |n·S_t|, i.e. the top candidate
    //      changepoints. Scale: one day-keyed agg, one window cumsum
    //      over days (|days| rows — tiny after the agg), 1-row total
    //      broadcast. ----
    "q166_cusum_changepoint" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val daily = Tables.lineitem(s, d)
          .groupBy(to_date(col("l_shipdate")).as("day"))
          .agg(sum(round(col("l_extendedprice") * 100, 0).cast("long"))
            .as("cents"))
        cusumScan(daily, "day", "cents")
          .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
            col("cusum_scaled"))
          .orderBy(abs(col("cusum_scaled")).desc, col("day"))
          .limit(5)
      },
      Some("""WITH daily AS (
             |  SELECT CAST(l_shipdate AS DATE) AS day,
             |    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
             |  FROM lineitem GROUP BY 1),
             |c AS (SELECT day, cents,
             |    CAST(sum(cents) OVER (ORDER BY day) AS BIGINT) AS cum,
             |    CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t
             |  FROM daily),
             |tot AS (SELECT CAST(sum(cents) AS BIGINT) AS total,
             |    CAST(count(*) AS BIGINT) AS n FROM daily)
             |SELECT strftime(c.day, '%Y-%m-%d') AS day,
             |  n * cum - t * total AS cusum_scaled
             |FROM c, tot
             |ORDER BY abs(n * cum - t * total) DESC, c.day LIMIT 5""".stripMargin)),

    // ---- q169: DAY-OF-WEEK SEASONALITY INDEX — average daily revenue
    //      per weekday relative to the overall daily average, as an
    //      integer milli-ratio (1000 = flat). Weekday is computed from
    //      the epoch-day modulo (0 = Thursday, 1970-01-01), NOT each
    //      engine's locale-dependent dayofweek(). Scale: a day-keyed
    //      agg then a 7-row agg; the 1-row total is a broadcast. ----
    "q169_dow_seasonality" -> Q(
      (s, d) => {
        val daily = Tables.lineitem(s, d)
          .groupBy(to_date(col("l_shipdate")).as("day"))
          .agg(sum(round(col("l_extendedprice") * 100, 0).cast("long"))
            .as("cents"))
        val byDow = daily
          .groupBy((datediff(col("day"), to_date(lit("1970-01-01"))) % 7)
            .cast("long").as("dow_idx"))
          .agg(sum("cents").as("dow_cents"),
            count(lit(1)).cast("long").as("dow_days"))
        val tot = daily.agg(sum("cents").as("total"),
          count(lit(1)).cast("long").as("n_days"))
        byDow.crossJoin(broadcast(tot))
          .select(col("dow_idx"),
            col("dow_cents"), col("dow_days"),
            ((col("dow_cents") * col("n_days") * 1000) /
              (col("dow_days") * col("total"))).cast("long")
              .as("index_milli"))
          .orderBy("dow_idx")
      },
      Some("""WITH daily AS (
             |  SELECT CAST(l_shipdate AS DATE) AS day,
             |    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
             |  FROM lineitem GROUP BY 1),
             |bd AS (SELECT CAST(date_diff('day', DATE '1970-01-01', day) % 7 AS BIGINT)
             |      AS dow_idx,
             |    CAST(sum(cents) AS BIGINT) AS dow_cents,
             |    CAST(count(*) AS BIGINT) AS dow_days
             |  FROM daily GROUP BY 1),
             |tot AS (SELECT CAST(sum(cents) AS BIGINT) AS total,
             |    CAST(count(*) AS BIGINT) AS n_days FROM daily)
             |SELECT dow_idx, dow_cents, dow_days,
             |  (dow_cents * n_days * 1000) // (dow_days * total) AS index_milli
             |FROM bd, tot ORDER BY dow_idx""".stripMargin)),

    // ---- q170: TOP SESSION PATHS — the 20 most common event-type
    //      TRIGRAMS inside 30-minute sessions (q120's island machinery
    //      inline), tie order pinned (count DESC, path ASC). The
    //      navigation-pattern read product analytics runs on every
    //      clickstream. Scale: one user-keyed window pass assigns
    //      islands AND the two leads (same partitioning, one shuffle),
    //      then a path-keyed count and a bounded top-20. ----
    "q170_session_paths" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val e = Tables.events(s, d)
          .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        val wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val isl = e
          .withColumn("gap",
            unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(wu))
          .withColumn("chg",
            when(col("gap").isNull || col("gap") > 30L * 60 * 1000000, 1)
              .otherwise(0))
          .withColumn("isl", sum("chg").over(
            wu.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        val ws = Window.partitionBy("user_id", "isl").orderBy("ts", "event_id")
        isl
          .withColumn("t2", lead(col("event_type"), 1).over(ws))
          .withColumn("t3", lead(col("event_type"), 2).over(ws))
          .filter(col("t2").isNotNull && col("t3").isNotNull)
          .groupBy(concat_ws(">", col("event_type"), col("t2"), col("t3"))
            .as("path"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("path"))
          .limit(20)
      },
      Some("""WITH e AS (SELECT CAST(user_id AS BIGINT) AS user_id,
             |    CAST(ts AS TIMESTAMP) AS ts, event_id, event_type FROM events),
             |w AS (SELECT *, epoch_us(ts) -
             |      lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             |    AS gap FROM e),
             |f AS (SELECT *, CASE WHEN gap IS NULL OR gap > 1800000000
             |    THEN 1 ELSE 0 END AS chg FROM w),
             |i AS (SELECT *, sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |    ROWS UNBOUNDED PRECEDING) AS isl FROM f),
             |t AS (SELECT event_type AS t1,
             |    lead(event_type, 1) OVER (PARTITION BY user_id, isl
             |      ORDER BY ts, event_id) AS t2,
             |    lead(event_type, 2) OVER (PARTITION BY user_id, isl
             |      ORDER BY ts, event_id) AS t3
             |  FROM i)
             |SELECT t1 || '>' || t2 || '>' || t3 AS path, count(*) AS n
             |FROM t WHERE t2 IS NOT NULL AND t3 IS NOT NULL
             |GROUP BY 1 ORDER BY n DESC, path LIMIT 20""".stripMargin)),

    // ---- q185: SEASONALLY-ADJUSTED RESIDUALS — which days were
    //      abnormal AFTER accounting for weekday shape? Residual is
    //      n_d-SCALED (daily·n_d − Σ_dow, exact longs — the q166 trick
    //      applied to the q169 decomposition: no division, so the
    //      ranking is bit-exact). Top 10 |residual| days. ----
    "q185_seasonal_residuals" -> Q(
      (s, d) => {
        val daily = Tables.lineitem(s, d)
          .groupBy(to_date(col("l_shipdate")).as("day"))
          .agg(sum(round(col("l_extendedprice") * 100, 0).cast("long"))
            .as("cents"))
          .withColumn("dow_idx",
            (datediff(col("day"), to_date(lit("1970-01-01"))) % 7).cast("long"))
        val byDow = daily.groupBy("dow_idx")
          .agg(sum("cents").as("dow_cents"),
            count(lit(1)).cast("long").as("dow_days"))
        daily.join(broadcast(byDow), "dow_idx")
          .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
            col("dow_idx"),
            (col("cents") * col("dow_days") - col("dow_cents"))
              .as("residual_scaled"))
          .orderBy(abs(col("residual_scaled")).desc, col("day"))
          .limit(10)
      },
      Some("""WITH daily AS (
             |  SELECT CAST(l_shipdate AS DATE) AS day,
             |    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents,
             |    CAST(date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) % 7
             |      AS BIGINT) AS dow_idx
             |  FROM lineitem GROUP BY 1, 3),
             |bd AS (SELECT dow_idx, CAST(sum(cents) AS BIGINT) AS dow_cents,
             |    CAST(count(*) AS BIGINT) AS dow_days
             |  FROM daily GROUP BY 1)
             |SELECT strftime(day, '%Y-%m-%d') AS day, daily.dow_idx,
             |  cents * dow_days - dow_cents AS residual_scaled
             |FROM daily JOIN bd ON daily.dow_idx = bd.dow_idx
             |ORDER BY abs(cents * dow_days - dow_cents) DESC, day
             |LIMIT 10""".stripMargin)),

    // ---- q199: MONTH-OVER-MONTH GROWTH — revenue delta vs the
    //      PRECEDING CALENDAR month (lag over the integer month index,
    //      so a gap month yields NULL rather than silently comparing
    //      across it), growth in exact milli-units
    //      ((cur−prev)·1000 div prev). The first month and any
    //      post-gap month report NULL growth. ----
    "q199_mom_growth" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val monthly = Tables.orders(s, d)
          .groupBy((year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1)
            .cast("long").as("m"))
          .agg(sum(round(col("o_totalprice") * 100, 0).cast("long")).as("rev"))
        val w = Window.orderBy("m")
        monthly
          .withColumn("prev_m", lag("m", 1).over(w))
          .withColumn("prev_rev", lag("rev", 1).over(w))
          .select(
            concat(format_string("%04d", (col("m") / 12).cast("int")), lit("-"),
              format_string("%02d", (col("m") % 12 + 1).cast("int"))).as("month"),
            col("rev").as("rev_cents"),
            when(col("prev_m") === col("m") - 1,
              expr("(rev - prev_rev) * 1000 div prev_rev")).as("growth_milli"))
          .orderBy("month")
      },
      Some("""WITH mo AS (SELECT
             |    CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS BIGINT) AS m,
             |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev
             |  FROM orders GROUP BY 1),
             |l AS (SELECT m, rev, lag(m) OVER (ORDER BY m) AS pm,
             |    lag(rev) OVER (ORDER BY m) AS pr FROM mo)
             |SELECT printf('%04d-%02d', CAST(m // 12 AS INT),
             |    CAST(m % 12 + 1 AS INT)) AS month,
             |  rev AS rev_cents,
             |  CASE WHEN pm = m - 1 THEN (rev - pr) * 1000 // pr END AS growth_milli
             |FROM l ORDER BY month""".stripMargin)),

    // ---- q200: CUMULATIVE DISTINCT USERS per day — running-distinct
    //      is not a window aggregate any engine supports directly; the
    //      standard exact rewrite counts each user only on their FIRST
    //      active day and cumsums: one distinct, one min-agg, one
    //      |days|-row window. ----
    "q200_cumulative_users" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val firstDay = Tables.events(s, d)
          .select(col("user_id"), to_date(col("ts")).as("day"))
          .groupBy("user_id").agg(min("day").as("day"))
          .groupBy("day").agg(count(lit(1)).as("new_users"))
        val activeDays = Tables.events(s, d)
          .select(to_date(col("ts")).as("day")).distinct()
        val w = Window.orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        activeDays.join(firstDay, Seq("day"), "left")
          .select(col("day"), coalesce(col("new_users"), lit(0L)).as("new_users"))
          .withColumn("cumulative_users", sum("new_users").over(w))
          .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
            col("new_users"), col("cumulative_users"))
          .orderBy("day")
      },
      Some("""WITH fd AS (SELECT user_id, min(CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS day
             |  FROM events GROUP BY user_id),
             |nu AS (SELECT day, CAST(count(*) AS BIGINT) AS new_users
             |  FROM fd GROUP BY day),
             |ad AS (SELECT DISTINCT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
             |  FROM events)
             |SELECT strftime(ad.day, '%Y-%m-%d') AS day,
             |  coalesce(nu.new_users, 0) AS new_users,
             |  CAST(sum(coalesce(nu.new_users, 0)) OVER (ORDER BY ad.day
             |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumulative_users
             |FROM ad LEFT JOIN nu ON ad.day = nu.day
             |ORDER BY day""".stripMargin)),

    // ---- q228: RFM SEGMENTATION — the classic customer-value cube:
    //      quartile-code every customer on Recency (days since last
    //      order, BELOW median recent), Frequency (order count) and
    //      Monetary (lifetime cents), then size the 4×4×4 segments.
    //      ntile(4) is deterministic once the window order is TOTAL, so
    //      each ordering is pinned (metric, then custkey) in both
    //      dialects — the standard cross-engine ntile trap, made safe.
    //      Recency orders DESCENDING by last-order date (most recent =
    //      quartile 1, the marketing convention). Scale: one shuffle to
    //      per-customer facts; three GlobalRank passes (range-partitioned
    //      sort + offsets — no unpartitioned ntile window, the classic
    //      single-reducer trap) with the closed-form remainder-to-early-
    //      buckets ntile over (rank, n); a ≤64-row agg. ----
    "q228_rfm_segments" -> Q(
      (s, d) => {
        val perCust = Tables.orders(s, d)
          .groupBy(col("o_custkey"))
          .agg(max(col("o_orderdate")).as("last_order"),
            count(lit(1)).as("n_orders"),
            sum(round(col("o_totalprice") * 100, 0).cast("long")).as("cents"))
        def quartile(df: DataFrame, order: Seq[Column], out: String) =
          GlobalRank.byOrder(df, order, "__rk", "__n")
            .withColumn(out,
              GlobalRank.ntileOf(col("__rk"), col("__n"), 4))
            .drop("__rk", "__n")
        val coded = quartile(quartile(quartile(perCust,
          Seq(col("last_order").desc, col("o_custkey")), "r_q"),
          Seq(col("n_orders"), col("o_custkey")), "f_q"),
          Seq(col("cents"), col("o_custkey")), "m_q")
        coded
          .groupBy("r_q", "f_q", "m_q")
          .agg(count(lit(1)).as("n_customers"), sum("cents").as("sum_cents"))
          .orderBy("r_q", "f_q", "m_q")
      },
      Some("""WITH perCust AS (
             |  SELECT o_custkey, max(o_orderdate) AS last_order,
             |    count(*) AS n_orders,
             |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             |      AS cents
             |  FROM orders GROUP BY 1),
             |coded AS (SELECT cents,
             |    CAST(ntile(4) OVER (ORDER BY last_order DESC, o_custkey)
             |      AS BIGINT) AS r_q,
             |    CAST(ntile(4) OVER (ORDER BY n_orders, o_custkey)
             |      AS BIGINT) AS f_q,
             |    CAST(ntile(4) OVER (ORDER BY cents, o_custkey)
             |      AS BIGINT) AS m_q
             |  FROM perCust)
             |SELECT r_q, f_q, m_q, count(*) AS n_customers,
             |  CAST(sum(cents) AS BIGINT) AS sum_cents
             |FROM coded GROUP BY 1, 2, 3
             |ORDER BY r_q, f_q, m_q""".stripMargin)),
  )
}
