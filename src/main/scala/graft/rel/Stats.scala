package graft.rel

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import scala.collection.immutable.ListMap
import graft.rel.RelQueries.Q
import graft.rel.Tables

/** EXPERIMENT / MARKETING STATISTICS — the decision-support tier that
  * sits on top of the event analytics: revenue attribution, an A/B
  * significance gate, and the autocorrelation diagnostic.
  *
  * Exactness discipline (the q138/q142 house rule): everything that can
  * be an integer is an integer (cents, counts, contingency cells); the
  * floating tail of each entry is a fixed, explicitly parenthesized
  * chain of IEEE ops both engines evaluate identically, rounded to 6.
  */
object Stats {

  /** χ²₀.₀₅ with one degree of freedom — the classical 2×2 significance
    * threshold.
    */
  private val Chi2Crit05 = 3.841458820694124

  val all: ListMap[String, Q] = ListMap(
    // ---- q154: LAST-TOUCH REVENUE ATTRIBUTION — each purchase's value
    //      is credited to the user's most recent marketing touch
    //      (click/view/signup) at or before the purchase instant; the
    //      as-of join IS the attribution operator. Touches are deduped
    //      to one per (user, instant) by max event_id first, so both
    //      engines resolve same-microsecond touches identically.
    //      Purchases with no prior touch land in 'none'. Scale: the
    //      as-of union shuffles once on user_id; everything after is a
    //      5-row agg. ----
    "q154_attribution" -> Q(
      (s, d) => {
        val ev = Tables.events(s, d)
        val touches = ev
          .filter(col("event_type").isin("click", "view", "signup"))
          .groupBy(col("user_id"), col("ts"))
          .agg(max_by(col("event_type"), col("event_id")).as("touch_type"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"),
            round(col("value") * 100, 0).cast("long").as("cents"))
        AsofJoin.asof(purchases, touches, "user_id", "ts",
            Map("touch_type" -> "touch_type"))
          .groupBy(coalesce(col("touch_type"), lit("none")).as("touch_type"))
          .agg(count(lit(1)).as("n_purchases"),
            sum(col("cents")).as("attributed_cents"))
          .orderBy("touch_type")
      },
      Some("""WITH t AS (SELECT user_id, ts,
             |    max_by(event_type, event_id) AS touch_type
             |  FROM events WHERE event_type IN ('click', 'view', 'signup')
             |  GROUP BY user_id, ts),
             |p AS (SELECT user_id, ts,
             |    CAST(round(value * 100) AS BIGINT) AS cents
             |  FROM events WHERE event_type = 'purchase')
             |SELECT coalesce(t.touch_type, 'none') AS touch_type,
             |  count(*) AS n_purchases,
             |  CAST(sum(p.cents) AS BIGINT) AS attributed_cents
             |FROM p ASOF LEFT JOIN t
             |  ON p.user_id = t.user_id AND p.ts >= t.ts
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- q155: 2×2 CHI-SQUARED A/B GATE — users split by parity of
    //      user_id (the deterministic stand-in for an assignment
    //      column), success = converted (≥1 purchase). The contingency
    //      cells are exact longs the driver hash-checks; χ² =
    //      N·(ad−bc)²/((a+b)(c+d)(a+c)(b+d)) is evaluated as one
    //      pinned parenthesization in doubles and rounded to 6.
    //      Degenerate margins (an empty group or a 0/100% conversion
    //      column) yield NULL, never a division by zero. Scale: one
    //      user-keyed agg then a single 4-cell reduction. ----
    "q155_ab_chisq" -> Q(
      (s, d) => {
        val conv = Tables.events(s, d)
          .groupBy(col("user_id"))
          .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("converted"))
          .withColumn("grp", pmod(col("user_id"), lit(2)))
        conv.agg(
            sum(when(col("grp") === 0, 1L).otherwise(0L)).as("n_a"),
            sum(when(col("grp") === 0, col("converted")).otherwise(0L)).as("c_a"),
            sum(when(col("grp") === 1, 1L).otherwise(0L)).as("n_b"),
            sum(when(col("grp") === 1, col("converted")).otherwise(0L)).as("c_b"))
          .withColumn("chi2_r6", {
            val a = col("c_a").cast("double"); val b = (col("n_a") - col("c_a")).cast("double")
            val c = col("c_b").cast("double"); val dd = (col("n_b") - col("c_b")).cast("double")
            val n = (col("n_a") + col("n_b")).cast("double")
            val num = a * dd - b * c
            val den = (col("n_a").cast("double") * col("n_b").cast("double")) *
              ((col("c_a") + col("c_b")).cast("double") *
                ((col("n_a") - col("c_a") + col("n_b") - col("c_b")).cast("double")))
            when(col("n_a") > 0 && col("n_b") > 0 &&
                col("c_a") + col("c_b") > 0 &&
                col("n_a") - col("c_a") + col("n_b") - col("c_b") > 0,
              round(n * (num * num) / den, 6))
          })
          .withColumn("significant_05", col("chi2_r6") > Chi2Crit05)
      },
      Some(s"""WITH conv AS (SELECT user_id, user_id % 2 AS grp,
             |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
             |  FROM events GROUP BY user_id, user_id % 2),
             |cells AS (SELECT
             |    CAST(sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             |    CAST(sum(CASE WHEN grp = 0 THEN converted ELSE 0 END) AS BIGINT) AS c_a,
             |    CAST(sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
             |    CAST(sum(CASE WHEN grp = 1 THEN converted ELSE 0 END) AS BIGINT) AS c_b
             |  FROM conv)
             |SELECT n_a, c_a, n_b, c_b,
             |  CASE WHEN n_a > 0 AND n_b > 0 AND c_a + c_b > 0
             |      AND n_a - c_a + n_b - c_b > 0 THEN
             |    round(CAST(n_a + n_b AS DOUBLE) *
             |      ((CAST(c_a AS DOUBLE) * CAST(n_b - c_b AS DOUBLE) -
             |        CAST(n_a - c_a AS DOUBLE) * CAST(c_b AS DOUBLE)) *
             |       (CAST(c_a AS DOUBLE) * CAST(n_b - c_b AS DOUBLE) -
             |        CAST(n_a - c_a AS DOUBLE) * CAST(c_b AS DOUBLE))) /
             |      ((CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)) *
             |       (CAST(c_a + c_b AS DOUBLE) *
             |        (CAST(n_a - c_a + n_b - c_b AS DOUBLE)))), 6)
             |  END AS chi2_r6,
             |  CASE WHEN n_a > 0 AND n_b > 0 AND c_a + c_b > 0
             |      AND n_a - c_a + n_b - c_b > 0 THEN
             |    round(CAST(n_a + n_b AS DOUBLE) *
             |      ((CAST(c_a AS DOUBLE) * CAST(n_b - c_b AS DOUBLE) -
             |        CAST(n_a - c_a AS DOUBLE) * CAST(c_b AS DOUBLE)) *
             |       (CAST(c_a AS DOUBLE) * CAST(n_b - c_b AS DOUBLE) -
             |        CAST(n_a - c_a AS DOUBLE) * CAST(c_b AS DOUBLE))) /
             |      ((CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)) *
             |       (CAST(c_a + c_b AS DOUBLE) *
             |        (CAST(n_a - c_a + n_b - c_b AS DOUBLE)))), 6)
             |    > $Chi2Crit05
             |  END AS significant_05
             |FROM cells""".stripMargin)),

    // ---- q156: AUTOCORRELATION of the daily order-revenue series at
    //      lags 1..3 — the seasonality/persistence diagnostic. The
    //      correlogram variant: acf_k = Pearson over (x_t, x_{t+k})
    //      pairs of the POSITION-indexed series (dense row_number, so
    //      calendar gaps don't misalign lags). Moment sums are exact
    //      DECIMAL(38,0) vs the oracle's HUGEINT — headroom to
    //      ~10¹¹ cents/day across 10⁴ days, i.e. past the 100 TB
    //      tier — and the floating tail is the q142 chain. The
    //      row_number window is global but the series is CALENDAR-
    //      BOUNDED (one row per day), never data-sized. ----
    "q156_acf" -> Q(
      (s, d) => {
        import s.implicits._
        val dec = DecimalType(38, 0)
        val daily = Tables.orders(s, d)
          .groupBy(unix_date(to_date(date_trunc("DAY", col("o_orderdate"))))
            .cast("long").as("day"))
          .agg(sum(round(col("o_totalprice") * 100, 0).cast("long")).as("y"))
          .withColumn("idx", row_number().over(
            org.apache.spark.sql.expressions.Window.orderBy(col("day"))).cast("long"))
        val lags = Seq(1L, 2L, 3L).toDF("lag")
        val m = daily.as("a").crossJoin(lags)
          .join(daily.as("b"), col("b.idx") === col("a.idx") + col("lag"))
          .groupBy(col("lag"))
          .agg(count(lit(1)).as("n_pairs"),
            sum(col("a.y").cast(dec)).as("sx"), sum(col("b.y").cast(dec)).as("sy"),
            sum(col("a.y").cast(dec) * col("a.y").cast(dec)).as("sxx"),
            sum(col("b.y").cast(dec) * col("b.y").cast(dec)).as("syy"),
            sum(col("a.y").cast(dec) * col("b.y").cast(dec)).as("sxy"))
        m.select(col("lag"), col("n_pairs"),
            round((col("n_pairs").cast(dec) * col("sxy") - col("sx") * col("sy")).cast("double") /
              sqrt((col("n_pairs").cast(dec) * col("sxx") - col("sx") * col("sx")).cast("double") *
                (col("n_pairs").cast(dec) * col("syy") - col("sy") * col("sy")).cast("double")), 6)
              .as("acf_r6"))
          .orderBy("lag")
      },
      Some("""WITH daily AS (SELECT
             |    CAST(CAST(date_trunc('day', o_orderdate) AS DATE) - DATE '1970-01-01'
             |      AS BIGINT) AS day,
             |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS y
             |  FROM orders GROUP BY 1),
             |idxd AS (SELECT day, y,
             |    CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS idx FROM daily),
             |m AS (SELECT l.lag, count(*) AS n_pairs,
             |    sum(CAST(a.y AS HUGEINT)) AS sx, sum(CAST(b.y AS HUGEINT)) AS sy,
             |    sum(CAST(a.y AS HUGEINT) * a.y) AS sxx,
             |    sum(CAST(b.y AS HUGEINT) * b.y) AS syy,
             |    sum(CAST(a.y AS HUGEINT) * b.y) AS sxy
             |  FROM idxd a CROSS JOIN (VALUES (1), (2), (3)) l(lag)
             |    JOIN idxd b ON b.idx = a.idx + l.lag
             |  GROUP BY l.lag)
             |SELECT CAST(lag AS BIGINT) AS lag, n_pairs,
             |  round(CAST(n_pairs * sxy - sx * sy AS DOUBLE) /
             |    sqrt(CAST(n_pairs * sxx - sx * sx AS DOUBLE) *
             |      CAST(n_pairs * syy - sy * sy AS DOUBLE)), 6) AS acf_r6
             |FROM m ORDER BY lag""".stripMargin)),

    // ---- q190: TIME-DECAY ATTRIBUTION — q154's last-touch rule
    //      replaced by the multi-touch decay model: every touch within
    //      7 days before the purchase earns credit_milli_cents =
    //      (purchase_cents · 1000) div (1 + gap_days) — exact integer
    //      decay, no exponentials, so the credit table is hash-exact.
    //      Scale: one user-keyed join with a time-band predicate (the
    //      band bounds the per-purchase touch fan-out), one agg. ----
    "q190_decay_attribution" -> Q(
      (s, d) => {
        val ev = Tables.events(s, d)
        val touches = ev
          .filter(col("event_type").isin("click", "view", "signup"))
          .select(col("user_id"), col("event_type").as("touch_type"),
            unix_micros(col("ts")).as("tt"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), unix_micros(col("ts")).as("pt"),
            round(col("value") * 100, 0).cast("long").as("cents"))
        purchases.join(touches, Seq("user_id"))
          .filter(col("tt") <= col("pt") &&
            col("tt") > col("pt") - lit(7L * 86400L * 1000000L))
          .withColumn("gap_days", expr("(pt - tt) div 86400000000"))
          .groupBy("touch_type")
          .agg(count(lit(1)).as("n_credits"),
            sum(expr("(cents * 1000) div (1 + gap_days)"))
              .as("credit_milli_cents"))
          .orderBy("touch_type")
      },
      Some("""WITH t AS (SELECT user_id, event_type AS touch_type,
             |    epoch_us(ts) AS tt
             |  FROM events WHERE event_type IN ('click', 'view', 'signup')),
             |p AS (SELECT user_id, epoch_us(ts) AS pt,
             |    CAST(round(value * 100) AS BIGINT) AS cents
             |  FROM events WHERE event_type = 'purchase')
             |SELECT touch_type, CAST(count(*) AS BIGINT) AS n_credits,
             |  CAST(sum((cents * 1000) // (1 + (pt - tt) // 86400000000))
             |    AS BIGINT) AS credit_milli_cents
             |FROM p JOIN t ON p.user_id = t.user_id
             |  AND tt <= pt AND tt > pt - 604800000000
             |GROUP BY touch_type ORDER BY touch_type""".stripMargin)),

    // ---- q205: AS-OF JOIN WITH TOLERANCE (pandas merge_asof
    //      semantics) — q154's last-touch attribution where a touch
    //      older than 24 h no longer counts: the carried right row is
    //      nulled when staler than the tolerance, landing the purchase
    //      in 'none'. Same single-shuffle as-of plan; the oracle takes
    //      DuckDB's native ASOF join and ages out matches with the
    //      identical integer-microsecond comparison. ----
    "q205_asof_tolerance" -> Q(
      (s, d) => {
        val ev = Tables.events(s, d)
        val touches = ev
          .filter(col("event_type").isin("click", "view", "signup"))
          .groupBy(col("user_id"), col("ts"))
          .agg(max_by(col("event_type"), col("event_id")).as("touch_type"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"),
            round(col("value") * 100, 0).cast("long").as("cents"))
        AsofJoin.asofTolerance(purchases, touches, "user_id", "ts",
            Map("touch_type" -> "touch_type"),
            toleranceMicros = 24L * 3600L * 1000000L)
          .groupBy(coalesce(col("touch_type"), lit("none")).as("touch_type"))
          .agg(count(lit(1)).as("n_purchases"),
            sum(col("cents")).as("attributed_cents"))
          .orderBy("touch_type")
      },
      Some("""WITH t AS (SELECT user_id, ts,
             |    max_by(event_type, event_id) AS touch_type
             |  FROM events WHERE event_type IN ('click', 'view', 'signup')
             |  GROUP BY user_id, ts),
             |p AS (SELECT user_id, ts,
             |    CAST(round(value * 100) AS BIGINT) AS cents
             |  FROM events WHERE event_type = 'purchase'),
             |a AS (SELECT p.user_id, p.cents,
             |    CASE WHEN t.ts IS NOT NULL
             |        AND epoch_us(p.ts) - epoch_us(t.ts) <= 86400000000
             |      THEN t.touch_type END AS touch_type
             |  FROM p ASOF LEFT JOIN t
             |    ON p.user_id = t.user_id AND t.ts <= p.ts)
             |SELECT coalesce(touch_type, 'none') AS touch_type,
             |  CAST(count(*) AS BIGINT) AS n_purchases,
             |  CAST(sum(cents) AS BIGINT) AS attributed_cents
             |FROM a GROUP BY 1 ORDER BY 1""".stripMargin)),
  )
}
