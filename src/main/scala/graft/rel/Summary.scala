package graft.rel

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.rel.RelQueries.Q
import graft.rel.Tables

/** SUMMARY & RESHAPING TIER — pivot/unpivot, exact weighted median,
  * equi-width histograms, exact quartile order statistics, and the
  * RANGE-frame rolling window: the reshape-and-describe operators a
  * BI layer expects from an engine.
  *
  * Exactness discipline: money is exact cents, ranks and bin indices
  * are integer formulas ((n−1)·k div 4, (v−mn)·B div span), and every
  * tie order is pinned total — no percentile interpolation, no
  * locale/calendar arithmetic.
  */
object Summary {

  /** EXACT WEIGHTED MEDIAN of `value` (long-valued) per `group`,
    * weighted by `weight`: the smallest value whose cumulative weight
    * reaches half the total (2·cumw ≥ W — exact longs, no
    * interpolation). One (group, value) pre-aggregation bounds the
    * window pass at distinct values, not raw rows.
    */
  def weightedMedian(df: org.apache.spark.sql.DataFrame, group: String,
      value: String, weight: String): org.apache.spark.sql.DataFrame = {
    val w = Window.partitionBy(group).orderBy(value)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = df
      .groupBy(col(group), col(value))
      .agg(sum(col(weight).cast("long")).as("qw"))
      .withColumn("cumw", sum("qw").over(w))
    val tot = df.groupBy(col(group))
      .agg(sum(col(weight).cast("long")).as("totw"))
    cum.join(tot, group)
      .filter(col("cumw") * 2 >= col("totw"))
      .groupBy(col(group))
      .agg(min(col(value)).as(s"weighted_median_$value"),
        min("totw").as("total_weight"))
  }

  val all: ListMap[String, Q] = ListMap(
    // ---- q172: PIVOT — revenue cents by nation × order priority,
    //      priorities pinned as explicit columns (dynamic pivot is a
    //      two-pass affair at scale; serving layers pin the column set
    //      exactly like this). Scale: one grouped agg; the pivot is a
    //      projection shape, not extra shuffles. ----
    "q172_pivot" -> Q(
      (s, d) => {
        val joined = Tables.orders(s, d)
          .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
          .join(Tables.nation(s, d), col("c_nationkey") === col("n_nationkey"))
          .select(col("n_name"), col("o_orderpriority"),
            round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
        joined.groupBy("n_name")
          .pivot("o_orderpriority",
            Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
          .sum("cents")
          .select(col("n_name"),
            coalesce(col("1-URGENT"), lit(0L)).as("p1_urgent"),
            coalesce(col("2-HIGH"), lit(0L)).as("p2_high"),
            coalesce(col("3-MEDIUM"), lit(0L)).as("p3_medium"),
            coalesce(col("4-NOT SPECIFIED"), lit(0L)).as("p4_not_specified"),
            coalesce(col("5-LOW"), lit(0L)).as("p5_low"))
          .orderBy("n_name")
      },
      Some("""SELECT n.n_name,
             |  CAST(coalesce(sum(CASE WHEN o_orderpriority = '1-URGENT'
             |    THEN CAST(round(o_totalprice * 100) AS BIGINT) END), 0) AS BIGINT) AS p1_urgent,
             |  CAST(coalesce(sum(CASE WHEN o_orderpriority = '2-HIGH'
             |    THEN CAST(round(o_totalprice * 100) AS BIGINT) END), 0) AS BIGINT) AS p2_high,
             |  CAST(coalesce(sum(CASE WHEN o_orderpriority = '3-MEDIUM'
             |    THEN CAST(round(o_totalprice * 100) AS BIGINT) END), 0) AS BIGINT) AS p3_medium,
             |  CAST(coalesce(sum(CASE WHEN o_orderpriority = '4-NOT SPECIFIED'
             |    THEN CAST(round(o_totalprice * 100) AS BIGINT) END), 0) AS BIGINT) AS p4_not_specified,
             |  CAST(coalesce(sum(CASE WHEN o_orderpriority = '5-LOW'
             |    THEN CAST(round(o_totalprice * 100) AS BIGINT) END), 0) AS BIGINT) AS p5_low
             |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
             |  JOIN nation n ON c.c_nationkey = n.n_nationkey
             |GROUP BY n.n_name ORDER BY n.n_name""".stripMargin)),

    // ---- q173: EXACT WEIGHTED MEDIAN — per return flag, the smallest
    //      price v whose cumulative quantity weight reaches half the
    //      total (2·cumw ≥ W, all longs): the robust "typical traded
    //      price" weighted by volume. Tie order pinned by (cents,
    //      orderkey, linenumber). Scale: one flag-keyed window pass
    //      over pre-aggregated... rows carry only (flag, cents, qty). ----
    "q173_weighted_median" -> Q(
      (s, d) => {
        val li = Tables.lineitem(s, d).select(col("l_returnflag").as("flag"),
          round(col("l_extendedprice") * 100, 0).cast("long").as("cents"),
          col("l_quantity").cast("long").as("qty"))
        weightedMedian(li, "flag", "cents", "qty")
          .orderBy("flag")
      },
      Some("""WITH li AS (SELECT l_returnflag AS flag,
             |    CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
             |    CAST(l_quantity AS BIGINT) AS qty
             |  FROM lineitem),
             |g AS (SELECT flag, cents, CAST(sum(qty) AS BIGINT) AS qw
             |  FROM li GROUP BY 1, 2),
             |c AS (SELECT flag, cents,
             |    CAST(sum(qw) OVER (PARTITION BY flag ORDER BY cents
             |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumw
             |  FROM g),
             |t AS (SELECT flag, CAST(sum(qty) AS BIGINT) AS totw
             |  FROM li GROUP BY 1)
             |SELECT c.flag, min(cents) AS weighted_median_cents,
             |  min(totw) AS total_weight
             |FROM c JOIN t ON c.flag = t.flag
             |WHERE cumw * 2 >= totw
             |GROUP BY c.flag ORDER BY c.flag""".stripMargin)),

    // ---- q174: EQUI-WIDTH HISTOGRAM — 10 bins over order totals in
    //      cents, integer bin edges from the exact global min/max
    //      (bin = (v−mn)·10 div (span+1)): the one-pass distribution
    //      sketch every profiler draws. Scale: 1-row min/max broadcast
    //      + one narrow map + a 10-row agg. ----
    "q174_histogram" -> Q(
      (s, d) => {
        val o = Tables.orders(s, d)
          .select(round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
        val mm = o.agg(min("cents").as("mn"), max("cents").as("mx"))
        o.crossJoin(broadcast(mm))
          .select(expr("(cents - mn) * 10 div (mx - mn + 1)").as("bin"),
            col("mn"), col("mx"))
          .groupBy("bin")
          .agg(count(lit(1)).as("n"),
            min(expr("mn + (mx - mn + 1) * bin div 10")).as("bin_lo"))
          .orderBy("bin")
      },
      Some("""WITH o AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents
             |  FROM orders),
             |mm AS (SELECT min(cents) AS mn, max(cents) AS mx FROM o)
             |SELECT (cents - mn) * 10 // (mx - mn + 1) AS bin,
             |  CAST(count(*) AS BIGINT) AS n,
             |  CAST(min(mn + (mx - mn + 1) * ((cents - mn) * 10 // (mx - mn + 1)) // 10)
             |    AS BIGINT) AS bin_lo
             |FROM o, mm GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- q175: EXACT QUARTILES AS ORDER STATISTICS — p25/p50/p75 of
    //      order totals per priority, each the element at integer rank
    //      (n−1)·k div 4 + 1 in the pinned (cents, orderkey) total
    //      order: distribution-free, interpolation-free, engine-
    //      agnostic. Scale: one group-keyed window pass. ----
    "q175_quartiles" -> Q(
      (s, d) => {
        val o = Tables.orders(s, d).select(col("o_orderpriority").as("pri"),
          round(col("o_totalprice") * 100, 0).cast("long").as("cents"),
          col("o_orderkey"))
        val w = Window.partitionBy("pri").orderBy("cents", "o_orderkey")
        val ranked = o
          .withColumn("rk", row_number().over(w))
          .withColumn("n", count(lit(1)).over(Window.partitionBy("pri")))
        ranked
          .filter(expr("rk = (n - 1) * 1 div 4 + 1") ||
            expr("rk = (n - 1) * 2 div 4 + 1") ||
            expr("rk = (n - 1) * 3 div 4 + 1"))
          .groupBy("pri")
          .agg(
            min(when(expr("rk = (n - 1) * 1 div 4 + 1"), col("cents")))
              .as("p25_cents"),
            min(when(expr("rk = (n - 1) * 2 div 4 + 1"), col("cents")))
              .as("p50_cents"),
            min(when(expr("rk = (n - 1) * 3 div 4 + 1"), col("cents")))
              .as("p75_cents"))
          .orderBy("pri")
      },
      Some("""WITH o AS (SELECT o_orderpriority AS pri,
             |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents, o_orderkey
             |  FROM orders),
             |r AS (SELECT pri, cents,
             |    CAST(row_number() OVER (PARTITION BY pri ORDER BY cents, o_orderkey)
             |      AS BIGINT) AS rk,
             |    CAST(count(*) OVER (PARTITION BY pri) AS BIGINT) AS n
             |  FROM o)
             |SELECT pri,
             |  min(CASE WHEN rk = (n - 1) * 1 // 4 + 1 THEN cents END) AS p25_cents,
             |  min(CASE WHEN rk = (n - 1) * 2 // 4 + 1 THEN cents END) AS p50_cents,
             |  min(CASE WHEN rk = (n - 1) * 3 // 4 + 1 THEN cents END) AS p75_cents
             |FROM r WHERE rk = (n - 1) * 1 // 4 + 1 OR rk = (n - 1) * 2 // 4 + 1
             |  OR rk = (n - 1) * 3 // 4 + 1
             |GROUP BY pri ORDER BY pri""".stripMargin)),

    // ---- q176: UNPIVOT (melt) — part attributes to long (key, attr,
    //      value) form, the inverse reshape of q172; values normalized
    //      to exact integer units (size as-is, retail price in cents).
    //      Scale: a narrow flatMap — rows × attributes, no shuffle
    //      until the final order. ----
    "q176_unpivot" -> Q(
      (s, d) => {
        Tables.part(s, d)
          .select(col("p_partkey"),
            col("p_size").cast("long").as("size_units"),
            round(col("p_retailprice") * 100, 0).cast("long").as("price_cents"))
          .select(col("p_partkey"), explode(map(
            lit("size_units"), col("size_units"),
            lit("price_cents"), col("price_cents"))).as(Seq("attr", "val")))
          .orderBy("p_partkey", "attr")
      },
      Some("""SELECT p_partkey, attr, val FROM (
             |  SELECT p_partkey, 'size_units' AS attr,
             |    CAST(p_size AS BIGINT) AS val FROM part
             |  UNION ALL
             |  SELECT p_partkey, 'price_cents',
             |    CAST(round(p_retailprice * 100) AS BIGINT) FROM part)
             |ORDER BY p_partkey, attr""".stripMargin)),

    // ---- q177: RANGE-FRAME ROLLING WINDOW — trailing 7-day revenue
    //      per day computed with a RANGE frame over the integer day
    //      index (days with no neighbors still see their true 7-day
    //      trailing sum — a ROWS frame would silently skip calendar
    //      gaps, which is the bug this operator exists to avoid). ----
    "q177_range_window" -> Q(
      (s, d) => {
        val daily = Tables.lineitem(s, d)
          .groupBy(to_date(col("l_shipdate")).as("day"))
          .agg(sum(round(col("l_extendedprice") * 100, 0).cast("long"))
            .as("cents"))
          .withColumn("di",
            datediff(col("day"), to_date(lit("1970-01-01"))).cast("long"))
        val w = Window.orderBy("di").rangeBetween(-6, 0)
        daily
          .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
            col("cents"), sum("cents").over(w).as("trailing7_cents"))
          .orderBy("day")
      },
      Some("""WITH daily AS (
             |  SELECT CAST(l_shipdate AS DATE) AS day,
             |    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents,
             |    CAST(date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE))
             |      AS BIGINT) AS di
             |  FROM lineitem GROUP BY 1, 3)
             |SELECT strftime(day, '%Y-%m-%d') AS day, cents,
             |  CAST(sum(cents) OVER (ORDER BY di
             |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT)
             |    AS trailing7_cents
             |FROM daily ORDER BY day""".stripMargin)),

    // ---- q184: RANK-TRANSFORM WINDOW FAMILY — ntile / percent_rank /
    //      cume_dist over per-customer revenue, summarized per decile
    //      so the entry pins all three definitions at once: decile
    //      boundaries (ntile's remainder-to-early-buckets rule),
    //      Σ percent_rank and Σ cume_dist per decile (both are exact
    //      small-rational sums — k/(n−1), k/n — identical IEEE in both
    //      engines, rounded to 6). One window pass, one 10-row agg. ----
    "q184_window_ranks" -> Q(
      (s, d) => {
        // all three rank transforms derive from ONE scale-safe global
        // rank (GlobalRank: range-partitioned sort + offsets) — under
        // the pinned total order, rank ≡ row_number, so ntile /
        // percent_rank / cume_dist are closed forms over (rk, n),
        // bit-identical to the unpartitioned-window definitions this
        // entry pins (GlobalRankSpec proves each equality on tied data)
        val perCust = Tables.orders(s, d)
          .groupBy("o_custkey")
          .agg(sum(round(col("o_totalprice") * 100, 0).cast("long")).as("cents"))
        GlobalRank.byOrder(perCust,
            Seq(col("cents"), col("o_custkey")), "rk", "n")
          .select(col("o_custkey"), col("cents"),
            GlobalRank.ntileOf(col("rk"), col("n"), 10).cast("int")
              .as("decile"),
            GlobalRank.percentRankOf(col("rk"), col("n")).as("pr"),
            GlobalRank.cumeDistOf(col("rk"), col("n")).as("cd"))
          .groupBy("decile")
          .agg(count(lit(1)).as("n"),
            min("cents").as("lo_cents"), max("cents").as("hi_cents"),
            round(sum("pr"), 6).as("sum_pr"),
            round(sum("cd"), 6).as("sum_cd"))
          .orderBy("decile")
      },
      Some("""WITH pc AS (SELECT o_custkey,
             |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
             |  FROM orders GROUP BY 1),
             |r AS (SELECT o_custkey, cents,
             |    ntile(10) OVER (ORDER BY cents, o_custkey) AS decile,
             |    percent_rank() OVER (ORDER BY cents, o_custkey) AS pr,
             |    cume_dist() OVER (ORDER BY cents, o_custkey) AS cd
             |  FROM pc)
             |SELECT CAST(decile AS INT) AS decile, CAST(count(*) AS BIGINT) AS n,
             |  min(cents) AS lo_cents, max(cents) AS hi_cents,
             |  round(sum(pr), 6) AS sum_pr, round(sum(cd), 6) AS sum_cd
             |FROM r GROUP BY decile ORDER BY decile""".stripMargin)),

    // ---- q194: FORWARD FILL (last observation carried forward) — the
    //      canonical sparse-series densification: every event carries
    //      the user's most recent purchase amount (events before the
    //      first purchase stay NULL). One user-keyed window pass with
    //      last(_, ignoreNulls) over the pinned (ts, event_id) order;
    //      summarized per event type (count with/without a carried
    //      value + exact carried sum) to keep the output bounded. ----
    "q194_forward_fill" -> Q(
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.events(s, d)
          .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
            when(col("event_type") === "purchase",
              round(col("value") * 100, 0).cast("long")).as("purchase_cents"))
          .withColumn("carried", last("purchase_cents", ignoreNulls = true).over(w))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_events"),
            count(col("carried")).as("n_with_carry"),
            sum("carried").as("carried_sum_cents"))
          .orderBy("event_type")
      },
      Some("""WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
             |    event_type,
             |    CASE WHEN event_type = 'purchase'
             |      THEN CAST(round(value * 100) AS BIGINT) END AS pc
             |  FROM events),
             |f AS (SELECT event_type,
             |    last_value(pc IGNORE NULLS) OVER (PARTITION BY user_id
             |      ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS carried
             |  FROM e)
             |SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
             |  CAST(count(carried) AS BIGINT) AS n_with_carry,
             |  CAST(sum(carried) AS BIGINT) AS carried_sum_cents
             |FROM f GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // ---- q197: SLIDING WINDOWS — 2-hour windows advancing hourly
    //      (each event belongs to exactly TWO), the overlap shape q18's
    //      tumbling grid cannot express. The oracle replays the window
    //      assignment arithmetic: an event at hour h lands in windows
    //      starting h and h−1. ----
    "q197_sliding_window" -> Q(
      (s, d) => {
        Tables.events(s, d)
          .groupBy(window(col("ts"), "2 hours", "1 hour").as("w"),
            col("event_type"))
          .agg(count(lit(1)).as("cnt"),
            sum(round(col("value") * 100, 0).cast("long")).as("value_cents"))
          .select(col("w.start").cast("timestamp_ntz").as("wstart"),
            col("event_type"), col("cnt"), col("value_cents"))
          .orderBy("wstart", "event_type")
      },
      Some("""WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type,
             |    CAST(round(value * 100) AS BIGINT) AS cents FROM events),
             |w AS (SELECT date_trunc('hour', ts)
             |      - to_hours(CAST(o.o AS BIGINT)) AS wstart,
             |    event_type, cents
             |  FROM e CROSS JOIN (VALUES (0), (1)) o(o))
             |SELECT wstart, event_type, count(*) AS cnt,
             |  CAST(sum(cents) AS BIGINT) AS value_cents
             |FROM w GROUP BY 1, 2 ORDER BY wstart, event_type""".stripMargin)),
  )
}
