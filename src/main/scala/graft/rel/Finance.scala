package graft.rel

import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.rel.RelQueries.Q
import graft.rel.Tables

/** FINANCIAL SERIES OPERATORS — OHLC bar construction and the Gini
  * concentration coefficient: the two reads a revenue stream gets from
  * a finance/market-structure consumer.
  *
  * Exactness: prices are exact cents; open/close are argmin/argmax
  * under the pinned (ts, event_id) total order; Gini is computed from
  * exact DECIMAL(38,0) rank-weighted sums with ONE integer division at
  * the end (milli-units) — no floating point anywhere.
  */
object Finance {

  val all: ListMap[String, Q] = ListMap(
    // ---- q179: OHLC BARS — per (event type, day): first/max/min/last
    //      value in cents, the canonical bar build. First/last are
    //      min_by/max_by under (ts, event_id) — a total order, so both
    //      engines pick identical rows (DuckDB replays with ordered
    //      first()/last() aggregates). Scale: one grouped agg, no
    //      window, no sort until the bounded output. ----
    "q179_ohlc_bars" -> Q(
      (s, d) => {
        val ev = Tables.events(s, d)
          .filter(col("event_type") === "purchase")
          .select(col("event_type"),
            to_date(col("ts")).as("day"),
            col("ts"), col("event_id"),
            round(col("value") * 100, 0).cast("long").as("cents"))
        ev.groupBy("event_type", "day")
          .agg(
            min_by(col("cents"), struct(col("ts"), col("event_id"))).as("open"),
            max("cents").as("high"),
            min("cents").as("low"),
            max_by(col("cents"), struct(col("ts"), col("event_id"))).as("close"),
            count(lit(1)).as("n_trades"))
          .select(col("event_type"),
            date_format(col("day"), "yyyy-MM-dd").as("day"),
            col("open"), col("high"), col("low"), col("close"),
            col("n_trades"))
          .orderBy("event_type", "day")
      },
      Some("""WITH e AS (SELECT event_type,
             |    CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
             |    CAST(ts AS TIMESTAMP) AS ts, event_id,
             |    CAST(round(value * 100) AS BIGINT) AS cents
             |  FROM events WHERE event_type = 'purchase')
             |SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
             |  first(cents ORDER BY ts, event_id) AS open,
             |  max(cents) AS high, min(cents) AS low,
             |  last(cents ORDER BY ts, event_id) AS close,
             |  count(*) AS n_trades
             |FROM e GROUP BY event_type, day
             |ORDER BY event_type, day""".stripMargin)),

    // ---- q180: GINI COEFFICIENT of customer revenue concentration —
    //      G = (2·Σ i·x_i − (n+1)·Σx) / (n·Σx) over per-customer order
    //      totals sorted ascending (ties broken by custkey, making the
    //      rank-weighted sum a pinned total-order quantity). Carried in
    //      DECIMAL(38,0)/HUGEINT so the rank-weighted sum cannot wrap,
    //      emitted in integer milli-units. Scale: one custkey agg, one
    //      rank window over |customers| rows, a 1-row reduction. ----
    "q180_gini" -> Q(
      (s, d) => {
        val perCust = Tables.orders(s, d)
          .groupBy("o_custkey")
          .agg(sum(round(col("o_totalprice") * 100, 0).cast("long")).as("x"))
        val dec = "decimal(38,0)"
        // global ranks come from the scale-safe decomposition (range
        // partition + per-partition offsets), not an unpartitioned window
        GlobalRank.byOrder(perCust, Seq(col("x"), col("o_custkey")), "i", "nt")
          .drop("nt")
          .agg(count(lit(1)).cast(dec).as("n"),
            sum(col("x")).cast(dec).as("sx"),
            sum(col("i") * col("x")).cast(dec).as("six"))
          .select(col("n").cast("long").as("n_customers"),
            // `div` is integral division on decimals too — the numerator
            // is non-negative, so truncation ≡ floor ≡ DuckDB's //
            expr("(2 * six - (n + 1) * sx) * 1000 div (n * sx)")
              .cast("long").as("gini_milli"))
      },
      Some("""WITH pc AS (SELECT o_custkey,
             |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS x
             |  FROM orders GROUP BY 1),
             |r AS (SELECT x, CAST(row_number() OVER (ORDER BY x, o_custkey) AS BIGINT) AS i
             |  FROM pc),
             |mo AS (SELECT count(*) AS n, sum(x) AS sx, sum(i * x) AS six FROM r)
             |SELECT CAST(n AS BIGINT) AS n_customers,
             |  CAST((2 * six - (n + 1) * sx) * 1000 // (n * sx) AS BIGINT)
             |    AS gini_milli
             |FROM mo""".stripMargin)),

    // ---- q186: PARETO / CONTRIBUTION ANALYSIS — revenue share and
    //      cumulative share per nation in exact milli-units (share =
    //      rev·1000 div total; cumulative share from the exact long
    //      cumsum, divided once), ordered by the pinned (revenue DESC,
    //      nation) total order: the 80/20 read on any dimension.
    //      Scale: one join-agg, a 25-row window, a 1-row broadcast. ----
    "q186_pareto_share" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val byNation = Tables.orders(s, d)
          .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
          .join(Tables.nation(s, d), col("c_nationkey") === col("n_nationkey"))
          .groupBy("n_name")
          .agg(sum(round(col("o_totalprice") * 100, 0).cast("long")).as("rev"))
        val w = Window.orderBy(col("rev").desc, col("n_name"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val tot = byNation.agg(sum("rev").as("total"))
        byNation
          .withColumn("cum", sum("rev").over(w))
          .crossJoin(broadcast(tot))
          .select(col("n_name"), col("rev").as("rev_cents"),
            expr("rev * 1000 div total").as("share_milli"),
            expr("cum * 1000 div total").as("cum_share_milli"))
          .orderBy(col("rev_cents").desc, col("n_name"))
      },
      Some("""WITH bn AS (
             |  SELECT n.n_name,
             |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev
             |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
             |    JOIN nation n ON c.c_nationkey = n.n_nationkey
             |  GROUP BY 1),
             |c AS (SELECT n_name, rev,
             |    CAST(sum(rev) OVER (ORDER BY rev DESC, n_name
             |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
             |  FROM bn),
             |t AS (SELECT CAST(sum(rev) AS BIGINT) AS total FROM bn)
             |SELECT n_name, rev AS rev_cents,
             |  rev * 1000 // total AS share_milli,
             |  cum * 1000 // total AS cum_share_milli
             |FROM c, t ORDER BY rev DESC, n_name""".stripMargin)),

    // ---- q207: COEFFICIENT OF VARIATION — relative dispersion of
    //      order totals per priority from exact DECIMAL(38,0) moment
    //      sums; the floating tail is one sqrt + one divide
    //      (cv = sqrt(n·Σx² − (Σx)²) / Σx, an algebraic rearrangement
    //      with NO mean subtraction inside the sum), rounded to 6. ----
    "q207_cv" -> Q(
      (s, d) => {
        val dec = "decimal(38,0)"
        Tables.orders(s, d)
          .select(col("o_orderpriority").as("pri"),
            round(col("o_totalprice") * 100, 0).cast("long").as("x"))
          .groupBy("pri")
          .agg(count(lit(1)).cast(dec).as("n"),
            sum(col("x")).cast(dec).as("sx"),
            sum(col("x").cast(dec) * col("x").cast(dec)).as("sxx"))
          .select(col("pri"), col("n").cast("long").as("n_orders"),
            round(
              sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double")) /
                col("sx").cast("double"), 6).as("cv6"))
          .orderBy("pri")
      },
      Some("""SELECT o_orderpriority AS pri, CAST(count(*) AS BIGINT) AS n_orders,
             |  round(sqrt(CAST(count(*) * sum(CAST(x AS HUGEINT) * x)
             |      - CAST(sum(x) AS HUGEINT) * sum(x) AS DOUBLE))
             |    / CAST(sum(x) AS DOUBLE), 6) AS cv6
             |FROM (SELECT o_orderpriority,
             |    CAST(round(o_totalprice * 100) AS BIGINT) AS x FROM orders)
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- q208: Z-SCORE OUTLIERS WITH ZERO FLOATS — |x − μ| > 1.7σ
    //      (the fixture's near-uniform totals top out at z ≈ 1.77)
    //      rewritten as the exact integer predicate
    //      100·(n·x − Σx)² > 289·(n·Σx² − (Σx)²), carried in
    //      DECIMAL(38,0)/HUGEINT: the outlier SET cannot drift by an
    //      ulp between engines, which a floating z-score threshold
    //      cannot promise. Top-10 outliers by the same exact
    //      excess-over-threshold quantity. ----
    "q208_zscore_outliers" -> Q(
      (s, d) => {
        val dec = "decimal(38,0)"
        val o = Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_orderpriority").as("pri"),
            round(col("o_totalprice") * 100, 0).cast("long").as("x"))
        val mo = o.groupBy("pri")
          .agg(count(lit(1)).cast(dec).as("n"),
            sum(col("x")).cast(dec).as("sx"),
            sum(col("x").cast(dec) * col("x").cast(dec)).as("sxx"))
        o.join(broadcast(mo), "pri")
          .withColumn("dev", col("n") * col("x") - col("sx"))
          .withColumn("excess",
            lit(100).cast(dec) * col("dev") * col("dev") -
              lit(289).cast(dec) * (col("n") * col("sxx") - col("sx") * col("sx")))
          .filter(col("excess") > 0)
          .select(col("pri"), col("o_orderkey"), col("x").as("cents"),
            col("excess").cast("double").as("excess_d"))
          .orderBy(desc("excess_d"), col("pri"), col("o_orderkey"))
          .limit(10)
          .select(col("pri"), col("o_orderkey"), col("cents"))
      },
      Some("""WITH o AS (SELECT o_orderkey, o_orderpriority AS pri,
             |    CAST(round(o_totalprice * 100) AS BIGINT) AS x FROM orders),
             |m AS (SELECT pri, CAST(count(*) AS HUGEINT) AS n,
             |    CAST(sum(x) AS HUGEINT) AS sx,
             |    sum(CAST(x AS HUGEINT) * x) AS sxx
             |  FROM o GROUP BY pri),
             |j AS (SELECT o.pri, o.o_orderkey, o.x,
             |    100 * (n * x - sx) * (n * x - sx)
             |      - 289 * (n * sxx - sx * sx) AS excess
             |  FROM o JOIN m ON o.pri = m.pri)
             |SELECT pri, o_orderkey, x AS cents
             |FROM j WHERE excess > 0
             |ORDER BY CAST(excess AS DOUBLE) DESC, pri, o_orderkey
             |LIMIT 10""".stripMargin)),
  )
}
