package graft.rel

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap

/** The relational operator surface (SURVEY.md §2b / §7.6): TPC-H-shaped
  * queries over the driver's tables, each written with the declarative
  * DataFrame API (Catalyst handles pushdown/pruning/join planning) and
  * paired with an ANSI-SQL oracle the driver runs in DuckDB.
  *
  * Cross-engine determinism rules (so hash compares can't flake):
  *   - Money/float SUMs go through exact integer cents:
  *     sum(cast(round(x*100) as bigint)) — identical in both engines
  *     regardless of accumulation order.
  *   - Averages/ratios are derived from exact operands (cents / counts),
  *     one IEEE division → bit-identical.
  *   - Every result has a total deterministic ORDER BY in BOTH dialects,
  *     with NULLS FIRST pinned where rollup/outer joins can emit nulls.
  */
object RelQueries {
  final case class Q(
      fn: (SparkSession, String) => DataFrame,
      sql: Option[String],
      /** included in the Bench headline set */
      headline: Boolean = false)

  /** exact money sum in integer cents */
  private def cents(e: Column): Column = sum(round(e * 100, 0).cast("long"))

  import Tables._

  val all: ListMap[String, Q] = ListMap(
    // ---- aggregation: partial+final hash agg, exact-cents sums (Q1) ----
    "q01_pricing_summary" -> Q(
      (s, d) =>
        lineitem(s, d)
          .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            sum(col("l_quantity")).as("sum_qty"),
            cents(col("l_extendedprice")).as("sum_base_cents"),
            cents(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_cents"),
            cents(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")))
              .as("sum_charge_cents"),
            count(lit(1)).as("count_order"))
          .withColumn("avg_qty", col("sum_qty") / col("count_order"))
          .withColumn("avg_price", col("sum_base_cents") / lit(100.0) / col("count_order"))
          .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT l_returnflag, l_linestatus,
             |  sum(l_quantity) AS sum_qty,
             |  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
             |  CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT) AS sum_disc_cents,
             |  CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*(1+l_tax)*100) AS BIGINT)) AS BIGINT) AS sum_charge_cents,
             |  count(*) AS count_order,
             |  sum(l_quantity)/count(*) AS avg_qty,
             |  sum(CAST(round(l_extendedprice*100) AS BIGINT))/100.0/count(*) AS avg_price
             |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin),
      headline = true),

    // ---- scan + filter + projection with pushdown ----
    "q02_filter_project" -> Q(
      (s, d) =>
        part(s, d)
          .filter(col("p_size").between(10, 20) && col("p_type") === "STANDARD")
          .select(col("p_partkey"), col("p_brand"), col("p_size"),
            round(col("p_retailprice") * 100, 0).cast("long").as("price_cents"))
          .orderBy("p_partkey"),
      Some("""SELECT p_partkey, p_brand, p_size,
             |  CAST(round(p_retailprice*100) AS BIGINT) AS price_cents
             |FROM part WHERE p_size BETWEEN 10 AND 20 AND p_type = 'STANDARD'
             |ORDER BY p_partkey""".stripMargin)),

    // ---- 3-way join + agg + top-k, small dim broadcast (Q3) ----
    "q03_top_revenue" -> Q(
      (s, d) => {
        val c = customer(s, d).filter(col("c_mktsegment") === "BUILDING")
        val o = orders(s, d)
        val l = lineitem(s, d)
        broadcast(c)
          .join(o, col("c_custkey") === col("o_custkey"))
          .join(l, col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("o_orderkey"))
          .agg(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue_cents"))
          .orderBy(col("revenue_cents").desc, col("o_orderkey"))
          .limit(10)
      },
      Some("""SELECT o_orderkey,
             |  CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_cents
             |FROM customer, orders, lineitem
             |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey AND o_orderkey = l_orderkey
             |GROUP BY o_orderkey
             |ORDER BY revenue_cents DESC, o_orderkey LIMIT 10""".stripMargin),
      headline = true),

    // ---- semi join + agg (Q4) ----
    "q04_order_priority" -> Q(
      (s, d) => {
        val o = orders(s, d)
        val l = lineitem(s, d).select("l_orderkey").distinct()
        o.join(l, col("o_orderkey") === col("l_orderkey"), "left_semi")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("order_count"))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority, count(*) AS order_count
             |FROM orders WHERE EXISTS (
             |  SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
             |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // ---- 6-way join through the star schema (Q5) ----
    "q05_local_supplier" -> Q(
      (s, d) => {
        val r = region(s, d).filter(col("r_name") === "ASIA")
        val n = nation(s, d)
        val c = customer(s, d)
        val o = orders(s, d)
        val l = lineitem(s, d)
        val sup = supplier(s, d)
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
          .join(c, col("o_custkey") === col("c_custkey") &&
            col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("n_name"))
          .agg(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue_cents"))
          .orderBy(col("revenue_cents").desc, col("n_name"))
      },
      Some("""SELECT n_name,
             |  CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_cents
             |FROM lineitem, orders, supplier, customer, nation, region
             |WHERE l_orderkey = o_orderkey AND l_suppkey = s_suppkey
             |  AND o_custkey = c_custkey AND c_nationkey = s_nationkey
             |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
             |  AND r_name = 'ASIA'
             |GROUP BY n_name ORDER BY revenue_cents DESC, n_name""".stripMargin),
      headline = true),

    // ---- selective scan-only aggregate (Q6): pushdown must reach parquet ----
    "q06_revenue_forecast" -> Q(
      (s, d) =>
        lineitem(s, d)
          .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
            col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
          .agg(cents(col("l_extendedprice") * col("l_discount")).as("revenue_cents")),
      Some("""SELECT CAST(sum(CAST(round(l_extendedprice*l_discount*100) AS BIGINT)) AS BIGINT) AS revenue_cents
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
             |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin),
      headline = true),

    // ---- window function: rank within partition ----
    "q07_top_orders_per_cust" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        orders(s, d)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 2)
          .select(col("o_custkey"), col("rn"), col("o_orderkey"),
            round(col("o_totalprice") * 100, 0).cast("long").as("total_cents"))
          .orderBy("o_custkey", "rn")
      },
      Some("""SELECT o_custkey, rn, o_orderkey, total_cents FROM (
             |  SELECT o_custkey, o_orderkey,
             |    CAST(round(o_totalprice*100) AS BIGINT) AS total_cents,
             |    row_number() OVER (PARTITION BY o_custkey
             |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
             |  FROM orders) t
             |WHERE rn <= 2 ORDER BY o_custkey, rn""".stripMargin),
      headline = true),

    // ---- global sort + limit (top-k) ----
    "q08_top_orders" -> Q(
      (s, d) =>
        orders(s, d)
          .select(col("o_orderkey"), col("o_custkey"),
            round(col("o_totalprice") * 100, 0).cast("long").as("total_cents"))
          .orderBy(col("total_cents").desc, col("o_orderkey"))
          .limit(100),
      Some("""SELECT o_orderkey, o_custkey,
             |  CAST(round(o_totalprice*100) AS BIGINT) AS total_cents
             |FROM orders ORDER BY total_cents DESC, o_orderkey LIMIT 100""".stripMargin)),

    // ---- distinct aggregation ----
    "q09_distinct_counts" -> Q(
      (s, d) =>
        lineitem(s, d).agg(
          countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n_rows")),
      Some("""SELECT count(DISTINCT l_partkey) AS n_parts,
             |  count(DISTINCT l_suppkey) AS n_supps, count(*) AS n_rows
             |FROM lineitem""".stripMargin)),

    // ---- grouping sets: rollup with null subtotal keys ----
    "q10_rollup" -> Q(
      (s, d) =>
        lineitem(s, d)
          .rollup(col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("cnt"), sum(col("l_quantity")).as("sum_qty"))
          .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first),
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS cnt, sum(l_quantity) AS sum_qty
             |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
             |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)),

    // ---- grouping sets: full cube ----
    "q21_cube" -> Q(
      (s, d) =>
        lineitem(s, d)
          .cube(col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("cnt"), sum(col("l_quantity")).as("sum_qty"))
          .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first),
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS cnt, sum(l_quantity) AS sum_qty
             |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
             |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)),

    // ---- as-of join: most recent prior click for each purchase.
    //      graft.rel.AsofJoin composes it from built-ins (union + sorted
    //      window carry-forward): one sort shuffle, no range explosion.
    //      Oracle: DuckDB's native ASOF LEFT JOIN. ----
    "q22_asof_purchase_click" -> Q(
      (s, d) => {
        val ev = events(s, d)
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts"))
        AsofJoin.asof(purchases, clicks, "user_id", "ts",
            Map("event_id" -> "click_event_id", "ts" -> "click_ts"))
          .select(col("event_id"), col("user_id"),
            unix_micros(col("ts")).as("p_ts_us"),
            col("click_event_id"),
            (unix_micros(col("ts")) - unix_micros(col("click_ts"))).as("gap_us"))
          .orderBy("event_id")
      },
      Some("""SELECT p.event_id AS event_id, p.user_id AS user_id,
             |  epoch_us(p.ts) AS p_ts_us, c.event_id AS click_event_id,
             |  epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
             |FROM (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events
             |      WHERE event_type = 'purchase') p
             |ASOF LEFT JOIN (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events
             |      WHERE event_type = 'click') c
             |  ON p.user_id = c.user_id AND p.ts >= c.ts
             |ORDER BY event_id""".stripMargin)),

    // ---- date arithmetic + banded histogram (interval predicate) ----
    "q23_ship_latency" -> Q(
      (s, d) => {
        val o = orders(s, d).select(col("o_orderkey"), col("o_orderdate"))
        val l = lineitem(s, d).select(col("l_orderkey"), col("l_shipdate"))
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .withColumn("lat_days", datediff(col("l_shipdate"), col("o_orderdate")))
          .withColumn("bucket", floor(col("lat_days") / 30).cast("int"))
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("cnt"),
            min(col("lat_days")).as("min_days"), max(col("lat_days")).as("max_days"))
          .orderBy("bucket")
      },
      Some("""SELECT CAST(floor(datediff('day', o_orderdate, l_shipdate) / 30) AS INT) AS bucket,
             |  count(*) AS cnt,
             |  min(datediff('day', o_orderdate, l_shipdate)) AS min_days,
             |  max(datediff('day', o_orderdate, l_shipdate)) AS max_days
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |GROUP BY 1 ORDER BY bucket""".stripMargin)),

    // ---- exact percentiles (sort-based, linear interpolation) ----
    "q24_percentiles" -> Q(
      (s, d) =>
        orders(s, d)
          .groupBy(col("o_orderstatus"))
          .agg(
            round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
            round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"),
            count(lit(1)).as("cnt"))
          .orderBy("o_orderstatus"),
      Some("""SELECT o_orderstatus,
             |  round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
             |  round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
             |  count(*) AS cnt
             |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    // ---- spark.sql surface: correlated scalar subquery through the SQL
    //      parser (the DataFrame API can't express this shape directly) ----
    "q25_sql_correlated" -> Q(
      (s, d) => {
        orders(s, d).createOrReplaceTempView("orders_v")
        s.sql("""
          SELECT o_custkey,
                 count(*) AS n_big,
                 CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS big_cents
          FROM orders_v o
          WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders_v i
                                WHERE i.o_custkey = o.o_custkey)
          GROUP BY o_custkey
          HAVING count(*) >= 8
          ORDER BY o_custkey""")
      },
      Some("""SELECT o_custkey, count(*) AS n_big,
             |  CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS big_cents
             |FROM orders o
             |WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders i
             |                      WHERE i.o_custkey = o.o_custkey)
             |GROUP BY o_custkey HAVING count(*) >= 8
             |ORDER BY o_custkey""".stripMargin)),

    // ---- pivot: long→wide conditional aggregation with a FIXED value
    //      list (an open-ended pivot would need a driver-side distinct
    //      pass — the anti-pattern at 100 TB; fixed domains keep the plan
    //      a single hash agg) ----
    "q26_pivot_status" -> Q(
      (s, d) =>
        orders(s, d)
          .groupBy(col("o_orderpriority"))
          .pivot("o_orderstatus", Seq("F", "O", "P"))
          .agg(count(lit(1)))
          .na.fill(0, Seq("F", "O", "P"))
          .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority,
             |  count(*) FILTER (o_orderstatus = 'F') AS "F",
             |  count(*) FILTER (o_orderstatus = 'O') AS "O",
             |  count(*) FILTER (o_orderstatus = 'P') AS "P"
             |FROM orders GROUP BY o_orderpriority
             |ORDER BY o_orderpriority""".stripMargin)),

    // ---- date spine / gap fill: generate the continuous day range from
    //      the data's own bounds, left-join per-day counts, zero-fill.
    //      The spine and the per-day agg are both tiny post-aggregation,
    //      so the join broadcasts regardless of fact-table size ----
    "q27_date_spine" -> Q(
      (s, d) => {
        val days = orders(s, d).select(to_date(col("o_orderdate")).as("day"))
        // sequence(date, date, day-time interval) promotes to timestamp;
        // cast the spine back to date to match the per-day agg key
        val spine = days.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
          .select(explode(sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("t"))
          .select(to_date(col("t")).as("day"))
        val per = days.groupBy("day").agg(count(lit(1)).as("n_orders"))
        spine.join(per, Seq("day"), "left")
          .na.fill(0, Seq("n_orders"))
          .orderBy("day")
      },
      Some("""WITH b AS (SELECT min(CAST(o_orderdate AS DATE)) AS d0,
             |                  max(CAST(o_orderdate AS DATE)) AS d1 FROM orders),
             |spine AS (SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day FROM b),
             |per AS (SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS n_orders
             |        FROM orders GROUP BY 1)
             |SELECT s.day, COALESCE(p.n_orders, 0) AS n_orders
             |FROM spine s LEFT JOIN per p USING (day) ORDER BY day""".stripMargin)),

    // ---- ntile deciles within bounded partitions (a GLOBAL ntile is a
    //      one-task sort — scale-hostile; per-status partitions keep the
    //      window parallel and the tie-break (price, orderkey) makes
    //      bucket assignment deterministic in both engines) ----
    "q28_deciles" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("o_orderstatus"))
          .orderBy(col("o_totalprice"), col("o_orderkey"))
        orders(s, d)
          .select(col("o_orderstatus"), col("o_totalprice"),
            ntile(10).over(w).as("decile"))
          .groupBy(col("o_orderstatus"), col("decile"))
          .agg(count(lit(1)).as("n"),
            min(col("o_totalprice")).as("min_price"),
            max(col("o_totalprice")).as("max_price"))
          .orderBy("o_orderstatus", "decile")
      },
      Some("""SELECT o_orderstatus, decile, count(*) AS n,
             |  min(o_totalprice) AS min_price, max(o_totalprice) AS max_price
             |FROM (SELECT o_orderstatus, o_totalprice,
             |        ntile(10) OVER (PARTITION BY o_orderstatus
             |          ORDER BY o_totalprice, o_orderkey) AS decile
             |      FROM orders) t
             |GROUP BY o_orderstatus, decile
             |ORDER BY o_orderstatus, decile""".stripMargin)),

    // ---- approximate sketches (HLL++ count-distinct, approx quantile)
    //      checked against their exact twins with a relative-error bound:
    //      the sketch values themselves are engine-specific, so the
    //      oracle-comparable output is the exact value + a deterministic
    //      within-bound flag (fixed data, fixed sketch seeds). At 100 TB
    //      the approx forms are the ones that matter: HLL is a bounded
    //      merge buffer vs a full distinct shuffle ----
    "q29_sketch_bounds" -> Q(
      (s, d) => {
        val o = orders(s, d)
        o.agg(
            countDistinct(col("o_custkey")).as("exact_custkeys"),
            approx_count_distinct(col("o_custkey"), 0.02).as("hll"),
            expr("percentile(o_totalprice, 0.5)").as("p50_exact"),
            percentile_approx(col("o_totalprice"), lit(0.5), lit(10000)).as("p50_approx"))
          .select(
            col("exact_custkeys"),
            (abs(col("hll") - col("exact_custkeys")) <=
              col("exact_custkeys") * 0.05).as("hll_within_5pct"),
            round(col("p50_exact"), 4).as("p50_exact"),
            (abs(col("p50_approx") - col("p50_exact")) <=
              col("p50_exact") * 0.01).as("p50_within_1pct"))
      },
      Some("""SELECT count(DISTINCT o_custkey) AS exact_custkeys,
             |  TRUE AS hll_within_5pct,
             |  round(quantile_cont(o_totalprice, 0.5), 4) AS p50_exact,
             |  TRUE AS p50_within_1pct
             |FROM orders""".stripMargin)),

    // ---- RANGE-frame moving window: 7-day trailing revenue per day.
    //      The frame is a NUMERIC range over days-since-epoch (both
    //      engines agree on that; interval-typed RANGE frames don't
    //      exist in the DataFrame API), so calendar gaps are handled by
    //      the frame itself, not by row counting. The unpartitioned
    //      window is safe: its input is one row per DAY — bounded by the
    //      calendar, not by data size ----
    "q48_moving_window" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val daily = orders(s, d)
          .groupBy(to_date(col("o_orderdate")).as("day"))
          .agg(cents(col("o_totalprice")).as("rev_cents"),
            count(lit(1)).as("n_orders"))
          .withColumn("ord", datediff(col("day"), lit("1970-01-01").cast("date")))
        val w = Window.orderBy(col("ord")).rangeBetween(-6, 0)
        daily
          .withColumn("rev7_cents", sum(col("rev_cents")).over(w))
          .withColumn("n7", sum(col("n_orders")).over(w))
          .select("day", "rev_cents", "n_orders", "rev7_cents", "n7")
          .orderBy("day")
      },
      Some("""WITH daily AS (
             |  SELECT CAST(o_orderdate AS DATE) AS day,
             |    CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS rev_cents,
             |    count(*) AS n_orders,
             |    date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS ord
             |  FROM orders GROUP BY 1, 4)
             |SELECT day, rev_cents, n_orders,
             |  CAST(sum(rev_cents) OVER (ORDER BY ord
             |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS rev7_cents,
             |  CAST(sum(n_orders) OVER (ORDER BY ord
             |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS n7
             |FROM daily ORDER BY day""".stripMargin)),

    // ---- unpivot/melt: wide charge components -> long (id, component,
    //      value) rows via the native Dataset.unpivot operator (a narrow
    //      1->3 row expansion, no shuffle; the inverse of q26's pivot).
    //      The oracle states the same relation as a UNION ALL, the
    //      engine-neutral definition of UNPIVOT. ----
    "q52_unpivot" -> Q(
      (s, d) => {
        val li = lineitem(s, d)
          .filter(col("l_orderkey") < 100)
          .select(col("l_orderkey"), col("l_linenumber"),
            col("l_extendedprice"), col("l_discount"), col("l_tax"))
        li.unpivot(
            Array(col("l_orderkey"), col("l_linenumber")),
            Array(col("l_extendedprice"), col("l_discount"), col("l_tax")),
            "component", "value")
          .orderBy("l_orderkey", "l_linenumber", "component")
      },
      Some("""SELECT l_orderkey, l_linenumber, component, value FROM (
             |  SELECT l_orderkey, l_linenumber,
             |    'l_extendedprice' AS component, l_extendedprice AS value
             |  FROM lineitem WHERE l_orderkey < 100
             |  UNION ALL
             |  SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
             |  FROM lineitem WHERE l_orderkey < 100
             |  UNION ALL
             |  SELECT l_orderkey, l_linenumber, 'l_tax', l_tax
             |  FROM lineitem WHERE l_orderkey < 100) t
             |ORDER BY l_orderkey, l_linenumber, component""".stripMargin)),

    // ---- set ops: intersect / except on key domains ----
    "q11_setops" -> Q(
      (s, d) => {
        val ck = customer(s, d).select(col("c_custkey").as("k"))
        val ok = orders(s, d).select(col("o_custkey").as("k"))
        ck.intersect(ok).withColumn("tag", lit("both"))
          .union(ck.except(ok).withColumn("tag", lit("no_orders")))
          .orderBy("tag", "k")
      },
      Some("""SELECT k, tag FROM (
             |  SELECT DISTINCT c_custkey AS k, 'both' AS tag FROM customer
             |    WHERE c_custkey IN (SELECT o_custkey FROM orders)
             |  UNION ALL
             |  SELECT DISTINCT c_custkey AS k, 'no_orders' AS tag FROM customer
             |    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)) t
             |ORDER BY tag, k""".stripMargin)),

    // ---- string scalar functions ----
    "q12_string_funcs" -> Q(
      (s, d) =>
        part(s, d)
          .filter(col("p_partkey") <= 500)
          .select(
            col("p_partkey"),
            upper(col("p_brand")).as("brand_up"),
            substring(col("p_name"), 1, 8).as("name_pfx"),
            length(col("p_name")).as("name_len"),
            concat_ws("|", col("p_type"), col("p_brand")).as("type_brand"),
            regexp_replace(col("p_name"), "[aeiou]", "").as("name_novowel"))
          .orderBy("p_partkey"),
      Some("""SELECT p_partkey, upper(p_brand) AS brand_up, substr(p_name,1,8) AS name_pfx,
             |  length(p_name) AS name_len,
             |  concat_ws('|', p_type, p_brand) AS type_brand,
             |  regexp_replace(p_name, '[aeiou]', '', 'g') AS name_novowel
             |FROM part WHERE p_partkey <= 500 ORDER BY p_partkey""".stripMargin)),

    // ---- date/time scalar functions ----
    "q13_date_funcs" -> Q(
      (s, d) =>
        orders(s, d)
          .groupBy(year(col("o_orderdate")).as("yr"), quarter(col("o_orderdate")).as("qtr"))
          .agg(count(lit(1)).as("cnt"),
            cents(col("o_totalprice")).as("total_cents"))
          .orderBy("yr", "qtr"),
      Some("""SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS yr,
             |  CAST(EXTRACT(quarter FROM o_orderdate) AS INT) AS qtr,
             |  count(*) AS cnt,
             |  CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS total_cents
             |FROM orders GROUP BY 1, 2 ORDER BY yr, qtr""".stripMargin)),

    // ---- conditional aggregation (CASE WHEN, Q12-shaped) ----
    "q14_priority_case" -> Q(
      (s, d) => {
        val o = orders(s, d)
        val l = lineitem(s, d)
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("l_linestatus"))
          .agg(
            sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1).otherwise(0))
              .as("high_line_count"),
            sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1).otherwise(0))
              .as("low_line_count"))
          .orderBy("l_linestatus")
      },
      Some("""SELECT l_linestatus,
             |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
             |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
             |FROM lineitem, orders WHERE l_orderkey = o_orderkey
             |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin)),

    // ---- HAVING over grouped join ----
    "q15_big_customers" -> Q(
      (s, d) =>
        orders(s, d)
          .groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("n_orders"), cents(col("o_totalprice")).as("spend_cents"))
          .filter(col("n_orders") >= 20)
          .orderBy(col("spend_cents").desc, col("o_custkey")),
      Some("""SELECT o_custkey, count(*) AS n_orders,
             |  CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS spend_cents
             |FROM orders GROUP BY o_custkey HAVING count(*) >= 20
             |ORDER BY spend_cents DESC, o_custkey""".stripMargin)),

    // ---- anti join (vs urgent orders so the result is non-empty) ----
    "q16_customers_without_urgent" -> Q(
      (s, d) => {
        val c = customer(s, d)
        val o = orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_custkey")).distinct()
        c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
          .select(col("c_custkey"), col("c_mktsegment"))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_mktsegment FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders
             |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
             |ORDER BY c_custkey""".stripMargin)),

    // ---- correlated scalar subquery: above-average account balances ----
    "q17_above_avg_balance" -> Q(
      (s, d) => {
        val c = customer(s, d)
        val natAvg = c.groupBy(col("c_nationkey").as("nk"))
          .agg((cents(col("c_acctbal")) / lit(100.0) / count(lit(1))).as("nat_avg"))
        c.join(broadcast(natAvg), col("c_nationkey") === col("nk"))
          .filter(col("c_acctbal") > col("nat_avg"))
          .groupBy(col("c_nationkey"))
          .agg(count(lit(1)).as("n_above"))
          .orderBy("c_nationkey")
      },
      Some("""SELECT c_nationkey, count(*) AS n_above
             |FROM customer c JOIN (
             |  SELECT c_nationkey AS nk,
             |    sum(CAST(round(c_acctbal*100) AS BIGINT))/100.0/count(*) AS nat_avg
             |  FROM customer GROUP BY c_nationkey) a ON c.c_nationkey = a.nk
             |WHERE c_acctbal > nat_avg
             |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin)),

    // ---- events: tumbling time window aggregation (batch form of the
    //      streaming query; see graft.streaming for the readStream twin) ----
    "q18_events_hourly" -> Q(
      (s, d) =>
        events(s, d)
          .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
          .agg(count(lit(1)).as("cnt"), cents(col("value")).as("value_cents"))
          // timestamp_ntz so the parquet written value is wall-clock like
          // DuckDB's date_trunc output (no UTC-adjusted flag mismatch)
          .select(col("w.start").cast("timestamp_ntz").as("wstart"),
            col("event_type"), col("cnt"), col("value_cents"))
          .orderBy("wstart", "event_type"),
      Some("""SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS wstart, event_type, count(*) AS cnt,
             |  CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS value_cents
             |FROM events GROUP BY 1, 2 ORDER BY wstart, event_type""".stripMargin),
      headline = true),

    // ---- events: JSON extraction + sessionless funnel counts ----
    "q19_events_json" -> Q(
      (s, d) =>
        events(s, d)
          .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("cnt"), sum(col("k")).as("sum_k"),
            min(col("k")).as("min_k"), max(col("k")).as("max_k"))
          .orderBy("event_type"),
      Some("""SELECT event_type, count(*) AS cnt,
             |  CAST(sum(CAST(props->>'$.k' AS INT)) AS BIGINT) AS sum_k,
             |  min(CAST(props->>'$.k' AS INT)) AS min_k,
             |  max(CAST(props->>'$.k' AS INT)) AS max_k
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // ---- events: sessionization via window lag (gap > 30 min) ----
    "q20_events_sessions" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        events(s, d)
          .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
          // gap test in exact integer microseconds — DuckDB's epoch_us twin
          .withColumn("new_sess",
            when(col("prev_ts").isNull ||
              unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 1800000000L, 1).otherwise(0))
          .withColumn("sess_id", sum(col("new_sess")).over(
            byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy(col("user_id"))
          .agg(max(col("sess_id")).as("n_sessions"), count(lit(1)).as("n_events"))
          .orderBy("user_id")
      },
      // CAST: DuckDB window sum(INTEGER) yields HUGEINT, which its max()
      // propagates; Spark emits BIGINT — cast so the hash compare sees the
      // same arrow dtype (same rule as every other oracle sum in this file).
      Some("""SELECT user_id, CAST(max(sess_id) AS BIGINT) AS n_sessions, count(*) AS n_events FROM (
             |  SELECT user_id, sum(new_sess) OVER (
             |      PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
             |  FROM (
             |    SELECT user_id, ts, event_id,
             |      CASE WHEN lag(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) IS NULL
             |        OR epoch_us(CAST(ts AS TIMESTAMP)) - epoch_us(lag(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)) > 1800000000
             |        THEN 1 ELSE 0 END AS new_sess
             |    FROM events) a) b
             |GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // ---- interval-stabbing via the binned range join: open orders per
    //      day, each order open [o_orderdate, +(o_orderkey%30)+1 days].
    //      [[RangeJoin.binnedIntervalJoin]] turns the BETWEEN theta-join
    //      (nested-loop in Spark) into an equi-join on 16-day bins —
    //      ranges replicate ≤3×, each (day, order) pair meets in exactly
    //      one bin. The oracle states the same join as a plain BETWEEN,
    //      which DuckDB executes natively as its IE-join. ----
    "q63_interval_stab" -> Q(
      (s, d) => {
        val epoch = lit("1970-01-01").cast("date")
        val ds = datediff(to_date(col("o_orderdate")), epoch)
        val r = orders(s, d).select(ds.as("d_start"),
          (ds + pmod(col("o_orderkey"), lit(30)) + 1).cast("int").as("d_end"))
        val spine = r.agg(min(col("d_start")).as("d0"), max(col("d_start")).as("d1"))
          .select(explode(sequence(col("d0"), col("d1"))).as("d"))
        val stabbed = RangeJoin
          .binnedIntervalJoin(spine, "d", r, "d_start", "d_end", 16)
          .groupBy("d").agg(count(lit(1)).as("n_open"))
        spine.join(stabbed, Seq("d"), "left")
          .na.fill(0, Seq("n_open"))
          .select(date_add(epoch, col("d")).as("day"), col("n_open"))
          .orderBy("day")
      },
      Some("""WITH r AS (SELECT
             |    CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS d_start,
             |    CAST(o_orderdate AS DATE) - DATE '1970-01-01' + o_orderkey % 30 + 1 AS d_end
             |  FROM orders),
             |b AS (SELECT min(d_start) AS d0, max(d_start) AS d1 FROM r),
             |spine AS (SELECT unnest(generate_series(d0, d1)) AS d FROM b),
             |c AS (SELECT s.d, count(*) AS n_open FROM spine s
             |      JOIN r ON s.d BETWEEN r.d_start AND r.d_end GROUP BY s.d)
             |SELECT DATE '1970-01-01' + CAST(s.d AS INT) AS day, COALESCE(c.n_open, 0) AS n_open
             |FROM spine s LEFT JOIN c USING (d) ORDER BY day""".stripMargin)),

    // ---- Bloom RUNTIME semi-join ([[BloomJoin]]): lineitem is
    //      pre-filtered by a Bloom filter of the URGENT orders' keys
    //      BEFORE the join shuffle — ~80% of the fact rows never enter
    //      the exchange. Results are exact regardless of fpp (the join
    //      eliminates false positives), so the oracle is the plain
    //      join. BloomJoinSpec pins the plan shape (probe below the
    //      exchange, codegen'd); BloomBench measures the shuffle cut.
    //      expectedNdv overestimates (wastes bits, never correctness).
    "q70_bloom_join" -> Q(
      (s, d) => {
        val urgent = orders(s, d)
          .filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_orderkey").as("l_orderkey"))
        val li = lineitem(s, d).select(col("l_orderkey"),
          col("l_extendedprice"), col("l_discount"), col("l_returnflag"))
        BloomJoin.bloomEquiJoin(s, li, urgent, "l_orderkey", expectedNdv = 100000)
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n_items"),
            cents(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue_cents"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag, count(*) AS n_items,
             |  CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_cents
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |WHERE o_orderpriority = '1-URGENT'
             |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // ---- Z-ORDER clustered layout ([[graft.io.Layout.zorderWrite]]):
    //      lineitem rewritten clustered along the Morton curve of
    //      (l_partkey, l_suppkey), then a RECTANGLE predicate on both
    //      columns reads it back. The entry pins that the layout
    //      rewrite PRESERVES the data (oracle = the same rectangle on
    //      the original table); the scan-byte cut the clustering exists
    //      for is measured in LayoutBench (BASELINE.md) — row-group
    //      min/max pruning is an IO effect, invisible to row results.
    "q71_zorder_scan" -> Q(
      (s, d) => {
        val dir = zorderDirFor(s, d)
        s.read.parquet(dir)
          .filter(col("l_partkey").between(100, 300) &&
            col("l_suppkey").between(10, 40))
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n_items"), sum(col("l_quantity")).as("sum_qty"),
            cents(col("l_extendedprice")).as("sum_base_cents"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag, count(*) AS n_items, sum(l_quantity) AS sum_qty,
             |  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_base_cents
             |FROM lineitem
             |WHERE l_partkey BETWEEN 100 AND 300 AND l_suppkey BETWEEN 10 AND 40
             |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // ---- PIVOT: long → wide reshaping with EXPLICIT value columns
    //      (the scale-safe form — Spark's value-discovering overload
    //      runs an extra distinct scan and caps at
    //      spark.sql.pivotMaxValues; declaring them keeps one pass).
    //      Absent (month, priority) cells coalesce to 0 so both
    //      engines agree on missing combinations. ----
    "q90_pivot_priority" -> Q(
      (s, d) => orders(s, d)
        .withColumn("mon", date_format(col("o_orderdate"), "yyyy-MM"))
        .groupBy("mon")
        .pivot("o_orderpriority",
          Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
        .agg(count(lit(1)))
        .select(col("mon"),
          coalesce(col("1-URGENT"), lit(0L)).as("urgent"),
          coalesce(col("2-HIGH"), lit(0L)).as("high"),
          coalesce(col("3-MEDIUM"), lit(0L)).as("medium"),
          coalesce(col("4-NOT SPECIFIED"), lit(0L)).as("notspec"),
          coalesce(col("5-LOW"), lit(0L)).as("low"))
        .orderBy("mon"),
      Some("""SELECT strftime(o_orderdate, '%Y-%m') AS mon,
             |  count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS urgent,
             |  count(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS high,
             |  count(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS medium,
             |  count(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS notspec,
             |  count(*) FILTER (WHERE o_orderpriority = '5-LOW') AS low
             |FROM orders GROUP BY mon ORDER BY mon""".stripMargin)),

    // ---- UNPIVOT: wide → long (Dataset.unpivot, the melt shape);
    //      measures are pre-rounded to integer cents so the per-measure
    //      sums stay order-independent and exact ----
    "q91_unpivot_measures" -> Q(
      (s, d) => lineitem(s, d)
        .select(col("l_orderkey"),
          round(col("l_quantity") * 100, 0).cast("long").as("quantity_c"),
          round(col("l_extendedprice") * 100, 0).cast("long").as("extendedprice_c"),
          round(col("l_discount") * 100, 0).cast("long").as("discount_c"),
          round(col("l_tax") * 100, 0).cast("long").as("tax_c"))
        .unpivot(Array(col("l_orderkey")),
          Array(col("quantity_c"), col("extendedprice_c"),
            col("discount_c"), col("tax_c")),
          "measure", "cents")
        .groupBy("measure")
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"))
        .orderBy("measure"),
      Some("""SELECT measure, count(*) AS n, CAST(sum(c) AS BIGINT) AS sum_cents
             |FROM (
             |  SELECT 'quantity_c' AS measure, CAST(round(l_quantity*100) AS BIGINT) AS c FROM lineitem
             |  UNION ALL
             |  SELECT 'extendedprice_c', CAST(round(l_extendedprice*100) AS BIGINT) FROM lineitem
             |  UNION ALL
             |  SELECT 'discount_c', CAST(round(l_discount*100) AS BIGINT) FROM lineitem
             |  UNION ALL
             |  SELECT 'tax_c', CAST(round(l_tax*100) AS BIGINT) FROM lineitem) t
             |GROUP BY measure ORDER BY measure""".stripMargin)),
  )

  /** one z-ordered lineitem rewrite per dataset for the q71 entry */
  private val zordered = scala.collection.concurrent.TrieMap[String, String]()

  private def zorderDirFor(s: SparkSession, d: String): String =
    zordered.getOrElseUpdate(d, {
      val work = java.nio.file.Files.createTempDirectory("graft-q71")
      sys.addShutdownHook {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm))
          f.delete(); ()
        }
        rm(work.toFile)
      }
      graft.io.Layout.zorderWrite(s, lineitem(s, d),
        "l_partkey", "l_suppkey", work.toString, files = 8)
      work.toString
    })
}
