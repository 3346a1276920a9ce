package graft.rel

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import scala.collection.immutable.ListMap
import graft.rel.RelQueries.Q
import graft.rel.Tables

/** ENGINE-PARITY PINS — entries whose point is the SEMANTICS, not the
  * analytics: SQL null behavior and typed DECIMAL arithmetic are the
  * two places engines classically diverge, so each gets a driver-gated
  * entry that would go red the day this engine (or an upgrade of it)
  * drifts from the ANSI behavior the oracle replays.
  */
object Parity {

  val all: ListMap[String, Q] = ListMap(
    // ---- q222: NULL-SEMANTICS MATRIX — one relation exercising the
    //      ANSI null rules an engine must honor together: a NULL
    //      grouping key groups as its own row (pinned NULLS FIRST both
    //      dialects), count(*) counts rows while count(col)/sum/min/max
    //      skip nulls, a distinct count ignores nulls, and coalesce
    //      re-defaults a null aggregate input. Nullable columns are
    //      DERIVED (nullif / key-residue masking) so the fixture's
    //      non-null schema still exercises every rule. ----
    "q222_null_semantics" -> Q(
      (s, d) => {
        val o = Tables.orders(s, d).select(
          nullif(col("o_orderstatus"), lit("O")).as("grp"),
          when(col("o_orderkey") % 10 === 0, lit(null).cast("long"))
            .otherwise(round(col("o_totalprice") * 100, 0).cast("long"))
            .as("cents_n"),
          nullif(col("o_orderpriority"), lit("1-URGENT")).as("prio_n"))
        o.groupBy("grp")
          .agg(count(lit(1)).as("n_rows"),
            count(col("cents_n")).as("n_nonnull"),
            sum(col("cents_n")).as("sum_cents"),
            min(col("cents_n")).as("min_cents"),
            max(col("cents_n")).as("max_cents"),
            countDistinct(col("prio_n")).as("n_prio"),
            coalesce(sum(when(lit(false), lit(1L))), lit(0L)).as("sum_empty"))
          .orderBy(col("grp").asc_nulls_first)
      },
      Some("""WITH o AS (SELECT nullif(o_orderstatus, 'O') AS grp,
             |    CASE WHEN o_orderkey % 10 = 0 THEN NULL
             |      ELSE CAST(round(o_totalprice * 100) AS BIGINT) END AS cents_n,
             |    nullif(o_orderpriority, '1-URGENT') AS prio_n
             |  FROM orders)
             |SELECT grp, count(*) AS n_rows,
             |  count(cents_n) AS n_nonnull,
             |  CAST(sum(cents_n) AS BIGINT) AS sum_cents,
             |  CAST(min(cents_n) AS BIGINT) AS min_cents,
             |  CAST(max(cents_n) AS BIGINT) AS max_cents,
             |  count(DISTINCT prio_n) AS n_prio,
             |  coalesce(CAST(sum(CASE WHEN false THEN 1 END) AS BIGINT), 0)
             |    AS sum_empty
             |FROM o GROUP BY grp
             |ORDER BY grp NULLS FIRST""".stripMargin)),

    // ---- q223: TYPED-DECIMAL MONEY PIPELINE — the cents-long house
    //      rule sidesteps decimals; this entry pins the typed road
    //      instead: money summed exactly and surfaced as DECIMAL(38,2)
    //      on both wires. The one double→fixed-point rounding step is
    //      routed through the PROVEN-PORTABLE form (round(x*100) →
    //      BIGINT cents, hash-green in ~40 other entries) rather than a
    //      direct double→DECIMAL(12,2) cast: r8 showed that cast's
    //      rounding can be manufactured into a .5 tie by an engine's
    //      internal rint(x*100) path, and rounding-mode/version drift
    //      between Spark's HALF_UP setScale and the driver's DuckDB
    //      then costs a cent in sum/min/max. Cents→DECIMAL(38,2)/100
    //      is exact at 2dp (no tie can exist), so the typed wire stays
    //      while the only rounding is the portable one. ----
    "q223_decimal_money" -> Q(
      (s, d) => {
        val cents = round(col("o_totalprice") * 100, 0).cast("long")
        def money(c: org.apache.spark.sql.Column) =
          (c.cast(DecimalType(38, 2)) / 100).cast(DecimalType(38, 2))
        Tables.orders(s, d)
          .select(col("o_orderpriority"), cents.as("cents"))
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n_orders"),
            money(sum(col("cents"))).as("sum_money"),
            money(min(col("cents"))).as("min_money"),
            money(max(col("cents"))).as("max_money"))
          .orderBy("o_orderpriority")
      },
      Some("""WITH o AS (SELECT o_orderpriority,
             |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
             |  FROM orders)
             |SELECT o_orderpriority, count(*) AS n_orders,
             |  CAST(CAST(sum(cents) AS DECIMAL(38,2)) / 100 AS DECIMAL(38,2))
             |    AS sum_money,
             |  CAST(CAST(min(cents) AS DECIMAL(38,2)) / 100 AS DECIMAL(38,2))
             |    AS min_money,
             |  CAST(CAST(max(cents) AS DECIMAL(38,2)) / 100 AS DECIMAL(38,2))
             |    AS max_money
             |FROM o GROUP BY o_orderpriority
             |ORDER BY o_orderpriority""".stripMargin)),

    // ---- q226: HIGHER-ORDER ARRAY FUNCTIONS — the lambda surface
    //      (transform / filter / aggregate-fold / element_at with
    //      negative index) exercised end-to-end on a DETERMINISTIC
    //      array (collect_list is order-free only after sort_array —
    //      that pin is half the point) and replayed through DuckDB's
    //      list lambdas. All integer arithmetic, so the fold equals
    //      the flat sum and every output hash-compares. ----
    "q226_array_lambdas" -> Q(
      (s, d) => {
        val arr = Tables.orders(s, d)
          .select(col("o_orderpriority"),
            round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
          .groupBy("o_orderpriority")
          .agg(sort_array(collect_list(col("cents"))).as("l"))
        arr.select(col("o_orderpriority"),
            size(col("l")).cast("long").as("n_vals"),
            aggregate(col("l"), lit(0L), (acc, x) => acc + x).as("sum_cents"),
            size(filter(col("l"), x => x % 2 === 0)).cast("long").as("n_even"),
            (element_at(col("l"), 1) + element_at(col("l"), -1))
              .as("head_plus_tail"),
            size(filter(col("l"), x => x > lit(30000000L))).cast("long")
              .as("n_big"))
          .orderBy("o_orderpriority")
      },
      Some("""WITH a AS (SELECT o_orderpriority,
             |    list_sort(list(CAST(round(o_totalprice * 100) AS BIGINT))) AS l
             |  FROM orders GROUP BY 1)
             |SELECT o_orderpriority,
             |  CAST(len(l) AS BIGINT) AS n_vals,
             |  CAST(list_sum(l) AS BIGINT) AS sum_cents,
             |  CAST(len(list_filter(l, x -> x % 2 = 0)) AS BIGINT) AS n_even,
             |  CAST(l[1] + l[-1] AS BIGINT) AS head_plus_tail,
             |  CAST(len(list_filter(l, x -> x > 30000000)) AS BIGINT) AS n_big
             |FROM a ORDER BY o_orderpriority""".stripMargin)),

    // ---- q230: WIRE-TYPE PARITY MATRIX — one row per priority class
    //      carrying every wire type the driver's typed hash compares
    //      (string key, bigint, double, DECIMAL(38,2), timestamp, date,
    //      array<bigint>), each derived by the proven-portable rule for
    //      its type: ints exact, the double as ONE fixed division of
    //      exact ints rounded to 6, the decimal via integer cents, the
    //      timestamp as a date→midnight cast, the array as a 2-element
    //      sorted pin. The regression mate of tools/check_oracle.py's
    //      driver-hash-faithful compare: if any type's rendering or
    //      rounding drifts between engines (the r8 q223 failure mode),
    //      this single entry localizes WHICH type went red. ----
    "q230_wire_types" -> Q(
      (s, d) => {
        val cents = round(col("o_totalprice") * 100, 0).cast("long")
        Tables.orders(s, d)
          .select(col("o_orderpriority"), cents.as("cents"),
            col("o_orderdate"))
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n_orders"),
            sum(col("cents")).as("sum_cents"),
            round(sum(col("cents")).cast("double") /
              count(lit(1)).cast("double"), 6).as("avg_cents_r6"),
            (sum(col("cents")).cast(DecimalType(38, 2)) / 100)
              .cast(DecimalType(38, 2)).as("sum_money"),
            to_date(max(col("o_orderdate"))).as("last_date"),
            // NTZ on the wire (the Scd.scala house rule): Spark's parquet
            // then carries naive micros, the same arrow type DuckDB emits
            max(col("o_orderdate")).cast("timestamp_ntz").as("last_ts"),
            array(min(col("cents")), max(col("cents"))).as("cents_range"))
          .orderBy("o_orderpriority")
      },
      Some("""WITH o AS (SELECT o_orderpriority,
             |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             |    o_orderdate
             |  FROM orders)
             |SELECT o_orderpriority, count(*) AS n_orders,
             |  CAST(sum(cents) AS BIGINT) AS sum_cents,
             |  round(CAST(sum(cents) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
             |    AS avg_cents_r6,
             |  CAST(CAST(sum(cents) AS DECIMAL(38,2)) / 100 AS DECIMAL(38,2))
             |    AS sum_money,
             |  CAST(max(o_orderdate) AS DATE) AS last_date,
             |  max(o_orderdate) AS last_ts,
             |  [CAST(min(cents) AS BIGINT), CAST(max(cents) AS BIGINT)]
             |    AS cents_range
             |FROM o GROUP BY o_orderpriority
             |ORDER BY o_orderpriority""".stripMargin))
  )
}
