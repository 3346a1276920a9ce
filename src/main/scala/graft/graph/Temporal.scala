package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.rel.RelQueries.Q
import graft.rel.Tables

/** TEMPORAL REACHABILITY — earliest-arrival paths in a TIMESTAMPED
  * graph: an edge (u → v, t) is traversable only if t ≥ the time u was
  * reached, so "reachable" means reachable by a TIME-RESPECTING path
  * (contagion tracing, supply-chain propagation, information-flow
  * audits — where static BFS over-reports because it walks edges
  * backwards in time).
  *
  * Earliest arrival is a min-fold: arrival'(v) = min over edges
  * (u→v, t ≥ arrival(u)) of t — a monotone fixed point, merged by MIN,
  * so iteration order and partitioning cannot change the result and a
  * fixed unrolled round count is oracle-replayable round by round
  * (rounds past the fixpoint are no-ops, the q123 discipline).
  *
  * Scale shape (100 TB): the timestamped edge list shuffles once
  * (repartitioned by src, cached); each round moves only the frontier
  * arrival table (16-byte rows) through one join + one min-agg;
  * lineage cut per round. No driver state beyond the round counter.
  */
object Temporal {

  /** Earliest time-respecting arrival from `seeds` (col `node`, arrival
    * time 0) over `edges` (cols `u`, `v`, `t` — integer timestamps).
    * Runs exactly `rounds` rounds (hops); returns (node, at) for every
    * node reached within them, including seeds at 0.
    */
  def earliestArrival(s: SparkSession, edges: DataFrame, seeds: DataFrame,
      rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1: $rounds")
    val ed = edges.select(col("u").cast("long"), col("v").cast("long"),
        col("t").cast("long"))
      .repartition(col("u"))
      .cache()
    var arr = seeds.select(col("node").cast("long").as("node"), lit(0L).as("at"))
      .distinct()
      .localCheckpoint()
    for (_ <- 1 to rounds) {
      val nxt = ed.join(arr, ed("u") === arr("node") && col("t") >= col("at"))
        .select(col("v").as("node"), col("t").as("at"))
      arr = arr.unionAll(nxt)
        .groupBy("node").agg(min("at").as("at"))
        .localCheckpoint()
    }
    ed.unpersist()
    arr
  }

  /** q181: supply-chain propagation over the TEMPORAL trade graph —
    * each order links its customer and supplier in both directions at
    * the order's epoch-day; seeds are nation-0 suppliers at day 0. Three
    * rounds of earliest time-respecting arrival: who is reachable, and
    * how early, when influence can only flow forward in time. The
    * oracle unrolls the three min-folds as materialized CTEs.
    */
  val all: ListMap[String, Q] = ListMap(
    "q181_temporal_reach" -> Q(
      (s, d) => {
        val e0 = Tables.orders(s, d)
          .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
          .select((col("o_custkey") * 2).as("cu"),
            (col("l_suppkey") * 2 + 1).as("su"),
            datediff(to_date(col("o_orderdate")), to_date(lit("1970-01-01")))
              .cast("long").as("t"))
          .distinct()
        val edges = e0.select(col("cu").as("u"), col("su").as("v"), col("t"))
          .unionAll(e0.select(col("su").as("u"), col("cu").as("v"), col("t")))
        val seeds = Tables.supplier(s, d).filter(col("s_nationkey") === 0)
          .select((col("s_suppkey") * 2 + 1).as("node"))
        earliestArrival(s, edges, seeds, rounds = 3)
          .select(
            when(col("node") % 2 === 0, lit("customer")).otherwise(lit("supplier"))
              .as("kind"),
            expr("node div 2").as("key"), col("at").as("earliest_day"))
          .orderBy("kind", "key")
      },
      Some {
        def round(prev: String, cur: String): String =
          s"""$cur AS MATERIALIZED (
             |  SELECT node, min(at) AS at FROM (
             |    SELECT node, at FROM $prev
             |    UNION ALL
             |    SELECT ed.v AS node, ed.t AS at
             |    FROM ed JOIN $prev p ON ed.u = p.node AND ed.t >= p.at)
             |  GROUP BY node)""".stripMargin
        s"""WITH e0 AS MATERIALIZED (
           |  SELECT DISTINCT o.o_custkey * 2 AS cu, l.l_suppkey * 2 + 1 AS su,
           |    CAST(date_diff('day', DATE '1970-01-01',
           |      CAST(o.o_orderdate AS DATE)) AS BIGINT) AS t
           |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
           |ed AS MATERIALIZED (SELECT cu AS u, su AS v, t FROM e0
           |  UNION ALL SELECT su, cu, t FROM e0),
           |a0 AS MATERIALIZED (SELECT DISTINCT s_suppkey * 2 + 1 AS node,
           |    CAST(0 AS BIGINT) AS at
           |  FROM supplier WHERE s_nationkey = 0),
           |${Seq(("a0", "a1"), ("a1", "a2"), ("a2", "a3"))
              .map { case (p, c) => round(p, c) }.mkString(",\n")}
           |SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS kind,
           |  node // 2 AS key, at AS earliest_day
           |FROM a3 ORDER BY kind, key""".stripMargin
      }),
  )
}
