package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.rel.RelQueries.Q
import graft.rel.Tables

/** BOUNDED-HOP BFS — exact shortest-path distances from a seed set,
  * capped at `maxHops`: the neighborhood/reachability primitive
  * (blast-radius queries, influence frontiers, "within 3 hops of a
  * flagged entity" fraud features). Unbounded BFS on a distributed
  * engine is a convergence loop; the BOUNDED form — which is what
  * feature pipelines actually ask for — is a fixed number of
  * relational steps, so its cost is predictable and its oracle can
  * replay every hop verbatim (chained CTEs, the q116 pattern).
  *
  * All arithmetic is integer (distances), all reductions are `min` —
  * order-independent, so the result is bit-exact on any engine.
  *
  * Scale shape (100 TB): edges shuffle once (cached, partitioned by
  * src); each hop joins the current distance table (8+8 bytes per
  * reached node) to the cached edges and min-merges — traffic per hop
  * is the reached set, not the graph. Lineage is cut per hop; caches
  * released on return.
  */
object Bfs {

  /** Distances ≤ maxHops from `seeds` (col `node`) over directed
    * `edges` (cols `u`, `v`; symmetrize for undirected semantics).
    * Output: (node, dist), one row per reached node, dist = exact
    * hop-count shortest distance (seeds at 0).
    */
  def boundedDistances(s: SparkSession, edges: DataFrame, seeds: DataFrame,
      maxHops: Int, distinctInput: Boolean = false): DataFrame = {
    require(maxHops >= 1, s"maxHops must be >= 1: $maxHops")
    val ed0 = edges.select(col("u").cast("long"), col("v").cast("long"))
    // distinctInput = caller guarantees `edges` is already a distinct
    // directed pair table (the q122 build: a symmetrized union of a
    // DISTINCT bipartite half — disjoint orientations), skipping the
    // dedup exchange (r15 opt, guide §2.4)
    val ed = (if (distinctInput) ed0 else ed0.distinct())
      .repartition(col("u"))
      .cache()
    var dist = seeds.select(col("node").cast("long").as("node"))
      .distinct()
      .withColumn("dist", lit(0L))
      .localCheckpoint()
    for (_ <- 1 to maxHops) {
      dist = dist
        .unionAll(ed.join(dist, ed("u") === dist("node"))
          .select(ed("v").as("node"), (dist("dist") + 1L).as("dist")))
        .groupBy("node").agg(min("dist").as("dist"))
        .localCheckpoint()
    }
    ed.unpersist()
    dist
  }

  /** Weighted bounded-hop shortest distances (Bellman-Ford unrolled k
    * times): like [[boundedDistances]] but each edge carries a positive
    * integer cost (col `w`) and the relaxation is `min(dist + w)`.
    * After k rounds, `dist` is the exact cheapest cost among paths of
    * ≤ k edges — the bounded form pipelines ask for, with the same
    * per-hop traffic bound (the reached set, never the graph).
    */
  def weightedDistances(s: SparkSession, edges: DataFrame, seeds: DataFrame,
      maxHops: Int): DataFrame = {
    require(maxHops >= 1, s"maxHops must be >= 1: $maxHops")
    val ed = edges.select(col("u").cast("long"), col("v").cast("long"),
        col("w").cast("long"))
      .repartition(col("u"))
      .cache()
    var dist = seeds.select(col("node").cast("long").as("node"))
      .distinct()
      .withColumn("dist", lit(0L))
      .localCheckpoint()
    for (_ <- 1 to maxHops) {
      dist = dist
        .unionAll(ed.join(dist, ed("u") === dist("node"))
          .select(ed("v").as("node"), (dist("dist") + ed("w")).as("dist")))
        .groupBy("node").agg(min("dist").as("dist"))
        .localCheckpoint()
    }
    ed.unpersist()
    dist
  }

  /** Bounded-hop WIDEST (maximum-bottleneck) paths: the dual of
    * [[weightedDistances]] — each edge carries a positive integer
    * CAPACITY (col `w`); a path's capacity is its minimum edge, and a
    * node's value is the MAXIMUM capacity over paths of ≤ k edges from
    * the seeds (seeds at Long.MaxValue, the identity of min). Max-min
    * is a monotone fold exactly like min-plus, so the same unrolled
    * oracle discipline applies. The trust/throughput propagation read:
    * "how strong is the strongest supply route into this node".
    */
  def widestPaths(s: SparkSession, edges: DataFrame, seeds: DataFrame,
      maxHops: Int): DataFrame = {
    require(maxHops >= 1, s"maxHops must be >= 1: $maxHops")
    val ed = edges.select(col("u").cast("long"), col("v").cast("long"),
        col("w").cast("long"))
      .repartition(col("u"))
      .cache()
    var cap = seeds.select(col("node").cast("long").as("node"))
      .distinct()
      .withColumn("cap", lit(Long.MaxValue))
      .localCheckpoint()
    for (_ <- 1 to maxHops) {
      cap = cap
        .unionAll(ed.join(cap, ed("u") === cap("node"))
          .select(ed("v").as("node"), least(cap("cap"), ed("w")).as("cap")))
        .groupBy("node").agg(max("cap").as("cap"))
        .localCheckpoint()
    }
    ed.unpersist()
    cap
  }

  /** q122: the 3-hop neighborhood of nation-0 suppliers in the trade
    * graph (q116's customer↔supplier edges) — every node within three
    * trade links, with its exact distance. The oracle replays all
    * three frontier expansions as chained CTEs (exact integer min).
    */
  val all: ListMap[String, Q] = ListMap(
    "q122_bfs_hops" -> Q(
      (s, d) => {
        val e0 = Tables.orders(s, d).join(Tables.lineitem(s, d),
            col("o_orderkey") === col("l_orderkey"))
          .select((col("o_custkey").cast("long") * 2).as("u"),
            (col("l_suppkey").cast("long") * 2 + 1).as("v"))
          .distinct()
        val edges = e0.unionAll(e0.select(col("v").as("u"), col("u").as("v")))
        val seeds = Tables.supplier(s, d).filter(col("s_nationkey") === 0)
          .select((col("s_suppkey").cast("long") * 2 + 1).as("node"))
        boundedDistances(s, edges, seeds, maxHops = 3, distinctInput = true)
          .select(
            when(col("node") % 2 === 0, lit("customer")).otherwise(lit("supplier"))
              .as("kind"),
            expr("node div 2").as("key"), col("dist"))
          .orderBy("dist", "kind", "key")
      },
      Some {
        def hop(prev: String, cur: String): String =
          s"""$cur AS (SELECT node, min(dist) AS dist FROM (
             |  SELECT node, dist FROM $prev
             |  UNION ALL
             |  SELECT ed.v AS node, $prev.dist + 1 AS dist
             |  FROM ed JOIN $prev ON ed.u = $prev.node) GROUP BY node)""".stripMargin
        s"""WITH e0 AS (
           |  SELECT DISTINCT o.o_custkey * 2 AS u, l.l_suppkey * 2 + 1 AS v
           |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
           |ed AS (SELECT u, v FROM e0 UNION SELECT v, u FROM e0),
           |d0 AS (SELECT DISTINCT s_suppkey * 2 + 1 AS node, CAST(0 AS BIGINT) AS dist
           |  FROM supplier WHERE s_nationkey = 0),
           |${hop("d0", "d1")},
           |${hop("d1", "d2")},
           |${hop("d2", "d3")}
           |SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS kind,
           |  node // 2 AS key, CAST(dist AS BIGINT) AS dist
           |FROM d3 ORDER BY dist, kind, key""".stripMargin
      }),

    // ---- q163: WEIGHTED SHORTEST PATHS (Bellman-Ford, 3 rounds) over
    //      the trade graph with tie-strength costs: an edge between a
    //      customer and supplier sharing n distinct orders costs
    //      1000 div n milli-units — strong ties are short, so the
    //      distance field reads as "how closely connected through the
    //      supply network". Exact integer relaxations; the oracle
    //      unrolls all three rounds. ----
    "q163_weighted_paths" -> Q(
      (s, d) => {
        val e0 = Tables.orders(s, d).join(Tables.lineitem(s, d),
            col("o_orderkey") === col("l_orderkey"))
          .groupBy((col("o_custkey").cast("long") * 2).as("u"),
            (col("l_suppkey").cast("long") * 2 + 1).as("v"))
          .agg(countDistinct(col("o_orderkey")).as("n_ord"))
          .select(col("u"), col("v"), expr("1000 div n_ord").as("w"))
        val edges = e0.unionAll(e0.select(col("v").as("u"), col("u").as("v"), col("w")))
        val seeds = Tables.supplier(s, d).filter(col("s_nationkey") === 0)
          .select((col("s_suppkey").cast("long") * 2 + 1).as("node"))
        weightedDistances(s, edges, seeds, maxHops = 3)
          .select(
            when(col("node") % 2 === 0, lit("customer")).otherwise(lit("supplier"))
              .as("kind"),
            expr("node div 2").as("key"), col("dist"))
          .orderBy("dist", "kind", "key")
      },
      Some {
        def hop(prev: String, cur: String): String =
          s"""$cur AS (SELECT node, min(dist) AS dist FROM (
             |  SELECT node, dist FROM $prev
             |  UNION ALL
             |  SELECT ed.v AS node, $prev.dist + ed.w AS dist
             |  FROM ed JOIN $prev ON ed.u = $prev.node) GROUP BY node)""".stripMargin
        s"""WITH e0 AS (
           |  SELECT o.o_custkey * 2 AS u, l.l_suppkey * 2 + 1 AS v,
           |    1000 // count(DISTINCT o.o_orderkey) AS w
           |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
           |  GROUP BY 1, 2),
           |ed AS (SELECT u, v, w FROM e0 UNION ALL SELECT v, u, w FROM e0),
           |d0 AS (SELECT DISTINCT s_suppkey * 2 + 1 AS node, CAST(0 AS BIGINT) AS dist
           |  FROM supplier WHERE s_nationkey = 0),
           |${hop("d0", "d1")},
           |${hop("d1", "d2")},
           |${hop("d2", "d3")}
           |SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS kind,
           |  node // 2 AS key, CAST(dist AS BIGINT) AS dist
           |FROM d3 ORDER BY dist, kind, key""".stripMargin
      }),

    // ---- q189: WIDEST (maximum-bottleneck) SUPPLY ROUTES — the max-min
    //      dual of q163: edge capacity = distinct shared orders, a
    //      route's strength is its weakest link, each node reports its
    //      strongest ≤3-hop route from the nation-0 suppliers. Seeds
    //      carry the max-long identity (printed as-is; the oracle uses
    //      the same literal). ----
    "q189_widest_path" -> Q(
      (s, d) => {
        val e0 = Tables.orders(s, d).join(Tables.lineitem(s, d),
            col("o_orderkey") === col("l_orderkey"))
          .groupBy((col("o_custkey").cast("long") * 2).as("u"),
            (col("l_suppkey").cast("long") * 2 + 1).as("v"))
          .agg(countDistinct(col("o_orderkey")).as("w"))
        val edges = e0.unionAll(e0.select(col("v").as("u"), col("u").as("v"), col("w")))
        val seeds = Tables.supplier(s, d).filter(col("s_nationkey") === 0)
          .select((col("s_suppkey").cast("long") * 2 + 1).as("node"))
        widestPaths(s, edges, seeds, maxHops = 3)
          .select(
            when(col("node") % 2 === 0, lit("customer")).otherwise(lit("supplier"))
              .as("kind"),
            expr("node div 2").as("key"), col("cap").as("bottleneck"))
          .orderBy(desc("bottleneck"), col("kind"), col("key"))
      },
      Some {
        def hop(prev: String, cur: String): String =
          s"""$cur AS MATERIALIZED (SELECT node, max(cap) AS cap FROM (
             |  SELECT node, cap FROM $prev
             |  UNION ALL
             |  SELECT ed.v AS node, least($prev.cap, ed.w) AS cap
             |  FROM ed JOIN $prev ON ed.u = $prev.node) GROUP BY node)""".stripMargin
        s"""WITH e0 AS MATERIALIZED (
           |  SELECT o.o_custkey * 2 AS u, l.l_suppkey * 2 + 1 AS v,
           |    CAST(count(DISTINCT o.o_orderkey) AS BIGINT) AS w
           |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
           |  GROUP BY 1, 2),
           |ed AS MATERIALIZED (SELECT u, v, w FROM e0 UNION ALL SELECT v, u, w FROM e0),
           |c0 AS MATERIALIZED (SELECT DISTINCT s_suppkey * 2 + 1 AS node,
           |    CAST(9223372036854775807 AS BIGINT) AS cap
           |  FROM supplier WHERE s_nationkey = 0),
           |${hop("c0", "c1")},
           |${hop("c1", "c2")},
           |${hop("c2", "c3")}
           |SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS kind,
           |  node // 2 AS key, CAST(cap AS BIGINT) AS bottleneck
           |FROM c3 ORDER BY bottleneck DESC, kind, key""".stripMargin
      }),
  )
}
