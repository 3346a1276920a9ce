package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.rel.RelQueries.Q
import graft.rel.Tables

/** GRAPH AUTHORITY — PageRank (Page et al. 1999) in FIXED-POINT integer
  * arithmetic. Corpus curation uses link-graph authority as a quality
  * prior (Common Crawl ranks hosts harmonically/PageRank-ly and data
  * pipelines mix by it), so the engine carries the operator natively.
  *
  * Why fixed-point: floating-point PageRank sums in-contributions in
  * partition order — different engines (or two runs of the same engine)
  * sum in different orders and drift in the last bits, compounding per
  * iteration, which makes exact cross-engine verification impossible.
  * Here rank mass is an INTEGER (1e12 micro-units across the graph):
  * shares are integer division `r div deg`, damping is `(num * x) div
  * den` — integer sums are order-independent, so ITERATION-FOR-
  * ITERATION the result is bit-exact on any engine, and the DuckDB
  * oracle replays all five iterations as chained CTEs and matches by
  * hash, not by tolerance. The cost is bounded truncation error
  * (< outdeg micro-units per node per iteration — at 1e12 total mass,
  * relative error ~1e-9·deg); the determinism is worth far more than
  * the ninth decimal of a quality prior.
  *
  * Scale shape (100 TB): the edge table is the big side — it is
  * shuffled ONCE (repartition by src, cached); each iteration moves
  * only the rank table (16-byte rows, one row per node) through a join
  * keyed like the cached edges plus one message aggregation keyed by
  * dst — the Pregel message pattern on DataFrames. Lineage is cut per
  * iteration with localCheckpoint (the q49 connected-components
  * pattern; swap to reliable checkpoint() on preemptible clusters).
  * Driver state: nothing but the node count.
  *
  * Contract: `edges` is the DIRECTED edge list (u → v); pass both
  * directions for an undirected graph. The node universe is the set of
  * sources (every node must have outdeg ≥ 1 — true by construction for
  * symmetrized graphs); rank mass reaching a sink that never appears
  * as a source leaks, the standard simplified-PageRank treatment —
  * callers who need dangling-mass redistribution symmetrize instead.
  */
object PageRank {

  /** Fixed-point PageRank over `edges` (cols `u`, `v`): returns
    * (node, rank_fp) with Σ rank_fp ≤ `mass` (truncation only).
    * Damping d = dampNum/dampDen (default 85/100);
    * r'(v) = (mass div n · (den−num)) div den + (num · Σ_{u→v} r(u)
    * div deg(u)) div den — all operations on longs.
    */
  def pagerankFixedPoint(s: SparkSession, edges: DataFrame, iters: Int = 5,
      dampNum: Int = 85, dampDen: Int = 100,
      mass: Long = 1000000000000L,
      distinctInput: Boolean = false): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    require(dampNum > 0 && dampNum < dampDen, s"need 0 < num < den: $dampNum/$dampDen")
    val ed0 = edges.select(col("u").cast("long"), col("v").cast("long"))
    // distinctInput = caller guarantees `edges` is already a distinct
    // directed pair table (the q116/q132 trade graph: a symmetrized
    // union of a DISTINCT bipartite half — disjoint orientations),
    // skipping the dedup exchange (r15 opt, guide §2.4)
    val ed = (if (distinctInput) ed0 else ed0.distinct())
      .repartition(col("u")) // the one edge shuffle; reused every iteration
      .cache()
    val deg = ed.groupBy("u").agg(count(lit(1)).as("d")).cache()
    val n = deg.count()
    require(n > 0, "empty edge set")
    val rUnit = mass / n
    val base = (rUnit * (dampDen - dampNum)) / dampDen
    // the static out-degree rides INSIDE the rank state (node, d, r):
    // the share projection is then a narrow map — the per-iteration
    // plan is exactly one edge join + one message aggregation + the
    // node-universe join, nothing else
    var ranks = deg.select(col("u").as("node"), col("d"), lit(rUnit).as("r"))
      .localCheckpoint()
    for (i <- 1 to iters) {
      val shares = ranks.select(col("node").as("u"), expr("r div d").as("share"))
      val inSums = ed.join(shares, "u")
        .groupBy(col("v").as("node")).agg(sum("share").as("insum"))
      // left join from the node universe: a node nobody links to still
      // holds its base rank (cannot happen on symmetrized graphs, but
      // the operator contract is directed)
      ranks = deg.select(col("u").as("node"), col("d"))
        .join(inSums, Seq("node"), "left")
        .select(col("node"), col("d"),
          (lit(base) + expr(s"($dampNum * coalesce(insum, 0L)) div $dampDen")).as("r"))
      // lineage cut every SECOND iteration (and at the end): an eager
      // localCheckpoint is a full job, and a plan two iterations deep
      // is still trivially small — halving the materializations shaves
      // the per-iteration fixed cost that dominates locally
      if (i % 2 == 0 || i == iters) ranks = ranks.localCheckpoint()
    }
    // ranks are materialized (eager localCheckpoint) — the cached edge
    // and degree tables are no longer reachable from the result plan,
    // so release their executor storage instead of leaking it into a
    // long-lived session (the serving-path cache-leak lesson)
    ed.unpersist()
    deg.unpersist()
    ranks.select(col("node"), col("r"))
  }

  /** Fixed-point PERSONALIZED PageRank: the restart mass returns to the
    * `seeds` set instead of spreading uniformly — the "relevance to
    * these entities" primitive (related-item retrieval, fraud-ring
    * proximity, seed-expansion labeling). Same exact-long arithmetic as
    * [[pagerankFixedPoint]], so the unrolled-CTE oracle pins every
    * iteration: seeds start with `mass div |S|` each, everyone else 0;
    * r'(v) = [v∈S]·(runit·(den−num)) div den
    *         + (num · Σ_{u→v} r(u) div deg(u)) div den.
    *
    * Scale shape (100 TB): identical to pagerankFixedPoint — edges
    * shuffle once and are reused cached; the seed membership table is
    * broadcast into both the init and per-iteration projections (seed
    * sets are small by definition — they're the query); per-iteration
    * traffic is one share map + one message agg, lineage cut per
    * round. Driver state: |S| and n only.
    */
  def personalizedPagerank(s: SparkSession, edges: DataFrame, seeds: DataFrame,
      iters: Int = 5, dampNum: Int = 85, dampDen: Int = 100,
      mass: Long = 1000000000000L,
      distinctInput: Boolean = false): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    require(dampNum > 0 && dampNum < dampDen, s"need 0 < num < den: $dampNum/$dampDen")
    val ed0 = edges.select(col("u").cast("long"), col("v").cast("long"))
    // distinctInput: see pagerankFixedPoint (r15 opt, guide §2.4)
    val ed = (if (distinctInput) ed0 else ed0.distinct())
      .repartition(col("u"))
      .cache()
    val deg = ed.groupBy("u").agg(count(lit(1)).as("d")).cache()
    // seeds restricted to the node universe (a seed with no out-edges
    // could never share its rank — excluding it keeps mass accounting
    // honest), deduplicated, broadcast everywhere it's joined
    val sd = broadcast(seeds.select(col("node").cast("long").as("node"))
      .distinct()
      .join(deg.select(col("u").as("node")), "node")
      .withColumn("is_seed", lit(1L)))
      .cache()
    val k = sd.count()
    require(k > 0, "no seed appears in the edge set's source universe")
    val rUnit = mass / k
    val base = (rUnit * (dampDen - dampNum)) / dampDen
    // static per-node facts (out-degree + the seed-conditional restart
    // term) fold into ONE cached node table and ride inside the rank
    // state, so an iteration is a narrow share map + the edge join +
    // the message agg + one node-universe join — no per-iteration deg
    // or seed joins
    val nodeBase = deg.select(col("u").as("node"), col("d"))
      .join(sd, Seq("node"), "left")
      .select(col("node"), col("d"),
        when(col("is_seed").isNotNull, lit(base)).otherwise(lit(0L)).as("bt"),
        when(col("is_seed").isNotNull, lit(rUnit)).otherwise(lit(0L)).as("r0"))
      .cache()
    var ranks = nodeBase.select(col("node"), col("d"), col("r0").as("r"))
      .localCheckpoint()
    for (i <- 1 to iters) {
      val shares = ranks.select(col("node").as("u"), expr("r div d").as("share"))
      val inSums = ed.join(shares, "u")
        .groupBy(col("v").as("node")).agg(sum("share").as("insum"))
      ranks = nodeBase.select(col("node"), col("d"), col("bt"))
        .join(inSums, Seq("node"), "left")
        .select(col("node"), col("d"),
          (col("bt") +
            expr(s"($dampNum * coalesce(insum, 0L)) div $dampDen")).as("r"))
      if (i % 2 == 0 || i == iters) ranks = ranks.localCheckpoint()
    }
    ed.unpersist()
    deg.unpersist()
    sd.unpersist()
    nodeBase.unpersist()
    ranks.select(col("node"), col("r"))
  }

  /** WEIGHTED fixed-point PageRank: rank flows along edges in
    * proportion to integer edge weights — r'(v) = base + num·Σ_{u→v}
    * ((r(u)·w_uv) div W_u) div den with W_u = Σ out-weights. The
    * natural form for co-occurrence graphs where tie strength matters
    * (a customer-supplier pair with 40 shared orders should pull more
    * authority than one with 1). Same all-long arithmetic and scale
    * shape as [[pagerankFixedPoint]]: exact, unrolled-CTE-pinnable;
    * r·w stays exact while rank mass (1e12) × max weight < 2⁶³
    * (weights to ~10⁶ are safe).
    */
  def weightedPagerank(s: SparkSession, edges: DataFrame, iters: Int = 5,
      dampNum: Int = 85, dampDen: Int = 100,
      mass: Long = 1000000000000L,
      preAggregated: Boolean = false): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    require(dampNum > 0 && dampNum < dampDen, s"need 0 < num < den: $dampNum/$dampDen")
    val ed0 = edges.select(col("u").cast("long").as("u"),
      col("v").cast("long").as("v"), col("w").cast("long").as("w"))
    // preAggregated = caller guarantees one row per (u, v) (the q146
    // build: a symmetrized union of a groupBy output — disjoint
    // orientations of unique pairs), skipping the weight-merge
    // exchange; the default path still merges duplicate edges by
    // adding their weights (r15 opt, guide §2.4)
    val ed = (if (preAggregated) ed0
      else ed0.groupBy("u", "v").agg(sum("w").as("w")))
      .repartition(col("u"))
      .cache()
    val deg = ed.groupBy("u").agg(sum("w").as("wu")).cache()
    val n = deg.count()
    require(n > 0, "empty edge set")
    val rUnit = mass / n
    val base = (rUnit * (dampDen - dampNum)) / dampDen
    // the static out-weight rides inside the rank state (node, wu, r):
    // per-edge shares need r and wu at the source, which the state
    // already carries — an iteration is the edge join + the message
    // agg + one node-universe join, no per-iteration deg join
    var ranks = deg.select(col("u").as("node"), col("wu"), lit(rUnit).as("r"))
      .localCheckpoint()
    for (i <- 1 to iters) {
      val inSums = ed
        .join(ranks, ed("u") === ranks("node"))
        .select(col("v"), expr("(r * w) div wu").as("share"))
        .groupBy(col("v").as("node")).agg(sum("share").as("insum"))
      ranks = deg.select(col("u").as("node"), col("wu"))
        .join(inSums, Seq("node"), "left")
        .select(col("node"), col("wu"),
          (lit(base) + expr(s"($dampNum * coalesce(insum, 0L)) div $dampDen")).as("r"))
      if (i % 2 == 0 || i == iters) ranks = ranks.localCheckpoint()
    }
    ed.unpersist()
    deg.unpersist()
    ranks.select(col("node"), col("r"))
  }

  /** q116: authority over the customer↔supplier TRADE GRAPH — an edge
    * per (customer, supplier) pair that co-occurs in an order
    * (orders ⋈ lineitem), symmetrized; nodes disambiguate by parity
    * (customer 2k, supplier 2k+1). 5 iterations at d = 0.85 over 1e12
    * micro-units. The oracle unrolls the five iterations as chained
    * CTEs in exact BIGINT arithmetic — chain-equality is the strongest
    * pin an iterative operator can get.
    */
  private def tradeEdges(s: SparkSession, d: String): DataFrame = {
    val e0 = Tables.orders(s, d).join(Tables.lineitem(s, d),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey").cast("long") * 2).as("u"),
        (col("l_suppkey").cast("long") * 2 + 1).as("v"))
      .distinct()
    e0.unionAll(e0.select(col("v").as("u"), col("u").as("v")))
  }

  private val oracleSql: String = {
    val mass = 1000000000000L
    // one iteration: v's new rank from prev table `p`
    def iter(prev: String, cur: String): String =
      s"""$cur AS (
         |  SELECT d0.u AS node,
         |    (SELECT base FROM consts) +
         |      (85 * coalesce(m.s, 0)) // 100 AS r
         |  FROM deg d0 LEFT JOIN (
         |    SELECT ed.v, CAST(sum($prev.r // deg.d) AS BIGINT) AS s
         |    FROM ed JOIN $prev ON ed.u = $prev.node
         |            JOIN deg ON ed.u = deg.u
         |    GROUP BY ed.v) m ON m.v = d0.u)""".stripMargin
    s"""WITH e0 AS (
       |  SELECT DISTINCT o.o_custkey * 2 AS u, l.l_suppkey * 2 + 1 AS v
       |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
       |ed AS (SELECT u, v FROM e0 UNION SELECT v, u FROM e0),
       |deg AS (SELECT u, count(*) AS d FROM ed GROUP BY u),
       |consts AS (
       |  SELECT CAST($mass AS BIGINT) // count(*) AS runit,
       |    (CAST($mass AS BIGINT) // count(*)) * 15 // 100 AS base
       |  FROM deg),
       |r0 AS (SELECT u AS node, (SELECT runit FROM consts) AS r FROM deg),
       |${(1 to 5).map(i => iter(s"r${i - 1}", s"r$i")).mkString(",\n")}
       |SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS kind,
       |  node // 2 AS key, CAST(r AS BIGINT) AS rank_fp
       |FROM r5
       |ORDER BY rank_fp DESC, kind, key""".stripMargin
  }

  /** q132's oracle: the q116 preamble plus a seed CTE; restart mass
    * (base) is paid only to seed rows, each iteration replayed in exact
    * BIGINT arithmetic.
    */
  private val pprOracleSql: String = {
    val mass = 1000000000000L
    def iter(prev: String, cur: String): String =
      s"""$cur AS (
         |  SELECT d0.u AS node,
         |    CASE WHEN d0.u IN (SELECT node FROM sd)
         |      THEN (SELECT base FROM consts) ELSE CAST(0 AS BIGINT) END +
         |      (85 * coalesce(m.s, 0)) // 100 AS r
         |  FROM deg d0 LEFT JOIN (
         |    SELECT ed.v, CAST(sum($prev.r // deg.d) AS BIGINT) AS s
         |    FROM ed JOIN $prev ON ed.u = $prev.node
         |            JOIN deg ON ed.u = deg.u
         |    GROUP BY ed.v) m ON m.v = d0.u)""".stripMargin
    s"""WITH e0 AS (
       |  SELECT DISTINCT o.o_custkey * 2 AS u, l.l_suppkey * 2 + 1 AS v
       |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
       |ed AS (SELECT u, v FROM e0 UNION SELECT v, u FROM e0),
       |deg AS (SELECT u, count(*) AS d FROM ed GROUP BY u),
       |sd AS (SELECT DISTINCT s_suppkey * 2 + 1 AS node FROM supplier
       |  WHERE s_nationkey = 0
       |    AND s_suppkey * 2 + 1 IN (SELECT u FROM deg)),
       |consts AS (
       |  SELECT CAST($mass AS BIGINT) // count(*) AS runit,
       |    (CAST($mass AS BIGINT) // count(*)) * 15 // 100 AS base
       |  FROM sd),
       |r0 AS (SELECT u AS node,
       |    CASE WHEN u IN (SELECT node FROM sd)
       |      THEN (SELECT runit FROM consts) ELSE CAST(0 AS BIGINT) END AS r
       |  FROM deg),
       |${(1 to 5).map(i => iter(s"r${i - 1}", s"r$i")).mkString(",\n")}
       |SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS kind,
       |  node // 2 AS key, CAST(r AS BIGINT) AS rank_fp
       |FROM r5
       |ORDER BY rank_fp DESC, kind, key""".stripMargin
  }

  val all: ListMap[String, Q] = ListMap(
    "q116_pagerank" -> Q(
      (s, d) => pagerankFixedPoint(s, tradeEdges(s, d), iters = 5,
          distinctInput = true)
        .select(
          when(col("node") % 2 === 0, lit("customer")).otherwise(lit("supplier"))
            .as("kind"),
          expr("node div 2").as("key"), col("r").as("rank_fp"))
        .orderBy(desc("rank_fp"), col("kind"), col("key")),
      Some(oracleSql)),

    // ---- q146: the trade graph with TIE-STRENGTH weights (edge weight
    //      = distinct orders linking the pair): rank flows in
    //      proportion to relationship volume. Exact-long recurrence,
    //      all five iterations unrolled in the oracle with the
    //      weighted-share term ----
    "q146_weighted_pagerank" -> Q(
      (s, d) => {
        val e0 = Tables.orders(s, d).join(Tables.lineitem(s, d),
            col("o_orderkey") === col("l_orderkey"))
          .groupBy((col("o_custkey").cast("long") * 2).as("u"),
            (col("l_suppkey").cast("long") * 2 + 1).as("v"))
          .agg(countDistinct(col("o_orderkey")).as("w"))
        val ed = e0.unionAll(e0.select(col("v").as("u"), col("u").as("v"), col("w")))
        weightedPagerank(s, ed, iters = 5, preAggregated = true)
          .select(
            when(col("node") % 2 === 0, lit("customer")).otherwise(lit("supplier"))
              .as("kind"),
            expr("node div 2").as("key"), col("r").as("rank_fp"))
          .orderBy(desc("rank_fp"), col("kind"), col("key"))
      },
      Some {
        val mass = 1000000000000L
        def iter(prev: String, cur: String): String =
          s"""$cur AS (
             |  SELECT d0.u AS node,
             |    (SELECT base FROM consts) +
             |      (85 * coalesce(m.s, 0)) // 100 AS r
             |  FROM deg d0 LEFT JOIN (
             |    SELECT ed.v, CAST(sum(($prev.r * ed.w) // deg.wu) AS BIGINT) AS s
             |    FROM ed JOIN $prev ON ed.u = $prev.node
             |            JOIN deg ON ed.u = deg.u
             |    GROUP BY ed.v) m ON m.v = d0.u)""".stripMargin
        s"""WITH e0 AS (
           |  SELECT o.o_custkey * 2 AS u, l.l_suppkey * 2 + 1 AS v,
           |    count(DISTINCT o.o_orderkey) AS w
           |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
           |  GROUP BY 1, 2),
           |ed AS (SELECT u, v, w FROM e0 UNION ALL SELECT v, u, w FROM e0),
           |deg AS (SELECT u, sum(w) AS wu FROM ed GROUP BY u),
           |consts AS (
           |  SELECT CAST($mass AS BIGINT) // count(*) AS runit,
           |    (CAST($mass AS BIGINT) // count(*)) * 15 // 100 AS base
           |  FROM deg),
           |r0 AS (SELECT u AS node, (SELECT runit FROM consts) AS r FROM deg),
           |${(1 to 5).map(i => iter(s"r${i - 1}", s"r$i")).mkString(",\n")}
           |SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS kind,
           |  node // 2 AS key, CAST(r AS BIGINT) AS rank_fp
           |FROM r5
           |ORDER BY rank_fp DESC, kind, key""".stripMargin
      }),

    // ---- q132: proximity to nation-0 suppliers in the trade graph —
    //      restart mass returns to the seed set; the oracle unrolls all
    //      five iterations with the seed-conditional base term ----
    "q132_ppr" -> Q(
      (s, d) => {
        val seeds = Tables.supplier(s, d).filter(col("s_nationkey") === 0)
          .select((col("s_suppkey").cast("long") * 2 + 1).as("node"))
        personalizedPagerank(s, tradeEdges(s, d), seeds, iters = 5,
          distinctInput = true)
          .select(
            when(col("node") % 2 === 0, lit("customer")).otherwise(lit("supplier"))
              .as("kind"),
            expr("node div 2").as("key"), col("r").as("rank_fp"))
          .orderBy(desc("rank_fp"), col("kind"), col("key"))
      },
      Some(pprOracleSql)),
  )
}
