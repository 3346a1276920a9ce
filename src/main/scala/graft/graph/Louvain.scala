package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.rel.RelQueries.Q
import graft.rel.Tables

/** LOUVAIN-STYLE LOCAL MOVING (Blondel et al. 2008, the one-level
  * move phase), made DETERMINISTIC the way [[LabelProp]] is:
  * SYNCHRONOUS rounds where every node simultaneously evaluates
  * moving to each neighbor community (or staying), using the
  * PREVIOUS round's labeling, and adopts the gain-argmax with ties
  * broken to the SMALLEST community id. Classic Louvain is
  * sequential-sweep order-dependent; an engine whose results can't be
  * replayed can't be hash-checked, so fixed synchronous rounds (the
  * q116/q316 contract) are the shipped variant.
  *
  * The move criterion is the exact-integer form of the modularity
  * gain: moving node i (degree dᵢ) to community c scores
  *
  *   G(c) = 2m·k_{i,c} − dᵢ·Σtot_c          (c ≠ current),
  *   G(a) = 2m·k_{i,a} − dᵢ·(Σtot_a − dᵢ)   (staying — own degree
  *                                            leaves the community sum),
  *
  * where k_{i,c} counts i's edges into c and Σtot_c is c's degree
  * sum; argmax G over {own community} ∪ {neighbor communities} is
  * argmax ΔQ (the 1/2m² scaling is monotone). Products ride
  * decimal(38,0)/HUGEINT (2m·k and d·Σtot overflow a long past
  * ~2³¹ edges — the [[Modularity]] rule), so the comparison — and the
  * oracle's replay of it — is exact at any scale.
  *
  * Unlike LPA (whose plurality vote is only a proxy), the gain
  * criterion DIRECTLY optimizes the q333 quality functional —
  * degree-weighted, so a high-degree neighbor community is only
  * joined when its pull beats its size penalty, not merely because
  * it shouts the most labels.
  *
  * Fully-synchronous moving livelocks on symmetric pairs (two
  * adjacent nodes each adopt the OTHER's old community, forever —
  * observed on the two-clique fixture), so rounds alternate a
  * deterministic 2-COLORING SCHEDULE: round r moves only nodes with
  * node % 2 == r % 2, the other class holds still — the standard
  * coloring move of distributed Louvain, and still a pure function of
  * the graph. [[Modularity.modularity]] reports the landed
  * partition's quality honestly.
  *
  * Scale shape: degree and m are static (one agg each); each round is
  * one join of the cached edge table to the 16-byte label table, one
  * (node, community)-keyed count, one community-keyed degree sum
  * (both map-side combinable), and the two-agg argmax — no window
  * over nodes, no collect; lineage cut per round.
  */
object Louvain {

  /** `rounds` synchronous local-moving rounds over undirected `edges`
    * (u, v). Initial community = node id. Output: (node, community).
    */
  def localMove(s: SparkSession, edges: DataFrame, rounds: Int): DataFrame =
    localMoveWeighted(s, edges.select(col("u"), col("v"))
      .withColumn("w", lit(1L)), rounds)

  /** The WEIGHTED local-moving core — (u, v, w) undirected edges,
    * self-loops (u = v) allowed. This is what makes the classic
    * two-level pass expressible: the community quotient graph is a
    * weighted multigraph with self-loops (intra-community mass), and
    * modularity on it equals modularity of the expanded partition.
    * Degrees are weight sums (a self-loop counts TWICE — it is
    * symmetrized like any edge); k_{i,c} excludes self-loops (they
    * move with i, contributing equally to every candidate); m is the
    * total undirected weight. All quantities stay exact integers.
    */
  def localMoveWeighted(s: SparkSession, edges: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1: $rounds")
    val e = edges.select(col("u").cast("long").as("u"),
      col("v").cast("long").as("v"), col("w").cast("long").as("w"))
    val sym = e.unionAll(e.select(col("v").as("u"), col("u").as("v"), col("w")))
      .repartition(col("v")).cache()
    val deg = sym.groupBy(col("u").as("node")).agg(sum("w").as("d"))
      .localCheckpoint(true)
    // m derived from the checkpointed degrees (Σd = 2m exactly — every
    // edge, self-loops included, is counted twice in sym): the old
    // `e.agg(sum(w))` re-ran the ENTIRE upstream edge build (for the
    // driver entries: orders ⋈ lineitem + distinct; for the two-level
    // pass: the whole quotient rollup) just for one scalar (r15 opt).
    val m = deg.agg(coalesce(sum("d"), lit(0L))).first().getLong(0) / 2
    require(m > 0, "localMove: empty edge set")
    val dec38 = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
    var lab = deg.select(col("node"), col("node").as("comm"))
      .localCheckpoint(true)
    for (r <- 1 to rounds) {
      // static degree + previous label in ONE node-keyed table, shared
      // by the community-mass rollup and the gain scoring
      val labd = lab.join(deg, "node") // (node, comm, d)
      val sTot = labd.groupBy(col("comm")).agg(sum(col("d")).as("stot"))
      // i's edge weight into each neighboring community, from the
      // PREVIOUS labeling (synchronous: all nodes decide on the same
      // snapshot); self-loops excluded — they follow i everywhere.
      // The STAY option (must exist even when i has no neighbor in its
      // own community) rides the SAME aggregation as a zero-weight
      // message: sum(w..., 0) ≡ the old separate nbr-agg + max-merge,
      // one (node, cand)-keyed shuffle instead of two (r15 opt pass).
      val msgs = sym.filter(col("u") =!= col("v"))
        .join(lab.select(col("node").as("v"), col("comm").as("cv")), "v")
        .select(col("u").as("node"), col("cv").as("cand"), col("w").as("k"))
        .unionByName(lab.select(col("node"), col("comm").as("cand"),
          lit(0L).as("k")))
      val cands = msgs.groupBy("node", "cand").agg(sum(col("k")).as("k"))
      val scored = cands
        .join(labd, "node")
        .join(sTot.select(col("comm").as("cand"), col("stot")), "cand")
        .withColumn("g",
          when(col("cand") === col("comm"),
            lit(2L).cast(dec38) * lit(m) * col("k")
              - col("d").cast(dec38) * (col("stot") - col("d")))
            .otherwise(lit(2L).cast(dec38) * lit(m) * col("k")
              - col("d").cast(dec38) * col("stot")))
      // argmax in ONE aggregation: max over (g, −cand) structs ≡ max
      // gain with ties to the SMALLEST community id — the former
      // max-agg + equality self-join + min-agg collapsed (r15 opt pass)
      val winner = scored.groupBy(col("node"))
        .agg(max(struct(col("g"), (-col("cand")).as("nc"))).as("best"))
        .select(col("node"), (-col("best.nc")).as("wcomm"))
      // the coloring schedule: only this round's parity class moves
      lab = lab.join(winner, "node")
        .select(col("node"),
          when(col("node") % 2 === lit((r % 2).toLong), col("wcomm"))
            .otherwise(col("comm")).as("comm"))
        .localCheckpoint(true)
    }
    sym.unpersist()
    lab.select(col("node"), col("comm").as("community"))
  }

  /** CLASSIC TWO-LEVEL LOUVAIN (Blondel et al. 2008, move +
    * AGGREGATION + re-move): after `rounds1` local-moving rounds, the
    * graph contracts to its community QUOTIENT — one groupBy((cu,cv))
    * edge rollup, quotient-sized, with intra-community mass as
    * self-loops — `rounds2` weighted move rounds run on the quotient,
    * and the coarse labels map back through the level-1 assignment.
    * Modularity of the weighted quotient partition equals modularity
    * of the expanded partition (the identity the aggregation phase
    * rests on), so gains found on the quotient are gains on the
    * original graph — the spec pins Q(two-level) ≥ Q(one-level) on
    * the planted two-clique fixture.
    *
    * Scale shape: level 1 is [[localMoveWeighted]] on the full edge
    * set; everything after is QUOTIENT-sized (communities, not
    * nodes) — the rollup is one shuffle keyed by (cu, cv) and the
    * level-2 rounds run on a table bounded by the community count.
    * Output: (node, community) — community ids are level-1 ids.
    */
  def louvainTwoLevel(s: SparkSession, edges: DataFrame,
      rounds1: Int, rounds2: Int): DataFrame = {
    // the base edge list feeds BOTH level 1's symmetrized cache and the
    // quotient rollup — cached so the (often expensive) upstream edge
    // build runs once instead of twice (r15 opt); released as soon as
    // the checkpointed level-2 labels exist
    val e = edges.select(col("u").cast("long").as("u"),
      col("v").cast("long").as("v")).withColumn("w", lit(1L)).cache()
    val lab1 = localMoveWeighted(s, e, rounds1).localCheckpoint(true)
    val qe = e
      .join(lab1.select(col("node").as("u"), col("community").as("cu")), "u")
      .join(lab1.select(col("node").as("v"), col("community").as("cv")), "v")
      .select(least(col("cu"), col("cv")).as("u"),
        greatest(col("cu"), col("cv")).as("v"), col("w"))
      .groupBy("u", "v").agg(sum("w").as("w"))
    // lab2 is already materialized (localMoveWeighted checkpoints its
    // final labeling), so the cached edge list can be released here
    val lab2 = localMoveWeighted(s, qe, rounds2)
    e.unpersist()
    lab1.select(col("node"), col("community").as("c1"))
      .join(lab2.select(col("node").as("c1"), col("community")), "c1")
      .select(col("node"), col("community"))
  }

  /** The find+judge composition (the [[LabelProp.lpaCommunities]]
    * shape): local-moving partition scored by the exact-integer
    * modularity report.
    */
  def louvainCommunities(s: SparkSession, edges: DataFrame,
      rounds: Int): DataFrame = {
    val e = edges.select(col("u").cast("long").as("u"),
      col("v").cast("long").as("v"))
    val labels = localMove(s, e, rounds)
      .select(col("node"), col("community").cast("string").as("community"))
    Modularity.modularity(s,
      e.select(col("u").as("a"), col("v").as("b")), labels)
  }

  val all: ListMap[String, Q] = ListMap(
    // ---- q352: one-level Louvain local moving on the q164 trade
    //      graph, 2 synchronous rounds — one row per node with its
    //      landed community. The oracle unrolls each round: community
    //      degree sums, per-(node, candidate) edge counts, the
    //      stay-corrected HUGEINT gains, and the max-gain /
    //      min-community argmax. ----
    "q352_louvain_move" -> Q(
      (s, d) => {
        val e0 = Tables.orders(s, d).join(Tables.lineitem(s, d),
            col("o_orderkey") === col("l_orderkey"))
          .select((col("o_custkey").cast("long") * 2).as("u"),
            (col("l_suppkey").cast("long") * 2 + 1).as("v"))
          .distinct()
        localMove(s, e0, rounds = 2)
          .select(
            when(col("node") % 2 === 0, lit("customer")).otherwise(lit("supplier"))
              .as("kind"),
            expr("node div 2").as("key"), col("community"))
          .orderBy("kind", "key")
      },
      Some {
        def round(prev: String, cur: String, par: Int): String =
          s"""${cur}_st AS MATERIALIZED (SELECT p.comm, sum(dg.d) AS stot
             |  FROM $prev p JOIN dg ON dg.node = p.node GROUP BY p.comm),
             |${cur}_nb AS MATERIALIZED (SELECT ed.u AS node, p.comm AS cand,
             |    count(*) AS k
             |  FROM ed JOIN $prev p ON p.node = ed.v GROUP BY 1, 2),
             |${cur}_cd AS (SELECT node, cand, max(k) AS k FROM (
             |    SELECT node, cand, k FROM ${cur}_nb
             |    UNION ALL SELECT node, comm AS cand, 0 AS k FROM $prev)
             |  GROUP BY node, cand),
             |${cur}_g AS MATERIALIZED (SELECT c.node, c.cand,
             |    CASE WHEN c.cand = p.comm
             |      THEN CAST(2 AS HUGEINT) * (SELECT m FROM me) * c.k
             |        - CAST(dg.d AS HUGEINT) * (st.stot - dg.d)
             |      ELSE CAST(2 AS HUGEINT) * (SELECT m FROM me) * c.k
             |        - CAST(dg.d AS HUGEINT) * st.stot END AS g
             |  FROM ${cur}_cd c JOIN $prev p ON p.node = c.node
             |    JOIN dg ON dg.node = c.node
             |    JOIN ${cur}_st st ON st.comm = c.cand),
             |${cur}_m AS (SELECT node, max(g) AS mg FROM ${cur}_g GROUP BY 1),
             |${cur}_w AS (SELECT g.node, min(g.cand) AS wcomm
             |  FROM ${cur}_g g JOIN ${cur}_m x
             |    ON x.node = g.node AND g.g = x.mg
             |  GROUP BY g.node),
             |$cur AS MATERIALIZED (SELECT p.node,
             |    CASE WHEN p.node % 2 = $par THEN w.wcomm ELSE p.comm END AS comm
             |  FROM $prev p JOIN ${cur}_w w ON w.node = p.node)""".stripMargin
        s"""WITH e0 AS MATERIALIZED (
           |  SELECT DISTINCT o.o_custkey * 2 AS u, l.l_suppkey * 2 + 1 AS v
           |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
           |ed AS MATERIALIZED (SELECT u, v FROM e0
           |  UNION ALL SELECT v, u FROM e0),
           |me AS (SELECT count(*) AS m FROM e0),
           |dg AS MATERIALIZED (SELECT u AS node, count(*) AS d
           |  FROM ed GROUP BY u),
           |l0 AS (SELECT node, node AS comm FROM dg),
           |${round("l0", "l1", 1)},
           |${round("l1", "l2", 0)}
           |SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS kind,
           |  node // 2 AS key, CAST(comm AS BIGINT) AS community
           |FROM l2 ORDER BY kind, key""".stripMargin
      }),

    // ---- q408: TWO-LEVEL LOUVAIN on the same trade graph — 2 move
    //      rounds, community-quotient aggregation (weighted edges +
    //      self-loops), 2 weighted move rounds on the quotient, labels
    //      mapped back. The oracle unrolls BOTH levels: the weighted
    //      gain rounds (sum(w) for k, self-loops excluded from k but
    //      doubled into degrees), the least/greatest quotient rollup,
    //      and the final label composition. ----
    "q408_louvain_two_level" -> Q(
      (s, d) => {
        val e0 = Tables.orders(s, d).join(Tables.lineitem(s, d),
            col("o_orderkey") === col("l_orderkey"))
          .select((col("o_custkey").cast("long") * 2).as("u"),
            (col("l_suppkey").cast("long") * 2 + 1).as("v"))
          .distinct()
        louvainTwoLevel(s, e0, rounds1 = 2, rounds2 = 2)
          .select(
            when(col("node") % 2 === 0, lit("customer")).otherwise(lit("supplier"))
              .as("kind"),
            expr("node div 2").as("key"), col("community"))
          .orderBy("kind", "key")
      },
      Some {
        // one weighted synchronous move round, parameterized on the
        // edge/degree/m tables so both levels replay through it
        def roundW(ed: String, dg: String, me: String,
            prev: String, cur: String, par: Int): String =
          s"""${cur}_st AS MATERIALIZED (SELECT p.comm, sum(d.d) AS stot
             |  FROM $prev p JOIN $dg d ON d.node = p.node GROUP BY p.comm),
             |${cur}_nb AS MATERIALIZED (SELECT e.u AS node, p.comm AS cand,
             |    sum(e.w) AS k
             |  FROM $ed e JOIN $prev p ON p.node = e.v
             |  WHERE e.u <> e.v GROUP BY 1, 2),
             |${cur}_cd AS (SELECT node, cand, max(k) AS k FROM (
             |    SELECT node, cand, k FROM ${cur}_nb
             |    UNION ALL SELECT node, comm AS cand, 0 AS k FROM $prev)
             |  GROUP BY node, cand),
             |${cur}_g AS MATERIALIZED (SELECT c.node, c.cand,
             |    CASE WHEN c.cand = p.comm
             |      THEN CAST(2 AS HUGEINT) * (SELECT m FROM $me) * c.k
             |        - CAST(d.d AS HUGEINT) * (st.stot - d.d)
             |      ELSE CAST(2 AS HUGEINT) * (SELECT m FROM $me) * c.k
             |        - CAST(d.d AS HUGEINT) * st.stot END AS g
             |  FROM ${cur}_cd c JOIN $prev p ON p.node = c.node
             |    JOIN $dg d ON d.node = c.node
             |    JOIN ${cur}_st st ON st.comm = c.cand),
             |${cur}_m AS (SELECT node, max(g) AS mg FROM ${cur}_g GROUP BY 1),
             |${cur}_w AS (SELECT g.node, min(g.cand) AS wcomm
             |  FROM ${cur}_g g JOIN ${cur}_m x
             |    ON x.node = g.node AND g.g = x.mg
             |  GROUP BY g.node),
             |$cur AS MATERIALIZED (SELECT p.node,
             |    CASE WHEN p.node % 2 = $par THEN w.wcomm ELSE p.comm END AS comm
             |  FROM $prev p JOIN ${cur}_w w ON w.node = p.node)""".stripMargin
        s"""WITH e0 AS MATERIALIZED (
           |  SELECT DISTINCT o.o_custkey * 2 AS u, l.l_suppkey * 2 + 1 AS v
           |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
           |e0w AS (SELECT u, v, 1 AS w FROM e0),
           |ed AS MATERIALIZED (SELECT u, v, w FROM e0w
           |  UNION ALL SELECT v, u, w FROM e0w),
           |me AS (SELECT sum(w) AS m FROM e0w),
           |dg AS MATERIALIZED (SELECT u AS node, sum(w) AS d
           |  FROM ed GROUP BY u),
           |l0 AS (SELECT node, node AS comm FROM dg),
           |${roundW("ed", "dg", "me", "l0", "l1", 1)},
           |${roundW("ed", "dg", "me", "l1", "l2", 0)},
           |qe AS MATERIALIZED (SELECT least(a.comm, b.comm) AS u,
           |    greatest(a.comm, b.comm) AS v, count(*) AS w
           |  FROM e0 e JOIN l2 a ON a.node = e.u
           |  JOIN l2 b ON b.node = e.v GROUP BY 1, 2),
           |ed2 AS MATERIALIZED (SELECT u, v, w FROM qe
           |  UNION ALL SELECT v, u, w FROM qe),
           |me2 AS (SELECT sum(w) AS m FROM qe),
           |dg2 AS MATERIALIZED (SELECT u AS node, sum(w) AS d
           |  FROM ed2 GROUP BY u),
           |m0 AS (SELECT node, node AS comm FROM dg2),
           |${roundW("ed2", "dg2", "me2", "m0", "m1", 1)},
           |${roundW("ed2", "dg2", "me2", "m1", "m2", 0)}
           |SELECT CASE WHEN l.node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS kind,
           |  l.node // 2 AS key, CAST(q.comm AS BIGINT) AS community
           |FROM l2 l JOIN m2 q ON q.node = l.comm
           |ORDER BY kind, key""".stripMargin
      }),
  )
}
