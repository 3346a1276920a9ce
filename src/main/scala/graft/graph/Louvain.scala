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
  def localMove(s: SparkSession, edges: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1: $rounds")
    val e = edges.select(col("u").cast("long").as("u"),
      col("v").cast("long").as("v"))
    val sym = e.unionAll(e.select(col("v").as("u"), col("u").as("v")))
      .repartition(col("v")).cache()
    val m = e.count()
    require(m > 0, "localMove: empty edge set")
    val deg = sym.groupBy(col("u").as("node")).agg(count(lit(1)).as("d"))
      .localCheckpoint(true)
    val dec38 = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
    var lab = deg.select(col("node"), col("node").as("comm"))
      .localCheckpoint(true)
    for (r <- 1 to rounds) {
      val sTot = lab.join(deg, "node")
        .groupBy(col("comm")).agg(sum(col("d")).as("stot"))
      // i's edges into each neighboring community, from the PREVIOUS
      // labeling (synchronous: all nodes decide on the same snapshot)
      val nbr = sym
        .join(lab.select(col("node").as("v"), col("comm").as("cv")), "v")
        .groupBy(col("u").as("node"), col("cv").as("cand"))
        .agg(count(lit(1)).as("k"))
      // the STAY option must exist even when i has no neighbor in its
      // own community (k = 0 there)
      val stay = lab.select(col("node"), col("comm").as("cand"),
        lit(0L).as("k"))
      val cands = nbr.unionByName(stay)
        .groupBy("node", "cand").agg(max(col("k")).as("k"))
      val scored = cands
        .join(lab, "node")
        .join(deg, "node")
        .join(sTot.select(col("comm").as("cand"), col("stot")), "cand")
        .withColumn("g",
          when(col("cand") === col("comm"),
            lit(2L).cast(dec38) * lit(m) * col("k")
              - col("d").cast(dec38) * (col("stot") - col("d")))
            .otherwise(lit(2L).cast(dec38) * lit(m) * col("k")
              - col("d").cast(dec38) * col("stot")))
      val mx = scored.groupBy(col("node").as("mn"))
        .agg(max(col("g")).as("mg"))
      val winner = scored.join(mx,
          scored("node") === col("mn") && scored("g") === col("mg"))
        .groupBy(scored("node")).agg(min(col("cand")).as("wcomm"))
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
  )
}
