package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.rel.RelQueries.Q
import graft.rel.Tables

/** BETWEENNESS CENTRALITY by Brandes' dependency accumulation
  * (Brandes 2001, "A faster algorithm for betweenness centrality")
  * from a FIXED SOURCE SET with a FIXED hop horizon — the
  * sampled-source estimator of Brandes & Pich 2007 ("Centrality
  * estimation in large networks"), which is the only formulation that
  * survives scale: exact all-sources betweenness is Θ(nm) and
  * unbounded, while k sources × h hops is k·|reached| state and
  * 2h relational rounds, both chosen by the caller.
  *
  *   forward:  σ(v) = Σ_{u ∈ pred(v)} σ(u)   (layered BFS, exact ints)
  *   backward: δ(v) = Σ_{w ∈ succ(v)} σ(v)/σ(w) · (1 + δ(w))
  *   BC(v)    = Σ_{s ≠ v} δ_s(v)
  *
  * Determinism (the house integer idiom): path counts σ are exact
  * integers; δ lives in integer MICRO-units with each term computed
  * as an exact decimal(38,0) product truncating-divided by σ(w) —
  * safe because v ∈ pred(w) ⇒ σ(w) ≥ σ(v), so every term is bounded
  * by (10⁶ + δ(w)) — and summed order-free. Loud overflow guards on
  * σ (> 10¹²) and δ (> 10¹⁵): a graph dense enough to trip them
  * needs a smaller horizon, and silence would be a wrong answer.
  *
  * Scale shape: edges shuffle once (cached, partitioned by u); each
  * forward round joins the FRONTIER (not the settled set) to the
  * cached edges — per-round traffic is the frontier; each backward
  * round joins one distance LAYER to the edges. State is
  * (src, node)-keyed: k sources bound it to k·|reached| rows.
  * Lineage cut per round (localCheckpoint, the q331 discipline).
  */
object Betweenness {

  private val dec38 =
    org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
  private val SigmaCap = 1000000000000L // 1e12
  private val DeltaCap = 1000000000000000L // 1e15

  /** Micro-unit betweenness from `seeds` (col `node`) over directed
    * `edges` (cols `u`, `v`), horizon `maxHops`. Output: (node,
    * bc_micro) for every node with a positive score.
    */
  def betweenness(s: SparkSession, edges: DataFrame, seeds: DataFrame,
      maxHops: Int, distinctInput: Boolean = false): DataFrame = {
    require(maxHops >= 2 && maxHops <= 6, s"2 <= maxHops <= 6: $maxHops")
    val ed0 = edges.select(col("u").cast("long"), col("v").cast("long"))
    // distinctInput = caller guarantees `edges` is already a distinct
    // directed pair table (the q375 build: a symmetrized union of a
    // DISTINCT bipartite half — disjoint orientations), skipping the
    // dedup exchange (r15 opt, guide §2.4)
    val ed = (if (distinctInput) ed0 else ed0.distinct())
      .repartition(col("u"))
      .cache()
    // forward: one CHECKPOINTED frame per distance layer — the settled
    // set for the anti-join is a lazy union over already-materialized
    // layers (re-materializing the whole settled table per round was
    // measured at ~3x the operator's wall at sf0.1)
    val layers = scala.collection.mutable.ArrayBuffer(
      seeds.select(col("node").cast("long").as("src"))
        .distinct()
        .select(col("src"), col("src").as("node"), lit(1L).as("sigma"))
        .localCheckpoint())
    for (k <- 1 to maxHops) {
      val frontier = layers.last
      val expanded = ed.join(frontier, ed("u") === frontier("node"))
        .groupBy(frontier("src").as("src"), ed("v").as("node"))
        .agg(sum(frontier("sigma").cast(dec38)).as("sig0"))
      val settled = layers.map(_.select(col("src"), col("node")))
        .reduce(_ unionAll _)
      layers += expanded.join(settled, Seq("src", "node"), "left_anti")
        .select(col("src"), col("node"),
          when(col("sig0") > lit(SigmaCap), raise_error(lit(
            "betweenness: sigma exceeds 1e12 — shrink the horizon")))
            .otherwise(col("sig0").cast("long")).as("sigma"))
        .localCheckpoint()
    }
    // backward: per-layer delta in micro, deepest layer first
    var layer = layers(maxHops)
      .select(col("src"), col("node"), col("sigma"), lit(0L).as("delta"))
    var acc = layer.select(col("src"), col("node"), col("delta"))
    for (k <- (maxHops - 1) to 1 by -1) {
      val cur = layers(k)
        .select(col("src"), col("node"), col("sigma"))
      val terms = cur.join(ed, ed("u") === cur("node"))
        .join(layer.select(col("src").as("wsrc"), col("node").as("wnode"),
          col("sigma").as("wsigma"), col("delta").as("wdelta")),
          col("wsrc") === cur("src") && col("wnode") === ed("v"))
        .groupBy(cur("src").as("src"), cur("node").as("node"))
        .agg(sum(expr(
          "CAST(sigma AS DECIMAL(38,0)) * (1000000 + wdelta) div wsigma")
          .cast(dec38)).as("d0"))
      layer = cur.join(terms, Seq("src", "node"), "left")
        .select(col("src"), col("node"), col("sigma"),
          when(col("d0") > lit(DeltaCap), raise_error(lit(
            "betweenness: delta exceeds 1e15 — shrink the horizon")))
            .otherwise(coalesce(col("d0").cast("long"), lit(0L)))
            .as("delta"))
        .localCheckpoint()
      acc = acc.unionAll(layer.select(col("src"), col("node"), col("delta")))
    }
    val out = acc.groupBy("node").agg(sum(col("delta")).as("bc_micro"))
      .filter(col("bc_micro") > 0L)
    ed.unpersist()
    out
  }

  /** the forward hop as a chained CTE (sigma sums + the settled
    * anti-join), the q122 oracle discipline extended with path counts
    */
  private def fwdHop(prevS: String, prevF: String, curF: String,
      curS: String, k: Int): String =
    s"""$curF AS MATERIALIZED (SELECT src, node, $k AS dist, sigma FROM (
       |    SELECT f.src, ed.v AS node, sum(f.sigma) AS sigma
       |    FROM ed JOIN $prevF f ON ed.u = f.node
       |    GROUP BY f.src, ed.v) x
       |  WHERE NOT EXISTS (SELECT 1 FROM $prevS s
       |    WHERE s.src = x.src AND s.node = x.node)),
       |$curS AS (SELECT * FROM $prevS UNION ALL SELECT * FROM $curF)"""
      .stripMargin

  /** one backward layer: delta terms from the layer below */
  private def bwdLayer(prevL: String, curL: String, k: Int,
      settled: String): String =
    s"""$curL AS MATERIALIZED (SELECT v.src, v.node, v.sigma,
       |    coalesce(t.d0, 0) AS delta
       |  FROM (SELECT src, node, sigma FROM $settled WHERE dist = $k) v
       |  LEFT JOIN (SELECT v2.src, v2.node,
       |      sum((CAST(v2.sigma AS HUGEINT) * (1000000 + w.delta))
       |        // w.sigma) AS d0
       |    FROM (SELECT src, node, sigma FROM $settled WHERE dist = $k) v2
       |    JOIN ed ON ed.u = v2.node
       |    JOIN $prevL w ON w.src = v2.src AND w.node = ed.v
       |    GROUP BY v2.src, v2.node) t
       |    ON t.src = v.src AND t.node = v.node)""".stripMargin

  val all: ListMap[String, Q] = ListMap(
    // ---- q375: BETWEENNESS over the trade graph (q116's
    //      customer↔supplier edges) from the nation-0 supplier
    //      sources (the q122 seed set), horizon 3 — "which accounts
    //      broker the most shortest supply routes". The oracle
    //      unrolls all three sigma hops and both delta layers with
    //      exact integer arithmetic. ----
    "q375_betweenness" -> Q(
      (s, d) => {
        val e0 = Tables.orders(s, d).join(Tables.lineitem(s, d),
            col("o_orderkey") === col("l_orderkey"))
          .select((col("o_custkey").cast("long") * 2).as("u"),
            (col("l_suppkey").cast("long") * 2 + 1).as("v"))
          .distinct()
        val edges = e0.unionAll(e0.select(col("v").as("u"), col("u").as("v")))
        val seeds = Tables.supplier(s, d).filter(col("s_nationkey") === 0)
          .select((col("s_suppkey").cast("long") * 2 + 1).as("node"))
        betweenness(s, edges, seeds, maxHops = 3, distinctInput = true)
          .select(
            when(col("node") % 2 === 0, lit("customer"))
              .otherwise(lit("supplier")).as("kind"),
            expr("node div 2").as("key"), col("bc_micro"))
          .orderBy(col("bc_micro").desc, col("kind"), col("key"))
      },
      Some {
        s"""WITH e0 AS (
           |  SELECT DISTINCT o.o_custkey * 2 AS u, l.l_suppkey * 2 + 1 AS v
           |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
           |ed AS (SELECT u, v FROM e0 UNION SELECT v, u FROM e0),
           |f0 AS (SELECT DISTINCT s_suppkey * 2 + 1 AS src,
           |    s_suppkey * 2 + 1 AS node, 0 AS dist, CAST(1 AS BIGINT) AS sigma
           |  FROM supplier WHERE s_nationkey = 0),
           |${fwdHop("f0", "f0", "f1", "s1", 1)},
           |${fwdHop("s1", "f1", "f2", "s2", 2)},
           |${fwdHop("s2", "f2", "f3", "s3", 3)},
           |l3 AS (SELECT src, node, sigma, CAST(0 AS BIGINT) AS delta
           |  FROM s3 WHERE dist = 3),
           |${bwdLayer("l3", "l2", 2, "s3")},
           |${bwdLayer("l2", "l1", 1, "s3")},
           |bc AS (SELECT node, sum(delta) AS bc_micro FROM (
           |    SELECT src, node, delta FROM l3
           |    UNION ALL SELECT src, node, delta FROM l2
           |    UNION ALL SELECT src, node, delta FROM l1)
           |  GROUP BY node HAVING sum(delta) > 0)
           |SELECT CASE WHEN node % 2 = 0 THEN 'customer'
           |    ELSE 'supplier' END AS kind,
           |  node // 2 AS key, CAST(bc_micro AS BIGINT) AS bc_micro
           |FROM bc ORDER BY bc_micro DESC, kind, key""".stripMargin
      }))
}
