package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.rel.RelQueries.Q
import graft.rel.Tables

/** LABEL PROPAGATION communities (Raghavan et al. 2007), made
  * DETERMINISTIC: synchronous rounds where every node adopts the most
  * frequent label among its neighbors, ties broken to the SMALLEST
  * label — so the result is a pure function of the graph and the
  * oracle can unroll every round. (Classic async LPA is
  * order-dependent; an engine whose results can't be replayed can't be
  * hash-checked, so the engine ships the synchronous variant.)
  *
  * The argmax is ONE aggregation — max over (count, −label) structs,
  * i.e. max count with ties to the smallest label. The SQL oracle
  * replays it as the equivalent two-step form (max count per node,
  * then min label at that count): the struct comparison is plain
  * lexicographic order over exact integers, so the two shapes define
  * the same function and the hash compare pins them to each other.
  * (Shipped as two aggregations + a self-join through r14; folded in
  * the r15 optimization pass — one shuffle per round instead of two
  * plus a join.)
  *
  * Scale: edges shuffle once and stay cached; each round's traffic is
  * the (node, label) table (16 bytes/node) joined to the cached edges,
  * plus two label-keyed aggs; lineage cut per round.
  */
object LabelProp {

  /** `rounds` synchronous LPA rounds over directed `edges` (u, v) —
    * symmetrize for undirected. Initial label = node id. Nodes with no
    * in-edges keep their label. Output: (node, label).
    */
  def propagate(s: SparkSession, edges: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1: $rounds")
    val ed = edges.select(col("u").cast("long"), col("v").cast("long"))
      .repartition(col("v"))
      .cache()
    val nodes = ed.select(col("u").as("node"))
      .unionAll(ed.select(col("v").as("node"))).distinct()
    var labels = nodes.withColumn("label", col("node")).localCheckpoint()
    for (_ <- 1 to rounds) {
      val votes = ed.join(labels, ed("u") === labels("node"))
        .groupBy(ed("v").as("n"), col("label"))
        .agg(count(lit(1)).as("cnt"))
      // argmax in ONE aggregation (r15 opt pass, the Louvain rewrite):
      // max over (cnt, −label) structs ≡ max count with ties to the
      // SMALLEST label — exactly the max-agg + equality-join + min-agg
      // the oracle CTEs replay, folded into a single shuffle
      val winner = votes.groupBy(col("n").as("node"))
        .agg(max(struct(col("cnt"), (-col("label")).as("nl"))).as("best"))
        .select(col("node"), (-col("best.nl")).as("label"))
      labels = labels.select(col("node").as("old_node"), col("label").as("old_label"))
        .join(winner, col("old_node") === col("node"), "left")
        .select(col("old_node").as("node"),
          coalesce(col("label"), col("old_label")).as("label"))
        .localCheckpoint()
    }
    ed.unpersist()
    labels
  }

  /** COMMUNITY DETECTION with its quality readout — the find+judge
    * loop: [[propagate]] proposes a partition (deterministic
    * synchronous LPA), [[Modularity.modularity]] scores it. Output is
    * the modularity report over the FOUND communities — one row per
    * community plus the constant total, the q333 shape. `edges` is the
    * undirected edge list (u, v), symmetrized internally for the
    * propagation and canonicalized for the score.
    *
    * Scale shape: LPA is `rounds` × (one join to the cached edge table
    * + two label-keyed aggs); the score is two hash aggregations.
    * Nothing is quadratic in nodes or communities.
    */
  def lpaCommunities(s: SparkSession, edges: DataFrame,
      rounds: Int): DataFrame = {
    val e = edges.select(col("u").cast("long").as("u"),
      col("v").cast("long").as("v"))
    val sym = e.unionAll(e.select(col("v").as("u"), col("u").as("v")))
    val labels = propagate(s, sym, rounds)
      .select(col("node"), col("label").cast("string").as("community"))
    Modularity.modularity(s,
      e.select(col("u").as("a"), col("v").as("b")), labels)
  }

  val all: ListMap[String, Q] = ListMap(
    // ---- q164: communities of the customer↔supplier trade graph
    //      after 3 deterministic LPA rounds; one row per node with its
    //      community label (the min-id convention makes labels
    //      meaningful across engines). The oracle unrolls each round
    //      as count → max-count → min-winning-label CTEs. ----
    "q164_label_prop" -> Q(
      (s, d) => {
        val e0 = Tables.orders(s, d).join(Tables.lineitem(s, d),
            col("o_orderkey") === col("l_orderkey"))
          .select((col("o_custkey").cast("long") * 2).as("u"),
            (col("l_suppkey").cast("long") * 2 + 1).as("v"))
          .distinct()
        val edges = e0.unionAll(e0.select(col("v").as("u"), col("u").as("v")))
        propagate(s, edges, rounds = 3)
          .select(
            when(col("node") % 2 === 0, lit("customer")).otherwise(lit("supplier"))
              .as("kind"),
            expr("node div 2").as("key"), col("label"))
          .orderBy("kind", "key")
      },
      Some {
        def round(prev: String, cur: String): String =
          s"""${cur}_c AS (SELECT ed.v AS n, $prev.label, count(*) AS cnt
             |  FROM ed JOIN $prev ON ed.u = $prev.node GROUP BY 1, 2),
             |${cur}_m AS (SELECT n, max(cnt) AS mx FROM ${cur}_c GROUP BY 1),
             |${cur}_w AS (SELECT c.n AS node, min(c.label) AS label
             |  FROM ${cur}_c c JOIN ${cur}_m m ON c.n = m.n AND c.cnt = m.mx
             |  GROUP BY 1),
             |$cur AS (SELECT p.node, coalesce(w.label, p.label) AS label
             |  FROM $prev p LEFT JOIN ${cur}_w w ON p.node = w.node)""".stripMargin
        s"""WITH e0 AS (
           |  SELECT DISTINCT o.o_custkey * 2 AS u, l.l_suppkey * 2 + 1 AS v
           |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
           |ed AS (SELECT u, v FROM e0 UNION SELECT v, u FROM e0),
           |l0 AS (SELECT node, node AS label FROM
           |  (SELECT DISTINCT u AS node FROM ed UNION SELECT DISTINCT v FROM ed)),
           |${round("l0", "l1")},
           |${round("l1", "l2")},
           |${round("l2", "l3")}
           |SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS kind,
           |  node // 2 AS key, CAST(label AS BIGINT) AS label
           |FROM l3 ORDER BY kind, key""".stripMargin
      }),

    // ---- q344: the find+judge loop — the q164 LPA partition of the
    //      trade graph SCORED by modularity (q333's arithmetic). The
    //      oracle unrolls the three LPA rounds, then replays the
    //      exact-integer modularity over the found labels — detection
    //      and its quality readout verified as ONE composition. ----
    "q344_lpa_modularity" -> Q(
      (s, d) => {
        val e0 = Tables.orders(s, d).join(Tables.lineitem(s, d),
            col("o_orderkey") === col("l_orderkey"))
          .select((col("o_custkey").cast("long") * 2).as("u"),
            (col("l_suppkey").cast("long") * 2 + 1).as("v"))
          .distinct()
        lpaCommunities(s, e0, rounds = 3)
      },
      Some {
        def round(prev: String, cur: String): String =
          s"""${cur}_c AS (SELECT ed.v AS n, $prev.label, count(*) AS cnt
             |  FROM ed JOIN $prev ON ed.u = $prev.node GROUP BY 1, 2),
             |${cur}_m AS (SELECT n, max(cnt) AS mx FROM ${cur}_c GROUP BY 1),
             |${cur}_w AS (SELECT c.n AS node, min(c.label) AS label
             |  FROM ${cur}_c c JOIN ${cur}_m m ON c.n = m.n AND c.cnt = m.mx
             |  GROUP BY 1),
             |$cur AS MATERIALIZED (SELECT p.node, coalesce(w.label, p.label) AS label
             |  FROM $prev p LEFT JOIN ${cur}_w w ON p.node = w.node)""".stripMargin
        s"""WITH e0 AS MATERIALIZED (
           |  SELECT DISTINCT o.o_custkey * 2 AS u, l.l_suppkey * 2 + 1 AS v
           |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
           |ed AS MATERIALIZED (SELECT u, v FROM e0 UNION SELECT v, u FROM e0),
           |l0 AS MATERIALIZED (SELECT node, node AS label FROM
           |  (SELECT DISTINCT u AS node FROM ed UNION SELECT DISTINCT v FROM ed)),
           |${round("l0", "l1")},
           |${round("l1", "l2")},
           |${round("l2", "l3")},
           |e AS (SELECT least(u, v) AS a, greatest(u, v) AS b
           |  FROM e0 GROUP BY 1, 2),
           |lab AS (SELECT node, CAST(label AS VARCHAR) AS c FROM l3),
           |tg AS MATERIALIZED (SELECT e.a, e.b, la.c AS ca, lb.c AS cb
           |  FROM e JOIN lab la ON la.node = e.a
           |    JOIN lab lb ON lb.node = e.b),
           |m AS (SELECT count(*) AS m FROM tg),
           |deg AS (SELECT a AS node, ca AS c FROM tg
           |  UNION ALL SELECT b, cb FROM tg),
           |dc AS (SELECT c, count(DISTINCT node) AS n_nodes,
           |    count(*) AS deg_sum FROM deg GROUP BY c),
           |ec AS (SELECT ca AS c, count(*) AS e_in FROM tg
           |  WHERE ca = cb GROUP BY ca),
           |t AS MATERIALIZED (SELECT dc.c, dc.n_nodes, coalesce(ec.e_in, 0) AS e_in,
           |    dc.deg_sum, m.m,
           |    CAST(CAST(4 AS HUGEINT) * m.m * coalesce(ec.e_in, 0)
           |        - CAST(dc.deg_sum AS HUGEINT) * dc.deg_sum AS DOUBLE)
           |      / (4.0 * CAST(m.m AS DOUBLE) * CAST(m.m AS DOUBLE))
           |      AS qc
           |  FROM dc LEFT JOIN ec USING (c), m),
           |x AS (SELECT sum(qc ORDER BY c) AS qtot FROM t)
           |SELECT t.c AS community, CAST(t.n_nodes AS BIGINT) AS n_nodes,
           |  CAST(t.e_in AS BIGINT) AS e_in,
           |  CAST(t.deg_sum AS BIGINT) AS deg_sum,
           |  round(t.qc, 6) AS q_contrib_r6,
           |  round(x.qtot, 6) AS modularity_r6
           |FROM t, x ORDER BY t.c""".stripMargin
      }),
  )
}
