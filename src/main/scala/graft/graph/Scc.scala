package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.rel.RelQueries.Q
import graft.rel.Tables

/** STRONGLY CONNECTED COMPONENTS on a CONTRACTED (quotient) graph —
  * the directed-cycle structure read: "which entities trade with each
  * other in both directions, transitively". Weak connectivity (the
  * q49 dedup-cluster machinery) ignores direction; SCC is the directed
  * refinement: u and v share a component iff each can reach the other.
  *
  * Scale shape (100 TB): raw edge lists at corpus scale are far too
  * large for closure algorithms, so the operator is deliberately split
  * into the two stages a production pipeline uses:
  *   1. CONTRACT — one keyed aggregation collapses the billion-edge
  *      list onto the quotient graph of the analysis dimension
  *      (nations here: ≤ n² = 625 edges whatever the data size). This
  *      is the only stage that touches the data, and it is a single
  *      shuffle.
  *   2. CLOSE — mutual reachability on the quotient: iterate
  *      reach ← reach ∪ (reach ⋈ edges) to a fixpoint. Every
  *      intermediate is bounded by n² pairs, the iteration count by
  *      the quotient diameter, and each fixpoint check is a count on
  *      a ≤ n²-row table — nothing in the loop scales with the corpus.
  * SCC id = min node id among mutual-reachability peers (reflexive),
  * which is deterministic and engine-independent; the oracle replays
  * the same closure as a recursive CTE.
  */
object Scc {

  /** Strongly connected components of the directed graph `edges`
    * (cols `u`, `v`, long). Returns (node, scc_id, scc_size) with
    * scc_id = min node id in the component (self-reachability is
    * assumed reflexively, so singleton nodes are their own SCC).
    */
  def scc(s: SparkSession, edges: DataFrame): DataFrame = {
    val ed = edges.select(col("u").cast("long").as("u"),
        col("v").cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .cache()
    // transitive closure to fixpoint; every frame is ≤ |nodes|² pairs
    var reach = ed.localCheckpoint()
    var size = reach.count()
    var grew = true
    while (grew) {
      val next = reach.as("r")
        .join(ed.as("e"), col("r.v") === col("e.u"))
        .select(col("r.u").as("u"), col("e.v").as("v"))
        .unionAll(reach)
        .distinct()
        .localCheckpoint()
      val m = next.count()
      grew = m > size
      size = m
      reach = next
    }
    val nodes = ed.select(col("u").as("node"))
      .unionAll(ed.select(col("v").as("node"))).distinct()
    // reflexive closure, deduped (cycles already contain self-pairs)
    val reflex = reach
      .unionAll(nodes.select(col("node").as("u"), col("node").as("v")))
      .distinct()
    val mutual = reflex.as("a").join(reflex.as("b"),
        col("a.u") === col("b.v") && col("a.v") === col("b.u"))
      .select(col("a.u").as("node"), col("a.v").as("peer"))
    ed.unpersist()
    mutual.groupBy("node")
      .agg(min("peer").as("scc_id"), count(lit(1)).as("scc_size"))
  }

  /** q211: SCCs of the inter-nation trade-flow graph — nation A points
    * at nation B when A's customers placed ≥ 70 distinct orders
    * containing B's suppliers' items. At the fixture's scale that
    * yields one large mutual-trade core plus peripheral nations that
    * import or export strongly in one direction only — exactly the
    * asymmetry SCC detects and weak connectivity cannot. The oracle
    * replays the closure as a recursive CTE over the same quotient.
    */
  val all: ListMap[String, Q] = ListMap(
    "q211_scc" -> Q(
      (s, d) => {
        val edges = Tables.orders(s, d)
          .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
          .join(Tables.lineitem(s, d), col("l_orderkey") === col("o_orderkey"))
          .join(Tables.supplier(s, d), col("s_suppkey") === col("l_suppkey"))
          .filter(col("c_nationkey") =!= col("s_nationkey"))
          .groupBy(col("c_nationkey").cast("long").as("u"),
            col("s_nationkey").cast("long").as("v"))
          .agg(countDistinct(col("o_orderkey")).as("n_ord"))
          .filter(col("n_ord") >= 70)
          .select("u", "v")
        scc(s, edges)
          .orderBy("node")
      },
      Some("""WITH RECURSIVE e AS (
             |  SELECT c.c_nationkey AS u, s.s_nationkey AS v
             |  FROM orders o
             |  JOIN customer c ON o.o_custkey = c.c_custkey
             |  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
             |  JOIN supplier s ON s.s_suppkey = l.l_suppkey
             |  WHERE c.c_nationkey <> s.s_nationkey
             |  GROUP BY 1, 2 HAVING count(DISTINCT o.o_orderkey) >= 70),
             |reach(u, v) AS (
             |  SELECT u, v FROM e
             |  UNION
             |  SELECT r.u, e2.v FROM reach r JOIN e e2 ON r.v = e2.u),
             |nodes AS (SELECT u AS node FROM e UNION SELECT v FROM e),
             |-- explicit DISTINCT wrapper: a plain UNION here does NOT
             |-- dedup in DuckDB when one branch reads the recursive CTE
             |reflex AS (SELECT DISTINCT u, v FROM (
             |  SELECT u, v FROM reach UNION ALL SELECT node, node FROM nodes)),
             |mutual AS (SELECT a.u AS node, a.v AS peer
             |  FROM reflex a JOIN reflex b ON a.u = b.v AND a.v = b.u)
             |SELECT CAST(node AS BIGINT) AS node,
             |  CAST(min(peer) AS BIGINT) AS scc_id,
             |  count(*) AS scc_size
             |FROM mutual GROUP BY node ORDER BY node""".stripMargin))
  )
}
