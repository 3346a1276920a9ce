package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.rel.RelQueries.Q
import graft.rel.Tables

/** HITS — hubs and authorities over a DIRECTED graph (Kleinberg 1999,
  * JACM 46(5), "Authoritative sources in a hyperlinked environment"):
  * a(v) = Σ_{u→v} h(u), h(u) = Σ_{u→v} a(v), renormalized each half-
  * step. The directional complement of the q116 PageRank prior: on a
  * purchase graph, hubs are broad buyers and authorities are the
  * suppliers broad buyers concentrate on — the two-sided quality
  * signal PageRank's single score conflates.
  *
  * Fixed-point integer arithmetic, for the q116 reason: floating-point
  * mutual reinforcement sums in partition order and drifts per
  * iteration, killing exact cross-engine verification. Here scores are
  * integer micro-units, each half-step renormalizes by the CURRENT
  * MAXIMUM via truncating division (score·SCALE div max — the max
  * norm, which HITS admits as freely as L2: normalization only fixes
  * the scale of the limit eigenvector), and integer sums are order-
  * independent — so the DuckDB oracle replays every iteration as
  * chained CTEs and matches by hash. The multiply-before-divide is
  * guarded loudly: a raw score above Long.MaxValue/SCALE (possible
  * only past ~9·10¹² in-mass, i.e. ~9M max in-degree) raises instead
  * of wrapping.
  *
  * Scale shape (100 TB): identical to the q116 Pregel pattern — the
  * edge table shuffles ONCE (repartitioned by u, cached; the a-step
  * joins it on u, the h-step on v — one of the two joins re-shuffles
  * the 16-byte score table, never the edges); each half-step is one
  * join + one message aggregation + a 1-row max broadcast; lineage is
  * cut per iteration with localCheckpoint. Driver state: nothing.
  */
object Hits {

  /** score scale: max-normalized to 10⁶ micro-units each half-step */
  val Scale = 1000000L

  private val MaxRaw = Long.MaxValue / Scale

  /** Fixed-point HITS over directed `edges` (cols `u`, `v`): returns
    * (node, hub_fp, auth_fp) for every node appearing on either side,
    * after `iters` full (authority, hub) rounds from the uniform hub
    * start h⁰ = SCALE. Pure sources carry auth_fp = 0, pure sinks
    * hub_fp = 0.
    */
  def hitsFixedPoint(s: SparkSession, edges: DataFrame,
      iters: Int = 4): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    val ed = edges.select(col("u").cast("long"), col("v").cast("long"))
      .distinct()
      .repartition(col("u")) // the one edge shuffle; reused every round
      .cache()
    val nodes = ed.select(col("u").as("node"))
      .union(ed.select(col("v").as("node"))).distinct()
      .localCheckpoint()
    // the empty-edge guard rides the nodes checkpoint (nodes is empty
    // iff ed is): the old ed.limit(1).count() ran one extra partial
    // job over the unbuilt upstream edge join just for the check
    // (r15 opt, guide §1.2)
    require(!nodes.isEmpty, "empty edge set")
    def renorm(raw0: DataFrame, c: String): DataFrame = {
      // raw: (node, s) sparse in-sums — MATERIALIZED (eager local
      // checkpoint) before the fan-out, because the max-normalizer and
      // the score join both read it: left as lazy lineage, the two
      // branches would re-evaluate the whole preceding round twice per
      // half-step, compounding to 2^(2·iters) edge joins. The
      // checkpoint doubles as the per-iteration lineage cut (the q116
      // pattern), so no extra cut is needed in the loop.
      //
      // Scores stay SPARSE through the loop (r15 opt, guide §1.2): a
      // node absent from raw is exactly a node whose densified score
      // would be 0, and 0-score rows contribute nothing to the next
      // half-step's edge-join sums — so the old per-half-step
      // densifying join against the node universe was pure overhead.
      // Densified ONCE at the end (coalesce 0), which is where the
      // pure-source / pure-sink zeros of the output contract come from.
      val raw = raw0.localCheckpoint()
      val mx = raw.agg(max("s").as("mx"))
        .select(when(col("mx") > MaxRaw, raise_error(concat(
          lit("hitsFixedPoint: raw score exceeds fixed-point cap: "),
          col("mx").cast("string")))).otherwise(col("mx")).as("mx"))
      raw.crossJoin(broadcast(mx))
        .select(col("node"), expr(s"(s * $Scale) div mx").as(c))
    }
    var h = nodes.select(col("node"), lit(Scale).as("h"))
    var a: DataFrame = null
    for (i <- 1 to iters) {
      val aRaw = ed.join(h.select(col("node").as("u"), col("h")), "u")
        .groupBy(col("v").as("node")).agg(sum("h").as("s"))
      a = renorm(aRaw, "a")
      val hRaw = ed.join(a.select(col("node").as("v"), col("a")), "v")
        .groupBy(col("u").as("node")).agg(sum("a").as("s"))
      h = renorm(hRaw, "h")
    }
    val out = nodes
      .join(h, Seq("node"), "left")
      .join(a, Seq("node"), "left")
      .select(col("node"), coalesce(col("h"), lit(0L)).as("hub_fp"),
        coalesce(col("a"), lit(0L)).as("auth_fp"))
      .localCheckpoint()
    ed.unpersist()
    out
  }

  /** the q316 oracle: every (authority, hub) half-step unrolled as
    * exact-BIGINT CTEs over the directed purchase graph
    */
  private def hitsOracleSql(iters: Int): String = {
    // every CTE is referenced exactly once downstream (the max-
    // normalizer is a window over the joined row set, NOT a second
    // scalar-subquery reference): a CTE referenced twice can be
    // re-evaluated by the oracle engine, and doubling per half-step
    // compounds to 4^iters re-evaluations of the edge join
    def round(i: Int): String = {
      val hp = s"h${i - 1}"
      s"""a${i}r AS (SELECT ed.v AS node, CAST(sum($hp.h) AS BIGINT) AS s
         |  FROM ed JOIN $hp ON ed.u = $hp.node GROUP BY ed.v),
         |a$i AS (SELECT node,
         |    CAST((coalesce(s, 0) * 1000000) // (max(s) OVER ()) AS BIGINT)
         |      AS a
         |  FROM nodes LEFT JOIN a${i}r USING (node)),
         |h${i}r AS (SELECT ed.u AS node, CAST(sum(a$i.a) AS BIGINT) AS s
         |  FROM ed JOIN a$i ON ed.v = a$i.node GROUP BY ed.u),
         |h$i AS (SELECT node,
         |    CAST((coalesce(s, 0) * 1000000) // (max(s) OVER ()) AS BIGINT)
         |      AS h
         |  FROM nodes LEFT JOIN h${i}r USING (node))"""
        .stripMargin
    }
    s"""WITH ed AS (
       |  SELECT DISTINCT o.o_custkey * 2 AS u, l.l_suppkey * 2 + 1 AS v
       |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
       |nodes AS (SELECT u AS node FROM ed UNION SELECT v FROM ed),
       |h0 AS (SELECT node, CAST(1000000 AS BIGINT) AS h FROM nodes),
       |${(1 to iters).map(round).mkString(",\n")}
       |SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END
       |    AS kind,
       |  node // 2 AS key, h$iters.h AS hub_fp, a$iters.a AS auth_fp
       |FROM h$iters JOIN a$iters USING (node)
       |ORDER BY auth_fp DESC, hub_fp DESC, kind, key""".stripMargin
  }

  val all: ListMap[String, Q] = ListMap(
    // ---- q316: HITS on the DIRECTED customer→supplier purchase graph
    //      (bipartite: hubs = customers by purchase breadth over good
    //      suppliers, authorities = suppliers by concentration of good
    //      buyers), 4 exact-integer rounds, every half-step unrolled
    //      in the oracle. ----
    "q316_hits" -> Q(
      (s, d) => {
        val e0 = Tables.orders(s, d).join(Tables.lineitem(s, d),
            col("o_orderkey") === col("l_orderkey"))
          .select((col("o_custkey").cast("long") * 2).as("u"),
            (col("l_suppkey").cast("long") * 2 + 1).as("v"))
        hitsFixedPoint(s, e0, iters = 4)
          .select(
            when(col("node") % 2 === 0, lit("customer"))
              .otherwise(lit("supplier")).as("kind"),
            expr("node div 2").as("key"), col("hub_fp"), col("auth_fp"))
          .orderBy(desc("auth_fp"), desc("hub_fp"), col("kind"), col("key"))
      },
      Some(hitsOracleSql(4))))
}
