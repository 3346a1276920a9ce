package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.rel.RelQueries.Q
import graft.rel.Tables

/** K-CORE DECOMPOSITION — the maximal subgraph in which every node
  * keeps degree ≥ k: the standard dense-region extractor (community
  * seeds, spam-farm cores, "well-connected" filters on link graphs —
  * the graph analogue of a quality threshold). Computed by the
  * textbook peel: repeatedly discard nodes whose degree WITHIN THE
  * SURVIVING SUBGRAPH falls below k; the fixpoint is the k-core
  * (unique, order-independent — peeling in any order converges to the
  * same set, which is what makes an exact cross-engine oracle
  * possible).
  *
  * Convergence is data-dependent (one cascade round can expose the
  * next), so the operator takes `maxRounds` and THROWS if the peel
  * has not stabilized — a partial peel would silently report a
  * superset of the core (the q49 connected-components contract:
  * non-convergence is a caller decision, never a silent wrong
  * answer). The oracle unrolls a fixed number of rounds as chained
  * CTEs; rounds after the fixpoint are no-ops, so oracle-rounds ≥
  * converged-rounds suffices and the hash compare pins the cascade
  * round by round.
  *
  * Scale shape (100 TB): edges shuffle once (cached, partitioned by
  * src); each round is one join of edges against the JUST-PEELED batch
  * plus a degree-delta subtraction — traffic per round is the peeled
  * frontier's incident edges (shrinking to zero at the fixpoint), not
  * the surviving subgraph. Lineage cut per round; caches released on
  * return.
  */
object KCore {

  /** Nodes of the k-core of the undirected graph (`a`, `b`), each with
    * its degree inside the core. Output: (node, core_deg).
    */
  def kCore(s: SparkSession, edges: DataFrame, k: Int,
      maxRounds: Int = 20): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    require(maxRounds >= 1, s"maxRounds must be >= 1: $maxRounds")
    val und = edges
      .select(col("a").cast("long").as("a"), col("b").cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("a"), greatest(col("a"), col("b")).as("b"))
      .distinct()
    val ed = und.select(col("a").as("u"), col("b").as("v"))
      .unionAll(und.select(col("b").as("u"), col("a").as("v")))
      .repartition(col("u"))
      .cache()
    // DELTA PEEL: degrees are MAINTAINED, not recomputed — each round
    // subtracts only the edges incident to the just-peeled batch
    // (edges among peeled nodes touch no survivor, so one subtraction
    // per removed-incident edge is exact). Per-round traffic is the
    // peeled frontier's edges, shrinking to zero at the fixpoint,
    // instead of the whole surviving subgraph every round; the same
    // simultaneous-batch cascade the unrolled oracle replays, and the
    // surviving degree table IS the core_deg output — no final
    // recompute join. Measured back-to-back at sf0.1: 6.6 s → 5.0 s on q123 (1.3×; the cascade peels only ~7% of nodes, so most of the win is the cheaper convergence count — graphs where the peel bites harder save proportionally more).
    var deg = ed.groupBy(col("u").as("node")).agg(count(lit(1)).as("d"))
      .localCheckpoint()
    // `removed` is a NARROW filter over the just-checkpointed degree
    // table — recomputing it at each use is a cached-partition scan,
    // so its own eager localCheckpoint was one wasted materialization
    // job per peel round (r15 opt pass)
    var removed = deg.filter(col("d") < k)
    var nRemoved = removed.count()
    var round = 0
    while (nRemoved > 0 && round < maxRounds) {
      val delta = ed.join(removed.select(col("node").as("u")), "u")
        .groupBy(col("v").as("node")).agg(count(lit(1)).as("dd"))
      deg = deg.join(removed.select(col("node")), Seq("node"), "left_anti")
        .join(delta, Seq("node"), "left")
        .select(col("node"),
          (col("d") - coalesce(col("dd"), lit(0L))).as("d"))
        .localCheckpoint()
      removed = deg.filter(col("d") < k)
      nRemoved = removed.count()
      round += 1
    }
    require(nRemoved == 0,
      s"k-core peel did not stabilize within $maxRounds rounds — raise maxRounds")
    ed.unpersist()
    deg.select(col("node"), col("d").as("core_deg"))
  }

  /** q123: the 80-core of the part co-purchase graph (q118's edges) —
    * at sf0.01 a 6-round cascade peels 2000 parts down to a 1857-node
    * core. The oracle unrolls 8 peel rounds as chained CTEs (the two
    * post-fixpoint rounds are no-ops) and recomputes core degrees.
    */
  val all: ListMap[String, Q] = ListMap(
    "q123_kcore" -> Q(
      (s, d) => {
        val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_partkey"))
        val edges = li.as("x").join(li.as("y"),
            col("x.l_orderkey") === col("y.l_orderkey") &&
              col("x.l_partkey") < col("y.l_partkey"))
          .select(col("x.l_partkey").as("a"), col("y.l_partkey").as("b"))
        kCore(s, edges, k = 80, maxRounds = 8)
          .select(col("node").as("part_key"), col("core_deg"))
          .orderBy("part_key")
      },
      Some {
        // every peel CTE references its predecessor TWICE: left inlined
        // (DuckDB's default for CTEs) the chain expands 2^8-fold and the
        // oracle runs for minutes instead of seconds — AS MATERIALIZED
        // pins compute-once semantics (verified identical 1857-row core)
        def round(prev: String, cur: String): String =
          s"""$cur AS MATERIALIZED (SELECT ed.u AS node FROM ed
             |  JOIN $prev a ON ed.u = a.node JOIN $prev b ON ed.v = b.node
             |  GROUP BY ed.u HAVING count(*) >= 80)""".stripMargin
        s"""WITH pp AS MATERIALIZED (SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
           |    FROM lineitem a JOIN lineitem b
           |      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
           |ed AS MATERIALIZED (SELECT pa AS u, pb AS v FROM pp
           |  UNION ALL SELECT pb, pa FROM pp),
           |c0 AS MATERIALIZED (SELECT DISTINCT u AS node FROM ed),
           |${(1 to 8).map(i => round(s"c${i - 1}", s"c$i")).mkString(",\n")}
           |SELECT CAST(ed.u AS BIGINT) AS part_key,
           |  CAST(count(*) AS BIGINT) AS core_deg
           |FROM ed JOIN c8 a ON ed.u = a.node JOIN c8 b ON ed.v = b.node
           |GROUP BY ed.u ORDER BY part_key""".stripMargin
      }),
  )
}
