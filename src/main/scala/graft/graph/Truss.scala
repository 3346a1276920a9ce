package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.rel.RelQueries.Q
import graft.rel.Tables

/** K-TRUSS DECOMPOSITION (Cohen 2008, "Trusses: cohesive subgraphs
  * for social network analysis") — the triangle-grade community core:
  * the maximal subgraph where EVERY EDGE closes at least k−2
  * triangles within the subgraph. Where k-core peels NODES by degree
  * (q-entry kCore), the truss peels EDGES by triangle support — a
  * strictly stronger cohesion signal (every k-truss is inside a
  * (k−1)-core, not vice versa), the standard next rung for community
  * detection over co-occurrence graphs.
  *
  * Shape: iterate (recount per-edge support over the SURVIVING
  * subgraph → drop edges under k−2) to the fixed point, exactly the
  * KCore contract — loud raise if not stable within `maxRounds`,
  * never a silently-truncated answer. Each round's support ride
  * [[Triangles.edgeTriangleCountsOf]] — the degree-oriented √(2m)-
  * bounded intersection under the adjacency byte cap — so the per-
  * round cost is the triangle-counting cost on a MONOTONICALLY
  * SHRINKING graph; peeling converges in a handful of rounds on
  * real graphs (the fixture stabilizes in 2). The oracle unrolls a
  * fixed round budget ≥ the stable point: post-convergence rounds
  * are no-ops, so the replay is exact regardless of where inside the
  * budget Spark stopped.
  */
object Truss {

  /** Edges of the k-truss with their final support, ordered:
    * (a, b, support). Raises if peeling hasn't stabilized within
    * `maxRounds`.
    */
  def kTruss(s: SparkSession, edges: DataFrame, k: Int,
      maxRounds: Int = 8): DataFrame = {
    require(k >= 3, s"kTruss: k >= 3: $k")
    require(maxRounds >= 1 && maxRounds <= 32,
      s"kTruss: 1 <= maxRounds <= 32: $maxRounds")
    val minSup = (k - 2).toLong
    var cur = Triangles.canonicalEdges(edges).localCheckpoint(true)
    var n = cur.count()
    var stable = false
    var rounds = 0
    var next: DataFrame = null
    while (rounds < maxRounds && !stable) {
      // cur is already canonical (a < b, distinct: canonicalEdges at
      // entry, a filtered subset thereafter) AND checkpointed, so the
      // support recount goes straight to edgeTriangleCountsOf — the
      // edgeTriangleCounts wrapper's canonicalEdges re-ran a full
      // dedup exchange + cache over the survivor set every round for
      // nothing (r15 opt, guide §2.4)
      val sup = Triangles.edgeTriangleCountsOf(s, cur)
      next = cur.join(sup, Seq("a", "b"), "left")
        .select(col("a"), col("b"),
          coalesce(col("cn"), lit(0L)).as("support"))
        .filter(col("support") >= minSup)
        .localCheckpoint(true)
      val nn = next.count()
      stable = nn == n
      n = nn
      cur = next.select("a", "b")
      rounds += 1
      if (n == 0) stable = true // empty truss: trivially stable
    }
    if (!stable) throw new IllegalStateException(
      s"kTruss: peel not stable within $maxRounds rounds — raise maxRounds")
    if (n == 0) {
      cur.select(col("a"), col("b"), lit(0L).as("support")).limit(0)
    } else {
      // support over the FINAL subgraph: stability means the last
      // round's filter kept EVERY edge (next ⊆ prev with equal count
      // ⟹ next = prev), so the checkpointed `next` — the stable edge
      // set with the support recounted over that same set — IS the
      // answer; the old re-join against the lazy support table ran one
      // more join job for rows already on disk (r15 opt, guide §1.2)
      next.orderBy("a", "b")
    }
  }

  private def trussOracleSql(k: Int, rounds: Int): String = {
    val minSup = k - 2
    val body = (1 to rounds).map { r =>
      s"""s$r AS (SELECT a AS u, b AS v FROM t${r - 1}
         |  UNION ALL SELECT b AS u, a AS v FROM t${r - 1}),
         |c$r AS (SELECT x.u AS a, y.u AS b, count(*) AS cn
         |  FROM s$r x JOIN s$r y ON x.v = y.v AND x.u < y.u
         |  JOIN t${r - 1} e ON e.a = x.u AND e.b = y.u
         |  GROUP BY 1, 2),
         |t$r AS MATERIALIZED (SELECT e.a, e.b,
         |    coalesce(c$r.cn, 0) AS support
         |  FROM t${r - 1} e LEFT JOIN c$r ON c$r.a = e.a AND c$r.b = e.b
         |  WHERE coalesce(c$r.cn, 0) >= $minSup)""".stripMargin
    }.mkString(",\n")
    s"""WITH ${CoPurchase.Sql},
       |t0 AS MATERIALIZED (SELECT a, b FROM e0),
       |$body
       |SELECT a, b, CAST(support AS BIGINT) AS support
       |FROM t$rounds ORDER BY a, b""".stripMargin
  }

  val all: ListMap[String, Q] = ListMap(
    // ---- q331: 3-TRUSS of the q315 co-purchase graph — every
    //      surviving edge closes >= 1 triangle within the surviving
    //      subgraph (181 edges at sf0.01; the fixture peels stable in
    //      2 rounds, the oracle unrolls 4 — post-stable rounds are
    //      no-ops). ----
    "q331_ktruss" -> Q(
      (s, d) => kTruss(s, CoPurchase.edges(s, d), k = 3, maxRounds = 4),
      Some(trussOracleSql(k = 3, rounds = 4))),
  )
}
