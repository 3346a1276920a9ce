package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.rel.RelQueries.Q
import graft.rel.Tables

/** LINK PREDICTION over an undirected graph — score non-adjacent node
  * pairs at distance 2 by their shared neighborhood (Liben-Nowell &
  * Kleinberg CIKM'03, "The link prediction problem for social
  * networks"): COMMON-NEIGHBOR count, plus the RESOURCE-ALLOCATION
  * index Σ_{w ∈ Γ(a)∩Γ(b)} 1/deg(w) (Zhou, Lü & Zhang 2009, Eur.
  * Phys. J. B 71 — the top performer of the 1/f(deg) family in their
  * benchmark, and EXACT in integers here: each wedge center
  * contributes ⌊10⁶ / deg(w)⌋ micro-units via truncating division, so
  * scores replay bit-for-bit in SQL with no log/float divergence —
  * the reason RA is preferred over Adamic-Adar's 1/ln(deg) in this
  * engine).
  *
  * Shape: candidate pairs are exactly the wedges (a—w—b), enumerated
  * from each center's neighbor list — the same pair space as the
  * q118 triangle wedge bound, but link prediction needs ALL wedges
  * (orientation can't prune: a prediction must see every common
  * neighbor), so fan-out is bounded by the `degCap` HUB CAP instead:
  * centers above the cap are excluded (≤ cap² candidate rows per
  * center). That is the standard practical estimator — RA weights a
  * hub center by 1/deg ≤ 1/cap, so dropped hubs contribute only
  * near-noise mass — and the cap is part of the operator's contract
  * (the oracle replays it; callers size it to their skew).
  * Existing edges leave via one anti-join on the canonical edge set;
  * top-N rides a TakeOrdered (per-partition heap, never a global
  * sort) under the total (ra, cn, a, b) order.
  */
object LinkPrediction {

  /** RA contributions in micro-units: ⌊RaScale / deg⌋ */
  val RaScale = 1000000L

  /** Scores for all non-adjacent distance-2 pairs of the undirected
    * graph given by edge list (`a`, `b`) — self-loops dropped,
    * duplicates collapsed, both input orientations accepted. Output:
    * (a, b, cn, ra_micro) for the `topN` pairs under (ra_micro desc,
    * cn desc, a, b), a < b.
    */
  def linkPredictionScores(s: SparkSession, edges: DataFrame,
      degCap: Long = 4096L, topN: Int = 50,
      canonicalInput: Boolean = false): DataFrame = {
    require(degCap >= 1, s"degCap=$degCap")
    require(topN >= 1, s"topN=$topN")
    // canonicalInput = caller guarantees `edges` is already a distinct
    // (a < b) canonical table (the CoPurchase contract), skipping the
    // re-canonicalization's dedup exchange (r15 opt, guide §2.4)
    val und = (if (canonicalInput)
        edges.select(col("a").cast("long").as("a"),
          col("b").cast("long").as("b"))
      else Triangles.canonicalEdges(edges)).localCheckpoint()
    val nb = und.select(col("a").as("x"), col("b").as("y"))
      .union(und.select(col("b").as("x"), col("a").as("y")))
    val deg = nb.groupBy("x").agg(count(lit(1)).as("d"))
    val nbc = nb.join(deg, "x").filter(col("d") <= degCap)
      .withColumn("rt", expr(s"$RaScale div d"))
    val wedges = nbc.as("e1").join(nbc.as("e2"),
        col("e1.x") === col("e2.x") && col("e1.y") < col("e2.y"))
      .select(col("e1.y").as("a"), col("e2.y").as("b"),
        col("e1.rt").as("ra_term"))
    wedges
      .groupBy("a", "b")
      .agg(count(lit(1)).as("cn"), sum("ra_term").as("ra_micro"))
      .join(und, Seq("a", "b"), "left_anti")
      .select(col("a"), col("b"), col("cn"), col("ra_micro"))
      .orderBy(col("ra_micro").desc, col("cn").desc, col("a"), col("b"))
      .limit(topN)
  }

  val all: ListMap[String, Q] = ListMap(
    // ---- q315: LINK PREDICTION on the repeat co-purchase graph
    //      (parts adjacent when they co-occur in >= 2 orders — the
    //      min-support sparsification that makes "you may also like"
    //      candidates meaningful): top-50 non-adjacent pairs by
    //      resource allocation, common neighbors breaking ties. ----
    "q315_link_prediction" -> Q(
      (s, d) => linkPredictionScores(s, CoPurchase.edges(s, d),
        degCap = 4096L, topN = 50, canonicalInput = true),
      Some(s"""WITH ${CoPurchase.Sql},
             |e AS (SELECT a, b FROM e0),
             |nb AS (SELECT a AS x, b AS y FROM e
             |  UNION ALL SELECT b AS x, a AS y FROM e),
             |deg AS (SELECT x, CAST(count(*) AS BIGINT) AS d
             |  FROM nb GROUP BY x),
             |nbc AS (SELECT nb.x, nb.y, deg.d FROM nb
             |  JOIN deg USING (x) WHERE deg.d <= 4096),
             |w AS (SELECT e1.y AS a, e2.y AS b, e1.d
             |  FROM nbc e1 JOIN nbc e2 ON e1.x = e2.x AND e1.y < e2.y),
             |sc AS (SELECT a, b, CAST(count(*) AS BIGINT) AS cn,
             |    CAST(sum(1000000 // d) AS BIGINT) AS ra_micro
             |  FROM w GROUP BY a, b)
             |SELECT a, b, cn, ra_micro FROM sc
             |WHERE NOT EXISTS (SELECT 1 FROM e
             |  WHERE e.a = sc.a AND e.b = sc.b)
             |ORDER BY ra_micro DESC, cn DESC, a, b LIMIT 50""".stripMargin)))
}
