package graft.rel

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.rel.RelQueries.Q

/** END-TO-END ENTITY RESOLUTION — the composed pipeline a user of the
  * individual stages actually runs: BLOCK (sorted-neighborhood, q240)
  * → SCORE (Fellegi–Sunter milli-bit weights, q243) → CLUSTER
  * (log-round connected components over the accepted match edges,
  * q239) → SURVIVE (golden record per cluster: max completeness, min
  * id tie-break — the q145 convention). Every stage is individually
  * oracle-pinned; this entry pins the COMPOSITION, because stage
  * contracts can drift in exactly the ways unit pins don't see
  * (column renames, threshold off-by-ones, orientation of pair ids).
  *
  * Scale: inherits each stage's shape — linear candidate volume from
  * the blocker, narrow-map scoring, O(log n)-round clustering bounded
  * by the MATCH edge set (≪ candidate set), and survivorship as two
  * keyed aggs + one join (no windows over the corpus).
  */
object EntityResolution {

  /** Cluster + golden-record assignment for the documents corpus:
    * (doc_id, cluster_id, cluster_size, golden_id) for every doc in a
    * match cluster (singletons are not entities — omitted). Golden =
    * the cluster member with the longest text, ties to the smaller id.
    */
  def resolveDocuments(s: SparkSession, docs: DataFrame, w: Int,
      matchMilli: Long): DataFrame = {
    val keyed = docs.select(col("doc_id"),
      lower(substring(col("text"), 1, 32)).as("key"),
      col("lang"), col("source"),
      floor(col("n_chars") / 100).cast("long").as("band"),
      col("n_chars"))
    val pairs = graft.llm.SortedNeighborhood.neighborhoodPairs(
      keyed, Seq(col("key"), col("doc_id")), "doc_id", w)
    val sides = pairs
      .join(keyed.select(col("doc_id").as("id_a"), col("lang").as("lang_a"),
        col("source").as("source_a"), col("band").as("band_a")), "id_a")
      .join(keyed.select(col("doc_id").as("id_b"), col("lang").as("lang_b"),
        col("source").as("source_b"), col("band").as("band_b")), "id_b")
    val scored = Linkage.fellegiSunterScore(sides, Seq(
        Linkage.FieldCompare("lang", col("lang_a") === col("lang_b"), 0.95, 0.20),
        Linkage.FieldCompare("source", col("source_a") === col("source_b"), 0.90, 0.25),
        Linkage.FieldCompare("len_band", col("band_a") === col("band_b"), 0.80, 0.05)),
      upperMilli = matchMilli, lowerMilli = 0L)
    val matches = scored.filter(col("weight_milli") >= matchMilli)
      .select(col("id_a").as("u"), col("id_b").as("v"))
    val clusters = graft.graph.ConnectedComponents
      .connectedComponents(s, matches)
      .select(col("node").as("doc_id"), col("comp_id").as("cluster_id"),
        col("comp_size").as("cluster_size"))
    // survivorship: argmax(n_chars, tie min doc_id) as two keyed aggs —
    // the shape that replays verbatim in SQL, no struct-ordering tricks
    val membersLen = clusters
      .join(keyed.select(col("doc_id"), col("n_chars")), "doc_id")
    val maxLen = membersLen.groupBy("cluster_id")
      .agg(max(col("n_chars")).as("__mx"))
    val golden = membersLen.join(maxLen, "cluster_id")
      .filter(col("n_chars") === col("__mx"))
      .groupBy("cluster_id").agg(min(col("doc_id")).as("golden_id"))
    clusters.join(golden, "cluster_id")
      .select("doc_id", "cluster_id", "cluster_size", "golden_id")
  }

  /** BLOCKING QUALITY — the two numbers every blocker is judged by
    * (Christen 2012): PAIRS COMPLETENESS = |candidates ∩ true pairs| /
    * |true pairs| (recall of the blocking stage — what the pipeline
    * can never get back) and REDUCTION RATIO = 1 − |candidates| /
    * C(n,2) (how much of the quadratic space it refused to touch).
    * Exact integer counts + two fixed rounded divisions; candidate and
    * truth sets join on canonicalized (lo, hi) pairs so orientation
    * can't double- or zero-count.
    */
  def blockingQuality(candidates: DataFrame, truePairs: DataFrame,
      nRecords: Long): DataFrame = {
    def canon(df: DataFrame) = df.select(
      least(col("id_a"), col("id_b")).as("lo"),
      greatest(col("id_a"), col("id_b")).as("hi")).distinct()
    val c = canon(candidates); val t = canon(truePairs)
    // all four numbers and both rounded divisions are ENGINE
    // expressions (1-row aggs crossed), so the oracle's identical SQL
    // chain cannot round differently
    val nC = c.agg(count(lit(1)).as("n_candidates"))
    val nT = t.agg(count(lit(1)).as("n_true"))
    val hit = c.join(t, Seq("lo", "hi")).agg(count(lit(1)).as("n_hit"))
    val total = nRecords * (nRecords - 1) / 2
    nC.crossJoin(nT).crossJoin(hit)
      .withColumn("pairs_completeness_r6",
        when(col("n_true") === 0, 1.0)
          .otherwise(round(col("n_hit").cast("double") / col("n_true"), 6)))
      .withColumn("reduction_ratio_r6",
        round(lit(1.0) - col("n_candidates").cast("double") / lit(total), 6))
  }

  val all: ListMap[String, Q] = ListMap(
    // ---- q246: the full ER pipeline on documents — block w=10, score
    //      on (lang, source, len band), accept ≥ 4000 milli-bits,
    //      cluster, survive. Oracle replays all four stages in one
    //      SQL statement: the q240 SNM CTE, the q243 weight CASEs
    //      (same literals), a recursive-CTE closure over the match
    //      edges, and the two-agg golden-record selection. ----
    "q246_entity_resolution" -> Q(
      (s, d) => resolveDocuments(s, Tables.documents(s, d),
          w = 10, matchMilli = 4000L)
        .select(col("doc_id").cast("long"), col("cluster_id").cast("long"),
          col("cluster_size").cast("long"), col("golden_id").cast("long"))
        .orderBy("doc_id"),
      Some("""WITH RECURSIVE k AS (
             |  SELECT doc_id, lower(substr(text, 1, 32)) AS key,
             |    lang, source,
             |    CAST(floor(n_chars / 100) AS BIGINT) AS band, n_chars
             |  FROM documents),
             |r AS (SELECT doc_id, lang, source, band,
             |    row_number() OVER (ORDER BY key, doc_id) AS rk
             |  FROM k),
             |p AS (SELECT a.doc_id AS u, b.doc_id AS v,
             |    (CASE WHEN a.lang = b.lang THEN 2248 ELSE -4000 END)
             |    + (CASE WHEN a.source = b.source THEN 1848 ELSE -2907 END)
             |    + (CASE WHEN a.band = b.band THEN 4000 ELSE -2248 END)
             |      AS w
             |  FROM r a JOIN r b ON b.rk > a.rk AND b.rk - a.rk < 10),
             |e AS (SELECT u, v FROM p WHERE w >= 4000),
             |sym AS (SELECT u, v FROM e UNION SELECT v, u FROM e),
             |reach(u, v) AS (
             |  SELECT u, v FROM sym
             |  UNION
             |  SELECT t.u, s.v FROM reach t JOIN sym s ON t.v = s.u),
             |allr AS (SELECT DISTINCT u, v FROM (
             |  SELECT u, v FROM reach
             |  UNION ALL SELECT u, u FROM sym)),
             |comp AS (SELECT u AS doc_id, min(v) AS cluster_id
             |  FROM allr GROUP BY u),
             |sz AS (SELECT cluster_id, count(*) AS n
             |  FROM comp GROUP BY 1),
             |ml AS (SELECT c.cluster_id, max(k2.n_chars) AS mx
             |  FROM comp c JOIN k k2 ON c.doc_id = k2.doc_id
             |  GROUP BY 1),
             |g AS (SELECT c.cluster_id, min(c.doc_id) AS golden_id
             |  FROM comp c JOIN k k2 ON c.doc_id = k2.doc_id
             |  JOIN ml ON ml.cluster_id = c.cluster_id
             |    AND k2.n_chars = ml.mx
             |  GROUP BY 1)
             |SELECT CAST(c.doc_id AS BIGINT) AS doc_id,
             |  CAST(c.cluster_id AS BIGINT) AS cluster_id,
             |  CAST(sz.n AS BIGINT) AS cluster_size,
             |  CAST(g.golden_id AS BIGINT) AS golden_id
             |FROM comp c
             |JOIN sz ON sz.cluster_id = c.cluster_id
             |JOIN g ON g.cluster_id = c.cluster_id
             |ORDER BY doc_id""".stripMargin))
  )
}
