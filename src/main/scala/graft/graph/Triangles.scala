package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.rel.RelQueries.Q
import graft.rel.Tables

/** TRIANGLE COUNTING — per-node triangle participation over an
  * undirected graph, the clustering-structure primitive (cohesion
  * scoring, community seeds, spam-farm detection on link graphs).
  *
  * The naive wedge join explodes at hubs: a degree-D node generates
  * D² wedge candidates, and real graphs are power-law. The classic fix
  * (Suri & Vassilvitskii, WWW 2011; Cohen's MapReduce curriculum)
  * orients every edge from the (degree, id)-SMALLER endpoint to the
  * larger; each triangle then has exactly one source node (its
  * orientation-minimum), wedges are enumerated only from a node's
  * OUT-edges, and a node's out-degree under this orientation is
  * O(√m) — the hub's edges point INTO it, so the hub generates no
  * wedge storm. Same triangle set, bounded fan-out.
  *
  * Implementation trick: the orientation order (deg, id) is packed
  * into ONE sortable long `okey = deg·2³² + id` (ids must fit in 31
  * bits — required loudly), so orientation and wedge ordering are
  * plain long comparisons and the node id round-trips via the low
  * bits. All arithmetic is exact integers; the oracle can enumerate
  * the same triangle SET in plain id order (orientation changes the
  * enumeration, never the set) and match counts by hash.
  *
  * Scale shape (100 TB): canonical edges are built once (one shuffle +
  * distinct) and cached; degrees are one aggregation; the wedge join
  * and the closing-edge join shuffle on node / edge keys with the
  * √m out-degree bound doing the work a skew cap would otherwise do.
  * No driver-side state at all.
  */
object Triangles {

  /** Canonicalize an arbitrary (`a`, `b`) edge list: self-loops
    * dropped, duplicates collapsed, both input orientations accepted,
    * output pinned to a < b. Every public entry point funnels through
    * this ONCE; compositions (clusteringCoefficients, embeddedness)
    * cache the result and hand it to the `*Of` variants so the — often
    * dominant — raw edge build is never executed twice.
    */
  def canonicalEdges(edges: DataFrame): DataFrame = edges
    .select(col("a").cast("long").as("a"), col("b").cast("long").as("b"))
    .filter(col("a") =!= col("b"))
    .select(least(col("a"), col("b")).as("a"), greatest(col("a"), col("b")).as("b"))
    .distinct()

  /** Guard + orientation build shared by the per-node and per-edge
    * counters. Validates the packed-okey id range and the adjacency-row
    * byte bound, then orients every canonical edge from the (deg, id)-
    * smaller endpoint. Returns (oriented edges in okey space — NOT
    * cached, callers own that — and the (x, d) degree table).
    */
  private def orientGuarded(und: DataFrame, adjRowBytesCap: Long,
      degOpt: Option[DataFrame]): (DataFrame, DataFrame) = {
    // ids must fit below the degree bits of the packed orientation key;
    // m rides along in the same agg (no extra job) for the size guard
    val hd = und.agg(max(greatest(col("a"), col("b"))).as("mx"),
      count(lit(1)).as("m")).head
    val mx = hd.getLong(0); val m = hd.getLong(1)
    require(mx < (1L << 31), s"node ids must fit in 31 bits: max id $mx")
    // LOUD adjacency-row size guard: under the (deg, id) orientation
    // d⁺(v) ≤ √(2m) for EVERY degree distribution (a node of degree
    // ≤ √(2m) trivially; a node of degree > √(2m) only out-points to
    // nodes of ≥ its degree, and fewer than √(2m) such nodes exist) —
    // so the largest collect_list row carries ≤ √(2m) longs. That bound
    // is a graph-size theorem, not a skew hope, but at extreme m the
    // row itself gets big (m = 10¹²  →  ~1.4M entries ≈ 11 MB); past
    // the cap fail loudly instead of letting a multi-GB row OOM an
    // executor mid-shuffle. 2⁵⁴ edges before the default cap trips.
    val adjBound = math.ceil(math.sqrt(2.0 * m)).toLong * 12L // 8B long + list overhead
    require(adjBound <= adjRowBytesCap,
      s"adjacency rows may reach ~$adjBound bytes (√(2·$m edges) longs) > " +
        s"cap $adjRowBytesCap: split neighborhoods (hash-bucket the " +
        "adjacency arrays) before intersecting at this scale")
    val deg = degOpt.getOrElse(
      und.select(explode(array(col("a"), col("b"))).as("x"))
        .groupBy("x").agg(count(lit(1)).as("d")))
    val okeyed = und
      .join(deg.withColumnRenamed("x", "a").withColumnRenamed("d", "da"), "a")
      .join(deg.withColumnRenamed("x", "b").withColumnRenamed("d", "db"), "b")
      .select((col("da") * (1L << 32) + col("a")).as("oka"),
        (col("db") * (1L << 32) + col("b")).as("okb"))
    (okeyed.select(least(col("oka"), col("okb")).as("u"),
      greatest(col("oka"), col("okb")).as("v")), deg)
  }

  /** Per-node triangle counts of the undirected graph given by edge
    * list (`a`, `b`) — self-loops dropped, duplicates collapsed, both
    * orientations accepted. Output: (node, n_tri) for nodes in ≥ 1
    * triangle.
    */
  def triangleCounts(s: SparkSession, edges: DataFrame,
      adjRowBytesCap: Long = 1L << 28): DataFrame = {
    val und = canonicalEdges(edges).cache()
    val counts = triangleCountsOf(s, und, adjRowBytesCap)
    und.unpersist()
    counts
  }

  /** Per-node counts from an ALREADY-canonical (a < b, distinct) edge
    * set the CALLER has cached — the composition entry point that keeps
    * an expensive raw edge build (e.g. the C(basket,2) co-purchase
    * self-join) from running once per consumer. The result is eagerly
    * materialized (localCheckpoint), so the caller may unpersist `und`
    * as soon as every OTHER consumer of it has also run.
    */
  def triangleCountsOf(s: SparkSession, und: DataFrame,
      adjRowBytesCap: Long = 1L << 28,
      degOpt: Option[DataFrame] = None): DataFrame = {
    // the oriented edge table feeds THREE join sides (wedge e1/e2 and
    // the closing e3); cached, each side reads the shuffled result of
    // the two degree joins instead of recomputing them
    val ori = orientGuarded(und, adjRowBytesCap, degOpt)._1.cache()
    // Edge-iterator with NEIGHBORHOOD INTERSECTION instead of the wedge
    // join: each triangle {a,b,c} oriented a→b, a→c, b→c is found
    // exactly once, on its edge (a,b), as c ∈ N⁺(a) ∩ N⁺(b). The wedge
    // formulation materializes Σ C(d⁺,2) candidate rows through a
    // composite-key shuffle and discards most of them at the closing
    // join; here the only new table is the adjacency list (one row per
    // node, array bounded by the O(√m) orientation out-degree), the
    // intersection runs as a codegen'd array op inside the edge scan,
    // and nothing wider than 2·(closing edges) + (triangles) rows is
    // ever shuffled (measured 1.3× end-to-end at sf0.1, 7.9 s → 6.0 s —
    // the shared edge build is a fixed cost that dilutes the ratio).
    // At local scale AQE broadcasts the
    // adjacency side; at cluster scale the same plan degrades to a
    // shuffle join on node id — both sides bounded, no plan rewrite.
    val adj = ori.groupBy(col("u").as("n")).agg(collect_list(col("v")).as("nb"))
    val common = ori
      .join(adj.select(col("n").as("u"), col("nb").as("nba")), "u")
      .join(adj.select(col("n").as("v"), col("nb").as("nbb")), "v")
      .select(col("u"), col("v"),
        array_intersect(col("nba"), col("nbb")).as("cs"))
      .filter(size(col("cs")) > 0)
    // credit all three corners: the edge endpoints participate in ONE
    // triangle per closing node (weight |cs|), each closing node in one
    // per edge that closes through it (weight 1) — summing weights
    // shuffles 2·|closing edges| + |triangles| rows instead of the
    // 3·|triangles| a flat per-triangle explode would
    val endpointCredits = common.select(
      explode(array(
        struct(col("u").as("ok"), size(col("cs")).cast("long").as("c")),
        struct(col("v").as("ok"), size(col("cs")).cast("long").as("c")))).as("e"))
      .select(col("e.ok").as("ok"), col("e.c").as("c"))
    val closingCredits = common
      .select(explode(col("cs")).as("ok"), lit(1L).as("c"))
    val counts = endpointCredits.unionAll(closingCredits)
      .select((col("ok") % (1L << 32)).as("node"), col("c"))
      .groupBy("node").agg(sum("c").as("n_tri"))
      // per-node counts are tiny; materialize them (eager local
      // checkpoint) so the cached edge table can be released here
      // rather than leak into a long-lived session
      .localCheckpoint()
    ori.unpersist()
    counts
  }

  /** PER-EDGE triangle counts — for each existing canonical edge
    * (a, b), the number of triangles containing it, which is exactly
    * |N(a) ∩ N(b)| on the undirected graph (common neighbors of an
    * existing edge ≡ closing nodes of that edge). Built on the SAME
    * oriented √(2m)-bounded machinery as the per-node counter — each
    * triangle {u→v→w} is found once on its oriented edge (u, v) and
    * credited to its three edges (u,v) += |cs| collapses to the edge
    * itself, (u,w) and (v,w) += 1 per closing node — so no FULL
    * neighborhood is ever collected: the only arrays are the oriented
    * adjacency rows the d⁺ ≤ √(2m) theorem bounds. (The naive
    * formulation — join full undirected neighborhoods onto each edge
    * and intersect — carries O(d_max) rows with NO theorem behind
    * them: one hub row at power-law scale is an executor OOM.)
    * Output: (a, b, cn) for edges in ≥ 1 triangle, canonical a < b;
    * edges in no triangle are absent (left-join + coalesce at the
    * call site).
    */
  /** Per-edge triangle counts of an arbitrary edge list — the public
    * wrapper over [[edgeTriangleCountsOf]] for callers without a
    * pre-canonicalized edge set.
    */
  def edgeTriangleCounts(s: SparkSession, edges: DataFrame,
      adjRowBytesCap: Long = 1L << 28): DataFrame = {
    val und = canonicalEdges(edges).cache()
    val counts = edgeTriangleCountsOf(s, und, adjRowBytesCap)
    und.unpersist()
    counts
  }

  def edgeTriangleCountsOf(s: SparkSession, und: DataFrame,
      adjRowBytesCap: Long = 1L << 28,
      degOpt: Option[DataFrame] = None): DataFrame = {
    val ori = orientGuarded(und, adjRowBytesCap, degOpt)._1.cache()
    val adj = ori.groupBy(col("u").as("n")).agg(collect_list(col("v")).as("nb"))
    val common = ori
      .join(adj.select(col("n").as("u"), col("nb").as("nba")), "u")
      .join(adj.select(col("n").as("v"), col("nb").as("nbb")), "v")
      .select(col("u"), col("v"),
        array_intersect(col("nba"), col("nbb")).as("cs"))
      .filter(size(col("cs")) > 0)
    // credit the three edges of each triangle: (u,v) gets the whole
    // closing set in one row; (u,w) and (v,w) get 1 per closing node —
    // 2·|closing triangles| + |closing edges| shuffled rows, same
    // budget shape as the per-node counter
    val credits = common.select(col("u").as("p"), col("v").as("q"),
        size(col("cs")).cast("long").as("c"))
      .unionAll(common.select(col("u").as("p"), explode(col("cs")).as("q"))
        .select(col("p"), col("q"), lit(1L).as("c")))
      .unionAll(common.select(col("v").as("p"), explode(col("cs")).as("q"))
        .select(col("p"), col("q"), lit(1L).as("c")))
    // okeys → node ids, re-canonicalized to the caller's a < b order
    // (okey order is (deg, id) order, not id order)
    val ids = credits.select((col("p") % (1L << 32)).as("x"),
      (col("q") % (1L << 32)).as("y"), col("c"))
    val counts = ids
      .select(least(col("x"), col("y")).as("a"),
        greatest(col("x"), col("y")).as("b"), col("c"))
      .groupBy("a", "b").agg(sum("c").as("cn"))
      .localCheckpoint()
    ori.unpersist()
    counts
  }

  /** LOCAL CLUSTERING COEFFICIENT per node: 2·tri(v) / (deg(v)·(deg(v)−1))
    * — how close each node's neighborhood is to a clique, the standard
    * community-tightness signal on top of the triangle machinery.
    * Degrees come from one agg over the same canonical undirected edge
    * set; zero-triangle nodes keep coefficient 0 (left join), degree-1
    * nodes are excluded (undefined denominator). The count pair is
    * exact; the one float op is the rounded division, a fixed chain
    * both engines share.
    */
  def clusteringCoefficients(s: SparkSession, edges: DataFrame,
      adjRowBytesCap: Long = 1L << 28): DataFrame = {
    // ONE canonical edge build feeds both the degree agg and the
    // triangle counter (for q258's C(basket,2) co-purchase build —
    // the heaviest stage — this halves the work vs composing the
    // public triangleCounts, which would re-canonicalize internally).
    // The |V|-sized degree table is eagerly materialized so `und` can
    // be released before the lazy final join runs.
    val und = canonicalEdges(edges).cache()
    val degX = und.select(explode(array(col("a"), col("b"))).as("x"))
      .groupBy("x").agg(count(lit(1)).as("d"))
      .localCheckpoint()
    val tri = triangleCountsOf(s, und, adjRowBytesCap, Some(degX))
    und.unpersist()
    val deg = degX.select(col("x").as("node"), col("d").as("degree"))
    deg.join(tri, Seq("node"), "left")
      .filter(col("degree") >= 2)
      .select(col("node"), col("degree"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"))
      .withColumn("coeff_r6", round(
        lit(2.0) * col("n_tri") /
          (col("degree") * (col("degree") - lit(1.0))), 6))
  }

  /** q118: the part CO-PURCHASE graph — parts are adjacent when they
    * co-occur in an order (per-order pair fan-out is C(basket, 2),
    * bounded by basket size, so the edge build needs no cap). The
    * oracle enumerates triangles in plain id order — a different
    * enumeration of the SAME set — and replays the per-node explode.
    */
  val all: ListMap[String, Q] = ListMap(
    "q118_triangles" -> Q(
      (s, d) => {
        val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_partkey"))
        val edges = li.as("x").join(li.as("y"),
            col("x.l_orderkey") === col("y.l_orderkey") &&
              col("x.l_partkey") < col("y.l_partkey"))
          .select(col("x.l_partkey").as("a"), col("y.l_partkey").as("b"))
        triangleCounts(s, edges)
          .select(col("node").as("part_key"), col("n_tri"))
          .orderBy("part_key")
      },
      Some("""WITH pp AS (SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
             |    FROM lineitem a JOIN lineitem b
             |      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
             |tri AS (SELECT e1.pa AS x, e1.pb AS y, e2.pb AS z
             |  FROM pp e1 JOIN pp e2 ON e1.pb = e2.pa
             |    JOIN pp e3 ON e3.pa = e1.pa AND e3.pb = e2.pb),
             |r AS (SELECT x AS k FROM tri
             |  UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri)
             |SELECT CAST(k AS BIGINT) AS part_key, count(*) AS n_tri
             |FROM r GROUP BY k ORDER BY part_key""".stripMargin)),

    // ---- q258: local clustering coefficients of the q118 graph —
    //      exact (tri, degree) pairs, one rounded division; degree-1
    //      nodes excluded, triangle-free nodes at 0. ----
    "q258_clustering_coeff" -> Q(
      (s, d) => {
        val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_partkey"))
        val edges = li.as("x").join(li.as("y"),
            col("x.l_orderkey") === col("y.l_orderkey") &&
              col("x.l_partkey") < col("y.l_partkey"))
          .select(col("x.l_partkey").as("a"), col("y.l_partkey").as("b"))
        clusteringCoefficients(s, edges)
          .select(col("node").cast("long"), col("degree").cast("long"),
            col("n_tri").cast("long"), col("coeff_r6"))
          .orderBy("node")
      },
      Some("""WITH pp AS (SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
             |    FROM lineitem a JOIN lineitem b
             |      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
             |tri AS (SELECT e1.pa AS x, e1.pb AS y, e2.pb AS z
             |  FROM pp e1 JOIN pp e2 ON e1.pb = e2.pa
             |    JOIN pp e3 ON e3.pa = e1.pa AND e3.pb = e2.pb),
             |r AS (SELECT x AS k FROM tri
             |  UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri),
             |t AS (SELECT k, count(*) AS n_tri FROM r GROUP BY k),
             |deg AS (SELECT k, count(*) AS degree FROM (
             |  SELECT pa AS k FROM pp UNION ALL SELECT pb FROM pp)
             |  GROUP BY k)
             |SELECT CAST(deg.k AS BIGINT) AS node,
             |  CAST(degree AS BIGINT) AS degree,
             |  CAST(coalesce(t.n_tri, 0) AS BIGINT) AS n_tri,
             |  round(2.0 * coalesce(t.n_tri, 0)
             |    / (degree * (degree - 1.0)), 6) AS coeff_r6
             |FROM deg LEFT JOIN t ON deg.k = t.k
             |WHERE degree >= 2 ORDER BY node""".stripMargin)),
  )
}
