package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.rel.RelQueries.Q
import graft.rel.Tables

/** CONNECTED COMPONENTS via alternating LARGE-STAR / SMALL-STAR
  * (Kiveris et al., "Connected Components in MapReduce and Beyond",
  * SoCC 2014) — the O(log n)-round formulation that replaces the
  * O(diameter) min-label propagation the dedup-cluster machinery
  * (q49) uses. On a 100 TB corpus the difference is decisive: a long
  * chain (diameter ~n) costs propagation one shuffle PER HOP, while
  * the star algorithm contracts the chain geometrically — every round
  * halves (at least) the height of each component's tree, so even a
  * path graph closes in ~log₂ n rounds (CcSpec pins exactly that on a
  * 64-node path: ≤ 8 rounds where propagation would need 63).
  *
  * Round anatomy (all rows are (hi, lo) pairs with hi > lo):
  *   LARGE-STAR  — center every node u on the min m of its closed
  *     neighborhood; re-hang each STRICTLY LARGER neighbor v on m.
  *     One symmetrized self-join-free pass: per-center min (a
  *     map-side-combinable agg) + one join back to the adjacency.
  *   SMALL-STAR  — orient edges high→low, center on the high end,
  *     re-hang the center and its smaller neighbors on the
  *     neighborhood min. Same two-shuffle shape.
  * The edge set never grows (each emitted edge replaces one read
  * edge), intermediates stay O(|E|), and both halves are pure
  * min-aggregations — deterministic, so the result is a function of
  * the graph alone and an SQL oracle can replay it as a transitive
  * closure. Fixpoint = the edge multiset is unchanged by a round
  * (checked with count + one anti-join; both frames are distinct).
  *
  * At the fixpoint every component is a star: each non-root node
  * carries exactly one edge (node, root) with root = the component's
  * min node id — the same canonical labeling q49 and Scc use.
  */
object ConnectedComponents {

  /** Components of the undirected graph `edges` (cols `u`, `v`, any
    * integer type; direction and duplicates ignored, self-loops
    * dropped). Returns (node, comp_id, comp_size) with comp_id = min
    * node id in the component. Isolated nodes never appear in an edge
    * list, so every returned node has degree ≥ 1.
    */
  def connectedComponents(s: SparkSession, edges: DataFrame): DataFrame =
    ccWithRounds(s, edges)._1

  /** Same, also returning the number of large+small rounds the
    * fixpoint took (spec'd logarithmic on a path graph). */
  private[graft] def ccWithRounds(s: SparkSession, edges: DataFrame)
      : (DataFrame, Int) = {
    // canonical internal form: (hi, lo), hi > lo, distinct
    var cur = edges
      .select(greatest(col("u").cast("long"), col("v").cast("long")).as("hi"),
        least(col("u").cast("long"), col("v").cast("long")).as("lo"))
      .filter(col("hi") =!= col("lo"))
      .distinct()
      .localCheckpoint()
    var rounds = 0
    var curCnt = -1L // cur's row count, carried across rounds so the
    // fixpoint check pays ONE count job per round, not two (r15 opt)
    var converged = cur.isEmpty
    while (!converged) {
      // LARGE-STAR: symmetrize, per-center closed-neighborhood min,
      // re-hang strictly larger neighbors on it. Emitted (v, m) keeps
      // v > m because m ≤ center < v. NOT deduplicated (r15 opt): the
      // n > c filter keeps exactly one orientation per input edge, so
      // the table stays |cur|-sized with no fan-out; duplicate (hi, lo)
      // rows (two centers sharing one min) are invisible to the
      // small-star min-aggregation and collapse in the round-end
      // distinct — the dedup here was one edge-sized exchange per
      // round for nothing.
      val sym = cur.select(col("hi").as("c"), col("lo").as("n"))
        .unionAll(cur.select(col("lo").as("c"), col("hi").as("n")))
      val mins = sym.groupBy("c").agg(min(col("n")).as("mn"))
        .select(col("c"), least(col("mn"), col("c")).as("m"))
      val large = sym.join(mins, "c")
        .filter(col("n") > col("c"))
        .select(col("n").as("hi"), col("m").as("lo"))
      // SMALL-STAR: already oriented high→low; center on hi, re-hang
      // the smaller neighbors AND the center on the neighborhood min.
      // m ≤ lo < hi, so both emissions keep the (hi, lo) invariant.
      val minsS = large.groupBy(col("hi").as("c"))
        .agg(min(col("lo")).as("m"))
      val j = large.join(minsS, large("hi") === minsS("c"))
      val next = j.filter(col("lo") =!= col("m"))
        .select(col("lo").as("hi"), col("m").as("lo"))
        .unionAll(j.select(col("hi"), col("m").as("lo")))
        .distinct()
        .localCheckpoint()
      rounds += 1
      // fixpoint: both sides distinct, so equal counts + empty
      // one-sided difference ⇒ equal sets
      val nextCnt = next.count()
      if (curCnt < 0) curCnt = cur.count()
      converged = nextCnt == curCnt && next.exceptAll(cur).isEmpty
      curCnt = nextCnt
      cur = next
    }
    val members = cur.select(col("hi").as("node"), col("lo").as("comp_id"))
    val roots = cur.select(col("lo").as("node"), col("lo").as("comp_id"))
      .distinct()
    val comp = members.unionAll(roots)
    val sizes = comp.groupBy("comp_id").agg(count(lit(1)).as("comp_size"))
    (comp.join(sizes, "comp_id").select("node", "comp_id", "comp_size"),
      rounds)
  }

  /** INCREMENTAL component maintenance: fold a batch of NEW edges into
    * an existing labeling without re-running CC on the corpus. Edges
    * can only MERGE components (deletions need a rebuild — same
    * contract as every monotone incremental structure in this repo),
    * and min-id labels compose: the merged component's label is the
    * min over the merged labels' members = the min over the labels
    * themselves. So the batch reduces to CC ON THE QUOTIENT — each new
    * edge mapped to the (label(u), label(v)) pair it bridges — whose
    * size is bounded by the BATCH's edge count, never the corpus; the
    * corpus-sized label table is touched by exactly two non-iterative
    * hash joins (map endpoints in, remap merged labels out) plus the
    * size re-aggregation. Equivalence to full recompute on the union
    * is spec-pinned and q244 puts it under the driver's oracle.
    */
  def incrementalComponents(s: SparkSession, labels: DataFrame,
      newEdges: DataFrame): DataFrame = {
    val e = newEdges
      .select(greatest(col("u").cast("long"), col("v").cast("long")).as("u"),
        least(col("u").cast("long"), col("v").cast("long")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
    val touched = e.select(col("u").as("node"))
      .unionAll(e.select(col("v").as("node"))).distinct()
    val newNodes = touched.join(labels.select("node"), Seq("node"), "left_anti")
      .select(col("node"), col("node").as("comp_id"))
    val allLab = labels.select(col("node"), col("comp_id"))
      .unionAll(newNodes)
    val mapped = e
      .join(allLab.select(col("node").as("u"), col("comp_id").as("lu")), "u")
      .join(allLab.select(col("node").as("v"), col("comp_id").as("lv")), "v")
      .select(col("lu").as("u"), col("lv").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
    val remap = connectedComponents(s, mapped)
      .select(col("node").as("comp_id"), col("comp_id").as("__cc_new"))
    val lab2 = allLab.join(remap, Seq("comp_id"), "left")
      .select(col("node"),
        coalesce(col("__cc_new"), col("comp_id")).as("comp_id"))
    val sizes = lab2.groupBy("comp_id").agg(count(lit(1)).as("comp_size"))
    lab2.join(sizes, "comp_id").select("node", "comp_id", "comp_size")
  }

  /** the q239/q244/q245 shared fixture: part co-purchase edges, optionally
    * restricted to orders of one parity (the q244 base/delta split) */
  private def coPurchaseEdges(s: SparkSession, d: String,
      parity: Option[Int]): DataFrame = {
    val hot0 = Tables.lineitem(s, d)
      .filter(col("l_quantity") >= 49)
      .select(col("l_orderkey"), col("l_partkey"))
    val hot = parity.fold(hot0)(p => hot0.filter(col("l_orderkey") % 2 === p))
    hot.as("a").join(hot.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
      .distinct()
  }

  private def ordered(df: DataFrame): DataFrame = df
    .select(col("node").cast("long").as("node"),
      col("comp_id").cast("long").as("comp_id"),
      col("comp_size").cast("long").as("comp_size"))
    .orderBy("node")

  /** q239's transitive-closure oracle — shared verbatim by q244 and
    * q245: the incremental/streaming folds must land exactly on the
    * full recompute. */
  private val closureOracle =
    """WITH RECURSIVE e AS (
      |  SELECT a.l_partkey AS u, b.l_partkey AS v
      |  FROM lineitem a JOIN lineitem b
      |    ON a.l_orderkey = b.l_orderkey
      |   AND a.l_partkey < b.l_partkey
      |  WHERE a.l_quantity >= 49 AND b.l_quantity >= 49
      |  GROUP BY 1, 2),
      |sym AS (SELECT u, v FROM e UNION SELECT v, u FROM e),
      |reach(u, v) AS (
      |  SELECT u, v FROM sym
      |  UNION
      |  SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u),
      |-- reflexive closure (DISTINCT wrapper: plain UNION over a
      |-- recursive CTE read does not dedup in DuckDB)
      |allr AS (SELECT DISTINCT u, v FROM (
      |  SELECT u, v FROM reach
      |  UNION ALL SELECT u, u FROM sym)),
      |comp AS (SELECT u AS node, min(v) AS comp_id
      |  FROM allr GROUP BY u),
      |sz AS (SELECT comp_id, count(*) AS n FROM comp GROUP BY 1)
      |SELECT CAST(c.node AS BIGINT) AS node,
      |  CAST(c.comp_id AS BIGINT) AS comp_id,
      |  CAST(sz.n AS BIGINT) AS comp_size
      |FROM comp c JOIN sz ON c.comp_id = sz.comp_id
      |ORDER BY node""".stripMargin

  val all: ListMap[String, Q] = ListMap(
    // ---- q239: components of the part co-purchase graph — parts are
    //      linked when some order contains BOTH at near-full quantity
    //      (≥ 49). The tight filter keeps the graph sparse and
    //      FRAGMENTED (many small components, not one giant blob) —
    //      exactly the regime where component ids carry signal, and
    //      where the oracle's transitive closure stays Σ|comp|²-
    //      bounded. Oracle: recursive-CTE closure, min reachable id. ----
    "q239_connected_components" -> Q(
      (s, d) => ordered(connectedComponents(s, coPurchaseEdges(s, d, None))),
      Some(closureOracle)),

    // ---- q244: INCREMENTAL component maintenance — bootstrap labels
    //      from the even-order half of the co-purchase graph, then fold
    //      the odd-order half in as a delta batch. The iterative work
    //      runs only on the label-quotient graph the delta bridges;
    //      the result must be INDISTINGUISHABLE from a full recompute,
    //      so the oracle is q239's closure over the union, verbatim. ----
    "q244_incr_components" -> Q(
      (s, d) => {
        val base = connectedComponents(s, coPurchaseEdges(s, d, Some(0)))
        ordered(incrementalComponents(s, base.select("node", "comp_id"),
          coPurchaseEdges(s, d, Some(1))))
      },
      Some(closureOracle)),

    // ---- q245: STREAMING component maintenance — the q244 fold driven
    //      through the real engine (file source, one edge file per
    //      trigger: orders ≡1 mod 4, then ≡3 mod 4, then ≡3 REPLAYED
    //      for at-least-once delivery — edge merges are idempotent, so
    //      the replay must be a label-level no-op). Labels live in A/B
    //      parquet generations (the q140/q238 pattern); the final
    //      labeling must equal the full batch recompute — the SAME
    //      closure oracle, so streaming idempotence sits under the
    //      driver gate. ----
    "q245_stream_components" -> Q(
      (s, d) => {
        val work = java.nio.file.Files.createTempDirectory("graft-q245")
          .toString
        val in = s"$work/in"
        val delta = coPurchaseEdges(s, d, Some(1))
        // deterministic 2-way split of the odd-order delta by edge hash
        val d1 = delta.filter(pmod(col("u") + col("v"), lit(2)) === 0)
        val d2 = delta.filter(pmod(col("u") + col("v"), lit(2)) === 1)
        d1.coalesce(1).write.mode("append").parquet(in)
        d2.coalesce(1).write.mode("append").parquet(in)
        d2.coalesce(1).write.mode("append").parquet(in) // replay
        val sch = s.read.parquet(in).schema
        val src = s.readStream.schema(sch)
          .option("maxFilesPerTrigger", 1).parquet(in)
        val stateA = s"$work/state_a"; val stateB = s"$work/state_b"
        def statePath(gen: Long) = if (gen % 2 == 0) stateA else stateB
        connectedComponents(s, coPurchaseEdges(s, d, Some(0)))
          .select("node", "comp_id")
          .write.mode("overwrite").parquet(stateA)
        var gen = 1L
        val q = src.writeStream
          .option("checkpointLocation", s"$work/ckpt")
          .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
            incrementalComponents(s, s.read.parquet(statePath(gen - 1)), batch)
              .select("node", "comp_id")
              .write.mode("overwrite").parquet(statePath(gen))
            gen += 1
          }
          .start()
        try q.processAllAvailable() finally q.stop()
        require(gen >= 4, s"expected >= 3 micro-batches, got ${gen - 1}")
        val lab = s.read.parquet(statePath(gen - 1))
        val sizes = lab.groupBy("comp_id")
          .agg(count(lit(1)).as("comp_size"))
        ordered(lab.join(sizes, "comp_id")
          .select("node", "comp_id", "comp_size"))
      },
      Some(closureOracle))
  )
}
