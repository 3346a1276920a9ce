package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.rel.RelQueries.Q
import graft.rel.Tables

/** DETERMINISTIC RANDOM-WALK CORPUS GENERATION — the data-pipeline
  * half of DeepWalk/node2vec (Perozzi et al. KDD'14): fixed-length
  * walks from a seed set whose every step is drawn by a KEYED HASH
  * instead of an RNG — at node u on step t the walk moves to the
  * out-neighbor v minimizing md5(salt‖u‖t‖v) (ties → v asc, the q254
  * portable-draw idiom). Changing the salt redraws every walk;
  * keeping it reproduces the corpus bit-for-bit on any engine — the
  * property a training pipeline needs from its walk corpus, and the
  * property `rand()` can never give a distributed plan.
  *
  * Scale shape: edges shuffle once (cached, partitioned by u); each
  * of the `steps` fixed rounds joins the CURRENT walk head table (one
  * 16-byte row per live walk) to the cached edges and takes one
  * integer/string struct-min per walk — per-round traffic is the walk
  * set times out-degree, never the graph. Walks hitting a sink die
  * and simply stop emitting (documented, not an error).
  */
object Walks {

  /** Walk rows (start, step, node), step 0..`steps`, one walk per
    * seed. Ordered (start, step). `distinctInput` = the caller
    * guarantees `edges` is already a distinct directed pair table
    * (e.g. a symmetrized union of a distinct bipartite half — the
    * q383/q388 build), so the dedup exchange is skipped (r15 opt,
    * guide §2.4: a distinct on data that is already unique).
    */
  def deterministicWalks(s: SparkSession, edges: DataFrame,
      seeds: DataFrame, steps: Int, salt: String,
      distinctInput: Boolean = false): DataFrame =
    walksUnordered(s, edges, seeds, steps, salt, distinctInput)
      .orderBy("start", "step")

  /** The walk corpus WITHOUT the presentation sort — downstream
    * consumers keyed by (start, step) or node (q388's pair counting)
    * pay the range exchange for nothing (r15 opt, guide §2.4: an
    * orderBy used only to make output deterministic).
    */
  private def walksUnordered(s: SparkSession, edges: DataFrame,
      seeds: DataFrame, steps: Int, salt: String,
      distinctInput: Boolean): DataFrame = {
    require(steps >= 1 && steps <= 32, s"1 <= steps <= 32: $steps")
    val ed0 = edges.select(col("u").cast("long"), col("v").cast("long"))
    val ed = (if (distinctInput) ed0 else ed0.distinct())
      .repartition(col("u"))
      .cache()
    var head = seeds.select(col("node").cast("long").as("start"))
      .distinct()
      .select(col("start"), col("start").as("node"))
      .localCheckpoint()
    var out = head.select(col("start"), lit(0).as("step"), col("node"))
    for (t <- 1 to steps) {
      val cand = ed.join(head, ed("u") === head("node"))
        .select(head("start").as("start"), ed("v").as("v"),
          md5(concat_ws("-", lit(salt), ed("u").cast("string"),
            lit(t.toString), ed("v").cast("string"))).as("h"))
      head = cand.groupBy("start")
        .agg(min(struct(col("h"), col("v"))).as("m"))
        .select(col("start"), col("m.v").as("node"))
        .localCheckpoint()
      out = out.unionAll(
        head.select(col("start"), lit(t).as("step"), col("node")))
    }
    ed.unpersist()
    out
  }

  /** NODE-EMBEDDING AXIS from the walk corpus — DeepWalk's
    * matrix-factorization reading made verifiable (Qiu et al.
    * WSDM'18, "Network embedding as matrix factorization"): generate
    * the deterministic walk corpus, count window-±2 co-visits along
    * each walk, and run the PPMI power iteration
    * ([[graft.llm.TextRank.ppmiAxis]]) toward its Perron vector — the
    * nodes loading highest share the corpus's strongest random-walk
    * context, i.e. the first coordinate a DeepWalk embedding would
    * learn. Every stage (walks, pairs, PPMI quantization, matvec
    * rounds) is exact integer arithmetic.
    *
    * Output: top-k (node, v_micro), ties → node asc.
    */
  def nodeEmbeddingAxis(s: SparkSession, edges: DataFrame,
      seeds: DataFrame, steps: Int, salt: String, minCount: Long = 2,
      iters: Int = 5, k: Int = 15,
      distinctInput: Boolean = false): DataFrame = {
    val wk = walksUnordered(s, edges, seeds, steps, salt, distinctInput)
      .localCheckpoint()
    val pr = (1 to 2).map { o =>
      val a = wk.select(col("start"), col("step"), col("node").as("na"))
      val b = wk.select(col("start").as("bstart"),
        col("step").as("bstep"), col("node").as("nb"))
      a.join(b, col("bstart") === col("start")
          && col("bstep") === col("step") + o)
        .filter(col("na") =!= col("nb"))
        .select(least(col("na"), col("nb")).as("a"),
          greatest(col("na"), col("nb")).as("b"))
    }.reduce(_ unionAll _)
    val pc = pr.groupBy("a", "b").agg(count(lit(1)).as("c2"))
      .filter(col("c2") >= minCount)
      .localCheckpoint()
    val uc = wk.groupBy(col("node").as("tok"))
      .agg(count(lit(1)).as("c1"))
    graft.llm.TextRank.ppmiAxis(s, pc, uc, iters, k)
      .select(col("term").as("node"), col("v_micro"))
  }

  val all: ListMap[String, Q] = ListMap(
    // ---- q383: WALK CORPUS over the trade graph — one 5-step
    //      hash-drawn walk per nation-0 supplier (the q122 seed set).
    //      The oracle replays every step's md5 argmin. ----
    "q383_walk_corpus" -> Q(
      (s, d) => {
        val e0 = Tables.orders(s, d).join(Tables.lineitem(s, d),
            col("o_orderkey") === col("l_orderkey"))
          .select((col("o_custkey").cast("long") * 2).as("u"),
            (col("l_suppkey").cast("long") * 2 + 1).as("v"))
          .distinct()
        val edges = e0.unionAll(e0.select(col("v").as("u"), col("u").as("v")))
        val seeds = Tables.supplier(s, d).filter(col("s_nationkey") === 0)
          .select((col("s_suppkey").cast("long") * 2 + 1).as("node"))
        // edges = symmetrized union of a DISTINCT bipartite (even, odd)
        // half — the two orientations are disjoint, so the table is
        // distinct by construction
        deterministicWalks(s, edges, seeds, steps = 5, salt = "w383",
          distinctInput = true)
      },
      Some {
        def step(prev: String, cur: String, t: Int): String =
          s"""$cur AS MATERIALIZED (SELECT start, v AS node FROM (
             |  SELECT h.start, ed.v,
             |    row_number() OVER (PARTITION BY h.start ORDER BY
             |      md5('w383-' || CAST(ed.u AS VARCHAR) || '-$t-' ||
             |        CAST(ed.v AS VARCHAR)), ed.v) AS rn
             |  FROM ed JOIN $prev h ON ed.u = h.node) WHERE rn = 1)"""
            .stripMargin
        s"""WITH e0 AS (
           |  SELECT DISTINCT o.o_custkey * 2 AS u, l.l_suppkey * 2 + 1 AS v
           |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
           |ed AS (SELECT u, v FROM e0 UNION SELECT v, u FROM e0),
           |w0 AS (SELECT DISTINCT s_suppkey * 2 + 1 AS start,
           |    s_suppkey * 2 + 1 AS node
           |  FROM supplier WHERE s_nationkey = 0),
           |${(1 to 5).map(t => step(s"w${t - 1}", s"w$t", t)).mkString(",\n")}
           |SELECT start, step, node FROM (
           |  SELECT start, 0 AS step, node FROM w0
           |  ${(1 to 5).map(t => s"UNION ALL SELECT start, $t, node FROM w$t")
            .mkString("\n  ")})
           |ORDER BY start, step""".stripMargin
      }),

    // ---- q388: NODE-EMBEDDING AXIS — 8-step walks from EVERY
    //      supplier, window-±2 co-visit pairs (count ≥ 2), PPMI power
    //      iteration; the 15 nodes loading highest on the dominant
    //      walk-context axis. The oracle replays walks, pairs, the
    //      PPMI quantization, and all five matvec rounds. ----
    "q388_node_embedding_axis" -> Q(
      (s, d) => {
        val e0 = Tables.orders(s, d).join(Tables.lineitem(s, d),
            col("o_orderkey") === col("l_orderkey"))
          .select((col("o_custkey").cast("long") * 2).as("u"),
            (col("l_suppkey").cast("long") * 2 + 1).as("v"))
          .distinct()
        val edges = e0.unionAll(e0.select(col("v").as("u"), col("u").as("v")))
        val seeds = Tables.supplier(s, d)
          .select((col("s_suppkey").cast("long") * 2 + 1).as("node"))
        nodeEmbeddingAxis(s, edges, seeds, steps = 8, salt = "ne388",
          minCount = 2, iters = 5, k = 15, distinctInput = true)
          .select(
            when(col("node") % 2 === 0, lit("customer"))
              .otherwise(lit("supplier")).as("kind"),
            expr("node div 2").as("key"), col("v_micro"))
          .orderBy(col("v_micro").desc, col("kind"), col("key"))
      },
      Some {
        def wstep(prev: String, cur: String, t: Int): String =
          s"""$cur AS MATERIALIZED (SELECT start, v AS node FROM (
             |  SELECT h.start, ed.v,
             |    row_number() OVER (PARTITION BY h.start ORDER BY
             |      md5('ne388-' || CAST(ed.u AS VARCHAR) || '-$t-' ||
             |        CAST(ed.v AS VARCHAR)), ed.v) AS rn
             |  FROM ed JOIN $prev h ON ed.u = h.node) WHERE rn = 1)"""
            .stripMargin
        def iter(prev: String, r: Int): String =
          s"""mv$r AS MATERIALIZED (SELECT edx.a AS term,
             |    sum(CAST(edx.w AS HUGEINT) * v.v) AS mv
             |  FROM edx JOIN $prev v ON v.term = edx.b GROUP BY edx.a),
             |v$r AS MATERIALIZED (SELECT term,
             |    CAST((mv * 1000000) // (SELECT max(abs(mv)) FROM mv$r)
             |      AS BIGINT) AS v
             |  FROM mv$r)""".stripMargin
        s"""WITH e0 AS (
           |  SELECT DISTINCT o.o_custkey * 2 AS u, l.l_suppkey * 2 + 1 AS v
           |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
           |ed AS (SELECT u, v FROM e0 UNION SELECT v, u FROM e0),
           |w0 AS (SELECT DISTINCT s_suppkey * 2 + 1 AS start,
           |    s_suppkey * 2 + 1 AS node FROM supplier),
           |${(1 to 8).map(t => wstep(s"w${t - 1}", s"w$t", t))
            .mkString(",\n")},
           |wk AS MATERIALIZED (
           |  SELECT start, 0 AS step, node FROM w0
           |  ${(1 to 8).map(t => s"UNION ALL SELECT start, $t, node FROM w$t")
            .mkString("\n  ")}),
           |pr AS (SELECT least(a.node, b.node) AS a,
           |    greatest(a.node, b.node) AS b
           |  FROM wk a JOIN wk b ON b.start = a.start
           |    AND b.step = a.step + 1
           |  WHERE a.node <> b.node
           |  UNION ALL
           |  SELECT least(a.node, b.node), greatest(a.node, b.node)
           |  FROM wk a JOIN wk b ON b.start = a.start
           |    AND b.step = a.step + 2
           |  WHERE a.node <> b.node),
           |pc AS (SELECT a, b, count(*) AS c2 FROM pr GROUP BY a, b
           |  HAVING count(*) >= 2),
           |uc AS (SELECT node AS tok, count(*) AS c1 FROM wk GROUP BY node),
           |np AS (SELECT sum(c2) AS np FROM pc),
           |nt AS (SELECT sum(c1) AS nt FROM uc),
           |ed0 AS (SELECT pc.a, pc.b,
           |    greatest(CAST(0 AS BIGINT), CAST(round(ln(
           |      (CAST(pc.c2 AS DOUBLE) * CAST(nt.nt AS DOUBLE)
           |        * CAST(nt.nt AS DOUBLE))
           |      / (CAST(np.np AS DOUBLE) * CAST(ua.c1 AS DOUBLE)
           |        * CAST(ub.c1 AS DOUBLE))) * 1e6, 0) AS BIGINT)) AS w
           |  FROM pc JOIN uc ua ON ua.tok = pc.a
           |          JOIN uc ub ON ub.tok = pc.b
           |  CROSS JOIN np CROSS JOIN nt),
           |edx AS MATERIALIZED (SELECT a, b, w FROM ed0 WHERE w > 0
           |  UNION ALL SELECT b, a, w FROM ed0 WHERE w > 0),
           |v0 AS (SELECT DISTINCT a AS term, CAST(1000000 AS BIGINT) AS v
           |  FROM edx),
           |${(1 to 5).map(r => iter(s"v${r - 1}", r)).mkString(",\n")}
           |SELECT CASE WHEN term % 2 = 0 THEN 'customer'
           |    ELSE 'supplier' END AS kind,
           |  term // 2 AS key, v AS v_micro FROM v5
           |ORDER BY v_micro DESC, kind, key LIMIT 15""".stripMargin
      }))
}
