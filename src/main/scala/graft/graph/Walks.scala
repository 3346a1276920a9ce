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
    * seed. Ordered (start, step).
    */
  def deterministicWalks(s: SparkSession, edges: DataFrame,
      seeds: DataFrame, steps: Int, salt: String): DataFrame = {
    require(steps >= 1 && steps <= 32, s"1 <= steps <= 32: $steps")
    val ed = edges.select(col("u").cast("long"), col("v").cast("long"))
      .distinct()
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
    out.orderBy("start", "step")
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
        deterministicWalks(s, edges, seeds, steps = 5, salt = "w383")
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
      }))
}
