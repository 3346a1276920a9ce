package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.rel.RelQueries.Q
import graft.rel.Tables

/** MODULARITY of a node partition (Newman & Girvan 2004, Newman
  * 2006) — THE quality score for a community assignment: how much
  * denser are within-community edges than the degree-preserving
  * random expectation,
  *
  *   Q = Σ_c ( e_c/m − (d_c/2m)² )  =  Σ_c (4m·e_c − d_c²) / (4m²),
  *
  * the second form being the EXACT-INTEGER numerator this operator
  * actually computes: e_c (within-community edge counts), d_c
  * (community degree sums), and m are exact integers from two hash
  * aggregations; squares and products ride decimal(38,0)/HUGEINT (at
  * 100 TB d_c² overflows a long — the q319 quantization rule), and
  * the ONE double division per community is the output, the community
  * sum ORDER-PINNED (q300 rule). A node in `labels` but not in the
  * graph contributes nothing (degree 0); an edge whose endpoint is
  * missing from `labels` raises loudly — a silently-dropped edge
  * would inflate Q.
  *
  * Output per community, ordered: (community, n_nodes, e_in, deg_sum,
  * q_contrib_r6, modularity_r6) — the last column the constant total,
  * each row's report self-contained (the q329 convention).
  */
object Modularity {

  def modularity(s: SparkSession, edges: DataFrame,
      labels: DataFrame, canonicalInput: Boolean = false): DataFrame = {
    // canonicalInput = caller guarantees `edges` is already a distinct
    // (a < b) canonical table (the CoPurchase contract), skipping the
    // re-canonicalization's dedup exchange (r15 opt, guide §2.4)
    val und = (if (canonicalInput)
        edges.select(col("a").cast("long").as("a"),
          col("b").cast("long").as("b"))
      else Triangles.canonicalEdges(edges)).localCheckpoint(true)
    val lab = labels.select(col("node").cast("long").as("node"),
      col("community").cast("string").as("c"))
      .groupBy("node").agg(max(col("c")).as("c")) // one label per node
      // (max, not first: first() is partition-order-nondeterministic)
    val la = lab.select(col("node").as("a"), col("c").as("ca"))
    val lb = lab.select(col("node").as("b"), col("c").as("cb"))
    val tagged = und.join(la, Seq("a"), "left").join(lb, Seq("b"), "left")
      .select(col("a"), col("b"),
        when(col("ca").isNull || col("cb").isNull, raise_error(concat(
          lit("modularity: edge endpoint missing from labels: "),
          col("a").cast("string"), lit("-"), col("b").cast("string"))))
          .otherwise(col("ca")).as("ca"),
        col("cb"))
      .localCheckpoint(true)
    val m = tagged.count()
    require(m > 0, "modularity: empty edge set")
    val deg = tagged.select(col("a").as("node"), col("ca").as("c"))
      .unionAll(tagged.select(col("b").as("node"), col("cb").as("c")))
    val dc = deg.groupBy("c")
      .agg(countDistinct(col("node")).as("n_nodes"),
        count(lit(1)).as("deg_sum"))
    val ec = tagged.filter(col("ca") === col("cb"))
      .groupBy(col("ca").as("c")).agg(count(lit(1)).as("e_in"))
    val wCum = Window.orderBy("c").rowsBetween(Long.MinValue, 0)
    dc.join(ec, Seq("c"), "left")
      .select(col("c"), col("n_nodes"), coalesce(col("e_in"), lit(0L))
        .as("e_in"), col("deg_sum"))
      .withColumn("num", // 4m·e_c − d_c² exactly, past long range
        expr(s"cast(4 as decimal(38,0)) * $m * e_in" +
          " - cast(deg_sum as decimal(38,0)) * deg_sum"))
      .withColumn("qc",
        col("num").cast("double") / (4.0 * m.toDouble * m.toDouble))
      .withColumn("qtot", sum("qc").over(wCum))
      .withColumn("last", max(struct(col("c"), col("qtot")))
        .over(Window.partitionBy()))
      .select(col("c").as("community"), col("n_nodes"), col("e_in"),
        col("deg_sum"), round(col("qc"), 6).as("q_contrib_r6"),
        round(col("last.qtot"), 6).as("modularity_r6"))
      .orderBy("community")
  }

  val all: ListMap[String, Q] = ListMap(
    // ---- q333: MODULARITY of the BRAND partition over the q315
    //      co-purchase graph — "do same-brand parts co-purchase?",
    //      the community-quality readout over a natural categorical
    //      assignment (and the scoring half of any community-
    //      detection loop: LabelProp/CC propose, this scores). ----
    "q333_modularity" -> Q(
      (s, d) => {
        val labels = Tables.part(s, d)
          .select(col("p_partkey").as("node"),
            col("p_brand").as("community"))
        modularity(s, CoPurchase.edges(s, d), labels,
          canonicalInput = true)
      },
      Some(s"""WITH ${CoPurchase.Sql},
             |e AS (SELECT a, b FROM e0),
             |lab AS (SELECT p_partkey AS node, p_brand AS c FROM part),
             |tg AS (SELECT e.a, e.b, la.c AS ca, lb.c AS cb
             |  FROM e JOIN lab la ON la.node = e.a
             |    JOIN lab lb ON lb.node = e.b),
             |m AS (SELECT count(*) AS m FROM tg),
             |deg AS (SELECT a AS node, ca AS c FROM tg
             |  UNION ALL SELECT b, cb FROM tg),
             |dc AS (SELECT c, count(DISTINCT node) AS n_nodes,
             |    count(*) AS deg_sum FROM deg GROUP BY c),
             |ec AS (SELECT ca AS c, count(*) AS e_in FROM tg
             |  WHERE ca = cb GROUP BY ca),
             |t AS (SELECT dc.c, dc.n_nodes, coalesce(ec.e_in, 0) AS e_in,
             |    dc.deg_sum, m.m,
             |    CAST(CAST(4 AS HUGEINT) * m.m * coalesce(ec.e_in, 0)
             |        - CAST(dc.deg_sum AS HUGEINT) * dc.deg_sum AS DOUBLE)
             |      / (4.0 * CAST(m.m AS DOUBLE) * CAST(m.m AS DOUBLE))
             |      AS qc
             |  FROM dc LEFT JOIN ec USING (c), m),
             |x AS (SELECT sum(qc ORDER BY c) AS qtot FROM t)
             |SELECT t.c AS community, CAST(t.n_nodes AS BIGINT) AS n_nodes,
             |  CAST(t.e_in AS BIGINT) AS e_in,
             |  CAST(t.deg_sum AS BIGINT) AS deg_sum,
             |  round(t.qc, 6) AS q_contrib_r6,
             |  round(x.qtot, 6) AS modularity_r6
             |FROM t, x ORDER BY t.c""".stripMargin)),
  )
}
