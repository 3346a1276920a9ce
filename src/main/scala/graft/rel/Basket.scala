package graft.rel

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.rel.RelQueries.Q
import graft.rel.Tables

/** MARKET-BASKET / RECOMMENDER ANALYTICS — co-occurrence mining over
  * order baskets: association rules (support, confidence, lift) and
  * item-item collaborative-filtering similarity.
  *
  * Both are PAIR-SPACE operators, and the engine's rule for those
  * (q34/q115/q118) is that the pair space must be bounded BEFORE the
  * shuffle: rules pair BRANDS within a basket (vocabulary-bounded —
  * ≤ |brands|²/2 pairs per basket regardless of data scale), and CF
  * pairs each user's TOP-C items (rank-capped with a deterministic
  * tiebreak, so the cap is replayable in SQL). All scores are exact
  * integer milli-units; the one floating step in CF cosine is an IEEE
  * sqrt of an exact long, floored — cross-engine deterministic.
  */
object Basket {

  /** per-user item cap for CF pair generation */
  private[rel] val CfCap = 20

  /** minimum pair support for an association rule */
  private[rel] val MinSupport = 10L

  /** (orderkey, brand) distinct basket lines */
  private def orderBrands(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"), col("p_brand")).distinct()

  val all: ListMap[String, Q] = ListMap(
    // ---- q158: ASSOCIATION RULES over order baskets at brand
    //      granularity — support/confidence/lift exactly, as integer
    //      milli-units (lift in micro for resolution). Both rule
    //      directions are emitted; rules below MinSupport pairs are
    //      cut. Scale: the within-basket self-join fans out at most
    //      |brands|²/2 per order; pair/item counts are map-side
    //      combined; N and item counts broadcast onto the
    //      vocabulary-bounded rule table. ----
    "q158_assoc_rules" -> Q(
      (s, d) => {
        val ob = orderBrands(s, d)
        val n = ob.select(col("l_orderkey")).distinct().count()
        val item = ob.groupBy(col("p_brand")).agg(count(lit(1)).as("supp"))
        val pair = ob.as("a").join(ob.as("b"),
            col("a.l_orderkey") === col("b.l_orderkey") &&
              col("a.p_brand") < col("b.p_brand"))
          .groupBy(col("a.p_brand").as("ba"), col("b.p_brand").as("bb"))
          .agg(count(lit(1)).as("supp_ab"))
          .filter(col("supp_ab") >= MinSupport)
        val rules = pair.select(col("ba").as("antecedent"), col("bb").as("consequent"),
            col("supp_ab"))
          .unionByName(pair.select(col("bb").as("antecedent"), col("ba").as("consequent"),
            col("supp_ab")))
        rules
          .join(item.select(col("p_brand"), col("supp").as("supp_a")),
            col("antecedent") === col("p_brand")).drop("p_brand")
          .join(item.select(col("p_brand"), col("supp").as("supp_b")),
            col("consequent") === col("p_brand")).drop("p_brand")
          .select(col("antecedent"), col("consequent"), col("supp_ab"),
            col("supp_a"), col("supp_b"),
            expr("supp_ab * 1000 div supp_a").as("confidence_milli"),
            expr(s"supp_ab * $n * 1000000 div (supp_a * supp_b)").as("lift_micro"))
          .orderBy("antecedent", "consequent")
      },
      Some(s"""WITH ob AS (SELECT DISTINCT l_orderkey, p_brand
             |  FROM lineitem JOIN part ON l_partkey = p_partkey),
             |n AS (SELECT count(DISTINCT l_orderkey) AS n FROM ob),
             |item AS (SELECT p_brand, count(*) AS supp FROM ob GROUP BY 1),
             |pair AS (SELECT a.p_brand AS ba, b.p_brand AS bb, count(*) AS supp_ab
             |  FROM ob a JOIN ob b
             |    ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
             |  GROUP BY 1, 2 HAVING count(*) >= $MinSupport),
             |rules AS (SELECT ba AS antecedent, bb AS consequent, supp_ab FROM pair
             |  UNION ALL SELECT bb, ba, supp_ab FROM pair)
             |SELECT antecedent, consequent, supp_ab,
             |  ia.supp AS supp_a, ib.supp AS supp_b,
             |  CAST(supp_ab * 1000 // ia.supp AS BIGINT) AS confidence_milli,
             |  CAST(supp_ab * n.n * 1000000 // (ia.supp * ib.supp) AS BIGINT)
             |    AS lift_micro
             |FROM rules JOIN item ia ON antecedent = ia.p_brand
             |  JOIN item ib ON consequent = ib.p_brand CROSS JOIN n
             |ORDER BY antecedent, consequent""".stripMargin)),

    // ---- q159: ITEM-ITEM CF — cosine similarity between parts from
    //      capped per-customer purchase sets: each customer contributes
    //      pairs among their top-${CfCap} parts (by line count desc,
    //      partkey asc — a total order, so the cap is exact in both
    //      engines). cos = cooc/sqrt(n_a·n_b) floored to milli. Top 50
    //      pairs under a total order ship via TakeOrderedAndProject
    //      (distributed heap), never a global sort of the pair space. ----
    "q159_item_cf" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val up = Tables.lineitem(s, d)
          .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_custkey").as("user"), col("l_partkey").as("item"))
          .agg(count(lit(1)).as("n_lines"))
        val w = Window.partitionBy(col("user"))
          .orderBy(col("n_lines").desc, col("item"))
        val capped = up.withColumn("rk", row_number().over(w))
          .filter(col("rk") <= CfCap).select("user", "item")
        val itemN = capped.groupBy(col("item")).agg(count(lit(1)).as("n_users"))
        val cooc = capped.as("a").join(capped.as("b"),
            col("a.user") === col("b.user") && col("a.item") < col("b.item"))
          .groupBy(col("a.item").as("ia"), col("b.item").as("ib"))
          .agg(count(lit(1)).as("cooc"))
        cooc
          .join(itemN.select(col("item"), col("n_users").as("n_a")), col("ia") === col("item"))
          .drop("item")
          .join(itemN.select(col("item"), col("n_users").as("n_b")), col("ib") === col("item"))
          .drop("item")
          .withColumn("cosine_milli",
            floor(col("cooc").cast("double") * 1000.0 /
              sqrt((col("n_a") * col("n_b")).cast("double"))).cast("long"))
          .select("ia", "ib", "cooc", "n_a", "n_b", "cosine_milli")
          .orderBy(col("cooc").desc, col("ia"), col("ib"))
          .limit(50)
      },
      Some(s"""WITH up AS (SELECT o_custkey AS usr, l_partkey AS item,
             |    count(*) AS n_lines
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |  GROUP BY 1, 2),
             |capped AS (SELECT usr, item FROM (SELECT usr, item,
             |    row_number() OVER (PARTITION BY usr
             |      ORDER BY n_lines DESC, item) AS rk FROM up)
             |  WHERE rk <= $CfCap),
             |itemn AS (SELECT item, count(*) AS n_users FROM capped GROUP BY 1),
             |cooc AS (SELECT a.item AS ia, b.item AS ib, count(*) AS cooc
             |  FROM capped a JOIN capped b
             |    ON a.usr = b.usr AND a.item < b.item GROUP BY 1, 2)
             |SELECT ia, ib, cooc, na.n_users AS n_a, nb.n_users AS n_b,
             |  CAST(floor(CAST(cooc AS DOUBLE) * 1000.0 /
             |    sqrt(CAST(na.n_users * nb.n_users AS DOUBLE))) AS BIGINT)
             |    AS cosine_milli
             |FROM cooc JOIN itemn na ON ia = na.item JOIN itemn nb ON ib = nb.item
             |ORDER BY cooc DESC, ia, ib LIMIT 50""".stripMargin)),
  )
}
