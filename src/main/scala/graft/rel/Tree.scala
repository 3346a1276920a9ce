package graft.rel

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.rel.RelQueries.Q
import graft.rel.Tables

/** DECISION-STUMP SPLIT FINDING (the CART building block, Breiman et
  * al. 1984): per feature, the binary threshold x ≤ v maximizing the
  * Gini impurity reduction against a 0/1 label —
  *
  *   gain(v) = G(parent) − (n_L/N)·G(left) − (n_R/N)·G(right),
  *   G = 1 − p² − (1−p)²,
  *
  * the standard feature-importance / leakage audit: a feature whose
  * best stump gain is near the parent impurity predicts the label
  * almost alone (target leakage); near zero, it is noise.
  *
  * Exactness: per-(feature, value) counts are exact integers from one
  * hash aggregation; left-cumulative counts ride the ORDER-PINNED
  * per-feature window; every candidate's gain is one fixed IEEE chain
  * on those integers, rounded to 6 BEFORE the argmax (the q44
  * float-noise rule) with ties to the SMALLEST threshold. The window
  * frame is the feature's distinct-value set — the operator requires
  * quantized/binned features (loud raise past 65536 distinct values:
  * bin first, the KM calendar-granularity adjudication).
  *
  * Output per feature (constant features drop — nothing to split):
  * (feature, split_value, n_left, pos_left, n_total, pos_total,
  * gain_r6).
  */
object Tree {

  private val DistinctCap = 65536L

  def splitGains(df: DataFrame, features: Seq[String],
      label: String = "y"): DataFrame = {
    require(features.nonEmpty, "splitGains: no features")
    val y0 = col(label).cast("long")
    val yv = when(y0 === 1L, 1L).when(y0 === 0L, 0L)
      .otherwise(raise_error(concat(
        lit("splitGains: label must be 0 or 1: "), y0.cast("string"))))
    val long = features.map(f =>
      df.select(lit(f).as("feat"), col(f).cast("long").as("x"), yv.as("y")))
      .reduce(_ unionAll _)
    val per = long.groupBy("feat", "x")
      .agg(count(lit(1)).as("n"), sum(col("y")).as("p"))
    val wCum = Window.partitionBy("feat").orderBy("x")
      .rowsBetween(Long.MinValue, 0)
    val wAll = Window.partitionBy("feat")
    def g(pp: org.apache.spark.sql.Column, nn: org.apache.spark.sql.Column) = {
      val r = pp.cast("double") / nn.cast("double")
      lit(1.0) - r * r - (lit(1.0) - r) * (lit(1.0) - r)
    }
    val cand = per
      .withColumn("nl", sum(col("n")).over(wCum))
      .withColumn("pl", sum(col("p")).over(wCum))
      .withColumn("nt", sum(col("n")).over(wAll))
      .withColumn("pt", sum(col("p")).over(wAll))
      .withColumn("nv", count(lit(1)).over(wAll))
      .select(col("feat"),
        when(col("nv") > DistinctCap, raise_error(concat(
          lit("splitGains: feature "), col("feat"),
          lit(s" has > $DistinctCap distinct values — bin it first"))))
          .otherwise(col("x")).as("x"),
        col("nl"), col("pl"), col("nt"), col("pt"))
      .filter(col("nl") < col("nt")) // right side must be non-empty
      .withColumn("gain_r6", round(
        g(col("pt"), col("nt"))
          - (col("nl").cast("double") / col("nt").cast("double"))
            * g(col("pl"), col("nl"))
          - ((col("nt") - col("nl")).cast("double") / col("nt").cast("double"))
            * g(col("pt") - col("pl"), col("nt") - col("nl")), 6))
    cand
      .groupBy("feat")
      .agg(max(struct(col("gain_r6"), (-col("x")).as("negx"), col("x"),
        col("nl"), col("pl"), col("nt"), col("pt"))).as("z"))
      .select(col("feat").as("feature"), col("z.x").as("split_value"),
        col("z.nl").as("n_left"), col("z.pl").as("pos_left"),
        col("z.nt").as("n_total"), col("z.pt").as("pos_total"),
        col("z.gain_r6").as("gain_r6"))
      .orderBy("feature")
  }

  val all: ListMap[String, Q] = ListMap(
    // ---- q361: stump split gains — which of quantity / discount /
    //      tax best separates returned lineitems (returnflag = 'R')?
    //      Features pre-quantized to integer units; the oracle replays
    //      counts, the per-feature cumulative window, every
    //      candidate's Gini chain, and the (gain desc, value asc)
    //      argmax. ----
    "q361_split_gain" -> Q(
      (s, d) => splitGains(
        Tables.lineitem(s, d).select(
          col("l_quantity").cast("long").as("quantity"),
          round(col("l_discount") * 100, 0).cast("long").as("discount_c"),
          round(col("l_tax") * 100, 0).cast("long").as("tax_c"),
          when(col("l_returnflag") === "R", 1L).otherwise(0L).as("y")),
        Seq("quantity", "discount_c", "tax_c")),
      Some("""WITH u AS (SELECT CAST(l_quantity AS BIGINT) AS quantity,
             |    CAST(round(l_discount * 100) AS BIGINT) AS discount_c,
             |    CAST(round(l_tax * 100) AS BIGINT) AS tax_c,
             |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
             |  FROM lineitem),
             |lg AS (SELECT 'quantity' AS feat, quantity AS x, y FROM u
             |  UNION ALL SELECT 'discount_c', discount_c, y FROM u
             |  UNION ALL SELECT 'tax_c', tax_c, y FROM u),
             |per AS (SELECT feat, x, count(*) AS n, sum(y) AS p
             |  FROM lg GROUP BY feat, x),
             |cw AS (SELECT feat, x,
             |    sum(n) OVER (PARTITION BY feat ORDER BY x
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS nl,
             |    sum(p) OVER (PARTITION BY feat ORDER BY x
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pl,
             |    sum(n) OVER (PARTITION BY feat) AS nt,
             |    sum(p) OVER (PARTITION BY feat) AS pt
             |  FROM per),
             |cand AS (SELECT feat, x, nl, pl, nt, pt,
             |    round(
             |      (1.0 - (CAST(pt AS DOUBLE) / CAST(nt AS DOUBLE))
             |        * (CAST(pt AS DOUBLE) / CAST(nt AS DOUBLE))
             |       - (1.0 - CAST(pt AS DOUBLE) / CAST(nt AS DOUBLE))
             |        * (1.0 - CAST(pt AS DOUBLE) / CAST(nt AS DOUBLE)))
             |      - (CAST(nl AS DOUBLE) / CAST(nt AS DOUBLE))
             |        * (1.0 - (CAST(pl AS DOUBLE) / CAST(nl AS DOUBLE))
             |          * (CAST(pl AS DOUBLE) / CAST(nl AS DOUBLE))
             |         - (1.0 - CAST(pl AS DOUBLE) / CAST(nl AS DOUBLE))
             |          * (1.0 - CAST(pl AS DOUBLE) / CAST(nl AS DOUBLE)))
             |      - (CAST(nt - nl AS DOUBLE) / CAST(nt AS DOUBLE))
             |        * (1.0 - (CAST(pt - pl AS DOUBLE) / CAST(nt - nl AS DOUBLE))
             |          * (CAST(pt - pl AS DOUBLE) / CAST(nt - nl AS DOUBLE))
             |         - (1.0 - CAST(pt - pl AS DOUBLE) / CAST(nt - nl AS DOUBLE))
             |          * (1.0 - CAST(pt - pl AS DOUBLE) / CAST(nt - nl AS DOUBLE))),
             |      6) AS gain_r6
             |  FROM cw WHERE nl < nt),
             |r AS (SELECT *, row_number() OVER (PARTITION BY feat
             |    ORDER BY gain_r6 DESC, x) AS rn FROM cand)
             |SELECT feat AS feature, x AS split_value,
             |  CAST(nl AS BIGINT) AS n_left, CAST(pl AS BIGINT) AS pos_left,
             |  CAST(nt AS BIGINT) AS n_total, CAST(pt AS BIGINT) AS pos_total,
             |  gain_r6
             |FROM r WHERE rn = 1 ORDER BY feature""".stripMargin)),
  )
}
