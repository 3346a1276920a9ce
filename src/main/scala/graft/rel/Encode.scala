package graft.rel

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.rel.RelQueries.Q

/** LEAKAGE-SAFE TARGET ENCODING — the feature-engineering companion to
  * the q112 leakage-free split: per (category, fold), the target
  * statistics computed over every OTHER fold, so a model trained on
  * fold i never sees its own rows' targets reflected back as a
  * feature (the classic target-leak that inflates offline metrics).
  *
  * Computed as two tiny reductions: one partial aggregation to
  * (category, fold) sums/counts — the ONLY pass over the data, one
  * shuffle of pre-aggregated partials — then a window over category on
  * the stats table (|categories| × |folds| rows, KB-scale at any data
  * size) subtracts each fold's own contribution. Applying the encoding
  * to rows is then a broadcast join of this table, never a second wide
  * shuffle. Means are integer floor-division of cent sums, so the
  * oracle replays them bit-exactly.
  */
object Encode {

  /** The out-of-fold encoding table for `df`: one row per (category,
    * fold) with the target sum/count over the other folds and the
    * integer floor-div mean (null when a category exists in only one
    * fold). `value` must be an integral column (fixed-point the target
    * first). Join this (broadcast — it is |categories|×|folds| rows)
    * back onto rows by (category, fold) to attach the feature.
    */
  def targetEncode(df: org.apache.spark.sql.DataFrame, category: String,
      fold: String, value: String): org.apache.spark.sql.DataFrame = {
    val byFold = df.groupBy(col(category), col(fold))
      .agg(sum(col(value)).as("fsum"), count(lit(1)).as("fcnt"))
    val w = Window.partitionBy(category)
    byFold
      .withColumn("oof_sum", sum("fsum").over(w) - col("fsum"))
      .withColumn("oof_cnt", sum("fcnt").over(w) - col("fcnt"))
      .withColumn("oof_mean",
        when(col("oof_cnt") === 0, lit(null))
          .otherwise(expr("oof_sum div oof_cnt")))
      .select(col(category), col(fold), col("oof_sum"), col("oof_cnt"),
        col("oof_mean"))
  }

  /** WEIGHT-OF-EVIDENCE encoding table: per category, WoE =
    * ln(((pos_c+0.5)/P) / ((neg_c+0.5)/N)) — the credit-scoring
    * categorical encoding (Laplace-smoothed so single-class categories
    * stay finite), the log-odds companion to [[targetEncode]]'s mean
    * encoding. Counts are exact longs; the float tail is ONE fixed
    * IEEE chain (two divisions, one division, one ln, rounded to 6)
    * mirrored verbatim in the oracle SQL. No information-value sum is
    * emitted: IV is a float SUM over categories, and unordered float
    * summation is exactly the nondeterminism this repo's house rules
    * exclude — derive it downstream if approximation is acceptable.
    *
    * Scale: one keyed agg (map-side combinable) to |categories| rows +
    * one broadcastable scalar cross of the global totals.
    */
  def woeEncode(df: org.apache.spark.sql.DataFrame, category: String,
      label: org.apache.spark.sql.Column): org.apache.spark.sql.DataFrame = {
    val per = df.groupBy(col(category))
      .agg(sum(when(label, 1L).otherwise(0L)).as("n_pos"),
        sum(when(label, 0L).otherwise(1L)).as("n_neg"))
    val tot = per.agg(sum("n_pos").as("tp"), sum("n_neg").as("tn"))
    per.crossJoin(broadcast(tot))
      .withColumn("woe_r6", round(log(
        ((col("n_pos") + lit(0.5)) / col("tp")) /
          ((col("n_neg") + lit(0.5)) / col("tn"))), 6))
      .select(col(category), col("n_pos"), col("n_neg"), col("woe_r6"))
  }

  val all: ListMap[String, Q] = ListMap(
    // ---- q248: WoE-encode market segment against the high-balance
    //      label (> 4500.00, integer-cents compare). Oracle replays
    //      the identical smoothed log-odds chain. ----
    "q248_woe_encode" -> Q(
      (s, d) => woeEncode(
          Tables.customer(s, d).select(col("c_mktsegment").as("seg"),
            round(col("c_acctbal") * 100).cast("long").as("cents")),
          "seg", col("cents") > 450000L)
        .orderBy("seg"),
      Some("""WITH b AS (
             |  SELECT c_mktsegment AS seg,
             |    CAST(round(c_acctbal * 100) AS BIGINT) > 450000 AS y
             |  FROM customer),
             |per AS (SELECT seg,
             |    sum(CASE WHEN y THEN 1 ELSE 0 END) AS n_pos,
             |    sum(CASE WHEN y THEN 0 ELSE 1 END) AS n_neg
             |  FROM b GROUP BY 1),
             |tot AS (SELECT sum(n_pos) AS tp, sum(n_neg) AS tn FROM per)
             |SELECT seg, CAST(n_pos AS BIGINT) AS n_pos,
             |  CAST(n_neg AS BIGINT) AS n_neg,
             |  round(ln(((n_pos + 0.5) / tp) / ((n_neg + 0.5) / tn)), 6)
             |    AS woe_r6
             |FROM per, tot ORDER BY seg""".stripMargin)),

    // q126: encode part brand by mean retail price (cents) with 5
    // hash folds on the part key. Output is the full encoding table:
    // out-of-fold sum/count and the integer mean each fold would use.
    "q126_target_encode" -> Q(
      (s, d) => {
        val base = Tables.part(s, d).select(
          col("p_brand").as("brand"),
          (col("p_partkey") % 5).cast("long").as("fold"),
          round(col("p_retailprice") * 100, 0).cast("long").as("cents"))
        targetEncode(base, "brand", "fold", "cents")
          .withColumnRenamed("oof_mean", "oof_mean_cents")
          .orderBy("brand", "fold")
      },
      Some("""WITH base AS (SELECT p_brand AS brand, p_partkey % 5 AS fold,
             |    CAST(round(p_retailprice * 100) AS BIGINT) AS cents FROM part),
             |f AS (SELECT brand, fold, CAST(sum(cents) AS BIGINT) AS fsum,
             |    count(*) AS fcnt FROM base GROUP BY 1, 2)
             |SELECT brand, fold,
             |  CAST(sum(fsum) OVER (PARTITION BY brand) - fsum AS BIGINT) AS oof_sum,
             |  CAST(sum(fcnt) OVER (PARTITION BY brand) - fcnt AS BIGINT) AS oof_cnt,
             |  CAST((sum(fsum) OVER (PARTITION BY brand) - fsum)
             |    // NULLIF(sum(fcnt) OVER (PARTITION BY brand) - fcnt, 0) AS BIGINT)
             |    AS oof_mean_cents
             |FROM f ORDER BY brand, fold""".stripMargin)),
  )
}
