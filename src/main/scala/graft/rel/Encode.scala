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

  val all: ListMap[String, Q] = ListMap(
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
