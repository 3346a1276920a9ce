package graft.rel

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.functions.{BitmapAgg, BitmapMergeCardAgg}
import graft.rel.RelQueries.Q
import graft.rel.Tables

/** EXACT DISTINCT ROLLUP over persisted bitmap partials — the
  * architecture entry for [[graft.functions.BitmapAgg]]: COUNT(DISTINCT)
  * is not re-aggregatable (weekly distinct ≠ Σ daily distinct), so
  * incremental pipelines either re-touch the facts per grain or keep a
  * mergeable state. The sketches (q51 KMV / q147 / q160 HLL) merge but
  * approximate; the bitmap merges AND stays exact, at domain/8 bytes
  * per group — the right trade wherever ids are dictionary-dense.
  *
  * Scale shape (100 TB): stage 1 is the only pass over the facts; its
  * (group, bitmap) output is partial-aggregated map-side (word-OR
  * combine), so the shuffle carries one bitmap per group per mapper at
  * worst. Stage 2 never sees the facts — it ORs the daily partials into
  * weeks, exactly what runs against PERSISTED stage-1 output in
  * production (shard → day → week → total, each level a pure merge).
  * Emitting Σ-of-daily alongside the true weekly count makes the
  * non-additivity the operator exists to solve visible in the output.
  */
object ExactDistinct {

  val all: ListMap[String, Q] = ListMap(
    "q214_bitmap_rollup" -> Q(
      (s, d) => {
        val bm = udaf(new BitmapAgg(1 << 16), Encoders.scalaLong)
        val mergeCard = udaf(new BitmapMergeCardAgg, Encoders.BINARY)
        val daily = Tables.events(s, d)
          .groupBy(col("event_type"),
            to_date(date_trunc("DAY", col("ts"))).as("day"))
          .agg(bm(col("user_id")).as("bmap"),
            countDistinct(col("user_id")).as("nd"))
        daily
          .groupBy(col("event_type"),
            to_date(date_trunc("WEEK", col("day"))).as("week"))
          .agg(mergeCard(col("bmap")).as("n_users_exact"),
            sum(col("nd")).as("n_daily_sum"),
            count(lit(1)).as("n_days"))
          .orderBy("event_type", "week")
      },
      Some("""WITH daily AS (
             |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             |    count(DISTINCT user_id) AS nd
             |  FROM events GROUP BY 1, 2),
             |weekly AS (
             |  SELECT event_type,
             |    CAST(date_trunc('week', CAST(date_trunc('day', ts) AS DATE))
             |      AS DATE) AS week,
             |    count(DISTINCT user_id) AS n_users_exact
             |  FROM events GROUP BY 1, 2),
             |agg AS (
             |  SELECT event_type, CAST(date_trunc('week', day) AS DATE) AS week,
             |    CAST(sum(nd) AS BIGINT) AS n_daily_sum, count(*) AS n_days
             |  FROM daily GROUP BY 1, 2)
             |SELECT w.event_type, w.week, w.n_users_exact, a.n_daily_sum, a.n_days
             |FROM weekly w JOIN agg a
             |  ON w.event_type = a.event_type AND w.week = a.week
             |ORDER BY w.event_type, w.week""".stripMargin))
  )
}
