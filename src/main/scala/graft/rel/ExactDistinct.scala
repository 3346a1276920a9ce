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
             |ORDER BY w.event_type, w.week""".stripMargin)),

    // ---- q220: BITMAP AUDIENCE SET-OPS — exact overlap ("did A and
    //      B") and exclusion ("did A, never B") for every event-type
    //      pair, computed from the PERSISTED per-type bitmaps by word
    //      AND / AND-NOT — never by re-joining facts. This is the
    //      audience-segmentation read path bitmap indexes exist for:
    //      the facts are touched once to build |types| bitmaps; every
    //      subsequent segment combination is pure bit arithmetic on
    //      domain/8-byte payloads. The combine runs as a Scala udf over
    //      the |types|²-row pair table — bounded by construction, not a
    //      fact-side path (the q214 aggregators remain the hot path).
    //      Oracle recomputes both counts from distinct (type, user)
    //      pairs. ----
    "q220_bitmap_audience" -> Q(
      (s, d) => {
        val bm = udaf(new BitmapAgg(1 << 16), Encoders.scalaLong)
        val andCard = udf(BitmapAgg.andCardinality _)
        val andNotCard = udf(BitmapAgg.andNotCardinality _)
        val byType = Tables.events(s, d)
          .groupBy(col("event_type"))
          .agg(bm(col("user_id")).as("bmap"))
          .localCheckpoint() // |types| rows; never rebuild per pair
        val a = byType.select(col("event_type").as("type_a"), col("bmap").as("ba"))
        val b = byType.select(col("event_type").as("type_b"), col("bmap").as("bb"))
        a.join(b, col("type_a") < col("type_b"))
          .select(col("type_a"), col("type_b"),
            andCard(col("ba"), col("bb")).as("n_both"),
            andNotCard(col("ba"), col("bb")).as("n_a_only"))
          .orderBy("type_a", "type_b")
      },
      Some("""WITH tu AS (SELECT DISTINCT event_type, user_id FROM events),
             |pairs AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
             |    a.user_id AS ua, b.user_id AS ub
             |  FROM tu a JOIN tu b ON a.user_id = b.user_id
             |    AND a.event_type < b.event_type),
             |ovl AS (SELECT type_a, type_b, count(*) AS n_both
             |  FROM pairs GROUP BY 1, 2),
             |totals AS (SELECT event_type, count(*) AS n FROM tu GROUP BY 1)
             |SELECT b.type_a, b.type_b, b.n_both,
             |  CAST(t.n - b.n_both AS BIGINT) AS n_a_only
             |FROM ovl b JOIN totals t ON t.event_type = b.type_a
             |ORDER BY type_a, type_b""".stripMargin)),

    // ---- q338: SLIDING EXACT DISTINCT — trailing-7-day distinct
    //      users per day, the metric a naive window CANNOT compute
    //      (distinct is not re-aggregatable, and count(DISTINCT) over
    //      a RANGE frame re-touches 7 days of facts per output day).
    //      Here the facts are touched ONCE (the daily bitmap
    //      partials); each output day OR-merges 7 tiny bitmaps — the
    //      same persisted-partial architecture as q214, turned
    //      sideways into a sliding frame. The window join is on the
    //      day table (calendar-bounded); Σ-of-daily rides along to
    //      make the non-additivity visible. ----
    "q338_sliding_distinct" -> Q(
      (s, d) => {
        val bm = udaf(new BitmapAgg(1 << 16), Encoders.scalaLong)
        val mergeCard = udaf(new BitmapMergeCardAgg, Encoders.BINARY)
        val daily = Tables.events(s, d)
          .groupBy(unix_date(to_date(date_trunc("DAY", col("ts"))))
            .cast("long").as("di"))
          .agg(bm(col("user_id")).as("bmap"),
            countDistinct(col("user_id")).as("nd"))
          .localCheckpoint(true) // facts touched once; the join below
                                 // reads 30 bitmap rows
        val days = daily.select(col("di").as("day_idx"))
        days.join(daily,
            col("di").between(col("day_idx") - 6, col("day_idx")))
          .groupBy("day_idx")
          .agg(mergeCard(col("bmap")).as("distinct_7d"),
            sum(col("nd")).as("daily_sum_7d"),
            count(lit(1)).as("n_days_in_window"))
          .orderBy("day_idx")
      },
      Some("""WITH daily AS (
             |  SELECT CAST(CAST(date_trunc('day', ts) AS DATE)
             |      - DATE '1970-01-01' AS BIGINT) AS di,
             |    count(DISTINCT user_id) AS nd
             |  FROM events GROUP BY 1),
             |ev AS (SELECT CAST(CAST(date_trunc('day', ts) AS DATE)
             |      - DATE '1970-01-01' AS BIGINT) AS di, user_id
             |  FROM events),
             |w AS (SELECT d.di AS day_idx,
             |    count(DISTINCT e.user_id) AS distinct_7d
             |  FROM daily d JOIN ev e
             |    ON e.di BETWEEN d.di - 6 AND d.di
             |  GROUP BY 1),
             |ds AS (SELECT d.di AS day_idx,
             |    CAST(sum(d2.nd) AS BIGINT) AS daily_sum_7d,
             |    count(*) AS n_days_in_window
             |  FROM daily d JOIN daily d2
             |    ON d2.di BETWEEN d.di - 6 AND d.di
             |  GROUP BY 1)
             |SELECT w.day_idx, CAST(w.distinct_7d AS BIGINT) AS distinct_7d,
             |  ds.daily_sum_7d, ds.n_days_in_window
             |FROM w JOIN ds USING (day_idx)
             |ORDER BY day_idx""".stripMargin))
  )
}
