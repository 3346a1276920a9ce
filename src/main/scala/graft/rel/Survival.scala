package graft.rel

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.rel.RelQueries.Q
import graft.rel.Tables

/** SURVIVAL ANALYSIS: the Kaplan–Meier product-limit estimator (Kaplan
  * & Meier 1958, "Nonparametric estimation from incomplete
  * observations") — THE retention/churn curve under right-censoring,
  * which the q129/q165 retention matrices cannot express (a user still
  * active at the observation edge is CENSORED, not churned; counting
  * them as survivors-forever biases the curve up, as churned biases it
  * down).
  *
  *   S(t) = Π_{tᵢ ≤ t, dᵢ>0} (1 − dᵢ/nᵢ),  nᵢ = at-risk count at tᵢ.
  *
  * Exactness: risk counts, event counts, censor counts are exact
  * integers from one hash aggregation; the product is evaluated as
  * exp(Σ ln((nᵢ−dᵢ)/nᵢ)) over the ORDERED cumulative window — the
  * summation order is pinned by the window, so both engines run the
  * bit-identical IEEE chain (unlike an unordered product), rounded to
  * 6 at the edge. A time where every remaining unit dies drives the
  * cumulative ln to −∞ and S to exactly 0 in both engines.
  *
  * Scale shape: one hash agg to the distinct-time table; the
  * cumulative windows order DISTINCT TIMES ONLY — survival curves are
  * read at calendar granularity (days/weeks), so the frame is
  * domain-bounded (the Distribution.scala adjudication), never
  * unit-count-sized. Continuous timestamps should be bucketed by the
  * caller first.
  */
object Survival {

  /** Kaplan–Meier curve over (duration, event) unit rows — event 1 =
    * observed (churn/death), 0 = right-censored; anything else fails
    * loudly. Output per distinct duration, ordered:
    * (t, n_risk, d_events, n_censored, surv_r6).
    */
  def kaplanMeier(df: DataFrame, duration: String = "t",
      event: String = "e"): DataFrame = {
    val e0 = col(event).cast("long")
    val e = when(e0 === 1L, 1L).when(e0 === 0L, 0L)
      .otherwise(raise_error(concat(
        lit("kaplanMeier: event must be 0 (censored) or 1 (observed): "),
        e0.cast("string"))))
    val base = df.select(col(duration).cast("long").as("t"), e.as("e"))
    val tot = base.agg(count(lit(1)).as("n_total"))
    val per = base.groupBy("t")
      .agg(count(lit(1)).as("leaving"), sum(col("e")).as("d"))
    val wPrev = Window.orderBy("t").rowsBetween(Long.MinValue, -1)
    val wCum = Window.orderBy("t").rowsBetween(Long.MinValue, 0)
    per.crossJoin(broadcast(tot))
      .withColumn("n_risk",
        col("n_total") - coalesce(sum(col("leaving")).over(wPrev), lit(0L)))
      // a time where EVERY at-risk unit dies has factor 0 — but Spark's
      // log(0) is NULL (ANSI-off), not −∞, so the zero is carried as an
      // explicit cumulative flag in both engines instead of through ln
      .withColumn("lnf", when(col("d") > 0 && col("n_risk") > col("d"),
        log((col("n_risk") - col("d")).cast("double")
          / col("n_risk").cast("double"))).otherwise(lit(0.0)))
      .withColumn("dead",
        max(when(col("d") >= col("n_risk"), 1L).otherwise(0L)).over(wCum))
      .withColumn("surv_r6", when(col("dead") === 1L, lit(0.0))
        .otherwise(round(exp(sum(col("lnf")).over(wCum)), 6)))
      .select(col("t"), col("n_risk"), col("d").as("d_events"),
        (col("leaving") - col("d")).as("n_censored"), col("surv_r6"))
      .orderBy("t")
  }

  val all: ListMap[String, Q] = ListMap(
    // ---- q300: KAPLAN-MEIER purchase-retention curve — per user with
    //      ≥ 1 purchase, lifetime = days from first event to last
    //      PURCHASE; users still purchasing in the corpus's final week
    //      are CENSORED (active at the observation edge), everyone
    //      else is an observed churn. Day granularity keeps the time
    //      domain bounded (≤ 30 distinct durations). ----
    "q300_kaplan_meier" -> Q(
      (s, d) => {
        val lastP = max(when(col("event_type") === "purchase", col("ts")))
        kaplanMeier(
          Tables.events(s, d)
            .groupBy(col("user_id"))
            .agg(
              datediff(to_date(lastP), to_date(min(col("ts"))))
                .cast("long").as("t"),
              when(lastP <= lit("2024-01-24").cast("timestamp"), 1L)
                .otherwise(0L).as("e"))
            .filter(col("t").isNotNull),
          "t", "e")
      },
      Some("""WITH u AS (SELECT user_id,
             |    CAST(date_diff('day', CAST(min(ts) AS DATE),
             |      CAST(max(CASE WHEN event_type = 'purchase' THEN ts END)
             |        AS DATE)) AS BIGINT) AS t,
             |    CASE WHEN max(CASE WHEN event_type = 'purchase' THEN ts END)
             |        <= TIMESTAMP '2024-01-24 00:00:00'
             |      THEN 1 ELSE 0 END AS e
             |  FROM events GROUP BY user_id
             |  HAVING max(CASE WHEN event_type = 'purchase' THEN ts END)
             |    IS NOT NULL),
             |tot AS (SELECT count(*) AS n_total FROM u),
             |per AS (SELECT t, count(*) AS leaving, sum(e) AS d
             |  FROM u GROUP BY t),
             |k AS (SELECT t, leaving, d,
             |    (SELECT n_total FROM tot) - coalesce(sum(leaving) OVER (
             |      ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
             |      AND 1 PRECEDING), 0) AS n_risk
             |  FROM per),
             |s AS (SELECT t, n_risk, d, leaving - d AS n_censored,
             |    sum(CASE WHEN d > 0 AND n_risk > d
             |      THEN ln(CAST(n_risk - d AS DOUBLE)
             |        / CAST(n_risk AS DOUBLE)) ELSE 0.0 END)
             |      OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
             |        AND CURRENT ROW) AS cl,
             |    max(CASE WHEN d >= n_risk THEN 1 ELSE 0 END)
             |      OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
             |        AND CURRENT ROW) AS dead
             |  FROM k)
             |SELECT t, CAST(n_risk AS BIGINT) AS n_risk,
             |  CAST(d AS BIGINT) AS d_events,
             |  CAST(n_censored AS BIGINT) AS n_censored,
             |  CASE WHEN dead = 1 THEN 0.0
             |    ELSE round(exp(cl), 6) END AS surv_r6
             |FROM s ORDER BY t""".stripMargin)))
}
