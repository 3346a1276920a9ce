package graft.rel

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.rel.RelQueries.Q
import graft.rel.Tables

/** STRATIFIED ATE — the covariate-adjustment estimator (Cochran 1968,
  * "The effectiveness of adjustment by subclassification"; equivalent
  * to inverse-propensity weighting with the DISCRETE propensity
  * n₁ₛ/nₛ, Rosenbaum & Rubin 1983): within each confounder stratum
  * compare treated vs control means, then weight strata by size,
  *
  *   ATE = Σ_s (nₛ/N_used)·(ȳ₁ₛ − ȳ₀ₛ),
  *
  * the adjustment that un-flips Simpson's paradox where the naive
  * treated-vs-control difference answers the wrong question. Strata
  * violating POSITIVITY (an empty arm) cannot be compared — they are
  * DROPPED and the weights renormalized over the used strata, with
  * the dropped count reported, never silently absorbed.
  *
  * Exactness: every cell count/sum is an exact integer from one hash
  * aggregation; per-stratum means are fixed IEEE chains; the stratum
  * sum rides the ORDER-PINNED cumulative window (the q300 rule) over
  * the domain-bounded stratum table. Output one row:
  * (strata_used, strata_dropped, n_treated, n_control, naive_r6,
  * ate_r6). NOTE: `naive_r6` is the unadjusted treated-vs-control
  * difference over the USED strata's units only (the same population
  * `ate_r6` is estimated on — a like-for-like confounding readout),
  * NOT the whole-input naive difference: units in dropped
  * (positivity-violating) strata contribute to neither column.
  */
object Causal {

  /** Stratified ATE over unit rows: `treat` 0/1, integral `y`,
    * integral `stratum`. Raises loudly when NO stratum has both arms.
    */
  def stratifiedAte(df: DataFrame, treat: String = "treat",
      y: String = "y", stratum: String = "s"): DataFrame = {
    val t0 = col(treat).cast("long")
    val t = when(t0 === 1L, 1L).when(t0 === 0L, 0L)
      .otherwise(raise_error(concat(
        lit("stratifiedAte: treat must be 0/1: "), t0.cast("string"))))
    val base = df.select(col(stratum).cast("long").as("s"), t.as("t"),
      col(y).cast("long").as("yv"))
    val cells = base.groupBy("s")
      .agg(sum(when(col("t") === 1L, 1L).otherwise(0L)).as("n1"),
        sum(when(col("t") === 0L, 1L).otherwise(0L)).as("n0"),
        sum(when(col("t") === 1L, col("yv")).otherwise(0L)).as("s1"),
        sum(when(col("t") === 0L, col("yv")).otherwise(0L)).as("s0"))
      .withColumn("ok", col("n1") > 0 && col("n0") > 0)
    val wCum = Window.orderBy("s").rowsBetween(Long.MinValue, 0)
    val terms = cells
      .withColumn("nu", when(col("ok"), col("n1") + col("n0")).otherwise(0L))
      .withColumn("cum_nu", sum(col("nu")).over(wCum))
      .withColumn("cum_used",
        sum(when(col("ok"), 1L).otherwise(0L)).over(wCum))
      .withColumn("cum_drop",
        sum(when(col("ok"), 0L).otherwise(1L)).over(wCum))
      .withColumn("cum_n1", sum(when(col("ok"), col("n1")).otherwise(0L))
        .over(wCum))
      .withColumn("cum_n0", sum(when(col("ok"), col("n0")).otherwise(0L))
        .over(wCum))
      // nₛ·(ȳ₁ₛ − ȳ₀ₛ) accumulated; the /N_used division is applied
      // once at the edge so the weighting stays a single IEEE chain
      .withColumn("cum_term", sum(when(col("ok"),
        (col("n1") + col("n0")).cast("double")
          * (col("s1").cast("double") / col("n1").cast("double")
            - col("s0").cast("double") / col("n0").cast("double")))
        .otherwise(lit(0.0))).over(wCum))
      .withColumn("cum_s1", sum(when(col("ok"), col("s1")).otherwise(0L))
        .over(wCum))
      .withColumn("cum_s0", sum(when(col("ok"), col("s0")).otherwise(0L))
        .over(wCum))
    terms
      .agg(max(struct(col("s"), col("cum_used"), col("cum_drop"),
        col("cum_n1"), col("cum_n0"), col("cum_nu"), col("cum_term"),
        col("cum_s1"), col("cum_s0"))).as("z"))
      .select(
        when(col("z.cum_used") > 0, col("z.cum_used"))
          .otherwise(raise_error(lit(
            "stratifiedAte: no stratum has both arms (positivity fails "
              + "everywhere)"))).as("strata_used"),
        col("z.cum_drop").as("strata_dropped"),
        col("z.cum_n1").as("n_treated"), col("z.cum_n0").as("n_control"),
        round(col("z.cum_s1").cast("double") / col("z.cum_n1").cast("double")
          - col("z.cum_s0").cast("double") / col("z.cum_n0").cast("double"),
          6).as("naive_r6"),
        round(col("z.cum_term") / col("z.cum_nu").cast("double"), 6)
          .as("ate_r6"))
  }

  val all: ListMap[String, Q] = ListMap(
    // ---- q328: STRATIFIED ATE of "did signing up EARLY (first 4
    //      days) lift purchase spend?" — outcome = total purchase
    //      cents, confounder = activity stratum (total events div 20,
    //      capped at 4): heavier users both hit an early signup more
    //      often (more draws) AND spend more — exactly the
    //      confounding the stratification removes (naive vs adjusted
    //      reported side by side; every stratum has both arms in the
    //      fixture). ----
    "q328_stratified_ate" -> Q(
      (s, d) => stratifiedAte(
        Tables.events(s, d).groupBy(col("user_id"))
          .agg(
            max(when(col("event_type") === "signup"
              && col("ts") < lit("2024-01-05").cast("timestamp"), 1L)
              .otherwise(0L)).as("treat"),
            sum(when(col("event_type") === "purchase",
              round(col("value") * 100, 0).cast("long")).otherwise(0L))
              .as("y"),
            least(floor(count(lit(1)) / 20).cast("long"), lit(4L)).as("s"))),
      Some("""WITH u AS (SELECT user_id,
             |    max(CASE WHEN event_type = 'signup'
             |      AND ts < TIMESTAMP '2024-01-05 00:00:00'
             |      THEN 1 ELSE 0 END) AS t,
             |    sum(CASE WHEN event_type = 'purchase'
             |      THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS yv,
             |    least(count(*) // 20, 4) AS s
             |  FROM events GROUP BY user_id),
             |c AS (SELECT s,
             |    sum(CASE WHEN t = 1 THEN 1 ELSE 0 END) AS n1,
             |    sum(CASE WHEN t = 0 THEN 1 ELSE 0 END) AS n0,
             |    sum(CASE WHEN t = 1 THEN yv ELSE 0 END) AS s1,
             |    sum(CASE WHEN t = 0 THEN yv ELSE 0 END) AS s0
             |  FROM u GROUP BY s),
             |k AS (SELECT *, n1 > 0 AND n0 > 0 AS ok FROM c),
             |w AS (SELECT
             |    sum(CASE WHEN ok THEN 1 ELSE 0 END) AS used,
             |    sum(CASE WHEN ok THEN 0 ELSE 1 END) AS dropped,
             |    sum(CASE WHEN ok THEN n1 ELSE 0 END) AS tn1,
             |    sum(CASE WHEN ok THEN n0 ELSE 0 END) AS tn0,
             |    sum(CASE WHEN ok THEN s1 ELSE 0 END) AS ts1,
             |    sum(CASE WHEN ok THEN s0 ELSE 0 END) AS ts0,
             |    sum(CASE WHEN ok THEN n1 + n0 ELSE 0 END) AS tnu,
             |    sum(CASE WHEN ok THEN CAST(n1 + n0 AS DOUBLE)
             |      * (CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
             |        - CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE))
             |      ELSE 0.0 END ORDER BY s) AS term
             |  FROM k)
             |SELECT CAST(used AS BIGINT) AS strata_used,
             |  CAST(dropped AS BIGINT) AS strata_dropped,
             |  CAST(tn1 AS BIGINT) AS n_treated,
             |  CAST(tn0 AS BIGINT) AS n_control,
             |  round(CAST(ts1 AS DOUBLE) / CAST(tn1 AS DOUBLE)
             |    - CAST(ts0 AS DOUBLE) / CAST(tn0 AS DOUBLE), 6) AS naive_r6,
             |  round(term / CAST(tnu AS DOUBLE), 6) AS ate_r6
             |FROM w""".stripMargin)),
  )
}
