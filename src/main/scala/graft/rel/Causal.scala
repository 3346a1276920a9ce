package graft.rel

import org.apache.spark.sql.{Column, DataFrame}
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

  /** DIFFERENCE-IN-DIFFERENCES (the two-group × two-period canonical
    * design): DiD = (ȳ_treated,post − ȳ_treated,pre) −
    * (ȳ_control,post − ȳ_control,pre) — the causal estimate under the
    * parallel-trends assumption, with the SE from the four independent
    * cell variances, se² = Σ_cells s²/n.
    *
    * Exactness: all four cells' (n, Σy, Σy²) are exact integers from
    * ONE hash aggregation (conditional sums — no pivot, no second
    * pass); each mean/variance is a fixed IEEE chain on a 1-row
    * aggregate, so the oracle replays bit-for-bit. Loud guards: an
    * empty cell (the design is undefined) and n < 2 in any cell (no
    * variance).
    *
    * Output (1 row): (n_t_pre, n_t_post, n_c_pre, n_c_post, did_r6,
    * se_r6, z_r6).
    */
  def diffInDiff(df: DataFrame, treat: String = "treat",
      period: String = "period", y: String = "y"): DataFrame = {
    val t0 = col(treat).cast("long"); val p0 = col(period).cast("long")
    val tv = when(t0 === 1L, 1L).when(t0 === 0L, 0L)
      .otherwise(raise_error(concat(
        lit("diffInDiff: treat must be 0 or 1: "), t0.cast("string"))))
    val pv = when(p0 === 1L, 1L).when(p0 === 0L, 0L)
      .otherwise(raise_error(concat(
        lit("diffInDiff: period must be 0 (pre) or 1 (post): "),
        p0.cast("string"))))
    val base = df.select(tv.as("t"), pv.as("p"),
      col(y).cast("long").as("yv"))
    def cell(t: Int, p: Int, what: String): Column = what match {
      case "n" => sum(when(col("t") === t && col("p") === p, 1L).otherwise(0L))
      case "s" => sum(when(col("t") === t && col("p") === p, col("yv"))
        .otherwise(0L))
      case "q" => sum(when(col("t") === t && col("p") === p,
        (col("yv") * col("yv")).cast(
          org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)))
        .otherwise(lit(0L).cast(
          org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0))))
    }
    val agg = base.agg(
      cell(1, 0, "n").as("n10"), cell(1, 0, "s").as("s10"), cell(1, 0, "q").as("q10"),
      cell(1, 1, "n").as("n11"), cell(1, 1, "s").as("s11"), cell(1, 1, "q").as("q11"),
      cell(0, 0, "n").as("n00"), cell(0, 0, "s").as("s00"), cell(0, 0, "q").as("q00"),
      cell(0, 1, "n").as("n01"), cell(0, 1, "s").as("s01"), cell(0, 1, "q").as("q01"))
    def m(n: String, s: String): Column =
      col(s).cast("double") / col(n).cast("double")
    // sample variance from exact moments: (n·Σy² − (Σy)²) / (n(n−1))
    def v(n: String, s: String, q: String): Column =
      (col(n).cast("double") * col(q).cast("double")
        - col(s).cast("double") * col(s).cast("double")) /
        (col(n).cast("double") * (col(n).cast("double") - lit(1.0)))
    val guard = Seq("n10", "n11", "n00", "n01")
      .map(n => when(col(n) < 2L, raise_error(lit(
        s"diffInDiff: cell $n has < 2 units — design undefined")))
        .otherwise(col(n)).as(n))
    agg.select(guard ++ Seq(col("s10"), col("q10"), col("s11"), col("q11"),
      col("s00"), col("q00"), col("s01"), col("q01")): _*)
      .withColumn("did",
        (m("n11", "s11") - m("n10", "s10")) - (m("n01", "s01") - m("n00", "s00")))
      .withColumn("se", sqrt(
        v("n11", "s11", "q11") / col("n11").cast("double")
          + v("n10", "s10", "q10") / col("n10").cast("double")
          + v("n01", "s01", "q01") / col("n01").cast("double")
          + v("n00", "s00", "q00") / col("n00").cast("double")))
      .select(col("n10").as("n_t_pre"), col("n11").as("n_t_post"),
        col("n00").as("n_c_pre"), col("n01").as("n_c_post"),
        round(col("did"), 6).as("did_r6"),
        round(col("se"), 6).as("se_r6"),
        when(col("se") === 0.0, lit(0.0))
          .otherwise(round(col("did") / col("se"), 6)).as("z_r6"))
  }

  /** REGRESSION DISCONTINUITY (sharp design, Thistlethwaite & Campbell
    * 1960; local LINEAR per side, the Gelman–Imbens-recommended order):
    * units within `bandwidthMilli` of the cutoff fit one OLS line per
    * side of the centered running variable; the causal jump is the
    * difference of the two intercepts AT the cutoff,
    *
    *   τ = β₀⁺ − β₀⁻,   se² = Var(β₀⁺) + Var(β₀⁻)
    *
    * with each side's intercept variance from the standard OLS
    * formula Var(β₀) = s²·Σx²/(n·Σx² − (Σx)²), s² = RSS/(n−2).
    *
    * Exactness: the running variable quantizes to centered MILLI
    * units; each side's five moments (n, Σx, Σx², Σy, Σxy, plus Σy²
    * for RSS) are exact decimal(38,0)/HUGEINT integers from ONE
    * conditional aggregation; every estimate is a fixed IEEE chain on
    * the 1-row aggregate. Loud guards: a side with < 3 units (no
    * residual df) and a degenerate side (zero x-variance).
    *
    * Output (1 row): (n_left, n_right, jump_r6, se_r6, z_r6).
    */
  def regressionDiscontinuity(df: DataFrame, running: String = "x",
      outcome: String = "y", cutoff: Double = 0.0,
      bandwidthMilli: Long = 1000000L): DataFrame = {
    require(bandwidthMilli > 0, s"bandwidth > 0: $bandwidthMilli")
    val dec38 = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
    val xm = round((col(running).cast("double") - lit(cutoff)) * 1000, 0)
      .cast("long")
    val base = df.select(xm.as("xm"), col(outcome).cast("long").as("yv"))
      .filter(abs(col("xm")) <= bandwidthMilli)
      .withColumn("r", when(col("xm") >= 0L, 1).otherwise(0))
    def m(side: Int, what: String): Column = {
      val in = col("r") === side
      what match {
        case "n" => sum(when(in, 1L).otherwise(0L))
        case "sx" => sum(when(in, col("xm")).otherwise(0L))
        case "sxx" => sum(when(in, (col("xm") * col("xm")).cast(dec38))
          .otherwise(lit(0L).cast(dec38)))
        case "sy" => sum(when(in, col("yv")).otherwise(0L))
        case "syy" => sum(when(in, (col("yv") * col("yv")).cast(dec38))
          .otherwise(lit(0L).cast(dec38)))
        case "sxy" => sum(when(in, (col("xm") * col("yv")).cast(dec38))
          .otherwise(lit(0L).cast(dec38)))
      }
    }
    val agg = base.agg(
      m(0, "n").as("n0"), m(0, "sx").as("sx0"), m(0, "sxx").as("sxx0"),
      m(0, "sy").as("sy0"), m(0, "syy").as("syy0"), m(0, "sxy").as("sxy0"),
      m(1, "n").as("n1"), m(1, "sx").as("sx1"), m(1, "sxx").as("sxx1"),
      m(1, "sy").as("sy1"), m(1, "syy").as("syy1"), m(1, "sxy").as("sxy1"))
    // per-side chains in doubles from the exact integers; x in MILLI
    // units cancels out of the intercept (evaluated at x = 0)
    def d(c: String): Column = col(c).cast("double")
    def det(s: String): Column = d(s"n$s") * d(s"sxx$s") - d(s"sx$s") * d(s"sx$s")
    def b1(s: String): Column =
      (d(s"n$s") * d(s"sxy$s") - d(s"sx$s") * d(s"sy$s")) / det(s)
    def b0(s: String): Column =
      (d(s"sy$s") * d(s"sxx$s") - d(s"sx$s") * d(s"sxy$s")) / det(s)
    def rss(s: String): Column =
      d(s"syy$s") - b0(s) * d(s"sy$s") - b1(s) * d(s"sxy$s")
    def varB0(s: String): Column =
      (rss(s) / (d(s"n$s") - lit(2.0))) * d(s"sxx$s") / det(s)
    agg.select(
        Seq("0", "1").map(s =>
          when(col(s"n$s") < 3L, raise_error(lit(
            s"regressionDiscontinuity: side $s has < 3 units in the " +
              "bandwidth — widen it")))
            .when(det(s) <= 0.0, raise_error(lit(
              s"regressionDiscontinuity: side $s has zero running-variable " +
                "variance")))
            .otherwise(col(s"n$s")).as(s"n$s")) ++
          Seq("sx0", "sxx0", "sy0", "syy0", "sxy0",
            "sx1", "sxx1", "sy1", "syy1", "sxy1").map(col): _*)
      .withColumn("jump", b0("1") - b0("0"))
      .withColumn("se", sqrt(varB0("1") + varB0("0")))
      .select(col("n0").as("n_left"), col("n1").as("n_right"),
        round(col("jump"), 6).as("jump_r6"),
        round(col("se"), 6).as("se_r6"),
        when(col("se") === 0.0, lit(0.0))
          .otherwise(round(col("jump") / col("se"), 6)).as("z_r6"))
  }

  /** INSTRUMENTAL-VARIABLE Wald estimator (Angrist, Imbens & Rubin
    * 1996, "Identification of causal effects using instrumental
    * variables"): with a binary instrument z,
    *
    *   LATE = ITT / first-stage
    *        = (ȳ_{z=1} − ȳ_{z=0}) / (t̄_{z=1} − t̄_{z=0}),
    *
    * the local average treatment effect on compliers — the estimator
    * that survives unmeasured treatment-outcome confounding, provided
    * z moves treatment and touches the outcome only through it. The
    * final rung of the adjustment ladder (q328 stratification, q349
    * IPW, q373 matching, q374 AIPW all assume no unmeasured
    * confounding; IV does not).
    *
    * Exactness: all six cell statistics are exact integers from ONE
    * hash aggregation; ITT, the first stage, and their ratio are one
    * fixed IEEE chain each. Loud guards: a degenerate instrument (an
    * empty z-arm) and a WEAK instrument (|first stage| < 0.01 — the
    * ratio explodes; silence would be a wrong answer).
    *
    * Output (1 row): (n_z1, n_z0, itt_r6, first_stage_r6, late_r6).
    */
  def ivWald(df: DataFrame, instrument: String = "z",
      treat: String = "t", y: String = "y"): DataFrame = {
    val z0 = col(instrument).cast("long")
    val zv = when(z0 === 1L, 1L).when(z0 === 0L, 0L)
      .otherwise(raise_error(concat(
        lit("ivWald: instrument must be 0 or 1: "), z0.cast("string"))))
    val t0 = col(treat).cast("long")
    val tv = when(t0 === 1L, 1L).when(t0 === 0L, 0L)
      .otherwise(raise_error(concat(
        lit("ivWald: treat must be 0 or 1: "), t0.cast("string"))))
    val base = df.select(zv.as("z"), tv.as("t"),
      col(y).cast("long").as("yv"))
    val agg = base.agg(
      sum(when(col("z") === 1L, 1L).otherwise(0L)).as("n1"),
      sum(when(col("z") === 0L, 1L).otherwise(0L)).as("n0"),
      sum(when(col("z") === 1L, col("t")).otherwise(0L)).as("st1"),
      sum(when(col("z") === 0L, col("t")).otherwise(0L)).as("st0"),
      sum(when(col("z") === 1L, col("yv")).otherwise(0L)).as("sy1"),
      sum(when(col("z") === 0L, col("yv")).otherwise(0L)).as("sy0"))
    val guarded = agg.select(
      when(col("n1") === 0L || col("n0") === 0L, raise_error(lit(
        "ivWald: degenerate instrument — an arm is empty")))
        .otherwise(col("n1")).as("n_z1"),
      col("n0").as("n_z0"), col("st1"), col("st0"), col("sy1"), col("sy0"))
      .withColumn("itt",
        col("sy1").cast("double") / col("n_z1").cast("double")
          - col("sy0").cast("double") / col("n_z0").cast("double"))
      .withColumn("fs",
        col("st1").cast("double") / col("n_z1").cast("double")
          - col("st0").cast("double") / col("n_z0").cast("double"))
    guarded.select(col("n_z1"), col("n_z0"),
      round(col("itt"), 6).as("itt_r6"),
      when(abs(col("fs")) < 0.01, raise_error(lit(
        "ivWald: weak instrument — |first stage| < 0.01, the Wald " +
          "ratio is unstable"))).otherwise(round(col("fs"), 6))
        .as("first_stage_r6"),
      round(col("itt") / col("fs"), 6).as("late_r6"))
  }

  val all: ListMap[String, Q] = ListMap(
    // ---- q381: IV / WALD — "what does early signup cause among the
    //      users an early FIRST TOUCH pushed into it?": instrument =
    //      first event before noon Jan 1 (first stage ~0.21 at
    //      sf0.01), treatment = early signup, outcome = spend cents.
    //      The exclusion restriction is a fixture convention — the
    //      ESTIMATOR is the contract. ----
    "q381_iv_wald" -> Q(
      (s, d) => ivWald(
        Tables.events(s, d).groupBy(col("user_id"))
          .agg(
            when(min(col("ts")) < lit("2024-01-01 12:00:00")
              .cast("timestamp"), 1L).otherwise(0L).as("z"),
            max(when(col("event_type") === "signup"
              && col("ts") < lit("2024-01-05").cast("timestamp"), 1L)
              .otherwise(0L)).as("t"),
            sum(when(col("event_type") === "purchase",
              round(col("value") * 100, 0).cast("long")).otherwise(0L))
              .as("y"))),
      Some("""WITH u AS (SELECT user_id,
             |    CASE WHEN min(ts) < TIMESTAMP '2024-01-01 12:00:00'
             |      THEN 1 ELSE 0 END AS z,
             |    max(CASE WHEN event_type = 'signup'
             |      AND ts < TIMESTAMP '2024-01-05 00:00:00'
             |      THEN 1 ELSE 0 END) AS t,
             |    sum(CASE WHEN event_type = 'purchase'
             |      THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS y
             |  FROM events GROUP BY user_id),
             |ag AS (SELECT
             |    sum(CASE WHEN z = 1 THEN 1 ELSE 0 END) AS n1,
             |    sum(CASE WHEN z = 0 THEN 1 ELSE 0 END) AS n0,
             |    sum(CASE WHEN z = 1 THEN t ELSE 0 END) AS st1,
             |    sum(CASE WHEN z = 0 THEN t ELSE 0 END) AS st0,
             |    sum(CASE WHEN z = 1 THEN y ELSE 0 END) AS sy1,
             |    sum(CASE WHEN z = 0 THEN y ELSE 0 END) AS sy0
             |  FROM u),
             |x AS (SELECT n1, n0,
             |    CAST(sy1 AS DOUBLE) / CAST(n1 AS DOUBLE)
             |      - CAST(sy0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS itt,
             |    CAST(st1 AS DOUBLE) / CAST(n1 AS DOUBLE)
             |      - CAST(st0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS fs
             |  FROM ag)
             |SELECT CAST(n1 AS BIGINT) AS n_z1, CAST(n0 AS BIGINT) AS n_z0,
             |  round(itt, 6) AS itt_r6, round(fs, 6) AS first_stage_r6,
             |  round(itt / fs, 6) AS late_r6
             |FROM x""".stripMargin)),

    // ---- q367: SHARP RDD — "does spend jump at the mid-month
    //      cohort boundary?": running variable = the user's first-
    //      event day index, cutoff day 15, ±10-day bandwidth, local
    //      linear per side. The oracle replays the milli quantization,
    //      the twelve HUGEINT side moments, and every OLS chain. ----
    "q367_regression_discontinuity" -> Q(
      (s, d) => regressionDiscontinuity(
        Tables.events(s, d).groupBy(col("user_id"))
          .agg(
            datediff(to_date(min(col("ts"))),
              lit("2024-01-01").cast("date")).cast("double").as("x"),
            sum(when(col("event_type") === "purchase",
              round(col("value") * 100, 0).cast("long")).otherwise(0L))
              .as("y")),
        "x", "y", cutoff = 15.0, bandwidthMilli = 10000L),
      Some("""WITH u AS (SELECT
             |    CAST(round((CAST(date_diff('day', DATE '2024-01-01',
             |      CAST(min(ts) AS DATE)) AS DOUBLE) - 15.0) * 1000)
             |      AS BIGINT) AS xm,
             |    sum(CASE WHEN event_type = 'purchase'
             |      THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS yv
             |  FROM events GROUP BY user_id),
             |b AS (SELECT xm, yv,
             |    CASE WHEN xm >= 0 THEN 1 ELSE 0 END AS r
             |  FROM u WHERE abs(xm) <= 10000),
             |c AS (SELECT
             |    sum(CASE WHEN r = 0 THEN 1 ELSE 0 END) AS n0,
             |    sum(CASE WHEN r = 0 THEN xm ELSE 0 END) AS sx0,
             |    sum(CASE WHEN r = 0 THEN CAST(xm AS HUGEINT) * xm ELSE 0 END) AS sxx0,
             |    sum(CASE WHEN r = 0 THEN yv ELSE 0 END) AS sy0,
             |    sum(CASE WHEN r = 0 THEN CAST(yv AS HUGEINT) * yv ELSE 0 END) AS syy0,
             |    sum(CASE WHEN r = 0 THEN CAST(xm AS HUGEINT) * yv ELSE 0 END) AS sxy0,
             |    sum(CASE WHEN r = 1 THEN 1 ELSE 0 END) AS n1,
             |    sum(CASE WHEN r = 1 THEN xm ELSE 0 END) AS sx1,
             |    sum(CASE WHEN r = 1 THEN CAST(xm AS HUGEINT) * xm ELSE 0 END) AS sxx1,
             |    sum(CASE WHEN r = 1 THEN yv ELSE 0 END) AS sy1,
             |    sum(CASE WHEN r = 1 THEN CAST(yv AS HUGEINT) * yv ELSE 0 END) AS syy1,
             |    sum(CASE WHEN r = 1 THEN CAST(xm AS HUGEINT) * yv ELSE 0 END) AS sxy1
             |  FROM b),
             |x AS (SELECT n0, n1,
             |    (CAST(sy1 AS DOUBLE) * CAST(sxx1 AS DOUBLE)
             |      - CAST(sx1 AS DOUBLE) * CAST(sxy1 AS DOUBLE))
             |      / (CAST(n1 AS DOUBLE) * CAST(sxx1 AS DOUBLE)
             |        - CAST(sx1 AS DOUBLE) * CAST(sx1 AS DOUBLE))
             |    - (CAST(sy0 AS DOUBLE) * CAST(sxx0 AS DOUBLE)
             |      - CAST(sx0 AS DOUBLE) * CAST(sxy0 AS DOUBLE))
             |      / (CAST(n0 AS DOUBLE) * CAST(sxx0 AS DOUBLE)
             |        - CAST(sx0 AS DOUBLE) * CAST(sx0 AS DOUBLE)) AS jump,
             |    sqrt(
             |      ((CAST(syy1 AS DOUBLE)
             |        - ((CAST(sy1 AS DOUBLE) * CAST(sxx1 AS DOUBLE)
             |          - CAST(sx1 AS DOUBLE) * CAST(sxy1 AS DOUBLE))
             |          / (CAST(n1 AS DOUBLE) * CAST(sxx1 AS DOUBLE)
             |            - CAST(sx1 AS DOUBLE) * CAST(sx1 AS DOUBLE)))
             |          * CAST(sy1 AS DOUBLE)
             |        - ((CAST(n1 AS DOUBLE) * CAST(sxy1 AS DOUBLE)
             |          - CAST(sx1 AS DOUBLE) * CAST(sy1 AS DOUBLE))
             |          / (CAST(n1 AS DOUBLE) * CAST(sxx1 AS DOUBLE)
             |            - CAST(sx1 AS DOUBLE) * CAST(sx1 AS DOUBLE)))
             |          * CAST(sxy1 AS DOUBLE))
             |        / (CAST(n1 AS DOUBLE) - 2.0))
             |        * CAST(sxx1 AS DOUBLE)
             |        / (CAST(n1 AS DOUBLE) * CAST(sxx1 AS DOUBLE)
             |          - CAST(sx1 AS DOUBLE) * CAST(sx1 AS DOUBLE))
             |      + ((CAST(syy0 AS DOUBLE)
             |        - ((CAST(sy0 AS DOUBLE) * CAST(sxx0 AS DOUBLE)
             |          - CAST(sx0 AS DOUBLE) * CAST(sxy0 AS DOUBLE))
             |          / (CAST(n0 AS DOUBLE) * CAST(sxx0 AS DOUBLE)
             |            - CAST(sx0 AS DOUBLE) * CAST(sx0 AS DOUBLE)))
             |          * CAST(sy0 AS DOUBLE)
             |        - ((CAST(n0 AS DOUBLE) * CAST(sxy0 AS DOUBLE)
             |          - CAST(sx0 AS DOUBLE) * CAST(sy0 AS DOUBLE))
             |          / (CAST(n0 AS DOUBLE) * CAST(sxx0 AS DOUBLE)
             |            - CAST(sx0 AS DOUBLE) * CAST(sx0 AS DOUBLE)))
             |          * CAST(sxy0 AS DOUBLE))
             |        / (CAST(n0 AS DOUBLE) - 2.0))
             |        * CAST(sxx0 AS DOUBLE)
             |        / (CAST(n0 AS DOUBLE) * CAST(sxx0 AS DOUBLE)
             |          - CAST(sx0 AS DOUBLE) * CAST(sx0 AS DOUBLE))) AS se
             |  FROM c)
             |SELECT CAST(n0 AS BIGINT) AS n_left, CAST(n1 AS BIGINT) AS n_right,
             |  round(jump, 6) AS jump_r6, round(se, 6) AS se_r6,
             |  CASE WHEN se = 0.0 THEN 0.0 ELSE round(jump / se, 6) END AS z_r6
             |FROM x""".stripMargin)),

    // ---- q358: DIFF-IN-DIFF — "did early signup lift second-half
    //      spend beyond its first-half baseline?": the q328 treatment,
    //      outcome = per-user purchase cents per calendar half, every
    //      user present in BOTH periods (absent halves are true zero
    //      spend, not missing data). One conditional aggregation
    //      carries all twelve cell moments; the oracle replays the
    //      means/variances/z from the same exact integers. ----
    "q358_diff_in_diff" -> Q(
      (s, d) => {
        val users = Tables.events(s, d).groupBy(col("user_id"))
          .agg(max(when(col("event_type") === "signup"
            && col("ts") < lit("2024-01-05").cast("timestamp"), 1L)
            .otherwise(0L)).as("treat"))
        val spend = Tables.events(s, d)
          .withColumn("period",
            when(col("ts") < lit("2024-01-15").cast("timestamp"), 0L)
              .otherwise(1L))
          .groupBy(col("user_id"), col("period"))
          .agg(sum(when(col("event_type") === "purchase",
            round(col("value") * 100, 0).cast("long")).otherwise(0L)).as("y"))
        val periods = s.range(2).select(col("id").as("period"))
        val units = users.crossJoin(periods)
          .join(spend, Seq("user_id", "period"), "left")
          .select(col("treat"), col("period"), coalesce(col("y"), lit(0L)).as("y"))
        diffInDiff(units)
      },
      Some("""WITH u AS (SELECT user_id,
             |    max(CASE WHEN event_type = 'signup'
             |      AND ts < TIMESTAMP '2024-01-05 00:00:00'
             |      THEN 1 ELSE 0 END) AS t
             |  FROM events GROUP BY user_id),
             |sp AS (SELECT user_id,
             |    CASE WHEN ts < TIMESTAMP '2024-01-15 00:00:00'
             |      THEN 0 ELSE 1 END AS p,
             |    sum(CASE WHEN event_type = 'purchase'
             |      THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS y
             |  FROM events GROUP BY 1, 2),
             |un AS (SELECT u.t, pr.p, coalesce(sp.y, 0) AS y
             |  FROM u CROSS JOIN (VALUES (0), (1)) pr(p)
             |  LEFT JOIN sp ON sp.user_id = u.user_id AND sp.p = pr.p),
             |c AS (SELECT
             |    sum(CASE WHEN t = 1 AND p = 0 THEN 1 ELSE 0 END) AS n10,
             |    sum(CASE WHEN t = 1 AND p = 0 THEN y ELSE 0 END) AS s10,
             |    sum(CASE WHEN t = 1 AND p = 0 THEN CAST(y AS HUGEINT) * y ELSE 0 END) AS q10,
             |    sum(CASE WHEN t = 1 AND p = 1 THEN 1 ELSE 0 END) AS n11,
             |    sum(CASE WHEN t = 1 AND p = 1 THEN y ELSE 0 END) AS s11,
             |    sum(CASE WHEN t = 1 AND p = 1 THEN CAST(y AS HUGEINT) * y ELSE 0 END) AS q11,
             |    sum(CASE WHEN t = 0 AND p = 0 THEN 1 ELSE 0 END) AS n00,
             |    sum(CASE WHEN t = 0 AND p = 0 THEN y ELSE 0 END) AS s00,
             |    sum(CASE WHEN t = 0 AND p = 0 THEN CAST(y AS HUGEINT) * y ELSE 0 END) AS q00,
             |    sum(CASE WHEN t = 0 AND p = 1 THEN 1 ELSE 0 END) AS n01,
             |    sum(CASE WHEN t = 0 AND p = 1 THEN y ELSE 0 END) AS s01,
             |    sum(CASE WHEN t = 0 AND p = 1 THEN CAST(y AS HUGEINT) * y ELSE 0 END) AS q01
             |  FROM un),
             |x AS (SELECT *,
             |    (CAST(s11 AS DOUBLE) / CAST(n11 AS DOUBLE)
             |      - CAST(s10 AS DOUBLE) / CAST(n10 AS DOUBLE))
             |    - (CAST(s01 AS DOUBLE) / CAST(n01 AS DOUBLE)
             |      - CAST(s00 AS DOUBLE) / CAST(n00 AS DOUBLE)) AS did,
             |    sqrt(
             |      (CAST(n11 AS DOUBLE) * CAST(q11 AS DOUBLE)
             |        - CAST(s11 AS DOUBLE) * CAST(s11 AS DOUBLE))
             |        / (CAST(n11 AS DOUBLE) * (CAST(n11 AS DOUBLE) - 1.0))
             |        / CAST(n11 AS DOUBLE)
             |      + (CAST(n10 AS DOUBLE) * CAST(q10 AS DOUBLE)
             |        - CAST(s10 AS DOUBLE) * CAST(s10 AS DOUBLE))
             |        / (CAST(n10 AS DOUBLE) * (CAST(n10 AS DOUBLE) - 1.0))
             |        / CAST(n10 AS DOUBLE)
             |      + (CAST(n01 AS DOUBLE) * CAST(q01 AS DOUBLE)
             |        - CAST(s01 AS DOUBLE) * CAST(s01 AS DOUBLE))
             |        / (CAST(n01 AS DOUBLE) * (CAST(n01 AS DOUBLE) - 1.0))
             |        / CAST(n01 AS DOUBLE)
             |      + (CAST(n00 AS DOUBLE) * CAST(q00 AS DOUBLE)
             |        - CAST(s00 AS DOUBLE) * CAST(s00 AS DOUBLE))
             |        / (CAST(n00 AS DOUBLE) * (CAST(n00 AS DOUBLE) - 1.0))
             |        / CAST(n00 AS DOUBLE)) AS se
             |  FROM c)
             |SELECT CAST(n10 AS BIGINT) AS n_t_pre,
             |  CAST(n11 AS BIGINT) AS n_t_post,
             |  CAST(n00 AS BIGINT) AS n_c_pre,
             |  CAST(n01 AS BIGINT) AS n_c_post,
             |  round(did, 6) AS did_r6, round(se, 6) AS se_r6,
             |  CASE WHEN se = 0.0 THEN 0.0 ELSE round(did / se, 6) END AS z_r6
             |FROM x""".stripMargin)),

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
