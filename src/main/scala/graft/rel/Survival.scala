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

  /** NELSON–AALEN cumulative hazard (Nelson 1972, Aalen 1978) over the
    * same (duration, event) unit rows as [[kaplanMeier]]:
    *
    *   H(t) = Σ_{tᵢ ≤ t} dᵢ/nᵢ,   Var(H(t)) = Σ_{tᵢ ≤ t} dᵢ/nᵢ²,
    *
    * plus the Fleming–Harrington survival transform S̃(t) = exp(−H(t))
    * — the hazard-side companion the KM curve's product form hides
    * (cumulative hazard is the quantity additive across time and
    * comparable across cohorts). Counts are exact integers from the
    * same one hash aggregation; each term is one fixed IEEE chain and
    * both running sums ride the ORDER-PINNED cumulative window (the
    * q300 rule), so the oracle replays bit-for-bit. Same domain-bounded
    * window shape as [[kaplanMeier]] — distinct (calendar-granular)
    * durations only.
    *
    * Output per distinct duration, ordered:
    * (t, n_risk, d_events, cumhaz_r6, var_r6, fh_surv_r6).
    */
  def nelsonAalen(df: DataFrame, duration: String = "t",
      event: String = "e"): DataFrame = {
    val e0 = col(event).cast("long")
    val e = when(e0 === 1L, 1L).when(e0 === 0L, 0L)
      .otherwise(raise_error(concat(
        lit("nelsonAalen: event must be 0 (censored) or 1 (observed): "),
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
      .withColumn("cumhaz", sum(
        col("d").cast("double") / col("n_risk").cast("double")).over(wCum))
      .withColumn("cumvar", sum(
        col("d").cast("double") /
          (col("n_risk").cast("double") * col("n_risk").cast("double")))
        .over(wCum))
      .select(col("t"), col("n_risk"), col("d").as("d_events"),
        round(col("cumhaz"), 6).as("cumhaz_r6"),
        round(col("cumvar"), 6).as("var_r6"),
        round(exp(-col("cumhaz")), 6).as("fh_surv_r6"))
      .orderBy("t")
  }

  /** χ²₀.₀₅, df = 1 — the two-group log-rank significance line. */
  private val Chi2Crit1df = 3.841458820694124

  /** LOG-RANK TEST (Mantel 1966; Peto & Peto 1972): are two groups'
    * survival curves the same? Per event time, the observed group-1
    * deaths vs the hypergeometric expectation and variance,
    *
    *   O−E = d₁ − d·n₁/n,   V = d·(n₁/n)·(1−n₁/n)·(n−d)/(n−1),
    *
    * χ² = (Σ(O−E))²/ΣV against the df-1 critical value. Counts are
    * exact integers; the per-time terms are fixed IEEE chains; BOTH
    * running sums ride the ORDER-PINNED cumulative window (the q300
    * rule — an unordered double sum would let engines disagree in the
    * last ulp). ΣV = 0 (no events, or every event at a single-group
    * time) yields χ² = 0 by convention. Output one row:
    * (n_event_times, oe_sum_r6, var_sum_r6, chi2_r6, significant).
    */
  def logRank(df: DataFrame, duration: String = "t", event: String = "e",
      group: String = "g"): DataFrame = {
    val e0 = col(event).cast("long")
    val e = when(e0 === 1L, 1L).when(e0 === 0L, 0L)
      .otherwise(raise_error(concat(
        lit("logRank: event must be 0/1: "), e0.cast("string"))))
    val g0 = col(group).cast("long")
    val g = when(g0 === 1L, 1L).when(g0 === 0L, 0L)
      .otherwise(raise_error(concat(
        lit("logRank: group must be 0/1: "), g0.cast("string"))))
    val base = df.select(col(duration).cast("long").as("t"),
      e.as("e"), g.as("g"))
    val per = base.groupBy("t")
      .agg(count(lit(1)).as("leaving"), sum(col("e")).as("d"),
        sum(col("g")).as("leaving1"),
        sum(col("e") * col("g")).as("d1"))
    val wPrev = Window.orderBy("t").rowsBetween(Long.MinValue, -1)
    val wCum = Window.orderBy("t").rowsBetween(Long.MinValue, 0)
    val tot = base.agg(count(lit(1)).as("n_total"),
      sum(col("g")).as("n1_total"))
    val nD = col("n_risk").cast("double")
    val n1D = col("n1_risk").cast("double")
    val dD = col("d").cast("double"); val d1D = col("d1").cast("double")
    val oe = d1D - (dD * (n1D / nD))
    val v = when(col("n_risk") > 1,
      ((dD * (n1D / nD)) * (lit(1.0) - (n1D / nD)))
        * ((nD - dD) / (nD - lit(1.0)))).otherwise(lit(0.0))
    per.crossJoin(broadcast(tot))
      .withColumn("n_risk",
        col("n_total") - coalesce(sum(col("leaving")).over(wPrev), lit(0L)))
      .withColumn("n1_risk",
        col("n1_total") - coalesce(sum(col("leaving1")).over(wPrev), lit(0L)))
      .withColumn("cum_oe",
        sum(when(col("d") > 0, oe).otherwise(lit(0.0))).over(wCum))
      .withColumn("cum_v",
        sum(when(col("d") > 0, v).otherwise(lit(0.0))).over(wCum))
      .withColumn("is_event", when(col("d") > 0, 1L).otherwise(0L))
      .withColumn("cum_ev", sum(col("is_event")).over(wCum))
      .agg(max(struct(col("t"), col("cum_ev"), col("cum_oe"), col("cum_v")))
        .as("last"))
      .select(col("last.cum_ev").as("n_event_times"),
        round(col("last.cum_oe"), 6).as("oe_sum_r6"),
        round(col("last.cum_v"), 6).as("var_sum_r6"),
        when(col("last.cum_v") === 0.0, lit(0.0))
          .otherwise(round((col("last.cum_oe") * col("last.cum_oe"))
            / col("last.cum_v"), 6)).as("chi2_r6"))
      .withColumn("significant", col("chi2_r6") > lit(Chi2Crit1df))
  }

  /** STRATIFIED (Mantel–Haenszel) LOG-RANK (Mantel 1966; Peto & Peto
    * 1972 §4): the two-group survival comparison ADJUSTED for a
    * confounding stratum — risk sets, O−E and V are computed WITHIN
    * each stratum (a heavy-user stratum cannot masquerade as a
    * treatment effect, the survival-side q328 adjustment), then
    * pooled: χ² = (Σ_s Σ_t (O−E))² / Σ_s Σ_t V against χ²(1).
    *
    * Same exactness contract as [[logRank]]: integer counts from one
    * hash aggregation keyed (stratum, time); per-time terms fixed
    * IEEE chains; the running sums ride cumulative windows
    * PARTITIONED BY STRATUM and ordered by time (domain-bounded
    * frames), and the cross-stratum pool is an ORDER-PINNED
    * cumulative over the stratum table (the q300 rule, twice).
    * Output one row:
    * (n_strata, n_event_times, oe_sum_r6, var_sum_r6, chi2_r6,
    * significant).
    */
  def logRankStratified(df: DataFrame, duration: String = "t",
      event: String = "e", group: String = "g",
      stratum: String = "s"): DataFrame = {
    val e0 = col(event).cast("long")
    val e = when(e0 === 1L, 1L).when(e0 === 0L, 0L)
      .otherwise(raise_error(concat(
        lit("logRankStratified: event must be 0/1: "), e0.cast("string"))))
    val g0 = col(group).cast("long")
    val g = when(g0 === 1L, 1L).when(g0 === 0L, 0L)
      .otherwise(raise_error(concat(
        lit("logRankStratified: group must be 0/1: "), g0.cast("string"))))
    val base = df.select(col(stratum).cast("long").as("s"),
      col(duration).cast("long").as("t"), e.as("e"), g.as("g"))
    val per = base.groupBy("s", "t")
      .agg(count(lit(1)).as("leaving"), sum(col("e")).as("d"),
        sum(col("g")).as("leaving1"),
        sum(col("e") * col("g")).as("d1"))
    val tot = base.groupBy("s")
      .agg(count(lit(1)).as("n_total"), sum(col("g")).as("n1_total"))
    val wPrev = Window.partitionBy("s").orderBy("t")
      .rowsBetween(Long.MinValue, -1)
    val nD = col("n_risk").cast("double")
    val n1D = col("n1_risk").cast("double")
    val dD = col("d").cast("double"); val d1D = col("d1").cast("double")
    val oe = d1D - (dD * (n1D / nD))
    val v = when(col("n_risk") > 1,
      ((dD * (n1D / nD)) * (lit(1.0) - (n1D / nD)))
        * ((nD - dD) / (nD - lit(1.0)))).otherwise(lit(0.0))
    val wCumS = Window.partitionBy("s").orderBy("t")
      .rowsBetween(Long.MinValue, 0)
    val stratumTotals = per.join(tot, Seq("s"))
      .withColumn("n_risk",
        col("n_total") - coalesce(sum(col("leaving")).over(wPrev), lit(0L)))
      .withColumn("n1_risk",
        col("n1_total") - coalesce(sum(col("leaving1")).over(wPrev), lit(0L)))
      .withColumn("cum_oe",
        sum(when(col("d") > 0, oe).otherwise(lit(0.0))).over(wCumS))
      .withColumn("cum_v",
        sum(when(col("d") > 0, v).otherwise(lit(0.0))).over(wCumS))
      .withColumn("cum_ev",
        sum(when(col("d") > 0, 1L).otherwise(0L)).over(wCumS))
      .groupBy("s")
      .agg(max(struct(col("t"), col("cum_ev"), col("cum_oe"), col("cum_v")))
        .as("z"))
      .select(col("s"), col("z.cum_ev").as("ev_s"),
        col("z.cum_oe").as("oe_s"), col("z.cum_v").as("v_s"))
    val wPool = Window.orderBy("s").rowsBetween(Long.MinValue, 0)
    stratumTotals
      .withColumn("p_oe", sum("oe_s").over(wPool))
      .withColumn("p_v", sum("v_s").over(wPool))
      .withColumn("p_ev", sum("ev_s").over(wPool))
      .withColumn("p_n", count(lit(1)).over(wPool))
      .agg(max(struct(col("s"), col("p_n"), col("p_ev"), col("p_oe"),
        col("p_v"))).as("z"))
      .select(col("z.p_n").as("n_strata"),
        col("z.p_ev").as("n_event_times"),
        round(col("z.p_oe"), 6).as("oe_sum_r6"),
        round(col("z.p_v"), 6).as("var_sum_r6"),
        when(col("z.p_v") === 0.0, lit(0.0))
          .otherwise(round((col("z.p_oe") * col("z.p_oe")) / col("z.p_v"), 6))
          .as("chi2_r6"))
      .withColumn("significant", col("chi2_r6") > lit(Chi2Crit1df))
  }

  /** COMPETING RISKS cumulative incidence (Aalen–Johansen 1978) — the
    * multi-cause rung of the ladder: when units can exit for SEVERAL
    * mutually-exclusive reasons (voluntary churn vs. involuntary, death
    * vs. transplant), 1−KM per cause OVERSTATES each cause's incidence
    * (it treats competing events as censoring, redistributing their
    * mass). The correct per-cause probability is
    *
    *   CIF_k(t) = Σ_{tᵢ ≤ t} S(tᵢ₋₁) · d_{k,i}/nᵢ,
    *
    * with S the ALL-CAUSE Kaplan–Meier survival. Σ_k CIF_k(∞) + S(∞)
    * = 1 (the CompetingRisksSpec pin).
    *
    * `cause` is 0 for right-censored, ≥ 1 for an observed exit cause
    * (anything negative raises loudly). Exactness: the q300 recipe —
    * exact integer counts from one hash aggregation, S as
    * exp(Σ ln((n−d)/n)) over the ORDER-PINNED cumulative window
    * (S(tᵢ₋₁) is the same sum over the EXCLUSIVE-prior frame), CIF
    * increments one fixed IEEE chain each, accumulated per cause over
    * the (cause, t)-partitioned ordered window. Domain-bounded
    * windows: distinct calendar durations × causes.
    *
    * Output per (distinct duration with ≥1 event of that cause),
    * ordered: (t, cause, n_risk, d_events, cif_r6).
    */
  def competingRisks(df: DataFrame, duration: String = "t",
      cause: String = "c"): DataFrame = {
    val c0 = col(cause).cast("long")
    val cv = when(c0 >= 0L, c0).otherwise(raise_error(concat(
      lit("competingRisks: cause must be 0 (censored) or >= 1: "),
      c0.cast("string"))))
    val base = df.select(col(duration).cast("long").as("t"), cv.as("c"))
    val tot = base.agg(count(lit(1)).as("n_total"))
    val per = base.groupBy("t")
      .agg(count(lit(1)).as("leaving"),
        sum(when(col("c") > 0L, 1L).otherwise(0L)).as("d"))
    val wPrev = Window.orderBy("t").rowsBetween(Long.MinValue, -1)
    val timeline = per.crossJoin(broadcast(tot))
      .withColumn("n_risk",
        col("n_total") - coalesce(sum(col("leaving")).over(wPrev), lit(0L)))
      .withColumn("lnf", when(col("d") > 0 && col("n_risk") > col("d"),
        log((col("n_risk") - col("d")).cast("double")
          / col("n_risk").cast("double"))).otherwise(lit(0.0)))
      // S(tᵢ₋₁): the exclusive-prior fold — 1 at the first time; 0
      // only if everything already died, at which point no later rows
      // exist (every row has leaving ≥ 1)
      .withColumn("sprev", exp(coalesce(sum(col("lnf")).over(wPrev), lit(0.0))))
      .select(col("t"), col("n_risk"), col("sprev"))
    val perCause = base.filter(col("c") > 0L)
      .groupBy("t", "c").agg(count(lit(1)).as("dk"))
    val wCif = Window.partitionBy("c").orderBy("t")
      .rowsBetween(Long.MinValue, 0)
    perCause.join(timeline, Seq("t"))
      .withColumn("inc",
        col("sprev") * col("dk").cast("double") / col("n_risk").cast("double"))
      .withColumn("cif_r6", round(sum(col("inc")).over(wCif), 6))
      .select(col("t"), col("c").as("cause"), col("n_risk"),
        col("dk").as("d_events"), col("cif_r6"))
      .orderBy("t", "cause")
  }

  /** RESTRICTED MEAN SURVIVAL TIME (Royston & Parmar 2013 for the
    * modern case; the estimand is ∫₀^τ S(t)dt) per group — "average
    * days retained within the first τ days", the absolute-scale
    * companion the log-rank χ² and the Cox hazard ratio both lack
    * (and the recommended summary when hazards are non-proportional).
    * The KM step function integrates EXACTLY: each inter-event
    * interval contributes S(tᵢ₋₁)·(min(tᵢ,τ) − min(tᵢ₋₁,τ)), plus the
    * tail S(t_last)·(τ − t_last) — no quadrature error, because S is
    * piecewise constant.
    *
    * Same exactness recipe as [[kaplanMeier]]: integer counts, the
    * ORDER-PINNED per-group ln-sum fold for S, one fixed IEEE chain
    * per interval, accumulated over the (group, t) window; a group
    * extinguished before τ gets a zero tail via the cumulative dead
    * flag. Output per group, ordered: (g, n_units, tau, rmst_r6).
    */
  def rmst(df: DataFrame, tau: Long, duration: String = "t",
      event: String = "e", group: String = "g"): DataFrame = {
    require(tau > 0, s"tau must be positive: $tau")
    val e0 = col(event).cast("long")
    val ev = when(e0 === 1L, 1L).when(e0 === 0L, 0L)
      .otherwise(raise_error(concat(
        lit("rmst: event must be 0 (censored) or 1 (observed): "),
        e0.cast("string"))))
    val base = df.select(col(group).cast("string").as("g"),
      col(duration).cast("long").as("t"), ev.as("e"))
    val tot = base.groupBy("g").agg(count(lit(1)).as("n_total"))
    val per = base.groupBy("g", "t")
      .agg(count(lit(1)).as("leaving"), sum(col("e")).as("d"))
    val wPrev = Window.partitionBy("g").orderBy("t")
      .rowsBetween(Long.MinValue, -1)
    val wCum = Window.partitionBy("g").orderBy("t")
      .rowsBetween(Long.MinValue, 0)
    val tl = per.join(broadcast(tot), "g")
      .withColumn("n_risk",
        col("n_total") - coalesce(sum(col("leaving")).over(wPrev), lit(0L)))
      .withColumn("lnf", when(col("d") > 0 && col("n_risk") > col("d"),
        log((col("n_risk") - col("d")).cast("double")
          / col("n_risk").cast("double"))).otherwise(lit(0.0)))
      .withColumn("sprev", exp(coalesce(sum(col("lnf")).over(wPrev), lit(0.0))))
      .withColumn("dead",
        max(when(col("d") >= col("n_risk"), 1L).otherwise(0L)).over(wCum))
      .withColumn("scur", when(col("dead") === 1L, lit(0.0))
        .otherwise(exp(sum(col("lnf")).over(wCum))))
      .withColumn("tprev", coalesce(lag(col("t"), 1).over(
        Window.partitionBy("g").orderBy("t")), lit(0L)))
      .withColumn("contrib", col("sprev")
        * (least(col("t"), lit(tau)) - least(col("tprev"), lit(tau)))
          .cast("double"))
      .withColumn("cum", sum(col("contrib")).over(wCum))
    tl.groupBy("g")
      .agg(max(col("n_total")).as("n_units"),
        // the last row carries the running integral and the tail state
        max(struct(col("t"), col("cum"), col("scur"))).as("z"))
      .select(col("g"), col("n_units"), lit(tau).as("tau"),
        round(col("z.cum") + col("z.scur")
          * greatest(lit(tau) - least(col("z.t"), lit(tau)), lit(0L))
            .cast("double"), 6).as("rmst_r6"))
      .orderBy("g")
  }

  /** HARRELL'S CONCORDANCE INDEX (Harrell et al. 1982) — the survival
    * model's ranking quality: over comparable pairs (i died at tᵢ
    * strictly before j's time), the fraction where the model gave i
    * the HIGHER risk score, score ties counted half. C = 0.5 is
    * coin-flip risk ranking, 1.0 perfect.
    *
    * The pair space is never formed: with an INTEGER risk score, pairs
    * reduce to a dense (distinct-t × distinct-score) GRID —
    * later(t, s) = units with time > t in score bucket s via a
    * t-suffix window per score, then concordant/tied/comparable masses
    * per event cell via score-cumulative windows per time — all exact
    * integer sums over a domain-bounded grid (loud raise past 10⁶
    * cells: quantize the score first, the splitGains binning rule).
    * Pairs tied on time are excluded (the standard simple variant).
    *
    * Output (1 row): (n_comparable, n_concordant, n_tied_score,
    * c_index_r6).
    */
  def concordanceIndex(df: DataFrame, duration: String = "t",
      event: String = "e", score: String = "s"): DataFrame = {
    val dec38 = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
    val e0 = col(event).cast("long")
    val ev = when(e0 === 1L, 1L).when(e0 === 0L, 0L)
      .otherwise(raise_error(concat(
        lit("concordanceIndex: event must be 0 or 1: "), e0.cast("string"))))
    val base = df.select(col(duration).cast("long").as("t"), ev.as("e"),
      col(score).cast("long").as("s"))
    val g = base.groupBy("t", "s")
      .agg(count(lit(1)).as("n"), sum(col("e")).as("d"))
      .localCheckpoint(true)
    // dense grid: distinct times × distinct scores (missing cells are
    // real zeroes the windows must fold over)
    val ts = g.select("t").distinct(); val ss = g.select("s").distinct()
    val sizes = ts.crossJoin(broadcast(ss.agg(count(lit(1)).as("ns"))))
      .agg(count(lit(1)).as("nt"), max(col("ns")).as("ns"))
    val grid = ts.crossJoin(ss)
      .join(g, Seq("t", "s"), "left")
      .select(col("t"), col("s"),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("d"), lit(0L)).as("d"))
    val wSufT = Window.partitionBy("s").orderBy(col("t").desc)
      .rowsBetween(Long.MinValue, -1) // strictly later times
    val wCumS = Window.partitionBy("t").orderBy("s")
      .rowsBetween(Long.MinValue, -1) // strictly smaller scores
    val wAllS = Window.partitionBy("t")
    val cells = grid
      .withColumn("later", coalesce(sum(col("n")).over(wSufT), lit(0L)))
      // among strictly-later units at this time row: how many have a
      // SMALLER score (concordant for an event here), the same score
      // (tied), or any score (comparable)
      .withColumn("conc_l", coalesce(sum(col("later")).over(wCumS), lit(0L)))
      .withColumn("comp_l", sum(col("later")).over(wAllS))
      .filter(col("d") > 0L)
      .select(
        (col("d").cast(dec38) * col("conc_l")).as("conc"),
        (col("d").cast(dec38) * col("later")).as("tied"),
        (col("d").cast(dec38) * col("comp_l")).as("comp"))
    cells.crossJoin(broadcast(sizes))
      .select(
        when(col("nt") * col("ns") > 1000000L, raise_error(lit(
          "concordanceIndex: grid exceeds 1e6 cells — quantize the score")))
          .otherwise(col("conc")).as("conc"), col("tied"), col("comp"))
      .agg(sum(col("conc")).as("conc0"), sum(col("tied")).as("tied0"),
        sum(col("comp")).as("comp0"))
      // an all-censored input has NO event cells: the sums come back
      // null, which would let the guard below slide through
      .select(coalesce(col("conc0"), lit(0L).cast(dec38)).as("conc"),
        coalesce(col("tied0"), lit(0L).cast(dec38)).as("tied"),
        coalesce(col("comp0"), lit(0L).cast(dec38)).as("comp"))
      .select(col("comp").cast("long").as("n_comparable"),
        col("conc").cast("long").as("n_concordant"),
        col("tied").cast("long").as("n_tied_score"),
        when(col("comp") === 0L, raise_error(lit(
          "concordanceIndex: no comparable pairs (no observed event " +
            "precedes another unit's time)")))
          .otherwise(round((col("conc").cast("double")
            + lit(0.5) * col("tied").cast("double"))
            / col("comp").cast("double"), 6)).as("c_index_r6"))
  }

  // ---- Cox proportional hazards ------------------------------------

  private val XmCap = 1000000L     // |x| ≤ 1000 after milli quantization
  private val LpCap = 20000000000L // |xm·β_micro| ≤ 2e10 ⇔ |xβ| ≤ 20

  /** COX PROPORTIONAL HAZARDS (Cox 1972), single covariate, Breslow
    * tie handling — the regression rung the KM/Nelson-Aalen/log-rank
    * ladder ([[kaplanMeier]]) stops short of: hazard h(t|x) =
    * h₀(t)·e^{βx}, β fit by `iters` FIXED Newton rounds on the partial
    * likelihood (fixed rounds = replayable, the q316/q323 contract):
    *
    *   U(β) = Σ_t [ sx_t − d_t·R1_t/R0_t ]
    *   I(β) = Σ_t d_t·[ R2_t/R0_t − (R1_t/R0_t)² ],   β ← β + U/I,
    *
    * with R0/R1/R2 the risk-set sums of w, x·w, x²·w over units still
    * at risk at t, and sx/d the event-side covariate sum and count.
    *
    * Cross-engine determinism (the house recipe): the covariate
    * quantizes to integer MILLI-units and β lives in integer
    * MICRO-units, so each round's weight w = round(e^{xm·β/10⁹}·10⁶)
    * is ONE fixed IEEE exp per unit quantized to an integer; all
    * risk-set sums then ride exact decimal(38,0)/HUGEINT integers
    * (order-free — the Modularity move), U and I are fixed IEEE
    * chains over the ORDER-PINNED distinct-time window (q300 rule),
    * and the β update re-quantizes to micro. Every round's β is an
    * integer both engines agree on bit-for-bit.
    *
    * Loud guards: covariate past ±1000 (standardize first), linear
    * predictor past ±20 (w would overflow the integer domain — a
    * diverging fit or an unscaled covariate), non-positive
    * information (degenerate covariate).
    *
    * Scale shape: the corpus collapses once to (t, e, xm) and is
    * localCheckpointed; each round is ONE narrow pass + a hash agg to
    * the distinct-time table + domain-bounded cumulative windows
    * (calendar-granular durations, the KM adjudication) + a 1-row β —
    * never a unit-count-sized window, never a collect of unit rows.
    *
    * Output (1 row): (beta_micro, hr_r6, se_r6, score_r6, n_events,
    * n_units) — se from the information at the FINAL β (one extra
    * evaluation pass), score_r6 the final U (≈0 at convergence).
    */
  def coxPh(df: DataFrame, duration: String = "t", event: String = "e",
      covariate: String = "x", iters: Int = 8): DataFrame = {
    require(iters >= 1 && iters <= 16, s"1 <= iters <= 16: $iters")
    val e0 = col(event).cast("long")
    val ev = when(e0 === 1L, 1L).when(e0 === 0L, 0L)
      .otherwise(raise_error(concat(
        lit("coxPh: event must be 0 (censored) or 1 (observed): "),
        e0.cast("string"))))
    val xm0 = round(col(covariate).cast("double") * 1000, 0).cast("long")
    val base0 = df.select(col(duration).cast("long").as("t"), ev.as("e"),
        xm0.as("xm0"))
      .select(col("t"), col("e"),
        when(abs(col("xm0")) > XmCap, raise_error(concat(
          lit("coxPh: |covariate| exceeds 1000 after milli quantization" +
            " — standardize it: "), col("xm0").cast("string"))))
          .otherwise(col("xm0")).as("xm"))
    // CENTER the covariate at its rounded-milli mean: hazard ratios are
    // shift-invariant, and centering keeps the weight domain near 1
    // (an uncentered x of constant sign drives every e^{xβ} jointly
    // huge or jointly underflowing-to-0 as β moves — observed as a
    // zero risk-set sum on the q345 fixture). The mean rides an exact
    // long sum divided in double (n < 2⁵³, sum < 2⁶³: both engines
    // compute the identical IEEE quotient), rounded to a long.
    val cbar = base0.agg(
      round(avg(col("xm")), 0).cast("long").as("cbar"))
    val base = base0.crossJoin(broadcast(cbar))
      .select(lit("_").as("s"), col("t"), col("e"),
        (col("xm") - col("cbar")).as("xm"))
      .localCheckpoint(true) // corpus touched once; rounds re-read this
    coxFit(base, iters)
  }

  /** STRATIFIED Cox PH: one shared β, a separate baseline hazard per
    * stratum — risk sets form WITHIN each stratum (the q339
    * per-stratum seam applied to the regression rung) and the score/
    * information contributions pool across strata. Same quantization,
    * centering (global — hazard ratios are shift-invariant within
    * every stratum), clamped fixed-round Newton, and determinism
    * contract as [[coxPh]].
    */
  def coxPhStratified(df: DataFrame, duration: String = "t",
      event: String = "e", covariate: String = "x",
      stratum: String = "s", iters: Int = 8): DataFrame = {
    require(iters >= 1 && iters <= 16, s"1 <= iters <= 16: $iters")
    val e0 = col(event).cast("long")
    val ev = when(e0 === 1L, 1L).when(e0 === 0L, 0L)
      .otherwise(raise_error(concat(
        lit("coxPhStratified: event must be 0 (censored) or 1 (observed): "),
        e0.cast("string"))))
    val xm0 = round(col(covariate).cast("double") * 1000, 0).cast("long")
    val base0 = df.select(col(stratum).cast("string").as("s"),
        col(duration).cast("long").as("t"), ev.as("e"), xm0.as("xm0"))
      .select(col("s"), col("t"), col("e"),
        when(abs(col("xm0")) > XmCap, raise_error(concat(
          lit("coxPhStratified: |covariate| exceeds 1000 after milli " +
            "quantization — standardize it: "), col("xm0").cast("string"))))
          .otherwise(col("xm0")).as("xm"))
    val cbar = base0.agg(
      round(avg(col("xm")), 0).cast("long").as("cbar"))
    val base = base0.crossJoin(broadcast(cbar))
      .select(col("s"), col("t"), col("e"), (col("xm") - col("cbar")).as("xm"))
      .localCheckpoint(true)
    coxFit(base, iters)
  }

  /** the shared fixed-round Newton core over (s, t, e, xm) unit rows —
    * the plain fit is the one-stratum case (s = "_")
    */
  private def coxFit(base: DataFrame, iters: Int): DataFrame = {
    val dec38 = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)

    /** one Newton evaluation at the 1-row β: returns (b, u, i) */
    def scoreInfo(betaDf: DataFrame): DataFrame = {
      val lp = col("xm") * col("b")
      val lpg = when(abs(lp) > LpCap, raise_error(
        lit("coxPh: |linear predictor| exceeds 20 — diverging fit or " +
          "unscaled covariate"))).otherwise(lp)
      val w = round(exp(lpg.cast("double") / lit(1e9)) * 1e6, 0).cast(dec38)
      val pt = base.crossJoin(broadcast(betaDf))
        .withColumn("w", w)
        .groupBy("s", "t", "b")
        .agg(sum(col("w")).as("s0"),
          sum(col("xm") * col("w")).as("s1"),
          sum((col("xm") * col("xm")).cast(dec38) * col("w")).as("s2"),
          sum(col("e")).as("d"),
          sum(when(col("e") === 1L, col("xm")).otherwise(0L)).as("sx"))
      // risk sets form WITHIN a stratum; the U/I folds pool across
      // strata in (s, t) order — both windows stay domain-bounded
      // (strata × distinct calendar durations)
      val wSuf = Window.partitionBy("s").orderBy(col("t").desc)
        .rowsBetween(Long.MinValue, 0)
      val wCum = Window.orderBy("s", "t").rowsBetween(Long.MinValue, 0)
      pt.withColumn("r0", sum("s0").over(wSuf))
        .withColumn("r1", sum("s1").over(wSuf))
        .withColumn("r2", sum("s2").over(wSuf))
        .withColumn("rr", col("r1").cast("double") / col("r0").cast("double"))
        .withColumn("uc",
          (col("sx").cast("double") - col("d").cast("double") * col("rr"))
            / lit(1000.0))
        .withColumn("ic", col("d").cast("double")
          * (col("r2").cast("double") / col("r0").cast("double")
            - col("rr") * col("rr")) / lit(1000000.0))
        .withColumn("ucum", sum("uc").over(wCum))
        .withColumn("icum", sum("ic").over(wCum))
        .agg(max(struct(col("s"), col("t"), col("b"), col("ucum"),
          col("icum"))).as("z"))
        .select(col("z.b").as("b"), col("z.ucum").as("u"), col("z.icum").as("i"))
    }

    var beta = base.sparkSession.range(1).select(lit(0L).as("b"))
    for (_ <- 1 to iters) {
      // the Newton step is CLAMPED to ±1 per round (a fixed trust
      // region): on a weakly-identified covariate the information is
      // near zero and the raw step overshoots past the weight domain
      // in one round. The clamp preserves the fixed point (at
      // convergence U≈0 so the step is inside the region) and keeps
      // every round deterministic.
      beta = scoreInfo(beta).select(
        when(col("i") <= 0.0, raise_error(
          lit("coxPh: non-positive information — degenerate covariate")))
          .otherwise(round((col("b").cast("double") / lit(1e6)
            + greatest(least(col("u") / col("i"), lit(1.0)), lit(-1.0)))
            * lit(1e6), 0).cast("long")).as("b"))
        .localCheckpoint(true) // eager: a lazy chain re-runs all rounds
    }
    val fin = scoreInfo(beta)
    val stats = base.agg(count(lit(1)).as("n_units"), sum("e").as("n_events"))
    fin.crossJoin(broadcast(stats))
      .select(col("b").as("beta_micro"),
        round(exp(col("b").cast("double") / lit(1e6)), 6).as("hr_r6"),
        when(col("i") <= 0.0, raise_error(
          lit("coxPh: non-positive information — degenerate covariate")))
          .otherwise(round(lit(1.0) / sqrt(col("i")), 6)).as("se_r6"),
        round(col("u"), 6).as("score_r6"),
        col("n_events"), col("n_units"))
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
             |FROM s ORDER BY t""".stripMargin)),

    // ---- q317: NELSON-AALEN cumulative hazard on the q300 fixture —
    //      the additive hazard-side reading of the same retention
    //      data, with the Fleming-Harrington survival transform. ----
    "q317_nelson_aalen" -> Q(
      (s, d) => {
        val lastP = max(when(col("event_type") === "purchase", col("ts")))
        nelsonAalen(
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
             |s AS (SELECT t, n_risk, d,
             |    sum(CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE))
             |      OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
             |        AND CURRENT ROW) AS ch,
             |    sum(CAST(d AS DOUBLE)
             |        / (CAST(n_risk AS DOUBLE) * CAST(n_risk AS DOUBLE)))
             |      OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
             |        AND CURRENT ROW) AS cv
             |  FROM k)
             |SELECT t, CAST(n_risk AS BIGINT) AS n_risk,
             |  CAST(d AS BIGINT) AS d_events,
             |  round(ch, 6) AS cumhaz_r6, round(cv, 6) AS var_r6,
             |  round(exp(-ch), 6) AS fh_surv_r6
             |FROM s ORDER BY t""".stripMargin)),

    // ---- q303: LOG-RANK TEST — do even- and odd-id users churn from
    //      purchasing at the same rate? The q300 fixture split by user
    //      parity; hypergeometric O−E and V per event time, χ² vs the
    //      df-1 critical value. ----
    "q303_logrank" -> Q(
      (s, d) => {
        val lastP = max(when(col("event_type") === "purchase", col("ts")))
        logRank(
          Tables.events(s, d)
            .groupBy(col("user_id"))
            .agg(
              datediff(to_date(lastP), to_date(min(col("ts"))))
                .cast("long").as("t"),
              when(lastP <= lit("2024-01-24").cast("timestamp"), 1L)
                .otherwise(0L).as("e"))
            .withColumn("g", pmod(col("user_id"), lit(2L)))
            .filter(col("t").isNotNull),
          "t", "e", "g")
      },
      Some("""WITH u AS (SELECT user_id,
             |    CAST(date_diff('day', CAST(min(ts) AS DATE),
             |      CAST(max(CASE WHEN event_type = 'purchase' THEN ts END)
             |        AS DATE)) AS BIGINT) AS t,
             |    CASE WHEN max(CASE WHEN event_type = 'purchase' THEN ts END)
             |        <= TIMESTAMP '2024-01-24 00:00:00'
             |      THEN 1 ELSE 0 END AS e,
             |    user_id % 2 AS g
             |  FROM events GROUP BY user_id
             |  HAVING max(CASE WHEN event_type = 'purchase' THEN ts END)
             |    IS NOT NULL),
             |per AS (SELECT t, count(*) AS leaving, sum(e) AS d,
             |    sum(g) AS leaving1, sum(e * g) AS d1 FROM u GROUP BY t),
             |tot AS (SELECT count(*) AS n_total, sum(g) AS n1_total FROM u),
             |k AS (SELECT t, d, d1,
             |    (SELECT n_total FROM tot) - coalesce(sum(leaving) OVER (
             |      ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
             |      AND 1 PRECEDING), 0) AS n_risk,
             |    (SELECT n1_total FROM tot) - coalesce(sum(leaving1) OVER (
             |      ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
             |      AND 1 PRECEDING), 0) AS n1_risk
             |  FROM per),
             |cm AS (SELECT t,
             |    sum(CASE WHEN d > 0 THEN CAST(d1 AS DOUBLE)
             |        - (CAST(d AS DOUBLE) * (CAST(n1_risk AS DOUBLE)
             |          / CAST(n_risk AS DOUBLE))) ELSE 0.0 END)
             |      OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
             |        AND CURRENT ROW) AS cum_oe,
             |    sum(CASE WHEN d > 0 THEN CASE WHEN n_risk > 1 THEN
             |        ((CAST(d AS DOUBLE) * (CAST(n1_risk AS DOUBLE)
             |          / CAST(n_risk AS DOUBLE)))
             |        * (1.0 - (CAST(n1_risk AS DOUBLE)
             |          / CAST(n_risk AS DOUBLE))))
             |        * ((CAST(n_risk AS DOUBLE) - CAST(d AS DOUBLE))
             |          / (CAST(n_risk AS DOUBLE) - 1.0))
             |      ELSE 0.0 END ELSE 0.0 END)
             |      OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
             |        AND CURRENT ROW) AS cum_v,
             |    sum(CASE WHEN d > 0 THEN 1 ELSE 0 END)
             |      OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
             |        AND CURRENT ROW) AS cum_ev
             |  FROM k),
             |lr AS (SELECT cum_ev, cum_oe, cum_v FROM cm
             |  ORDER BY t DESC LIMIT 1)
             |SELECT CAST(cum_ev AS BIGINT) AS n_event_times,
             |  round(cum_oe, 6) AS oe_sum_r6, round(cum_v, 6) AS var_sum_r6,
             |  CASE WHEN cum_v = 0.0 THEN 0.0
             |    ELSE round((cum_oe * cum_oe) / cum_v, 6) END AS chi2_r6,
             |  (CASE WHEN cum_v = 0.0 THEN 0.0
             |    ELSE round((cum_oe * cum_oe) / cum_v, 6) END)
             |    > 3.841458820694124 AS significant
             |FROM lr""".stripMargin)),

    // ---- q304: SPLIT-CONFORMAL THRESHOLDS — per return flag, the 90%
    //      conformal radius of |price − flag median| nonconformity
    //      scores; both the median and the conformal rank ride the
    //      grouped two-pass exact selection (no per-group sort). ----
    "q304_conformal" -> Q(
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .select(col("l_returnflag").as("flag"),
            round(col("l_extendedprice") * 100, 0).cast("long").as("c"))
          .localCheckpoint()
        val med = Robust.groupedExactKth(li, "flag", "c", n => (n + 1) / 2)
          .select(col("flag"), col("value").as("med"))
        val scores = li.join(broadcast(med), "flag")
          .select(col("flag"), abs(col("c") - col("med")).as("score"))
        Robust.conformalThresholds(scores, "flag", "score",
          alphaMilli = 100L)
      },
      Some("""WITH c AS (SELECT l_returnflag AS flag,
             |    CAST(round(l_extendedprice * 100) AS BIGINT) AS c
             |  FROM lineitem),
             |m AS (SELECT flag, CAST(quantile_disc(c, 0.5) AS BIGINT) AS med
             |  FROM c GROUP BY flag),
             |sc AS (SELECT c.flag, abs(c.c - m.med) AS score
             |  FROM c JOIN m USING (flag)),
             |st AS (SELECT flag, count(*) AS n FROM sc GROUP BY flag),
             |r AS (SELECT flag, n,
             |    least(n, ((900 * (n + 1)) + 999) // 1000) AS k FROM st),
             |rk AS (SELECT flag, score, row_number() OVER (
             |    PARTITION BY flag ORDER BY score) AS rn FROM sc)
             |SELECT r.flag AS flag, r.n, CAST(r.k AS BIGINT) AS k,
             |  rk.score AS qhat_milli
             |FROM r JOIN rk ON rk.flag = r.flag AND rk.rn = r.k
             |ORDER BY r.flag""".stripMargin)),

    // ---- q339: STRATIFIED LOG-RANK on the q303 retention comparison,
    //      adjusted for the q328 activity confounder (events div 20,
    //      capped at 4) — risk sets within stratum, O-E and V pooled
    //      across strata. ----
    "q339_logrank_stratified" -> Q(
      (s, d) => {
        val lastP = max(when(col("event_type") === "purchase", col("ts")))
        logRankStratified(
          Tables.events(s, d)
            .groupBy(col("user_id"))
            .agg(
              datediff(to_date(lastP), to_date(min(col("ts"))))
                .cast("long").as("t"),
              when(lastP <= lit("2024-01-24").cast("timestamp"), 1L)
                .otherwise(0L).as("e"),
              least(floor(count(lit(1)) / 20).cast("long"), lit(4L))
                .as("strat"))
            .withColumn("g", pmod(col("user_id"), lit(2L)))
            .filter(col("t").isNotNull),
          "t", "e", "g", "strat")
      },
      Some("""WITH u AS (SELECT user_id,
             |    CAST(date_diff('day', CAST(min(ts) AS DATE),
             |      CAST(max(CASE WHEN event_type = 'purchase' THEN ts END)
             |        AS DATE)) AS BIGINT) AS t,
             |    CASE WHEN max(CASE WHEN event_type = 'purchase' THEN ts END)
             |        <= TIMESTAMP '2024-01-24 00:00:00'
             |      THEN 1 ELSE 0 END AS e,
             |    user_id % 2 AS g,
             |    least(count(*) // 20, 4) AS s
             |  FROM events GROUP BY user_id
             |  HAVING max(CASE WHEN event_type = 'purchase' THEN ts END)
             |    IS NOT NULL),
             |per AS (SELECT s, t, count(*) AS leaving, sum(e) AS d,
             |    sum(g) AS leaving1, sum(e * g) AS d1
             |  FROM u GROUP BY s, t),
             |tot AS (SELECT s, count(*) AS n_total, sum(g) AS n1_total
             |  FROM u GROUP BY s),
             |k AS (SELECT per.s, per.t, per.leaving, per.d, per.d1,
             |    tot.n_total - coalesce(sum(per.leaving) OVER (
             |      PARTITION BY per.s ORDER BY per.t
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |      AS n_risk,
             |    tot.n1_total - coalesce(sum(per.leaving1) OVER (
             |      PARTITION BY per.s ORDER BY per.t
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |      AS n1_risk
             |  FROM per JOIN tot USING (s)),
             |c AS (SELECT s,
             |    sum(CASE WHEN d > 0 THEN CAST(d1 AS DOUBLE)
             |      - (CAST(d AS DOUBLE) * (CAST(n1_risk AS DOUBLE)
             |        / CAST(n_risk AS DOUBLE))) ELSE 0.0 END
             |      ORDER BY t) AS oe_s,
             |    sum(CASE WHEN d > 0 AND n_risk > 1
             |      THEN ((CAST(d AS DOUBLE) * (CAST(n1_risk AS DOUBLE)
             |          / CAST(n_risk AS DOUBLE)))
             |        * (1.0 - (CAST(n1_risk AS DOUBLE)
             |          / CAST(n_risk AS DOUBLE))))
             |        * ((CAST(n_risk AS DOUBLE) - CAST(d AS DOUBLE))
             |          / (CAST(n_risk AS DOUBLE) - 1.0))
             |      ELSE 0.0 END ORDER BY t) AS v_s,
             |    sum(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS ev_s
             |  FROM k GROUP BY s),
             |p AS (SELECT count(*) AS n_strata,
             |    CAST(sum(ev_s) AS BIGINT) AS n_event_times,
             |    sum(oe_s ORDER BY s) AS oe_sum,
             |    sum(v_s ORDER BY s) AS var_sum
             |  FROM c)
             |SELECT n_strata, n_event_times,
             |  round(oe_sum, 6) AS oe_sum_r6, round(var_sum, 6) AS var_sum_r6,
             |  CASE WHEN var_sum = 0.0 THEN 0.0
             |    ELSE round((oe_sum * oe_sum) / var_sum, 6) END AS chi2_r6,
             |  CASE WHEN var_sum = 0.0 THEN 0.0
             |    ELSE round((oe_sum * oe_sum) / var_sum, 6) END
             |    > 3.841458820694124 AS significant
             |FROM p""".stripMargin)),

    // ---- q365: RMST at τ=21 days for the q303 two-group retention
    //      comparison — "average days retained in the first three
    //      weeks, per arm": the absolute-scale readout beside q303's
    //      χ² and q345's hazard ratio. The oracle replays the
    //      per-group KM folds, the exact step-function integral, and
    //      the tail term. ----
    "q365_rmst" -> Q(
      (s, d) => {
        val lastP = max(when(col("event_type") === "purchase", col("ts")))
        rmst(
          Tables.events(s, d)
            .groupBy(col("user_id"))
            .agg(
              datediff(to_date(lastP), to_date(min(col("ts"))))
                .cast("long").as("t"),
              when(lastP <= lit("2024-01-24").cast("timestamp"), 1L)
                .otherwise(0L).as("e"))
            .withColumn("g", pmod(col("user_id"), lit(2L)))
            .filter(col("t").isNotNull),
          tau = 21L)
      },
      Some("""WITH u AS (SELECT user_id,
             |    CAST(date_diff('day', CAST(min(ts) AS DATE),
             |      CAST(max(CASE WHEN event_type = 'purchase' THEN ts END)
             |        AS DATE)) AS BIGINT) AS t,
             |    CASE WHEN max(CASE WHEN event_type = 'purchase' THEN ts END)
             |        <= TIMESTAMP '2024-01-24 00:00:00'
             |      THEN 1 ELSE 0 END AS e,
             |    CAST(user_id % 2 AS VARCHAR) AS g
             |  FROM events GROUP BY user_id
             |  HAVING max(CASE WHEN event_type = 'purchase' THEN ts END)
             |    IS NOT NULL),
             |tot AS (SELECT g, count(*) AS n_total FROM u GROUP BY g),
             |per AS (SELECT g, t, count(*) AS leaving, sum(e) AS d
             |  FROM u GROUP BY g, t),
             |k AS (SELECT per.g, t, leaving, d, tot.n_total,
             |    tot.n_total - coalesce(sum(leaving) OVER (PARTITION BY per.g
             |      ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
             |      AND 1 PRECEDING), 0) AS n_risk
             |  FROM per JOIN tot ON tot.g = per.g),
             |sv AS (SELECT g, t, n_total,
             |    exp(coalesce(sum(CASE WHEN d > 0 AND n_risk > d
             |      THEN ln(CAST(n_risk - d AS DOUBLE)
             |        / CAST(n_risk AS DOUBLE)) ELSE 0.0 END)
             |      OVER (PARTITION BY g ORDER BY t ROWS BETWEEN UNBOUNDED
             |        PRECEDING AND 1 PRECEDING), 0.0)) AS sprev,
             |    CASE WHEN max(CASE WHEN d >= n_risk THEN 1 ELSE 0 END)
             |        OVER (PARTITION BY g ORDER BY t ROWS BETWEEN UNBOUNDED
             |          PRECEDING AND CURRENT ROW) = 1 THEN 0.0
             |      ELSE exp(sum(CASE WHEN d > 0 AND n_risk > d
             |        THEN ln(CAST(n_risk - d AS DOUBLE)
             |          / CAST(n_risk AS DOUBLE)) ELSE 0.0 END)
             |        OVER (PARTITION BY g ORDER BY t ROWS BETWEEN UNBOUNDED
             |          PRECEDING AND CURRENT ROW)) END AS scur,
             |    coalesce(lag(t) OVER (PARTITION BY g ORDER BY t), 0) AS tprev
             |  FROM k),
             |c AS (SELECT g, t, n_total, scur,
             |    sprev * CAST(least(t, 21) - least(tprev, 21) AS DOUBLE)
             |      AS contrib
             |  FROM sv),
             |lastrow AS (SELECT g, t, scur,
             |    row_number() OVER (PARTITION BY g ORDER BY t DESC) AS rn
             |  FROM sv),
             |agg AS (SELECT g, max(n_total) AS n_units,
             |    sum(contrib ORDER BY t) AS cum FROM c GROUP BY g)
             |SELECT a.g, CAST(a.n_units AS BIGINT) AS n_units,
             |  CAST(21 AS BIGINT) AS tau,
             |  round(a.cum + l.scur
             |    * CAST(greatest(21 - least(l.t, 21), 0) AS DOUBLE), 6)
             |    AS rmst_r6
             |FROM agg a JOIN lastrow l ON l.g = a.g AND l.rn = 1
             |ORDER BY a.g""".stripMargin)),

    // ---- q345: COX PH on the q300 retention fixture — does activity
    //      level (ln(1+events)) predict the churn hazard? Six Newton
    //      rounds unrolled in the oracle (MATERIALIZED round CTEs, the
    //      q323 lesson), each replaying the integer-quantized weight,
    //      the HUGEINT risk-set sums, and the order-pinned U/I chains
    //      bit-for-bit; the final row re-evaluates at the converged β
    //      for the reported se/score. ----
    "q345_cox_ph" -> Q(
      (s, d) => {
        val lastP = max(when(col("event_type") === "purchase", col("ts")))
        val units = Tables.events(s, d)
          .groupBy(col("user_id"))
          .agg(
            datediff(to_date(lastP), to_date(min(col("ts"))))
              .cast("long").as("t"),
            when(lastP <= lit("2024-01-24").cast("timestamp"), 1L)
              .otherwise(0L).as("e"),
            log((count(lit(1)) + 1).cast("double")).as("x"))
          .filter(col("t").isNotNull)
        coxPh(units, "t", "e", "x", iters = 6)
      },
      Some(coxOracleSql(6, strat = false))),

    // ---- q346: STRATIFIED Cox PH — the q345 fit with a separate
    //      baseline hazard per stratum (the user's lexicographically
    //      smallest event type: a deterministic behavioral cohort).
    //      Same unrolled-rounds oracle with the per-stratum risk-set
    //      windows and (s, t)-ordered pooling folds. ----
    "q346_cox_ph_stratified" -> Q(
      (s, d) => {
        val lastP = max(when(col("event_type") === "purchase", col("ts")))
        val units = Tables.events(s, d)
          .groupBy(col("user_id"))
          .agg(
            datediff(to_date(lastP), to_date(min(col("ts"))))
              .cast("long").as("t"),
            when(lastP <= lit("2024-01-24").cast("timestamp"), 1L)
              .otherwise(0L).as("e"),
            log((count(lit(1)) + 1).cast("double")).as("x"),
            min(col("event_type")).as("s"))
          .filter(col("t").isNotNull)
        coxPhStratified(units, "t", "e", "x", "s", iters = 6)
      },
      Some(coxOracleSql(6, strat = true))),

    // ---- q350: COMPETING RISKS on the q300 retention fixture, churn
    //      split into two causes — cause 1 "drifted away" (events
    //      continued after the last purchase) vs cause 2 "hard stop"
    //      (the last purchase WAS the last event); still-active users
    //      censored as in q300. The oracle replays counts, the
    //      exclusive-prior KM fold, and the per-cause CIF windows. ----
    "q350_competing_risks" -> Q(
      (s, d) => {
        val lastP = max(when(col("event_type") === "purchase", col("ts")))
        val lastAny = max(col("ts"))
        competingRisks(
          Tables.events(s, d)
            .groupBy(col("user_id"))
            .agg(
              datediff(to_date(lastP), to_date(min(col("ts"))))
                .cast("long").as("t"),
              when(lastP > lit("2024-01-24").cast("timestamp"), 0L)
                .when(lastAny > lastP, 1L).otherwise(2L).as("c"))
            .filter(col("t").isNotNull),
          "t", "c")
      },
      Some("""WITH u AS (SELECT user_id,
             |    CAST(date_diff('day', CAST(min(ts) AS DATE),
             |      CAST(max(CASE WHEN event_type = 'purchase' THEN ts END)
             |        AS DATE)) AS BIGINT) AS t,
             |    CASE WHEN max(CASE WHEN event_type = 'purchase' THEN ts END)
             |        > TIMESTAMP '2024-01-24 00:00:00' THEN 0
             |      WHEN max(ts) > max(CASE WHEN event_type = 'purchase'
             |        THEN ts END) THEN 1
             |      ELSE 2 END AS c
             |  FROM events GROUP BY user_id
             |  HAVING max(CASE WHEN event_type = 'purchase' THEN ts END)
             |    IS NOT NULL),
             |tot AS (SELECT count(*) AS n_total FROM u),
             |per AS (SELECT t, count(*) AS leaving,
             |    sum(CASE WHEN c > 0 THEN 1 ELSE 0 END) AS d
             |  FROM u GROUP BY t),
             |tl AS (SELECT t, leaving, d,
             |    (SELECT n_total FROM tot) - coalesce(sum(leaving) OVER (
             |      ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
             |      AND 1 PRECEDING), 0) AS n_risk
             |  FROM per),
             |tl2 AS (SELECT t, n_risk,
             |    exp(coalesce(sum(CASE WHEN d > 0 AND n_risk > d
             |      THEN ln(CAST(n_risk - d AS DOUBLE)
             |        / CAST(n_risk AS DOUBLE)) ELSE 0.0 END)
             |      OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
             |        AND 1 PRECEDING), 0.0)) AS sprev
             |  FROM tl),
             |pc AS (SELECT t, c, count(*) AS dk FROM u
             |  WHERE c > 0 GROUP BY t, c),
             |j AS (SELECT pc.t, pc.c, tl2.n_risk, pc.dk,
             |    tl2.sprev * CAST(pc.dk AS DOUBLE)
             |      / CAST(tl2.n_risk AS DOUBLE) AS inc
             |  FROM pc JOIN tl2 ON pc.t = tl2.t)
             |SELECT t, c AS cause, CAST(n_risk AS BIGINT) AS n_risk,
             |  CAST(dk AS BIGINT) AS d_events,
             |  round(sum(inc) OVER (PARTITION BY c ORDER BY t
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
             |    AS cif_r6
             |FROM j ORDER BY t, cause""".stripMargin)),

    // ---- q371: HARRELL'S C for the q345 Cox fit on its own units —
    //      risk score = xm·β (uncentered: centering shifts every
    //      score equally and C is rank-invariant to shifts). The
    //      oracle replays the six training rounds, the dense
    //      (t × score) grid, the strictly-later suffix windows, and
    //      the concordant/tied/comparable masses. ----
    "q371_c_index" -> Q(
      (s, d) => {
        val lastP = max(when(col("event_type") === "purchase", col("ts")))
        val units = Tables.events(s, d)
          .groupBy(col("user_id"))
          .agg(
            datediff(to_date(lastP), to_date(min(col("ts"))))
              .cast("long").as("t"),
            when(lastP <= lit("2024-01-24").cast("timestamp"), 1L)
              .otherwise(0L).as("e"),
            log((count(lit(1)) + 1).cast("double")).as("x"))
          .filter(col("t").isNotNull)
        val beta = coxPh(units, "t", "e", "x", iters = 6)
          .select(col("beta_micro"))
        concordanceIndex(
          units.crossJoin(broadcast(beta))
            .select(col("t"), col("e"),
              (round(col("x") * 1000, 0).cast("long") * col("beta_micro"))
                .as("s")))
      },
      Some(s"""WITH ${coxRoundsWith(6, strat = false)},
             |sc AS (SELECT u0.t, u0.e, u0.xm * p.b AS s FROM u0, r6 p),
             |g AS (SELECT t, s, count(*) AS n, sum(e) AS d
             |  FROM sc GROUP BY t, s),
             |grid AS (SELECT ts.t, ss.s,
             |    coalesce(g.n, 0) AS n, coalesce(g.d, 0) AS d
             |  FROM (SELECT DISTINCT t FROM g) ts
             |  CROSS JOIN (SELECT DISTINCT s FROM g) ss
             |  LEFT JOIN g ON g.t = ts.t AND g.s = ss.s),
             |cw AS (SELECT t, s, d,
             |    coalesce(sum(n) OVER (PARTITION BY s ORDER BY t DESC
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |      AS later
             |  FROM grid),
             |c2 AS (SELECT t, s, d, later,
             |    coalesce(sum(later) OVER (PARTITION BY t ORDER BY s
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |      AS conc_l,
             |    sum(later) OVER (PARTITION BY t) AS comp_l
             |  FROM cw),
             |agg AS (SELECT
             |    sum(CAST(d AS HUGEINT) * conc_l) AS conc,
             |    sum(CAST(d AS HUGEINT) * later) AS tied,
             |    sum(CAST(d AS HUGEINT) * comp_l) AS comp
             |  FROM c2 WHERE d > 0)
             |SELECT CAST(comp AS BIGINT) AS n_comparable,
             |  CAST(conc AS BIGINT) AS n_concordant,
             |  CAST(tied AS BIGINT) AS n_tied_score,
             |  round((CAST(conc AS DOUBLE) + 0.5 * CAST(tied AS DOUBLE))
             |    / CAST(comp AS DOUBLE), 6) AS c_index_r6
             |FROM agg""".stripMargin)))

  /** The q345 oracle: the q300 unit CTE plus the ln(1+count) covariate
    * in milli-units, then `iters` Newton rounds unrolled — each round's
    * (u, i) evaluation nests weight quantization → per-time HUGEINT
    * sums → suffix-window risk sums → the ordered U/I folds. Round CTEs
    * MATERIALIZED: each is referenced twice (the weight pass and the
    * update row — the q316/q123 exponential-replay lesson).
    */
  private def coxEvalSql(prev: String, strat: Boolean): String = {
    val gb = if (strat) "s, t" else "t"
    val pb = if (strat) "PARTITION BY s " else ""
    val sCol = if (strat) "s, " else ""
    s"""(SELECT sum(uc ORDER BY $gb) AS u, sum(ic ORDER BY $gb) AS i FROM (
       |  SELECT ${sCol}t,
       |    (CAST(sx AS DOUBLE) - CAST(d AS DOUBLE) * rr) / 1000.0 AS uc,
       |    CAST(d AS DOUBLE) * (CAST(r2 AS DOUBLE) / CAST(r0 AS DOUBLE)
       |      - rr * rr) / 1000000.0 AS ic
       |  FROM (SELECT ${sCol}t, d, sx, r0, r2,
       |      CAST(r1 AS DOUBLE) / CAST(r0 AS DOUBLE) AS rr
       |    FROM (SELECT ${sCol}t, d, sx,
       |        sum(s0) OVER (${pb}ORDER BY t DESC ROWS BETWEEN UNBOUNDED
       |          PRECEDING AND CURRENT ROW) AS r0,
       |        sum(s1) OVER (${pb}ORDER BY t DESC ROWS BETWEEN UNBOUNDED
       |          PRECEDING AND CURRENT ROW) AS r1,
       |        sum(s2) OVER (${pb}ORDER BY t DESC ROWS BETWEEN UNBOUNDED
       |          PRECEDING AND CURRENT ROW) AS r2
       |      FROM (SELECT ${sCol}t, sum(w) AS s0, sum(xm * w) AS s1,
       |          sum(xm * xm * w) AS s2, sum(e) AS d,
       |          sum(CASE WHEN e = 1 THEN xm ELSE 0 END) AS sx
       |        FROM (SELECT ${if (strat) "uu.s, " else ""}uu.t, uu.e, uu.xm,
       |            CAST(round(exp(CAST(uu.xm * p2.b AS DOUBLE) / 1e9)
       |              * 1e6, 0) AS HUGEINT) AS w
       |          FROM u uu, $prev p2)
       |        GROUP BY $gb)))))""".stripMargin
  }

  /** the shared WITH-body: the q345 unit CTEs plus `iters` unrolled
    * Newton rounds ending at CTE r<iters> — reused by the q371
    * concordance oracle
    */
  private def coxRoundsWith(iters: Int, strat: Boolean): String = {
    def round(prev: String, cur: String): String =
      s"""$cur AS MATERIALIZED (
         |  SELECT CAST(round((p.b / 1e6
         |      + LEAST(GREATEST(x.u / x.i, -1.0), 1.0)) * 1e6, 0)
         |    AS BIGINT) AS b
         |  FROM $prev p, ${coxEvalSql(prev, strat)} x)""".stripMargin
    val rounds = (1 to iters)
      .map(k => round(if (k == 1) "r0" else s"r${k - 1}", s"r$k"))
      .mkString(",\n")
    val sSel = if (strat) "min(event_type) AS s,\n      " else ""
    val sCol = if (strat) "s, " else ""
    s"""u0 AS MATERIALIZED (SELECT ${sCol}t, e,
       |    CAST(round(ln(CAST(cnt + 1 AS DOUBLE)) * 1000, 0) AS BIGINT) AS xm
       |  FROM (SELECT user_id, $sSel
       |      CAST(date_diff('day', CAST(min(ts) AS DATE),
       |        CAST(max(CASE WHEN event_type = 'purchase' THEN ts END)
       |          AS DATE)) AS BIGINT) AS t,
       |      CASE WHEN max(CASE WHEN event_type = 'purchase' THEN ts END)
       |          <= TIMESTAMP '2024-01-24 00:00:00'
       |        THEN 1 ELSE 0 END AS e,
       |      count(*) AS cnt
       |    FROM events GROUP BY user_id
       |    HAVING max(CASE WHEN event_type = 'purchase' THEN ts END)
       |      IS NOT NULL)),
       |u AS MATERIALIZED (SELECT ${sCol}t, e,
       |    xm - (SELECT CAST(round(avg(xm), 0) AS BIGINT) FROM u0) AS xm
       |  FROM u0),
       |r0 AS (SELECT CAST(0 AS BIGINT) AS b),
       |$rounds""".stripMargin
  }

  private def coxOracleSql(iters: Int, strat: Boolean): String = {
    s"""WITH ${coxRoundsWith(iters, strat)},
       |fin AS MATERIALIZED (SELECT p.b, x.u, x.i
       |  FROM r$iters p, ${coxEvalSql(s"r$iters", strat)} x),
       |stats AS (SELECT count(*) AS n_units, sum(e) AS n_events FROM u)
       |SELECT b AS beta_micro, round(exp(b / 1e6), 6) AS hr_r6,
       |  round(1.0 / sqrt(i), 6) AS se_r6, round(u, 6) AS score_r6,
       |  CAST(n_events AS BIGINT) AS n_events,
       |  CAST(n_units AS BIGINT) AS n_units
       |FROM fin, stats""".stripMargin
  }
}
