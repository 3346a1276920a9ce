package graft.rel

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.rel.RelQueries.Q
import graft.rel.Tables

/** LOGISTIC REGRESSION (intercept + one covariate) by fixed-round
  * Newton–Raphson on the log-likelihood — the classification rung the
  * q247 AUC / q248 WoE readouts stop short of, and the propensity
  * model the IPW causal chain ([[ipwAte]]) stands on.
  *
  *   p_i = 1/(1+e^{−(a+b·x_i)}),   U = (Σ(y−p), Σx(y−p)),
  *   I = [[Σw, Σxw], [Σxw, Σx²w]] with w = p(1−p),  (a,b) += I⁻¹U.
  *
  * Cross-engine determinism (the q345 Cox recipe, simplified by the
  * absence of risk sets): x quantizes to integer MILLI-units (centered
  * at its rounded mean), parameters live in integer MICRO-units, and
  * the ONE transcendental per unit per round — p = σ(η) — quantizes
  * to integer micro (p_micro ∈ [0, 10⁶]). Everything after is EXACT
  * integer arithmetic: w = p_micro·(10⁶−p_micro) is exact, all six
  * sufficient statistics are order-free decimal(38,0)/HUGEINT sums
  * (no window pinning needed — unlike Cox there is no ordered risk-set
  * fold), and the 2×2 Newton solve is one fixed IEEE chain on a 1-row
  * aggregate. Per-parameter steps clamp to ±1 (the q345 trust region);
  * every round's (a, b) is an integer pair both engines agree on
  * bit-for-bit.
  *
  * Scale shape: quantize+center is one narrow pass (localCheckpointed);
  * each round is ONE map pass + ONE hash aggregation to a single row —
  * no shuffle keyed by anything but the global fold, no window, no
  * collect. `iters` fixed rounds = `iters` corpus passes, the honest
  * price of a second-order fit (SGD shuffles state; Newton re-reads).
  *
  * Output (1 row): (a_micro, b_micro, or_r6 = e^b, se_a_r6, se_b_r6,
  * n_units, n_pos) — standard errors from the inverse information at
  * the final parameters (one extra evaluation pass).
  */
object Logistic {

  private val XmCap = 1000000L  // |x| ≤ 1000 after milli quantization
  private val EtaCap = 20000000000L // |a·10³ + xm·b| ≤ 2e10 ⇔ |η| ≤ 20

  def logisticFit(df: DataFrame, label: String = "y",
      covariate: String = "x", iters: Int = 8): DataFrame = {
    require(iters >= 1 && iters <= 16, s"1 <= iters <= 16: $iters")
    val y0 = col(label).cast("long")
    val yv = when(y0 === 1L, 1L).when(y0 === 0L, 0L)
      .otherwise(raise_error(concat(
        lit("logisticFit: label must be 0 or 1: "), y0.cast("string"))))
    val xm0 = round(col(covariate).cast("double") * 1000, 0).cast("long")
    val base0 = df.select(yv.as("y"), xm0.as("xm0"))
      .select(col("y"),
        when(abs(col("xm0")) > XmCap, raise_error(concat(
          lit("logisticFit: |covariate| exceeds 1000 after milli " +
            "quantization — standardize it: "), col("xm0").cast("string"))))
          .otherwise(col("xm0")).as("xm"))
    val cbar = base0.agg(round(avg(col("xm")), 0).cast("long").as("cbar"))
    val base = base0.crossJoin(broadcast(cbar))
      .select(col("y"), (col("xm") - col("cbar")).as("xm"))
      .localCheckpoint(true)
    val fitted = fitOn(base, iters)
    val stats = base.agg(count(lit(1)).as("n_units"), sum("y").as("n_pos"))
    fitted.crossJoin(broadcast(stats))
      .select(col("a"), col("b"),
        round(exp(col("b").cast("double") / lit(1e6)), 6).as("or_r6"),
        col("se_a_r6"), col("se_b_r6"), col("n_units"), col("n_pos"))
      .withColumnRenamed("a", "a_micro").withColumnRenamed("b", "b_micro")
  }

  private val dec38 = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)

  /** per-unit p in micro at the 1-row (a, b): the one quantized
    * transcendental — the rest of the round is exact integers
    */
  private def pMicro = {
    val lp = col("a") * lit(1000L) + col("xm") * col("b")
    val lpg = when(abs(lp) > EtaCap, raise_error(
      lit("logisticFit: |linear predictor| exceeds 20 — diverging fit " +
        "or unscaled covariate"))).otherwise(lp)
    round(lit(1e6) / (lit(1.0) + exp(-lpg.cast("double") / lit(1e9))), 0)
      .cast("long")
  }

  /** one Newton evaluation: 1-row (a, b, u0, u1, i00, i01, i11) in
    * REAL units, from exact integer sufficient statistics
    */
  private def scoreInfo(base: DataFrame, ab: DataFrame): DataFrame =
    base.crossJoin(broadcast(ab))
      .withColumn("p", pMicro)
      .withColumn("w", (col("p") * (lit(1000000L) - col("p"))).cast(dec38))
      .withColumn("r", col("y") * lit(1000000L) - col("p"))
      .groupBy("a", "b")
      .agg(sum(col("r").cast(dec38)).as("su0"),
        sum((col("xm") * col("r")).cast(dec38)).as("su1"),
        sum(col("w")).as("si00"),
        sum(col("xm") * col("w")).as("si01"),
        sum((col("xm") * col("xm")).cast(dec38) * col("w")).as("si11"))
      .select(col("a"), col("b"),
        (col("su0").cast("double") / lit(1e6)).as("u0"),
        (col("su1").cast("double") / lit(1e9)).as("u1"),
        (col("si00").cast("double") / lit(1e12)).as("i00"),
        (col("si01").cast("double") / lit(1e15)).as("i01"),
        (col("si11").cast("double") / lit(1e18)).as("i11"))

  private def fitOn(base: DataFrame, iters: Int): DataFrame = {
    var ab = base.sparkSession.range(1)
      .select(lit(0L).as("a"), lit(0L).as("b"))
    for (_ <- 1 to iters) {
      // 2×2 solve + clamped update, one fixed IEEE chain on a 1-row agg
      ab = scoreInfo(base, ab)
        .withColumn("det", col("i00") * col("i11") - col("i01") * col("i01"))
        .select(
          when(col("det") <= 0.0, raise_error(
            lit("logisticFit: singular information — degenerate covariate")))
            .otherwise(round((col("a").cast("double") / lit(1e6)
              + greatest(least((col("i11") * col("u0") - col("i01") * col("u1"))
                / col("det"), lit(1.0)), lit(-1.0))) * lit(1e6), 0)
              .cast("long")).as("a"),
          round((col("b").cast("double") / lit(1e6)
            + greatest(least((col("i00") * col("u1") - col("i01") * col("u0"))
              / col("det"), lit(1.0)), lit(-1.0))) * lit(1e6), 0)
            .cast("long").as("b"))
        .localCheckpoint(true) // eager: a lazy chain re-runs all rounds
    }
    scoreInfo(base, ab)
      .withColumn("det", col("i00") * col("i11") - col("i01") * col("i01"))
      .select(col("a"), col("b"),
        when(col("det") <= 0.0, raise_error(
          lit("logisticFit: singular information — degenerate covariate")))
          .otherwise(round(sqrt(col("i11") / col("det")), 6)).as("se_a_r6"),
        round(sqrt(col("i00") / col("det")), 6).as("se_b_r6"))
  }

  /** INVERSE-PROPENSITY-WEIGHTED ATE (Horvitz–Thompson with Hájek
    * normalization) on a logistic propensity: fit e(x) = P(treat|x)
    * with [[logisticFit]]'s fixed rounds, clip the per-unit propensity
    * to [clipMilli, 1000−clipMilli]‰ (the standard positivity guard —
    * extreme weights trade bias for variance; clipping is DOCUMENTED,
    * not silent), then
    *
    *   ATE = Σ_T y/ê ⁄ Σ_T 1/ê  −  Σ_C y/(1−ê) ⁄ Σ_C 1/(1−ê).
    *
    * The q328 stratified ATE adjusts on a COARSE bucketing; this is
    * the continuous-covariate member of the same family. Determinism:
    * ê is integer micro from the integer-parameter fit, clipping is
    * integer, and the four weighted sums are fixed chains over
    * per-unit doubles summed... NO — they ride exact integer
    * arithmetic: each unit's weight is 10¹²/ê_micro (truncating long
    * division, the q316 recipe) so the sums are order-free exact
    * integers and the two means are one IEEE division each.
    *
    * Output (1 row): (a_micro, b_micro, n_treated, n_control,
    * naive_r6, ate_r6) — naive is the unadjusted difference over the
    * same units, the confounding readout (the q328 convention).
    */
  def ipwAte(df: DataFrame, treat: String = "treat", outcome: String = "yo",
      covariate: String = "x", iters: Int = 8,
      clipMilli: Int = 10): DataFrame = {
    require(clipMilli >= 1 && clipMilli < 500, s"1 <= clipMilli < 500: $clipMilli")
    val t0 = col(treat).cast("long")
    val tv = when(t0 === 1L, 1L).when(t0 === 0L, 0L)
      .otherwise(raise_error(concat(
        lit("ipwAte: treat must be 0 or 1: "), t0.cast("string"))))
    val xm0 = round(col(covariate).cast("double") * 1000, 0).cast("long")
    val units0 = df.select(tv.as("y"), xm0.as("xm0"),
        col(outcome).cast("long").as("yo"))
      .select(col("y"), col("yo"),
        when(abs(col("xm0")) > XmCap, raise_error(concat(
          lit("ipwAte: |covariate| exceeds 1000 after milli quantization" +
            " — standardize it: "), col("xm0").cast("string"))))
          .otherwise(col("xm0")).as("xm"))
    val cbar = units0.agg(round(avg(col("xm")), 0).cast("long").as("cbar"))
    val units = units0.crossJoin(broadcast(cbar))
      .select(col("y"), col("yo"), (col("xm") - col("cbar")).as("xm"))
      .localCheckpoint(true)
    val ab = fitOn(units.select(col("y"), col("xm")), iters)
      .select(col("a"), col("b"))
    val lo = clipMilli * 1000L; val hi = 1000000L - lo
    val scored = units.crossJoin(broadcast(ab))
      .withColumn("e", greatest(least(pMicro, lit(hi)), lit(lo)))
      // integer weights: 10¹² div ê_micro ∈ [10⁶/0.99, 10⁶/0.01] —
      // exact, order-free sums; yo·w ≤ yo·10⁸ rides decimal(38,0)
      .withColumn("wt", expr("case when y = 1 then 1000000000000 div e " +
        "else 1000000000000 div (1000000 - e) end"))
    scored.groupBy("a", "b")
      .agg(sum(when(col("y") === 1L, 1L).otherwise(0L)).as("n_treated"),
        sum(when(col("y") === 0L, 1L).otherwise(0L)).as("n_control"),
        sum(when(col("y") === 1L, col("yo")).otherwise(0L)).as("sy1"),
        sum(when(col("y") === 0L, col("yo")).otherwise(0L)).as("sy0"),
        sum(when(col("y") === 1L,
          (col("yo") * col("wt")).cast(dec38)).otherwise(lit(0L).cast(dec38)))
          .as("swy1"),
        sum(when(col("y") === 1L, col("wt").cast(dec38))
          .otherwise(lit(0L).cast(dec38))).as("sw1"),
        sum(when(col("y") === 0L,
          (col("yo") * col("wt")).cast(dec38)).otherwise(lit(0L).cast(dec38)))
          .as("swy0"),
        sum(when(col("y") === 0L, col("wt").cast(dec38))
          .otherwise(lit(0L).cast(dec38))).as("sw0"))
      .select(col("a").as("a_micro"), col("b").as("b_micro"),
        col("n_treated"), col("n_control"),
        round(col("sy1").cast("double") / col("n_treated").cast("double")
          - col("sy0").cast("double") / col("n_control").cast("double"), 6)
          .as("naive_r6"),
        round(col("swy1").cast("double") / col("sw1").cast("double")
          - col("swy0").cast("double") / col("sw0").cast("double"), 6)
          .as("ate_r6"))
  }

  /** PROPENSITY-SCORE MATCHING, 1-nearest-neighbor within a caliper,
    * with replacement (Rosenbaum & Rubin 1983; the caliper from
    * Cochran & Rubin 1973): fit ê(x) with [[logisticFit]]'s fixed
    * rounds, then for every TREATED unit pick the control with the
    * smallest |ê_t − ê_c| ≤ caliper (ties → smallest control id) and
    * estimate ATT = mean(y_t − y_matched). The third member of the
    * causal-adjustment family: q328 stratifies on a coarse bucket,
    * q349 reweights by 1/ê, this one COMPARES UNITS — and unlike
    * both, it reports how many treated units have no comparable
    * control (n_unmatched > 0 is a positivity readout, not an error).
    *
    * Determinism: ê is integer micro from the integer-parameter fit;
    * |Δ| and the id tie-break are exact integers, so the argmin is an
    * integer struct-min both engines replay; the ATT is one IEEE
    * division on exact integer sums.
    *
    * Scale shape: the candidate-pair space is CALIPER-BANDWIDTH-
    * BOUNDED by construction — controls bucket by ê div caliper, each
    * treated unit fans out to buckets {b−1, b, b+1} (which COVER every
    * control within the caliper: |Δ| ≤ w ⇒ bucket distance ≤ 1), and
    * the argmin is one hash aggregation. No global sort, no window
    * over the corpus; the caliper is the standard bias-variance lever
    * AND the pair-volume lever — exactly the interval-join recipe
    * (q63), not an all-pairs nearest-neighbor.
    *
    * Output (1 row): (a_micro, b_micro, n_treated, n_control,
    * n_matched, n_unmatched, att_r6, naive_r6).
    */
  def psmAtt(df: DataFrame, id: String = "user_id",
      treat: String = "treat", outcome: String = "yo",
      covariate: String = "x", iters: Int = 8,
      caliperMicro: Long = 50000L): DataFrame = {
    require(caliperMicro >= 1000L && caliperMicro <= 500000L,
      s"1000 <= caliperMicro <= 500000: $caliperMicro")
    val t0 = col(treat).cast("long")
    val tv = when(t0 === 1L, 1L).when(t0 === 0L, 0L)
      .otherwise(raise_error(concat(
        lit("psmAtt: treat must be 0 or 1: "), t0.cast("string"))))
    val xm0 = round(col(covariate).cast("double") * 1000, 0).cast("long")
    val units0 = df.select(col(id).cast("long").as("uid"), tv.as("y"),
        xm0.as("xm0"), col(outcome).cast("long").as("yo"))
      .select(col("uid"), col("y"), col("yo"),
        when(abs(col("xm0")) > XmCap, raise_error(concat(
          lit("psmAtt: |covariate| exceeds 1000 after milli quantization" +
            " — standardize it: "), col("xm0").cast("string"))))
          .otherwise(col("xm0")).as("xm"))
    val cbar = units0.agg(round(avg(col("xm")), 0).cast("long").as("cbar"))
    val units = units0.crossJoin(broadcast(cbar))
      .select(col("uid"), col("y"), col("yo"),
        (col("xm") - col("cbar")).as("xm"))
      .localCheckpoint(true)
    val ab = fitOn(units.select(col("y"), col("xm")), iters)
      .select(col("a"), col("b"))
    val scored = units.crossJoin(broadcast(ab))
      .withColumn("e", pMicro)
      .localCheckpoint(true)
    val treated = scored.filter(col("y") === 1L)
      .select(col("uid").as("tid"), col("e").as("e1"), col("yo").as("yo1"),
        col("a"), col("b"))
    val controls = scored.filter(col("y") === 0L)
      .select(col("uid").as("cid"), col("e").as("e0"), col("yo").as("yo0"))
      .withColumn("cb", expr(s"e0 div $caliperMicro"))
    val cand = treated
      .withColumn("cb", explode(array(
        expr(s"e1 div $caliperMicro") - 1L, expr(s"e1 div $caliperMicro"),
        expr(s"e1 div $caliperMicro") + 1L)))
      .join(controls, Seq("cb"))
      .filter(abs(col("e1") - col("e0")) <= caliperMicro)
    val best = cand.groupBy("tid")
      .agg(min(struct(abs(col("e1") - col("e0")).as("ad"), col("cid"),
        col("yo0"))).as("m"), max(col("yo1")).as("yo1"))
      .agg(count(lit(1)).as("n_matched"),
        sum(col("yo1")).as("s1"), sum(col("m.yo0")).as("s0"))
    val stats = scored.groupBy("a", "b")
      .agg(sum(when(col("y") === 1L, 1L).otherwise(0L)).as("n_treated"),
        sum(when(col("y") === 0L, 1L).otherwise(0L)).as("n_control"),
        sum(when(col("y") === 1L, col("yo")).otherwise(0L)).as("sy1"),
        sum(when(col("y") === 0L, col("yo")).otherwise(0L)).as("sy0"))
    stats.crossJoin(broadcast(best))
      .select(col("a").as("a_micro"), col("b").as("b_micro"),
        col("n_treated"), col("n_control"),
        when(col("n_matched") > 0, col("n_matched"))
          .otherwise(raise_error(lit(
            "psmAtt: no treated unit has a control inside the caliper")))
          .as("n_matched"),
        (col("n_treated") - col("n_matched")).as("n_unmatched"),
        round((col("s1") - col("s0")).cast("double")
          / col("n_matched").cast("double"), 6).as("att_r6"),
        round(col("sy1").cast("double") / col("n_treated").cast("double")
          - col("sy0").cast("double") / col("n_control").cast("double"), 6)
          .as("naive_r6"))
  }

  /** DOUBLY-ROBUST (AIPW) ATE (Robins, Rotnitzky & Zhao 1994;
    * "augmented inverse probability weighting"): combine the q349
    * logistic propensity with per-arm linear outcome regressions,
    *
    *   ATE = n⁻¹ Σ [ μ̂₁(x) + t(y−μ̂₁(x))/ê(x) ]
    *       − n⁻¹ Σ [ μ̂₀(x) + (1−t)(y−μ̂₀(x))/(1−ê(x)) ],
    *
    * consistent if EITHER model is right — the estimator the
    * q328/q349/q373 ladder culminates in.
    *
    * Determinism: ê is integer micro (clipped, the q349 positivity
    * guard); each arm's (α, β) is a closed-form chain on exact HUGEINT
    * sums quantized to integer (milli-cents intercept, nano slope), so
    * every unit's μ̂ = round(α + β·xm) is an integer both engines
    * agree on; the augmentation terms ride exact integer products
    * (residual × the 10¹²-div-ê weight) summed as decimal(38,0), and
    * the two divisions happen once at the edge.
    *
    * Scale shape: two corpus passes beyond the fit — one 1-row
    * aggregation for the regressions, one map-side scoring pass
    * folding to a 1-row sum (models broadcast; nothing shuffles
    * keyed by anything but the global fold).
    *
    * Output (1 row): (a_micro, b_micro, b1_nano, b0_nano, n_treated,
    * n_control, naive_r6, ate_r6) — outcomes in the outcome column's
    * own units (cents here), the q349 convention.
    */
  def aipwAte(df: DataFrame, treat: String = "treat", outcome: String = "yo",
      covariate: String = "x", iters: Int = 8,
      clipMilli: Int = 10): DataFrame = {
    require(clipMilli >= 1 && clipMilli < 500,
      s"1 <= clipMilli < 500: $clipMilli")
    val t0 = col(treat).cast("long")
    val tv = when(t0 === 1L, 1L).when(t0 === 0L, 0L)
      .otherwise(raise_error(concat(
        lit("aipwAte: treat must be 0 or 1: "), t0.cast("string"))))
    val xm0 = round(col(covariate).cast("double") * 1000, 0).cast("long")
    val units0 = df.select(tv.as("y"), xm0.as("xm0"),
        col(outcome).cast("long").as("yo"))
      .select(col("y"), col("yo"),
        when(abs(col("xm0")) > XmCap, raise_error(concat(
          lit("aipwAte: |covariate| exceeds 1000 after milli quantization" +
            " — standardize it: "), col("xm0").cast("string"))))
          .otherwise(col("xm0")).as("xm"))
    val cbar = units0.agg(round(avg(col("xm")), 0).cast("long").as("cbar"))
    val units = units0.crossJoin(broadcast(cbar))
      .select(col("y"), col("yo"), (col("xm") - col("cbar")).as("xm"))
      .localCheckpoint(true)
    val ab = fitOn(units.select(col("y"), col("xm")), iters)
      .select(col("a"), col("b"))
    // per-arm OLS on (xm, ym = yo·1000 milli-cents): exact sufficient
    // statistics, one closed-form chain, integer (alpha_milli, b_nano)
    val reg = units.groupBy("y")
      .agg(count(lit(1)).as("n"), sum(col("xm")).as("sx"),
        sum(col("yo") * lit(1000L)).as("sy"),
        sum((col("xm") * col("xm")).cast(dec38)).as("sxx"),
        sum((col("xm") * col("yo") * lit(1000L)).cast(dec38)).as("sxy"))
      .withColumn("beta",
        when(col("n").cast("double") * col("sxx").cast("double")
          - col("sx").cast("double") * col("sx").cast("double") <= 0.0,
          raise_error(lit(
            "aipwAte: degenerate covariate in an arm — no outcome slope")))
          .otherwise((col("n").cast("double") * col("sxy").cast("double")
            - col("sx").cast("double") * col("sy").cast("double"))
            / (col("n").cast("double") * col("sxx").cast("double")
              - col("sx").cast("double") * col("sx").cast("double"))))
      .select(col("y"), round(col("beta") * lit(1e9), 0).cast("long")
        .as("b_nano"),
        round((col("sy").cast("double") - col("beta")
          * col("sx").cast("double")) / col("n").cast("double"), 0)
          .cast("long").as("alpha_milli"))
    val m1 = reg.filter(col("y") === 1L)
      .select(col("b_nano").as("b1_nano"), col("alpha_milli").as("a1_milli"))
    val m0 = reg.filter(col("y") === 0L)
      .select(col("b_nano").as("b0_nano"), col("alpha_milli").as("a0_milli"))
    val lo = clipMilli * 1000L; val hi = 1000000L - lo
    val scored = units.crossJoin(broadcast(ab))
      .crossJoin(broadcast(m1)).crossJoin(broadcast(m0))
      .withColumn("e", greatest(least(pMicro, lit(hi)), lit(lo)))
      .withColumn("ym", col("yo") * lit(1000L))
      // μ̂ in milli-cents: one rounded IEEE chain at integer inputs
      .withColumn("mu1", round(col("a1_milli").cast("double")
        + col("xm").cast("double") * col("b1_nano").cast("double") / lit(1e9),
        0).cast("long"))
      .withColumn("mu0", round(col("a0_milli").cast("double")
        + col("xm").cast("double") * col("b0_nano").cast("double") / lit(1e9),
        0).cast("long"))
      .withColumn("wt1", expr("1000000000000 div e"))
      .withColumn("wt0", expr("1000000000000 div (1000000 - e)"))
    scored.groupBy("a", "b", "b1_nano", "b0_nano")
      .agg(count(lit(1)).as("n"),
        sum(when(col("y") === 1L, 1L).otherwise(0L)).as("n_treated"),
        sum(when(col("y") === 0L, 1L).otherwise(0L)).as("n_control"),
        sum(when(col("y") === 1L, col("yo")).otherwise(0L)).as("sy1"),
        sum(when(col("y") === 0L, col("yo")).otherwise(0L)).as("sy0"),
        sum((col("mu1") * lit(1000000L)).cast(dec38)
          + when(col("y") === 1L,
            ((col("ym") - col("mu1")) * col("wt1")).cast(dec38))
            .otherwise(lit(0L).cast(dec38))).as("s1"),
        sum((col("mu0") * lit(1000000L)).cast(dec38)
          + when(col("y") === 0L,
            ((col("ym") - col("mu0")) * col("wt0")).cast(dec38))
            .otherwise(lit(0L).cast(dec38))).as("s0"))
      .select(col("a").as("a_micro"), col("b").as("b_micro"),
        col("b1_nano"), col("b0_nano"), col("n_treated"), col("n_control"),
        round(col("sy1").cast("double") / col("n_treated").cast("double")
          - col("sy0").cast("double") / col("n_control").cast("double"), 6)
          .as("naive_r6"),
        round((col("s1").cast("double") - col("s0").cast("double"))
          / (col("n").cast("double") * lit(1e9)), 6).as("ate_r6"))
  }

  /** The DEPLOYABLE model row: (a, b, cbar) — parameters plus the
    * centering constant a scorer needs (scoring with a different
    * center than the fit silently shifts every probability). Same
    * fixed-round fit as [[logisticFit]].
    */
  def logisticModel(df: DataFrame, label: String = "y",
      covariate: String = "x", iters: Int = 8): DataFrame = {
    require(iters >= 1 && iters <= 16, s"1 <= iters <= 16: $iters")
    val y0 = col(label).cast("long")
    val yv = when(y0 === 1L, 1L).when(y0 === 0L, 0L)
      .otherwise(raise_error(concat(
        lit("logisticModel: label must be 0 or 1: "), y0.cast("string"))))
    val xm0 = round(col(covariate).cast("double") * 1000, 0).cast("long")
    val base0 = df.select(yv.as("y"), xm0.as("xm0"))
      .select(col("y"),
        when(abs(col("xm0")) > XmCap, raise_error(concat(
          lit("logisticModel: |covariate| exceeds 1000 after milli " +
            "quantization — standardize it: "), col("xm0").cast("string"))))
          .otherwise(col("xm0")).as("xm"))
    val cbar = base0.agg(round(avg(col("xm")), 0).cast("long").as("cbar"))
    val base = base0.crossJoin(broadcast(cbar))
      .select(col("y"), (col("xm") - col("cbar")).as("xm"))
      .localCheckpoint(true)
    fitOn(base, iters).crossJoin(broadcast(cbar))
      .select(col("a"), col("b"), col("cbar"))
  }

  /** SCORE rows against a frozen 1-row model (a, b, cbar): appends
    * `p_micro` — one quantized sigmoid per row, map-side only (the
    * model broadcasts; nothing shuffles). The scoring arithmetic is
    * the fit's own round arithmetic, so a batch score and a streamed
    * micro-batch score are bit-identical by construction.
    */
  def scoreLogistic(units: DataFrame, model: DataFrame,
      covariate: String = "x"): DataFrame =
    units.crossJoin(broadcast(model))
      .withColumn("xm",
        round(col(covariate).cast("double") * 1000, 0).cast("long")
          - col("cbar"))
      .withColumn("p_micro", pMicro)
      .drop("a", "b", "cbar", "xm")

  /** UPLIFT MODELING (the two-model / T-learner estimator, Radcliffe
    * & Surry 2011, "Real-world uplift modelling") with a QINI readout:
    * fit P(y|x) separately per arm, score every unit with both,
    * predicted uplift û = p̂₁ − p̂₀, then decile the population on û
    * and report, per fixed-width uplift bin (descending — best
    * targets first): arm sizes, mean predicted uplift, OBSERVED
    * uplift (treated minus control response — null when an arm is
    * empty, the q328 positivity convention), and the cumulative Qini
    * statistic Q_k = Σst − Σsc·Σnt/Σnc over the bins targeted so far.
    * A model that ranks persuadables first shows observed uplift
    * decreasing down the bins and a concave Qini path — the standard
    * "who should we target" audit.
    *
    * Determinism: both fits are the q348 integer chains (each arm
    * centered on ITS OWN covariate mean — the model is deployable
    * standalone); p̂ are integer micro; bins are integer fixed-width
    * ((û + 10⁶) div width, capped at 9 — no rank machinery); the
    * per-bin sums are exact integers and the cumulative fold rides
    * the ORDER-PINNED ≤10-row bin window.
    *
    * Scale shape: two fixed-round fits + ONE map-side double-scoring
    * pass (both 1-row models broadcast) + one hash aggregation to
    * ≤10 bins. Output ordered bin desc.
    */
  def upliftQini(df: DataFrame, treat: String = "treat", y: String = "y",
      covariate: String = "x", iters: Int = 8,
      binWidthMicro: Long = 200000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(binWidthMicro >= 1000L && binWidthMicro <= 2000000L,
      s"1000 <= binWidthMicro <= 2000000: $binWidthMicro")
    val t0 = col(treat).cast("long")
    val tv = when(t0 === 1L, 1L).when(t0 === 0L, 0L)
      .otherwise(raise_error(concat(
        lit("upliftQini: treat must be 0 or 1: "), t0.cast("string"))))
    val y0 = col(y).cast("long")
    val yv = when(y0 === 1L, 1L).when(y0 === 0L, 0L)
      .otherwise(raise_error(concat(
        lit("upliftQini: y must be 0 or 1: "), y0.cast("string"))))
    val base = df.select(tv.as("tr"), yv.as("yy"),
      col(covariate).cast("double").as("x"))
      .localCheckpoint(true) // read by both fits and the scoring pass
    val m1 = logisticModel(base.filter(col("tr") === 1L), "yy", "x", iters)
    val m0 = logisticModel(base.filter(col("tr") === 0L), "yy", "x", iters)
    val scored = scoreLogistic(
      scoreLogistic(base, m1).withColumnRenamed("p_micro", "p1"), m0)
      .withColumnRenamed("p_micro", "p0")
      .withColumn("u", col("p1") - col("p0"))
      .withColumn("bin",
        least(expr(s"(u + 1000000) div $binWidthMicro"), lit(9L)))
    val bins = scored.groupBy("bin").agg(
      sum(when(col("tr") === 1L, 1L).otherwise(0L)).as("nt"),
      sum(when(col("tr") === 0L, 1L).otherwise(0L)).as("nc"),
      sum(when(col("tr") === 1L, col("yy")).otherwise(0L)).as("st"),
      sum(when(col("tr") === 0L, col("yy")).otherwise(0L)).as("sc"),
      sum(col("u")).as("su"), count(lit(1)).as("n"))
    val wCum = Window.orderBy(col("bin").desc)
      .rowsBetween(Long.MinValue, 0)
    bins
      .withColumn("cnt", sum(col("nt")).over(wCum))
      .withColumn("cnc", sum(col("nc")).over(wCum))
      .withColumn("cst", sum(col("st")).over(wCum))
      .withColumn("csc", sum(col("sc")).over(wCum))
      .select(col("bin"), col("nt").as("n_treated"),
        col("nc").as("n_control"),
        round(col("su").cast("double")
          / (col("n").cast("double") * lit(1e6)), 6).as("pred_uplift_r6"),
        when(col("nt") > 0L && col("nc") > 0L,
          round(col("st").cast("double") / col("nt").cast("double")
            - col("sc").cast("double") / col("nc").cast("double"), 6))
          .as("obs_uplift_r6"),
        when(col("cnc") > 0L,
          round(col("cst").cast("double")
            - col("csc").cast("double") * col("cnt").cast("double")
              / col("cnc").cast("double"), 6))
          .as("qini_r6"))
      .orderBy(col("bin").desc)
  }

  /** TWO-COVARIATE LOGISTIC REGRESSION (intercept + x₁ + x₂) by
    * fixed-round Newton — the multi-feature rung of the q348 recipe.
    * Same determinism contract: covariates quantize to centered
    * integer MILLI, parameters to integer MICRO, the per-unit sigmoid
    * to integer micro; the NINE sufficient statistics are exact
    * decimal(38,0) sums and the 3×3 Newton solve is one fixed IEEE
    * cofactor chain on a 1-row aggregate (steps clamped to ±1 per
    * parameter, the q345 trust region). Collinear covariates make the
    * information singular — det ≤ 0 raises loudly.
    *
    * Scale shape: identical to [[logisticFit]] — `iters` map passes,
    * each folding to ONE row; nothing keyed by anything but the
    * global fold.
    *
    * Output (1 row): (a_micro, b1_micro, b2_micro, or1_r6, or2_r6,
    * se_b1_r6, se_b2_r6, n_units, n_pos).
    */
  def logisticFit2(df: DataFrame, label: String = "y",
      cov1: String = "x1", cov2: String = "x2",
      iters: Int = 8): DataFrame = {
    require(iters >= 1 && iters <= 16, s"1 <= iters <= 16: $iters")
    val y0 = col(label).cast("long")
    val yv = when(y0 === 1L, 1L).when(y0 === 0L, 0L)
      .otherwise(raise_error(concat(
        lit("logisticFit2: label must be 0 or 1: "), y0.cast("string"))))
    def quant(c: String, out: String) = {
      val m = round(col(c).cast("double") * 1000, 0).cast("long")
      when(abs(m) > XmCap, raise_error(concat(
        lit(s"logisticFit2: |$c| exceeds 1000 after milli quantization" +
          " — standardize it: "), m.cast("string")))).otherwise(m).as(out)
    }
    val base0 = df.select(yv.as("y"), quant(cov1, "x1m0"),
      quant(cov2, "x2m0"))
    val cb = base0.agg(round(avg(col("x1m0")), 0).cast("long").as("c1"),
      round(avg(col("x2m0")), 0).cast("long").as("c2"))
    val base = base0.crossJoin(broadcast(cb))
      .select(col("y"), (col("x1m0") - col("c1")).as("x1m"),
        (col("x2m0") - col("c2")).as("x2m"))
      .localCheckpoint(true)
    val fitted = fit2On(base, iters)
    val fin = eval2On(base, fitted)
      .select(col("a"), col("b1"), col("b2"),
        when(col("det") <= 0.0, raise_error(lit(
          "logisticFit2: singular information — collinear or " +
            "degenerate covariates")))
          .otherwise(round(sqrt(col("c11") / col("det")), 6))
          .as("se_b1_r6"),
        round(sqrt(col("c22") / col("det")), 6).as("se_b2_r6"))
    val stats = base.agg(count(lit(1)).as("n_units"), sum("y").as("n_pos"))
    fin.crossJoin(broadcast(stats))
      .select(col("a").as("a_micro"), col("b1").as("b1_micro"),
        col("b2").as("b2_micro"),
        round(exp(col("b1").cast("double") / lit(1e6)), 6).as("or1_r6"),
        round(exp(col("b2").cast("double") / lit(1e6)), 6).as("or2_r6"),
        col("se_b1_r6"), col("se_b2_r6"), col("n_units"), col("n_pos"))
  }

  /** quantize-and-cap a covariate to integer milli */
  private def quantMilli(c: String, out: String, who: String) = {
    val m = round(col(c).cast("double") * 1000, 0).cast("long")
    when(abs(m) > XmCap, raise_error(concat(
      lit(s"$who: |$c| exceeds 1000 after milli quantization" +
        " — standardize it: "), m.cast("string")))).otherwise(m).as(out)
  }

  /** one 3-parameter Newton evaluation at the broadcast 1-row
    * (a, b1, b2) over `base` (y, x1m, x2m)
    */
  private def eval2On(base: DataFrame, ab: DataFrame): DataFrame = {
      val lp = col("a") * lit(1000L) + col("x1m") * col("b1") +
        col("x2m") * col("b2")
      val lpg = when(abs(lp) > EtaCap, raise_error(
        lit("logisticFit2: |linear predictor| exceeds 20 — diverging " +
          "fit or unscaled covariates"))).otherwise(lp)
      val pm = round(lit(1e6) / (lit(1.0)
        + exp(-lpg.cast("double") / lit(1e9))), 0).cast("long")
      base.crossJoin(broadcast(ab))
        .withColumn("p", pm)
        .withColumn("w", (col("p") * (lit(1000000L) - col("p"))).cast(dec38))
        .withColumn("r", col("y") * lit(1000000L) - col("p"))
        .groupBy("a", "b1", "b2")
        .agg(sum(col("r").cast(dec38)).as("su0"),
          sum((col("x1m") * col("r")).cast(dec38)).as("su1"),
          sum((col("x2m") * col("r")).cast(dec38)).as("su2"),
          sum(col("w")).as("si00"),
          sum(col("x1m") * col("w")).as("si01"),
          sum(col("x2m") * col("w")).as("si02"),
          sum((col("x1m") * col("x1m")).cast(dec38) * col("w")).as("si11"),
          sum((col("x1m") * col("x2m")).cast(dec38) * col("w")).as("si12"),
          sum((col("x2m") * col("x2m")).cast(dec38) * col("w")).as("si22"))
        .select(col("a"), col("b1"), col("b2"),
          (col("su0").cast("double") / lit(1e6)).as("u0"),
          (col("su1").cast("double") / lit(1e9)).as("u1"),
          (col("su2").cast("double") / lit(1e9)).as("u2"),
          (col("si00").cast("double") / lit(1e12)).as("i00"),
          (col("si01").cast("double") / lit(1e15)).as("i01"),
          (col("si02").cast("double") / lit(1e15)).as("i02"),
          (col("si11").cast("double") / lit(1e18)).as("i11"),
          (col("si12").cast("double") / lit(1e18)).as("i12"),
          (col("si22").cast("double") / lit(1e18)).as("i22"))
        .withColumn("c00", col("i11") * col("i22") - col("i12") * col("i12"))
        .withColumn("c01", col("i02") * col("i12") - col("i01") * col("i22"))
        .withColumn("c02", col("i01") * col("i12") - col("i02") * col("i11"))
        .withColumn("c11", col("i00") * col("i22") - col("i02") * col("i02"))
        .withColumn("c12", col("i01") * col("i02") - col("i00") * col("i12"))
        .withColumn("c22", col("i00") * col("i11") - col("i01") * col("i01"))
        .withColumn("det", col("i00") * col("c00") + col("i01") * col("c01")
          + col("i02") * col("c02"))
    }
  /** the fixed-round 3-parameter Newton loop over centered
    * (y, x1m, x2m) units: returns the final 1-row (a, b1, b2)
    */
  private def fit2On(base: DataFrame, iters: Int): DataFrame = {
    def clampStep(num: org.apache.spark.sql.Column,
        det: org.apache.spark.sql.Column) =
      greatest(least(num / det, lit(1.0)), lit(-1.0))
    var ab = base.sparkSession.range(1)
      .select(lit(0L).as("a"), lit(0L).as("b1"), lit(0L).as("b2"))
    for (_ <- 1 to iters) {
      ab = eval2On(base, ab)
        .select(
          when(col("det") <= 0.0, raise_error(lit(
            "logisticFit2: singular information — collinear or " +
              "degenerate covariates")))
            .otherwise(round((col("a").cast("double") / lit(1e6)
              + clampStep(col("c00") * col("u0") + col("c01") * col("u1")
                + col("c02") * col("u2"), col("det"))) * lit(1e6), 0)
              .cast("long")).as("a"),
          round((col("b1").cast("double") / lit(1e6)
            + clampStep(col("c01") * col("u0") + col("c11") * col("u1")
              + col("c12") * col("u2"), col("det"))) * lit(1e6), 0)
            .cast("long").as("b1"),
          round((col("b2").cast("double") / lit(1e6)
            + clampStep(col("c02") * col("u0") + col("c12") * col("u1")
              + col("c22") * col("u2"), col("det"))) * lit(1e6), 0)
            .cast("long").as("b2"))
        .localCheckpoint(true)
    }
    ab
  }

  /** The deployable two-covariate model row: (a, b1, b2, c1, c2) —
    * parameters plus both centering constants (the [[logisticModel]]
    * contract extended).
    */
  def logistic2Model(df: DataFrame, label: String = "y",
      cov1: String = "x1", cov2: String = "x2",
      iters: Int = 8): DataFrame = {
    require(iters >= 1 && iters <= 16, s"1 <= iters <= 16: $iters")
    val y0 = col(label).cast("long")
    val yv = when(y0 === 1L, 1L).when(y0 === 0L, 0L)
      .otherwise(raise_error(concat(
        lit("logistic2Model: label must be 0 or 1: "), y0.cast("string"))))
    val base0 = df.select(yv.as("y"),
      quantMilli(cov1, "x1m0", "logistic2Model"),
      quantMilli(cov2, "x2m0", "logistic2Model"))
    val cb = base0.agg(round(avg(col("x1m0")), 0).cast("long").as("c1"),
      round(avg(col("x2m0")), 0).cast("long").as("c2"))
    val base = base0.crossJoin(broadcast(cb))
      .select(col("y"), (col("x1m0") - col("c1")).as("x1m"),
        (col("x2m0") - col("c2")).as("x2m"))
      .localCheckpoint(true)
    fit2On(base, iters).crossJoin(broadcast(cb))
      .select(col("a"), col("b1"), col("b2"), col("c1"), col("c2"))
  }

  /** Score rows against a frozen 1-row two-covariate model
    * (a, b1, b2, c1, c2): appends `p_micro`, map-side only.
    */
  def scoreLogistic2(units: DataFrame, model: DataFrame,
      cov1: String = "x1", cov2: String = "x2"): DataFrame =
    units.crossJoin(broadcast(model))
      .withColumn("x1m",
        round(col(cov1).cast("double") * 1000, 0).cast("long")
          - col("c1"))
      .withColumn("x2m",
        round(col(cov2).cast("double") * 1000, 0).cast("long")
          - col("c2"))
      .withColumn("p_micro", {
        val lp = col("a") * lit(1000L) + col("x1m") * col("b1") +
          col("x2m") * col("b2")
        val lpg = when(abs(lp) > EtaCap, raise_error(
          lit("scoreLogistic2: |linear predictor| exceeds 20")))
          .otherwise(lp)
        round(lit(1e6) / (lit(1.0) + exp(-lpg.cast("double") / lit(1e9))),
          0).cast("long")
      })
      .drop("a", "b1", "b2", "c1", "c2", "x1m", "x2m")

  /** EXACT FEATURE SHAPLEY over model AUC for the two-covariate
    * family (Shapley 1953 applied to feature coalitions — with two
    * features the 2! orderings are enumerable, no sampling): fit all
    * four coalitions (∅ → AUC exactly ½ under the tie convention,
    * {x₁}, {x₂}, {x₁,x₂}) and average each feature's marginal AUC
    * contribution over both orderings,
    *
    *   φ₁ = ½[(v₁ − v∅) + (v₁₂ − v₂)],  φ₂ symmetric,
    *
    * so φ₁ + φ₂ = v₁₂ − ½ exactly (efficiency, testable). The
    * "which feature earns its pipeline" readout with the attribution
    * axioms, not a heuristic.
    *
    * Determinism: three integer training chains, map-side scoring,
    * and the rank-free exact AUC — whose per-coalition window is
    * bounded by the micro quantization (≤ 10⁶+1 distinct scores
    * regardless of corpus size). Shapley arithmetic runs on the
    * rounded-6 AUCs (one fixed chain).
    *
    * Output (1 row): (auc0_r6, auc1_r6, auc2_r6, auc12_r6, shap1_r6,
    * shap2_r6).
    */
  def featureShapleyAuc(df: DataFrame, label: String = "y",
      cov1: String = "x1", cov2: String = "x2",
      iters: Int = 6): DataFrame = {
    val base = df.select(col(label).cast("long").as("y"),
      col(cov1).cast("double").as("x1"),
      col(cov2).cast("double").as("x2"))
      .localCheckpoint(true)
    def aucOf(scored: DataFrame, name: String): DataFrame =
      graft.llm.Eval.groupedAuc(scored, lit(1L), col("p_micro"),
        col("y") === 1L)
        .select(col("auc_r6").as(name))
    val s1 = scoreLogistic(base,
      logisticModel(base, "y", "x1", iters), "x1")
    val s2 = scoreLogistic(base,
      logisticModel(base, "y", "x2", iters), "x2")
    val s12 = scoreLogistic2(base,
      logistic2Model(base, "y", "x1", "x2", iters), "x1", "x2")
    aucOf(s1, "auc1_r6")
      .crossJoin(broadcast(aucOf(s2, "auc2_r6")))
      .crossJoin(broadcast(aucOf(s12, "auc12_r6")))
      .select(lit(0.5).as("auc0_r6"), col("auc1_r6"), col("auc2_r6"),
        col("auc12_r6"),
        round(((col("auc1_r6") - lit(0.5))
          + (col("auc12_r6") - col("auc2_r6"))) / 2, 6).as("shap1_r6"),
        round(((col("auc2_r6") - lit(0.5))
          + (col("auc12_r6") - col("auc1_r6"))) / 2, 6).as("shap2_r6"))
  }

  /** K-FOLD CROSS-VALIDATED AUC of the logistic model — the held-out
    * discrimination readout (Stone 1974): units hash into k folds by
    * a SALT-KEYED md5 (the q254 portable-draw idiom — both engines
    * assign every unit to the same fold, so the folds themselves sit
    * under the hash gate); each fold's model trains on the OTHER
    * folds (its own centering, its own fixed Newton rounds) and
    * scores only its held-out units; per-fold ROC AUC comes from the
    * exact rank-free cumulative trick ([[graft.llm.Eval.groupedAuc]]).
    * A fold whose test set is single-class drops from the output (the
    * groupedAuc contract — an AUC over one class is undefined).
    *
    * Scale shape: k fixed-round fits over (k−1)/k of the corpus each
    * + ONE map-side scoring pass per fold (1-row models broadcast) +
    * one windowed aggregation per fold keyed by fold — nothing
    * global, nothing quadratic.
    *
    * Output per fold: (fold, n_train, n_test, n_pos, n_neg, auc_r6),
    * ordered by fold.
    */
  def kFoldCvAuc(df: DataFrame, label: String = "y",
      covariate: String = "x", id: String = "user_id", folds: Int = 3,
      iters: Int = 6, salt: String = "cv384"): DataFrame = {
    require(folds >= 2 && folds <= 10, s"2 <= folds <= 10: $folds")
    val y0 = col(label).cast("long")
    val yv = when(y0 === 1L, 1L).when(y0 === 0L, 0L)
      .otherwise(raise_error(concat(
        lit("kFoldCvAuc: label must be 0 or 1: "), y0.cast("string"))))
    val base = df.select(col(id).cast("long").as("uid"), yv.as("yy"),
        col(covariate).cast("double").as("x"))
      // column API, not an expr() splice: salt is caller-supplied — a
      // quote/backslash would break the generated expression at plan time
      .withColumn("fold",
        conv(substring(md5(concat(lit(s"$salt-"),
          col("uid").cast("string"))), 1, 8), 16, 10)
          .cast("long") % folds.toLong)
      .localCheckpoint(true)
    val scored = (0 until folds).map { f =>
      val m = logisticModel(base.filter(col("fold") =!= f.toLong),
        "yy", "x", iters)
      scoreLogistic(base.filter(col("fold") === f.toLong), m)
        .select(col("fold"), col("yy"), col("p_micro"))
    }.reduce(_ unionAll _)
    val auc = graft.llm.Eval.groupedAuc(scored, col("fold"),
      col("p_micro"), col("yy") === 1L)
    val sizes = base.groupBy("fold").agg(count(lit(1)).as("n_test"))
      .select(col("fold").as("tfold"), col("n_test"))
    val tot = base.agg(count(lit(1)).as("n_all"))
    auc.join(sizes, auc("grp") === sizes("tfold"))
      .crossJoin(broadcast(tot))
      .select(col("tfold").as("fold"),
        (col("n_all") - col("n_test")).as("n_train"),
        col("n_test"), col("n_pos"), col("n_neg"), col("auc_r6"))
      .orderBy("fold")
  }

  /** UNCERTAINTY-SAMPLING BATCH (Lewis & Gale SIGIR'94, the active-
    * learning baseline): the k units whose model probability sits
    * closest to 1/2 — where a label purchase buys the most
    * information. Deterministic: p̂ is integer micro, the distance
    * |p̂ − 5·10⁵| is an exact integer, ties break on the unit id; the
    * selection is a bounded top-k (TakeOrderedAndProject — never a
    * global sort materialized).
    *
    * Output: (user_id, p_micro, dist_micro), ordered (dist, id).
    */
  def uncertaintyBatch(df: DataFrame, label: String = "y",
      covariate: String = "x", id: String = "user_id", iters: Int = 6,
      k: Int = 20): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val model = logisticModel(df, label, covariate, iters)
    scoreLogistic(df.select(col(id), col(covariate)), model, covariate)
      .select(col(id), col("p_micro"),
        abs(col("p_micro") - lit(500000L)).as("dist_micro"))
      .orderBy(col("dist_micro"), col(id))
      .limit(k)
  }

  /** MODEL CALIBRATION AUDIT over scored units: the Murphy (1973)
    * Brier decomposition BS = REL − RES + UNC on fixed-width
    * probability deciles, plus the Hosmer–Lemeshow χ² — the standard
    * "is the model honest about its probabilities" readout
    * (reliability ≈ 0 and HL χ² small = calibrated; resolution → UNC
    * = sharp). Fixed-width bins (p_micro div 10⁵, capped at 9) rather
    * than quantile bins: replayable with no rank machinery.
    *
    * Exactness: per-unit (p_micro − y·10⁶)² and all bin sums are exact
    * decimal(38,0)/HUGEINT integers from one hash aggregation; the
    * decomposition terms fold over the ORDER-PINNED ≤10-row bin
    * window; one IEEE chain each at the edge.
    *
    * Input: (label 0/1, `p_micro` score). Output (1 row): (n_units,
    * n_bins, brier_r6, rel_r6, res_r6, unc_r6, hl_chi2_r6).
    */
  def calibrationAudit(df: DataFrame, label: String = "y",
      score: String = "p_micro"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val y0 = col(label).cast("long")
    val yv = when(y0 === 1L, 1L).when(y0 === 0L, 0L)
      .otherwise(raise_error(concat(
        lit("calibrationAudit: label must be 0 or 1: "), y0.cast("string"))))
    val p0 = col(score).cast("long")
    val pv = when(p0 >= 0L && p0 <= 1000000L, p0)
      .otherwise(raise_error(concat(
        lit("calibrationAudit: score must be micro-units in [0, 1e6]: "),
        p0.cast("string"))))
    val base = df.select(yv.as("y"), pv.as("p"))
      .withColumn("b", least(expr("p div 100000"), lit(9L)))
    val bins = base.groupBy("b")
      .agg(count(lit(1)).as("nk"), sum(col("y")).as("ok"),
        sum(col("p")).as("pk"),
        sum(((col("p") - col("y") * lit(1000000L))
          * (col("p") - col("y") * lit(1000000L))).cast(dec38)).as("sq"))
    val wCum = Window.orderBy("b").rowsBetween(Long.MinValue, 0)
    val wAll = Window.partitionBy()
    bins
      .withColumn("n", sum(col("nk")).over(wAll))
      .withColumn("o", sum(col("ok")).over(wAll).cast("double")
        / sum(col("nk")).over(wAll).cast("double"))
      .withColumn("pbar", col("pk").cast("double")
        / (col("nk").cast("double") * lit(1e6)))
      .withColumn("obar", col("ok").cast("double") / col("nk").cast("double"))
      .withColumn("relc", col("nk").cast("double")
        * (col("pbar") - col("obar")) * (col("pbar") - col("obar")))
      .withColumn("resc", col("nk").cast("double")
        * (col("obar") - col("o")) * (col("obar") - col("o")))
      // HL: observed vs expected events AND non-events per bin
      .withColumn("e1", col("pk").cast("double") / lit(1e6))
      .withColumn("hlc",
        (col("ok").cast("double") - col("e1")) * (col("ok").cast("double")
          - col("e1")) / col("e1")
          + ((col("nk") - col("ok")).cast("double")
            - (col("nk").cast("double") - col("e1")))
            * ((col("nk") - col("ok")).cast("double")
              - (col("nk").cast("double") - col("e1")))
            / (col("nk").cast("double") - col("e1")))
      .withColumn("sqcum", sum(col("sq").cast("double")).over(wCum))
      .withColumn("relcum", sum(col("relc")).over(wCum))
      .withColumn("rescum", sum(col("resc")).over(wCum))
      .withColumn("hlcum", sum(col("hlc")).over(wCum))
      .withColumn("kcum", count(lit(1)).over(wCum))
      .agg(max(struct(col("b"), col("n"), col("o"), col("kcum"),
        col("sqcum"), col("relcum"), col("rescum"), col("hlcum"))).as("z"))
      .select(col("z.n").as("n_units"), col("z.kcum").as("n_bins"),
        round(col("z.sqcum") / (col("z.n").cast("double") * lit(1e12)), 6)
          .as("brier_r6"),
        round(col("z.relcum") / col("z.n").cast("double"), 6).as("rel_r6"),
        round(col("z.rescum") / col("z.n").cast("double"), 6).as("res_r6"),
        round(col("z.o") * (lit(1.0) - col("z.o")), 6).as("unc_r6"),
        round(col("z.hlcum"), 6).as("hl_chi2_r6"))
  }

  // ------------------------------------------------------------------
  // driver entries + oracles
  // ------------------------------------------------------------------

  /** one Newton evaluation at $prev's (a, b): the six HUGEINT
    * sufficient statistics → real-unit U/I + det, over the centered
    * unit CTE `u(y, xm[, yo])`
    */
  private def evalSql(prev: String): String = evalSqlOn("u", prev)

  /** the per-round Newton evaluation over an arbitrary unit CTE —
    * the q348 oracle machinery parametrized so multi-model entries
    * (q382's per-arm fits) can replay several chains side by side
    */
  private def evalSqlOn(unit: String, prev: String): String =
    s"""(SELECT u0, u1, i00, i01, i11, i00 * i11 - i01 * i01 AS det FROM (
       |  SELECT CAST(su0 AS DOUBLE) / 1e6 AS u0,
       |    CAST(su1 AS DOUBLE) / 1e9 AS u1,
       |    CAST(si00 AS DOUBLE) / 1e12 AS i00,
       |    CAST(si01 AS DOUBLE) / 1e15 AS i01,
       |    CAST(si11 AS DOUBLE) / 1e18 AS i11
       |  FROM (SELECT
       |      sum(y * 1000000 - pm) AS su0,
       |      sum(xm * (y * 1000000 - pm)) AS su1,
       |      sum(w) AS si00, sum(xm * w) AS si01,
       |      sum(CAST(xm * xm AS HUGEINT) * w) AS si11
       |    FROM (SELECT y, xm, pm, pm * (1000000 - pm) AS w
       |      FROM (SELECT uu.y, uu.xm,
       |          CAST(round(1e6 / (1 + exp(-CAST(p2.a * 1000 + uu.xm * p2.b
       |            AS DOUBLE) / 1e9)), 0) AS BIGINT) AS pm
       |        FROM $unit uu, $prev p2)))))""".stripMargin

  private def roundsSqlOn(unit: String, prefix: String,
      iters: Int): String = {
    def round(prev: String, cur: String): String =
      s"""$cur AS MATERIALIZED (
         |  SELECT CAST(round((p.a / 1e6 + LEAST(GREATEST(
         |      (x.i11 * x.u0 - x.i01 * x.u1) / x.det, -1.0), 1.0))
         |      * 1e6, 0) AS BIGINT) AS a,
         |    CAST(round((p.b / 1e6 + LEAST(GREATEST(
         |      (x.i00 * x.u1 - x.i01 * x.u0) / x.det, -1.0), 1.0))
         |      * 1e6, 0) AS BIGINT) AS b
         |  FROM $prev p, ${evalSqlOn(unit, prev)} x)""".stripMargin
    s"${prefix}0 AS (SELECT CAST(0 AS BIGINT) AS a, " +
      "CAST(0 AS BIGINT) AS b),\n" +
      (1 to iters)
        .map(k => round(if (k == 1) s"${prefix}0" else s"$prefix${k - 1}",
          s"$prefix$k"))
        .mkString(",\n")
  }

  private def roundsSql(iters: Int): String = roundsSqlOn("u", "r", iters)

  /** the q385 3-parameter Newton evaluation over an arbitrary
    * (y, x1m, x2m) unit CTE — shared by the q385 fit oracle and the
    * q397 Shapley chains
    */
  private def eval2SqlOn(unit: String, prev: String): String =
    s"""(SELECT a, b1, b2, u0, u1, u2, i00, i01, i02, i11, i12, i22,
       |    c00, c01, c02, c11, c12, c22,
       |    i00 * c00 + i01 * c01 + i02 * c02 AS det
       |  FROM (SELECT *,
       |      i11 * i22 - i12 * i12 AS c00,
       |      i02 * i12 - i01 * i22 AS c01,
       |      i01 * i12 - i02 * i11 AS c02,
       |      i00 * i22 - i02 * i02 AS c11,
       |      i01 * i02 - i00 * i12 AS c12,
       |      i00 * i11 - i01 * i01 AS c22
       |    FROM (SELECT a, b1, b2,
       |        CAST(su0 AS DOUBLE) / 1e6 AS u0,
       |        CAST(su1 AS DOUBLE) / 1e9 AS u1,
       |        CAST(su2 AS DOUBLE) / 1e9 AS u2,
       |        CAST(si00 AS DOUBLE) / 1e12 AS i00,
       |        CAST(si01 AS DOUBLE) / 1e15 AS i01,
       |        CAST(si02 AS DOUBLE) / 1e15 AS i02,
       |        CAST(si11 AS DOUBLE) / 1e18 AS i11,
       |        CAST(si12 AS DOUBLE) / 1e18 AS i12,
       |        CAST(si22 AS DOUBLE) / 1e18 AS i22
       |      FROM (SELECT a, b1, b2,
       |          sum(y * 1000000 - pm) AS su0,
       |          sum(x1m * (y * 1000000 - pm)) AS su1,
       |          sum(x2m * (y * 1000000 - pm)) AS su2,
       |          sum(w) AS si00, sum(x1m * w) AS si01,
       |          sum(x2m * w) AS si02,
       |          sum(CAST(x1m * x1m AS HUGEINT) * w) AS si11,
       |          sum(CAST(x1m * x2m AS HUGEINT) * w) AS si12,
       |          sum(CAST(x2m * x2m AS HUGEINT) * w) AS si22
       |        FROM (SELECT a, b1, b2, y, x1m, x2m, pm,
       |            pm * (1000000 - pm) AS w
       |          FROM (SELECT p2.a, p2.b1, p2.b2, uu.y, uu.x1m,
       |              uu.x2m,
       |              CAST(round(1e6 / (1 + exp(-CAST(p2.a * 1000
       |                + uu.x1m * p2.b1 + uu.x2m * p2.b2 AS DOUBLE)
       |                / 1e9)), 0) AS BIGINT) AS pm
       |            FROM $unit uu, $prev p2))
       |        GROUP BY a, b1, b2))))""".stripMargin

  private def rounds3SqlOn(unit: String, prefix: String,
      iters: Int): String = {
    def step(num: String): String =
      s"LEAST(GREATEST(($num) / x.det, -1.0), 1.0)"
    def round3(prev: String, cur: String): String =
      s"""$cur AS MATERIALIZED (
         |  SELECT CAST(round((x.a / 1e6 + ${step(
        "x.c00 * x.u0 + x.c01 * x.u1 + x.c02 * x.u2")})
         |      * 1e6, 0) AS BIGINT) AS a,
         |    CAST(round((x.b1 / 1e6 + ${step(
        "x.c01 * x.u0 + x.c11 * x.u1 + x.c12 * x.u2")})
         |      * 1e6, 0) AS BIGINT) AS b1,
         |    CAST(round((x.b2 / 1e6 + ${step(
        "x.c02 * x.u0 + x.c12 * x.u1 + x.c22 * x.u2")})
         |      * 1e6, 0) AS BIGINT) AS b2
         |  FROM ${eval2SqlOn(unit, prev)} x)""".stripMargin
    s"${prefix}0 AS (SELECT CAST(0 AS BIGINT) AS a, " +
      "CAST(0 AS BIGINT) AS b1, CAST(0 AS BIGINT) AS b2),\n" +
      (1 to iters)
        .map(k => round3(if (k == 1) s"${prefix}0" else s"$prefix${k - 1}",
          s"$prefix$k"))
        .mkString(",\n")
  }

  /** the q348/q349 unit CTEs: per-user label/treat, ln(1+count)
    * covariate in centered milli-units (+ spend for the IPW entry)
    */
  private val unitSql =
    """u0 AS MATERIALIZED (SELECT user_id, y, yo,
      |    CAST(round(ln(CAST(cnt + 1 AS DOUBLE)) * 1000, 0) AS BIGINT) AS xm
      |  FROM (SELECT user_id,
      |      max(CASE WHEN event_type = 'signup'
      |        AND ts < TIMESTAMP '2024-01-05 00:00:00'
      |        THEN 1 ELSE 0 END) AS y,
      |      sum(CASE WHEN event_type = 'purchase'
      |        THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS yo,
      |      count(*) AS cnt
      |    FROM events GROUP BY user_id)),
      |u AS MATERIALIZED (SELECT user_id, y, yo,
      |    xm - (SELECT CAST(round(avg(xm), 0) AS BIGINT) FROM u0) AS xm
      |  FROM u0)""".stripMargin

  val all: ListMap[String, Q] = ListMap(
    // ---- q348: LOGISTIC REGRESSION — does activity level predict an
    //      early signup? Six Newton rounds unrolled (MATERIALIZED
    //      round CTEs), each replaying the micro-quantized sigmoid,
    //      the HUGEINT sufficient statistics, the 2×2 solve and the
    //      clamped update bit-for-bit; the final row re-evaluates at
    //      the converged (a, b) for the reported standard errors. ----
    "q348_logistic" -> Q(
      (s, d) => logisticFit(
        Tables.events(s, d).groupBy(col("user_id"))
          .agg(
            max(when(col("event_type") === "signup"
              && col("ts") < lit("2024-01-05").cast("timestamp"), 1L)
              .otherwise(0L)).as("y"),
            log((count(lit(1)) + 1).cast("double")).as("x")),
        "y", "x", iters = 6),
      Some(s"""WITH $unitSql,
             |${roundsSql(6)},
             |fin AS MATERIALIZED (SELECT p.a, p.b, x.i00, x.i11, x.det
             |  FROM r6 p, ${evalSql("r6")} x),
             |stats AS (SELECT count(*) AS n_units, sum(y) AS n_pos FROM u)
             |SELECT a AS a_micro, b AS b_micro,
             |  round(exp(b / 1e6), 6) AS or_r6,
             |  round(sqrt(i11 / det), 6) AS se_a_r6,
             |  round(sqrt(i00 / det), 6) AS se_b_r6,
             |  CAST(n_units AS BIGINT) AS n_units,
             |  CAST(n_pos AS BIGINT) AS n_pos
             |FROM fin, stats""".stripMargin)),

    // ---- q349: IPW ATE on a logistic propensity — the q328 question
    //      ("did early signup lift spend?") adjusted on the CONTINUOUS
    //      activity covariate instead of the coarse stratum buckets:
    //      fit e(x), clip to [1, 99]%, Hájek-normalized weighted
    //      means via exact integer 10¹²/ê weights. ----
    "q349_ipw_ate" -> Q(
      (s, d) => ipwAte(
        Tables.events(s, d).groupBy(col("user_id"))
          .agg(
            max(when(col("event_type") === "signup"
              && col("ts") < lit("2024-01-05").cast("timestamp"), 1L)
              .otherwise(0L)).as("treat"),
            sum(when(col("event_type") === "purchase",
              round(col("value") * 100, 0).cast("long")).otherwise(0L))
              .as("spend"),
            log((count(lit(1)) + 1).cast("double")).as("x")),
        "treat", "spend", "x", iters = 6, clipMilli = 10),
      Some(s"""WITH $unitSql,
             |${roundsSql(6)},
             |sc AS MATERIALIZED (SELECT uu.y, uu.yo,
             |    LEAST(GREATEST(CAST(round(1e6 / (1 + exp(
             |      -CAST(p.a * 1000 + uu.xm * p.b AS DOUBLE) / 1e9)), 0)
             |      AS BIGINT), 10000), 990000) AS e
             |  FROM u uu, r6 p),
             |w AS (SELECT y, yo,
             |    CASE WHEN y = 1 THEN 1000000000000 // e
             |      ELSE 1000000000000 // (1000000 - e) END AS wt
             |  FROM sc),
             |agg AS (SELECT
             |    sum(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS n1,
             |    sum(CASE WHEN y = 0 THEN 1 ELSE 0 END) AS n0,
             |    sum(CASE WHEN y = 1 THEN yo ELSE 0 END) AS sy1,
             |    sum(CASE WHEN y = 0 THEN yo ELSE 0 END) AS sy0,
             |    sum(CASE WHEN y = 1 THEN yo * wt ELSE 0 END) AS swy1,
             |    sum(CASE WHEN y = 1 THEN wt ELSE 0 END) AS sw1,
             |    sum(CASE WHEN y = 0 THEN yo * wt ELSE 0 END) AS swy0,
             |    sum(CASE WHEN y = 0 THEN wt ELSE 0 END) AS sw0
             |  FROM w)
             |SELECT p.a AS a_micro, p.b AS b_micro,
             |  CAST(n1 AS BIGINT) AS n_treated, CAST(n0 AS BIGINT) AS n_control,
             |  round(CAST(sy1 AS DOUBLE) / CAST(n1 AS DOUBLE)
             |    - CAST(sy0 AS DOUBLE) / CAST(n0 AS DOUBLE), 6) AS naive_r6,
             |  round(CAST(swy1 AS DOUBLE) / CAST(sw1 AS DOUBLE)
             |    - CAST(swy0 AS DOUBLE) / CAST(sw0 AS DOUBLE), 6) AS ate_r6
             |FROM agg, r6 p""".stripMargin)),

    // ---- q382: UPLIFT / QINI — who should be targeted with early
    //      signup? Two-model T-learner on the activity covariate,
    //      outcome = a >$100 purchase in the back half of the month;
    //      fixed-width uplift deciles with observed uplift and the
    //      cumulative Qini path. The oracle replays BOTH arms'
    //      training chains, each unit's double scoring, the binning,
    //      and the order-pinned cumulative fold. ----
    "q382_uplift_qini" -> Q(
      (s, d) => upliftQini(
        Tables.events(s, d).groupBy(col("user_id"))
          .agg(
            max(when(col("event_type") === "signup"
              && col("ts") < lit("2024-01-05").cast("timestamp"), 1L)
              .otherwise(0L)).as("treat"),
            max(when(col("event_type") === "purchase"
              && col("ts") >= lit("2024-01-15").cast("timestamp")
              && col("value") > 100, 1L).otherwise(0L)).as("y"),
            log((count(lit(1)) + 1).cast("double")).as("x")),
        "treat", "y", "x", iters = 6, binWidthMicro = 200000L),
      Some(s"""WITH ub AS MATERIALIZED (SELECT user_id,
             |    max(CASE WHEN event_type = 'signup'
             |      AND ts < TIMESTAMP '2024-01-05 00:00:00'
             |      THEN 1 ELSE 0 END) AS tr,
             |    max(CASE WHEN event_type = 'purchase'
             |      AND ts >= TIMESTAMP '2024-01-15 00:00:00'
             |      AND value > 100 THEN 1 ELSE 0 END) AS yy,
             |    CAST(round(ln(CAST(count(*) + 1 AS DOUBLE)) * 1000, 0)
             |      AS BIGINT) AS xmr
             |  FROM events GROUP BY user_id),
             |cb1 AS (SELECT CAST(round(avg(xmr), 0) AS BIGINT) AS cb
             |  FROM ub WHERE tr = 1),
             |cb0 AS (SELECT CAST(round(avg(xmr), 0) AS BIGINT) AS cb
             |  FROM ub WHERE tr = 0),
             |ut AS MATERIALIZED (SELECT yy AS y,
             |    xmr - (SELECT cb FROM cb1) AS xm FROM ub WHERE tr = 1),
             |uc AS MATERIALIZED (SELECT yy AS y,
             |    xmr - (SELECT cb FROM cb0) AS xm FROM ub WHERE tr = 0),
             |${roundsSqlOn("ut", "t", 6)},
             |${roundsSqlOn("uc", "c", 6)},
             |scx AS MATERIALIZED (SELECT u.tr, u.yy,
             |    CAST(round(1e6 / (1 + exp(-CAST(p.a * 1000
             |      + (u.xmr - (SELECT cb FROM cb1)) * p.b AS DOUBLE)
             |      / 1e9)), 0) AS BIGINT)
             |    - CAST(round(1e6 / (1 + exp(-CAST(q.a * 1000
             |      + (u.xmr - (SELECT cb FROM cb0)) * q.b AS DOUBLE)
             |      / 1e9)), 0) AS BIGINT) AS u2
             |  FROM ub u, t6 p, c6 q),
             |bn AS (SELECT bin,
             |    sum(CASE WHEN tr = 1 THEN 1 ELSE 0 END) AS nt,
             |    sum(CASE WHEN tr = 0 THEN 1 ELSE 0 END) AS nc,
             |    sum(CASE WHEN tr = 1 THEN yy ELSE 0 END) AS st,
             |    sum(CASE WHEN tr = 0 THEN yy ELSE 0 END) AS sc2,
             |    sum(u2) AS su, count(*) AS n
             |  FROM (SELECT tr, yy, u2,
             |      least((u2 + 1000000) // 200000, 9) AS bin FROM scx)
             |  GROUP BY bin),
             |cm AS (SELECT bin, nt, nc, st, sc2, su, n,
             |    sum(nt) OVER w AS cnt_, sum(nc) OVER w AS cnc,
             |    sum(st) OVER w AS cst, sum(sc2) OVER w AS csc
             |  FROM bn WINDOW w AS (ORDER BY bin DESC
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
             |SELECT bin, CAST(nt AS BIGINT) AS n_treated,
             |  CAST(nc AS BIGINT) AS n_control,
             |  round(CAST(su AS DOUBLE) / (CAST(n AS DOUBLE) * 1e6), 6)
             |    AS pred_uplift_r6,
             |  CASE WHEN nt > 0 AND nc > 0 THEN
             |    round(CAST(st AS DOUBLE) / CAST(nt AS DOUBLE)
             |      - CAST(sc2 AS DOUBLE) / CAST(nc AS DOUBLE), 6)
             |    ELSE NULL END AS obs_uplift_r6,
             |  CASE WHEN cnc > 0 THEN
             |    round(CAST(cst AS DOUBLE) - CAST(csc AS DOUBLE)
             |      * CAST(cnt_ AS DOUBLE) / CAST(cnc AS DOUBLE), 6)
             |    ELSE NULL END AS qini_r6
             |FROM cm ORDER BY bin DESC""".stripMargin)),

    // ---- q390: UNCERTAINTY BATCH — the 20 users the q348 model is
    //      least sure about, the next labeling budget's targets. The
    //      oracle replays the training rounds, every scored sigmoid,
    //      and the (distance, id) top-k. ----
    "q390_uncertainty_batch" -> Q(
      (s, d) => uncertaintyBatch(
        Tables.events(s, d).groupBy(col("user_id"))
          .agg(
            max(when(col("event_type") === "signup"
              && col("ts") < lit("2024-01-05").cast("timestamp"), 1L)
              .otherwise(0L)).as("y"),
            log((count(lit(1)) + 1).cast("double")).as("x")),
        "y", "x", "user_id", iters = 6, k = 20),
      Some(s"""WITH $unitSql,
             |${roundsSql(6)},
             |sc AS (SELECT uu.user_id,
             |    CAST(round(1e6 / (1 + exp(
             |      -CAST(p.a * 1000 + uu.xm * p.b AS DOUBLE) / 1e9)), 0)
             |      AS BIGINT) AS p_micro
             |  FROM u uu, r6 p)
             |SELECT user_id, p_micro,
             |  abs(p_micro - 500000) AS dist_micro
             |FROM sc ORDER BY dist_micro, user_id LIMIT 20""".stripMargin)),

    // ---- q397: FEATURE SHAPLEY over AUC — how much does overall
    //      activity vs purchase activity each contribute to
    //      predicting early signup? All four coalitions fitted, both
    //      orderings averaged; the oracle replays three training
    //      chains, three scorings, three exact AUCs, and the Shapley
    //      chain. ----
    "q397_feature_shapley" -> Q(
      (s, d) => featureShapleyAuc(
        Tables.events(s, d).groupBy(col("user_id"))
          .agg(
            max(when(col("event_type") === "signup"
              && col("ts") < lit("2024-01-05").cast("timestamp"), 1L)
              .otherwise(0L)).as("y"),
            log((count(lit(1)) + 1).cast("double")).as("x1"),
            log((sum(when(col("event_type") === "purchase", 1L)
              .otherwise(0L)) + 1).cast("double")).as("x2")),
        "y", "x1", "x2", iters = 6),
      Some {
        def aucCtes(src: String, p: String): String =
          s"""${p}p AS (SELECT p AS s,
             |    sum(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS pos,
             |    sum(CASE WHEN y = 1 THEN 0 ELSE 1 END) AS neg
             |  FROM $src GROUP BY p),
             |${p}c AS (SELECT pos, neg,
             |    coalesce(sum(neg) OVER (ORDER BY s ROWS BETWEEN
             |      UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumneg
             |  FROM ${p}p),
             |$p AS (SELECT round(CAST(sum(pos * (2 * cumneg + neg))
             |      AS DOUBLE) / (2.0 * sum(pos) * sum(neg)), 6) AS auc
             |  FROM ${p}c)""".stripMargin
        s"""WITH ub2 AS MATERIALIZED (SELECT user_id,
           |    max(CASE WHEN event_type = 'signup'
           |      AND ts < TIMESTAMP '2024-01-05 00:00:00'
           |      THEN 1 ELSE 0 END) AS y,
           |    CAST(round(ln(CAST(count(*) + 1 AS DOUBLE)) * 1000, 0)
           |      AS BIGINT) AS x1r,
           |    CAST(round(ln(CAST(sum(CASE WHEN event_type = 'purchase'
           |      THEN 1 ELSE 0 END) + 1 AS DOUBLE)) * 1000, 0)
           |      AS BIGINT) AS x2r
           |  FROM events GROUP BY user_id),
           |cb1a AS (SELECT CAST(round(avg(x1r), 0) AS BIGINT) AS cb
           |  FROM ub2),
           |cb2a AS (SELECT CAST(round(avg(x2r), 0) AS BIGINT) AS cb
           |  FROM ub2),
           |u1c AS MATERIALIZED (SELECT y,
           |    x1r - (SELECT cb FROM cb1a) AS xm FROM ub2),
           |u2cv AS MATERIALIZED (SELECT y,
           |    x2r - (SELECT cb FROM cb2a) AS xm FROM ub2),
           |u2c AS MATERIALIZED (SELECT y,
           |    x1r - (SELECT cb FROM cb1a) AS x1m,
           |    x2r - (SELECT cb FROM cb2a) AS x2m FROM ub2),
           |${roundsSqlOn("u1c", "ma", 6)},
           |${roundsSqlOn("u2cv", "mb", 6)},
           |${rounds3SqlOn("u2c", "g", 6)},
           |s1 AS MATERIALIZED (SELECT uu.y,
           |    CAST(round(1e6 / (1 + exp(-CAST(p.a * 1000 + uu.xm * p.b
           |      AS DOUBLE) / 1e9)), 0) AS BIGINT) AS p
           |  FROM u1c uu, ma6 p),
           |s2 AS MATERIALIZED (SELECT uu.y,
           |    CAST(round(1e6 / (1 + exp(-CAST(p.a * 1000 + uu.xm * p.b
           |      AS DOUBLE) / 1e9)), 0) AS BIGINT) AS p
           |  FROM u2cv uu, mb6 p),
           |s12 AS MATERIALIZED (SELECT uu.y,
           |    CAST(round(1e6 / (1 + exp(-CAST(p.a * 1000
           |      + uu.x1m * p.b1 + uu.x2m * p.b2 AS DOUBLE) / 1e9)), 0)
           |      AS BIGINT) AS p
           |  FROM u2c uu, g6 p),
           |${aucCtes("s1", "a1")},
           |${aucCtes("s2", "a2")},
           |${aucCtes("s12", "a12")}
           |SELECT CAST(0.5 AS DOUBLE) AS auc0_r6,
           |  a1.auc AS auc1_r6, a2.auc AS auc2_r6,
           |  a12.auc AS auc12_r6,
           |  round(((a1.auc - 0.5) + (a12.auc - a2.auc)) / 2, 6)
           |    AS shap1_r6,
           |  round(((a2.auc - 0.5) + (a12.auc - a1.auc)) / 2, 6)
           |    AS shap2_r6
           |FROM a1, a2, a12""".stripMargin
      }),

    // ---- q385: TWO-COVARIATE LOGISTIC — early signup from overall
    //      activity AND purchase activity jointly; six 3×3 Newton
    //      rounds, the oracle replaying the nine HUGEINT sufficient
    //      statistics, the cofactor solve, and the clamped updates
    //      round for round. ----
    "q385_logistic2" -> Q(
      (s, d) => logisticFit2(
        Tables.events(s, d).groupBy(col("user_id"))
          .agg(
            max(when(col("event_type") === "signup"
              && col("ts") < lit("2024-01-05").cast("timestamp"), 1L)
              .otherwise(0L)).as("y"),
            log((count(lit(1)) + 1).cast("double")).as("x1"),
            log((sum(when(col("event_type") === "purchase", 1L)
              .otherwise(0L)) + 1).cast("double")).as("x2")),
        "y", "x1", "x2", iters = 6),
      Some {
        val rounds = rounds3SqlOn("u2c", "g", 6)
        s"""WITH ub2 AS MATERIALIZED (SELECT user_id,
           |    max(CASE WHEN event_type = 'signup'
           |      AND ts < TIMESTAMP '2024-01-05 00:00:00'
           |      THEN 1 ELSE 0 END) AS y,
           |    CAST(round(ln(CAST(count(*) + 1 AS DOUBLE)) * 1000, 0)
           |      AS BIGINT) AS x1r,
           |    CAST(round(ln(CAST(sum(CASE WHEN event_type = 'purchase'
           |      THEN 1 ELSE 0 END) + 1 AS DOUBLE)) * 1000, 0)
           |      AS BIGINT) AS x2r
           |  FROM events GROUP BY user_id),
           |cbb AS (SELECT CAST(round(avg(x1r), 0) AS BIGINT) AS c1,
           |    CAST(round(avg(x2r), 0) AS BIGINT) AS c2 FROM ub2),
           |u2c AS MATERIALIZED (SELECT y,
           |    x1r - (SELECT c1 FROM cbb) AS x1m,
           |    x2r - (SELECT c2 FROM cbb) AS x2m
           |  FROM ub2),
           |$rounds,
           |fin AS (SELECT x.a, x.b1, x.b2,
           |    round(sqrt(x.c11 / x.det), 6) AS se_b1_r6,
           |    round(sqrt(x.c22 / x.det), 6) AS se_b2_r6
           |  FROM ${eval2SqlOn("u2c", "g6")} x),
           |st AS (SELECT count(*) AS n_units, sum(y) AS n_pos FROM u2c)
           |SELECT a AS a_micro, b1 AS b1_micro, b2 AS b2_micro,
           |  round(exp(b1 / 1e6), 6) AS or1_r6,
           |  round(exp(b2 / 1e6), 6) AS or2_r6,
           |  se_b1_r6, se_b2_r6,
           |  CAST(n_units AS BIGINT) AS n_units,
           |  CAST(n_pos AS BIGINT) AS n_pos
           |FROM fin, st""".stripMargin
      }),

    // ---- q384: K-FOLD CROSS-VALIDATED AUC — does the q348 activity
    //      model discriminate OUT OF SAMPLE? Three md5-hashed folds,
    //      three training chains (each replayed in full by the
    //      oracle), held-out scoring, exact rank-free AUC per fold. ----
    "q384_kfold_cv_auc" -> Q(
      (s, d) => kFoldCvAuc(
        Tables.events(s, d).groupBy(col("user_id"))
          .agg(
            max(when(col("event_type") === "signup"
              && col("ts") < lit("2024-01-05").cast("timestamp"), 1L)
              .otherwise(0L)).as("y"),
            log((count(lit(1)) + 1).cast("double")).as("x")),
        "y", "x", "user_id", folds = 3, iters = 6),
      Some {
        val foldChains = (0 until 3).map { f =>
          s"""cb$f AS (SELECT CAST(round(avg(xmr), 0) AS BIGINT) AS cb
             |  FROM ub WHERE fold <> $f),
             |uf$f AS MATERIALIZED (SELECT yy AS y,
             |    xmr - (SELECT cb FROM cb$f) AS xm
             |  FROM ub WHERE fold <> $f),
             |${roundsSqlOn(s"uf$f", s"m${f}r", 6)}""".stripMargin
        }.mkString(",\n")
        val foldScores = (0 until 3).map { f =>
          s"""SELECT u.fold, u.yy,
             |  CAST(round(1e6 / (1 + exp(-CAST(p.a * 1000
             |    + (u.xmr - (SELECT cb FROM cb$f)) * p.b AS DOUBLE)
             |    / 1e9)), 0) AS BIGINT) AS p
             |FROM ub u, m${f}r6 p WHERE u.fold = $f""".stripMargin
        }.mkString("\nUNION ALL\n")
        s"""WITH ub AS MATERIALIZED (SELECT user_id,
           |    max(CASE WHEN event_type = 'signup'
           |      AND ts < TIMESTAMP '2024-01-05 00:00:00'
           |      THEN 1 ELSE 0 END) AS yy,
           |    CAST(round(ln(CAST(count(*) + 1 AS DOUBLE)) * 1000, 0)
           |      AS BIGINT) AS xmr,
           |    ('0x' || substr(md5('cv384-' || CAST(user_id AS VARCHAR)),
           |      1, 8))::BIGINT % 3 AS fold
           |  FROM events GROUP BY user_id),
           |$foldChains,
           |sc AS MATERIALIZED ($foldScores),
           |per AS (SELECT fold, p AS s,
           |    sum(CASE WHEN yy = 1 THEN 1 ELSE 0 END) AS pos,
           |    sum(CASE WHEN yy = 1 THEN 0 ELSE 1 END) AS neg
           |  FROM sc GROUP BY 1, 2),
           |c AS (SELECT fold, pos, neg,
           |    coalesce(sum(neg) OVER (PARTITION BY fold ORDER BY s
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
           |      0) AS cumneg
           |  FROM per),
           |g AS (SELECT fold, sum(pos) AS n_pos, sum(neg) AS n_neg,
           |    sum(pos * (2 * cumneg + neg)) AS auc_num2
           |  FROM c GROUP BY 1),
           |tc AS (SELECT fold, count(*) AS n_test FROM ub GROUP BY fold),
           |tt AS (SELECT count(*) AS n_all FROM ub)
           |SELECT g.fold, CAST(tt.n_all - tc.n_test AS BIGINT) AS n_train,
           |  CAST(tc.n_test AS BIGINT) AS n_test,
           |  CAST(n_pos AS BIGINT) AS n_pos, CAST(n_neg AS BIGINT) AS n_neg,
           |  round(CAST(auc_num2 AS DOUBLE) / (2.0 * n_pos * n_neg), 6)
           |    AS auc_r6
           |FROM g JOIN tc ON tc.fold = g.fold CROSS JOIN tt
           |WHERE n_pos > 0 AND n_neg > 0
           |ORDER BY g.fold""".stripMargin
      }),

    // ---- q374: DOUBLY-ROBUST (AIPW) ATE — the q349 question with the
    //      augmentation: per-arm linear outcome models correct the
    //      reweighting (consistent if either model is right). The
    //      oracle replays the training rounds, the clipped micro
    //      propensities, the quantized per-arm OLS, every unit's
    //      integer augmentation term, and the two edge divisions. ----
    "q374_aipw_ate" -> Q(
      (s, d) => aipwAte(
        Tables.events(s, d).groupBy(col("user_id"))
          .agg(
            max(when(col("event_type") === "signup"
              && col("ts") < lit("2024-01-05").cast("timestamp"), 1L)
              .otherwise(0L)).as("treat"),
            sum(when(col("event_type") === "purchase",
              round(col("value") * 100, 0).cast("long")).otherwise(0L))
              .as("spend"),
            log((count(lit(1)) + 1).cast("double")).as("x")),
        "treat", "spend", "x", iters = 6, clipMilli = 10),
      Some(s"""WITH $unitSql,
             |${roundsSql(6)},
             |reg AS MATERIALIZED (SELECT y,
             |    CAST(round(beta * 1e9, 0) AS BIGINT) AS b_nano,
             |    CAST(round((CAST(sy AS DOUBLE) - beta * CAST(sx AS DOUBLE))
             |      / CAST(n AS DOUBLE), 0) AS BIGINT) AS alpha_milli
             |  FROM (SELECT y, n, sx, sy,
             |      (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
             |        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             |      / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
             |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS beta
             |    FROM (SELECT y, count(*) AS n, sum(xm) AS sx,
             |        sum(yo * 1000) AS sy,
             |        sum(CAST(xm AS HUGEINT) * xm) AS sxx,
             |        sum(CAST(xm AS HUGEINT) * yo * 1000) AS sxy
             |      FROM u GROUP BY y))),
             |sc AS MATERIALIZED (SELECT uu.y, uu.yo, uu.xm,
             |    LEAST(GREATEST(CAST(round(1e6 / (1 + exp(
             |      -CAST(p.a * 1000 + uu.xm * p.b AS DOUBLE) / 1e9)), 0)
             |      AS BIGINT), 10000), 990000) AS e,
             |    CAST(round(CAST(m1.alpha_milli AS DOUBLE)
             |      + CAST(uu.xm AS DOUBLE) * CAST(m1.b_nano AS DOUBLE)
             |        / 1e9, 0) AS BIGINT) AS mu1,
             |    CAST(round(CAST(m0.alpha_milli AS DOUBLE)
             |      + CAST(uu.xm AS DOUBLE) * CAST(m0.b_nano AS DOUBLE)
             |        / 1e9, 0) AS BIGINT) AS mu0
             |  FROM u uu, r6 p,
             |    (SELECT b_nano, alpha_milli FROM reg WHERE y = 1) m1,
             |    (SELECT b_nano, alpha_milli FROM reg WHERE y = 0) m0),
             |ag AS (SELECT count(*) AS n,
             |    sum(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS n1,
             |    sum(CASE WHEN y = 0 THEN 1 ELSE 0 END) AS n0,
             |    sum(CASE WHEN y = 1 THEN yo ELSE 0 END) AS sy1,
             |    sum(CASE WHEN y = 0 THEN yo ELSE 0 END) AS sy0,
             |    sum(CAST(mu1 AS HUGEINT) * 1000000
             |      + CASE WHEN y = 1 THEN CAST(yo * 1000 - mu1 AS HUGEINT)
             |          * (1000000000000 // e) ELSE 0 END) AS s1,
             |    sum(CAST(mu0 AS HUGEINT) * 1000000
             |      + CASE WHEN y = 0 THEN CAST(yo * 1000 - mu0 AS HUGEINT)
             |          * (1000000000000 // (1000000 - e)) ELSE 0 END) AS s0
             |  FROM sc)
             |SELECT p.a AS a_micro, p.b AS b_micro,
             |  m1.b_nano AS b1_nano, m0.b_nano AS b0_nano,
             |  CAST(n1 AS BIGINT) AS n_treated,
             |  CAST(n0 AS BIGINT) AS n_control,
             |  round(CAST(sy1 AS DOUBLE) / CAST(n1 AS DOUBLE)
             |    - CAST(sy0 AS DOUBLE) / CAST(n0 AS DOUBLE), 6) AS naive_r6,
             |  round((CAST(s1 AS DOUBLE) - CAST(s0 AS DOUBLE))
             |    / (CAST(n AS DOUBLE) * 1e9), 6) AS ate_r6
             |FROM ag, r6 p,
             |  (SELECT b_nano FROM reg WHERE y = 1) m1,
             |  (SELECT b_nano FROM reg WHERE y = 0) m0""".stripMargin)),

    // ---- q373: PROPENSITY-SCORE MATCHING ATT — the q349 question a
    //      third way: 1-NN-within-caliper control per treated unit
    //      (with replacement, ties → smallest control id), ATT over
    //      the matched pairs. The oracle replays the training rounds,
    //      the micro propensities, and the integer argmin; its cross
    //      join IS the caliper filter (the bucket banding is a
    //      Spark-side pair-volume bound, proven output-equivalent by
    //      the covering argument in the scaladoc). ----
    "q373_psm_att" -> Q(
      (s, d) => psmAtt(
        Tables.events(s, d).groupBy(col("user_id"))
          .agg(
            max(when(col("event_type") === "signup"
              && col("ts") < lit("2024-01-05").cast("timestamp"), 1L)
              .otherwise(0L)).as("treat"),
            sum(when(col("event_type") === "purchase",
              round(col("value") * 100, 0).cast("long")).otherwise(0L))
              .as("spend"),
            log((count(lit(1)) + 1).cast("double")).as("x")),
        "user_id", "treat", "spend", "x", iters = 6,
        caliperMicro = 50000L),
      Some(s"""WITH $unitSql,
             |${roundsSql(6)},
             |sc AS MATERIALIZED (SELECT uu.user_id, uu.y, uu.yo,
             |    CAST(round(1e6 / (1 + exp(
             |      -CAST(p.a * 1000 + uu.xm * p.b AS DOUBLE) / 1e9)), 0)
             |      AS BIGINT) AS e
             |  FROM u uu, r6 p),
             |tr AS (SELECT user_id AS tid, e AS e1, yo AS yo1 FROM sc
             |  WHERE y = 1),
             |co AS (SELECT user_id AS cid, e AS e0, yo AS yo0 FROM sc
             |  WHERE y = 0),
             |cand AS (SELECT t.tid, t.yo1, abs(t.e1 - c.e0) AS ad,
             |    c.cid, c.yo0
             |  FROM tr t JOIN co c ON abs(t.e1 - c.e0) <= 50000),
             |best AS (SELECT tid, yo1, yo0 FROM (SELECT tid, yo1, yo0,
             |      row_number() OVER (PARTITION BY tid
             |        ORDER BY ad, cid) AS rn
             |    FROM cand) WHERE rn = 1),
             |m AS (SELECT count(*) AS n_matched, sum(yo1) AS s1,
             |    sum(yo0) AS s0 FROM best),
             |st AS (SELECT
             |    sum(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS n1,
             |    sum(CASE WHEN y = 0 THEN 1 ELSE 0 END) AS n0,
             |    sum(CASE WHEN y = 1 THEN yo ELSE 0 END) AS sy1,
             |    sum(CASE WHEN y = 0 THEN yo ELSE 0 END) AS sy0
             |  FROM sc)
             |SELECT p.a AS a_micro, p.b AS b_micro,
             |  CAST(n1 AS BIGINT) AS n_treated,
             |  CAST(n0 AS BIGINT) AS n_control,
             |  CAST(n_matched AS BIGINT) AS n_matched,
             |  CAST(n1 - n_matched AS BIGINT) AS n_unmatched,
             |  round((CAST(s1 AS DOUBLE) - CAST(s0 AS DOUBLE))
             |    / CAST(n_matched AS DOUBLE), 6) AS att_r6,
             |  round(CAST(sy1 AS DOUBLE) / CAST(n1 AS DOUBLE)
             |    - CAST(sy0 AS DOUBLE) / CAST(n0 AS DOUBLE), 6) AS naive_r6
             |FROM m, st, r6 p""".stripMargin)),

    // ---- q364: STREAMING score-at-ingest with the frozen logistic
    //      model (the q284 DSIR pattern on the classification rung):
    //      the model (a, b, cbar) trains once and persists; users
    //      arrive as a 3-batch stream with the LAST batch REPLAYED
    //      (at-least-once), each micro-batch scoring map-side against
    //      the broadcast model and appending; replays collapse in the
    //      id-keyed dedup. Output must equal one-shot batch scoring —
    //      the oracle replays the training rounds and the per-user
    //      quantized sigmoid. ----
    "q364_logistic_stream_score" -> Q(
      (s, d) => {
        import s.implicits._
        implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
        import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
        val units = Tables.events(s, d).groupBy(col("user_id"))
          .agg(
            max(when(col("event_type") === "signup"
              && col("ts") < lit("2024-01-05").cast("timestamp"), 1L)
              .otherwise(0L)).as("y"),
            log((count(lit(1)) + 1).cast("double")).as("x"))
        val work = java.nio.file.Files.createTempDirectory("graft-q364")
        val ckDir = java.nio.file.Files.createTempDirectory("graft-q364-ck")
        sys.addShutdownHook {
          def rm(f: java.io.File): Unit = {
            Option(f.listFiles()).foreach(_.foreach(rm))
            f.delete(); ()
          }
          rm(work.toFile); rm(ckDir.toFile)
        }
        logisticModel(units, "y", "x", iters = 6)
          .coalesce(1).write.parquet(s"$work/model")
        val frozen = s.read.parquet(s"$work/model")
        val arriving = units.select(col("user_id"), col("x"))
          .as[(Long, Double)].collect()
        val (b12, b3) = arriving.partition(_._1 % 3 != 2)
        val (b1, b2) = b12.partition(_._1 % 3 == 0)
        val mem = MemoryStream[(Long, Double)]
        val q = mem.toDF.toDF("user_id", "x").writeStream
          .foreachBatch { (batch: DataFrame, _: Long) =>
            scoreLogistic(batch, frozen)
              .select(col("user_id"), col("p_micro"))
              .write.mode("append").parquet(s"$work/scores")
          }
          .option("checkpointLocation", ckDir.toString)
          .start()
        try {
          mem.addData(b1.toSeq); q.processAllAvailable()
          mem.addData(b2.toSeq); q.processAllAvailable()
          mem.addData(b3.toSeq); q.processAllAvailable()
          mem.addData(b3.toSeq); q.processAllAvailable() // replay
        } finally q.stop()
        s.read.parquet(s"$work/scores")
          .dropDuplicates("user_id")
          .orderBy("user_id")
      },
      Some(s"""WITH $unitSql,
             |${roundsSql(6)}
             |SELECT uu.user_id,
             |  CAST(round(1e6 / (1 + exp(
             |    -CAST(p.a * 1000 + uu.xm * p.b AS DOUBLE) / 1e9)), 0)
             |    AS BIGINT) AS p_micro
             |FROM u uu, r6 p ORDER BY uu.user_id""".stripMargin)),

    // ---- q370: CALIBRATION AUDIT of the q348 model on its own
    //      training units — Brier decomposition + Hosmer-Lemeshow
    //      over fixed probability deciles; the oracle replays the
    //      training rounds, every unit's quantized sigmoid, the
    //      binning, and the order-pinned decomposition folds. ----
    "q370_calibration_audit" -> Q(
      (s, d) => {
        val units = Tables.events(s, d).groupBy(col("user_id"))
          .agg(
            max(when(col("event_type") === "signup"
              && col("ts") < lit("2024-01-05").cast("timestamp"), 1L)
              .otherwise(0L)).as("y"),
            log((count(lit(1)) + 1).cast("double")).as("x"))
        val model = logisticModel(units, "y", "x", iters = 6)
        calibrationAudit(scoreLogistic(units, model))
      },
      Some(s"""WITH $unitSql,
             |${roundsSql(6)},
             |sc AS MATERIALIZED (SELECT uu.y,
             |    CAST(round(1e6 / (1 + exp(
             |      -CAST(pp.a * 1000 + uu.xm * pp.b AS DOUBLE) / 1e9)), 0)
             |      AS BIGINT) AS p
             |  FROM u uu, r6 pp),
             |bi AS (SELECT y, p, least(p // 100000, 9) AS b FROM sc),
             |bn AS (SELECT b, count(*) AS nk, sum(y) AS ok, sum(p) AS pk,
             |    sum(CAST(p - y * 1000000 AS HUGEINT) * (p - y * 1000000))
             |      AS sq
             |  FROM bi GROUP BY b),
             |tt AS (SELECT sum(nk) AS n,
             |    CAST(sum(ok) AS DOUBLE) / CAST(sum(nk) AS DOUBLE) AS o
             |  FROM bn),
             |tm AS (SELECT b, nk, ok, sq,
             |    CAST(pk AS DOUBLE) / (CAST(nk AS DOUBLE) * 1e6) AS pbar,
             |    CAST(ok AS DOUBLE) / CAST(nk AS DOUBLE) AS obar,
             |    CAST(pk AS DOUBLE) / 1e6 AS e1
             |  FROM bn),
             |ag AS (SELECT count(*) AS n_bins,
             |    sum(CAST(sq AS DOUBLE) ORDER BY b) AS sqcum,
             |    sum(CAST(nk AS DOUBLE) * (pbar - obar) * (pbar - obar)
             |      ORDER BY b) AS relcum,
             |    sum(CAST(nk AS DOUBLE) * (obar - tt.o) * (obar - tt.o)
             |      ORDER BY b) AS rescum,
             |    sum((CAST(ok AS DOUBLE) - e1) * (CAST(ok AS DOUBLE) - e1)
             |        / e1
             |      + (CAST(nk - ok AS DOUBLE) - (CAST(nk AS DOUBLE) - e1))
             |        * (CAST(nk - ok AS DOUBLE) - (CAST(nk AS DOUBLE) - e1))
             |        / (CAST(nk AS DOUBLE) - e1) ORDER BY b) AS hlcum
             |  FROM tm, tt)
             |SELECT CAST(tt.n AS BIGINT) AS n_units,
             |  CAST(ag.n_bins AS BIGINT) AS n_bins,
             |  round(ag.sqcum / (CAST(tt.n AS DOUBLE) * 1e12), 6) AS brier_r6,
             |  round(ag.relcum / CAST(tt.n AS DOUBLE), 6) AS rel_r6,
             |  round(ag.rescum / CAST(tt.n AS DOUBLE), 6) AS res_r6,
             |  round(tt.o * (1.0 - tt.o), 6) AS unc_r6,
             |  round(ag.hlcum, 6) AS hl_chi2_r6
             |FROM ag, tt""".stripMargin)))
}
