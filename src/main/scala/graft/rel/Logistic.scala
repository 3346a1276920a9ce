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

  val all: ListMap[String, Q] = ListMap.empty
}
