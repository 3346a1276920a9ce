package graft.rel

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.rel.RelQueries.Q
import graft.rel.Tables

/** EXPERIMENT-ANALYSIS tier II: variance reduction and resampling
  * uncertainty — the two operators an A/B platform runs on every metric
  * after the q155/q229 significance gates.
  *
  *  - CUPED (Deng, Xu, Kohavi & Walker WSDM'13 "Improving the
  *    sensitivity of online controlled experiments"): adjust the
  *    in-experiment metric Y by the pre-experiment covariate X,
  *    Y' = Y − θ·(X − E[X]) with θ = cov(X,Y)/var(X) pooled across
  *    variants; the adjustment is mean-preserving over the pooled
  *    population and cuts variance by the squared correlation.
  *  - POISSON BOOTSTRAP (Chamandy, Muralidharan, Najmi & Naidu 2012,
  *    "Estimating uncertainty for massive data streams", Google TR;
  *    Kleiner et al.'s motivation applies): classical bootstrap
  *    resampling is impossible at 100 TB (each replicate would
  *    reshuffle the corpus), but Poisson(1) per-(row, replicate)
  *    weights are independent of everything, so ALL replicates ride
  *    ONE narrow pass with map-side combine — the shuffle carries
  *    |groups|·R partial sums, never data.
  *
  * Exactness discipline (the q138/q155 house rule): metric values are
  * integer MILLI units; every sum is exact (DECIMAL(38,0) against
  * overflow, matching DuckDB's HUGEINT sums); the floating tail of each
  * output column is one fixed, explicitly parenthesized chain of IEEE
  * ops both engines evaluate identically, rounded to 6. Bootstrap
  * weights come from the house Knuth-hash uniform (the q282 Gumbel
  * recipe) through hard-coded 17-digit Poisson(1) CDF literals — no
  * libm exp() whose last ulp could differ between engines — so a
  * replicate replays bit-for-bit in DuckDB.
  */
object Experiment {

  /** |x| and |y| per unit must stay below this for the per-row long
    * product x·y to be exact; beyond it the operator fails loudly
    * (observed magnitudes, not an assumed range — the r10 q273 rule).
    * 3_037_000_499² < Long.MaxValue < 3_037_000_500².
    */
  private val MilliCap = 3037000499L

  private def guarded(c: Column, name: String): Column =
    when(abs(c) > MilliCap,
      raise_error(concat(lit(s"cuped: |$name| milli exceeds exact-product cap: "),
        c.cast("string")))).otherwise(c)

  /** CUPED variance-reduced per-variant summary.
    *
    * Input: one row per experiment unit with an integer-MILLI
    * pre-period covariate `x`, in-period metric `y`, and a variant
    * key. θ is the pooled cov(X,Y)/var(X) (the standard single-θ
    * form — per-variant θ would bias the delta); var(X)=0 degenerates
    * to θ=0 (no adjustment), pinned in ExperimentSpec.
    *
    * Output (one row per variant, ordered):
    *   variant, n_units, mean_y_r6, mean_cuped_r6, var_y_r6,
    *   var_cuped_r6, theta_r6 — means/variances in METRIC units
    *   (milli/1000), variances population (divide by n, matching
    *   var_pop).
    *
    * Scale shape: one hash aggregation unit→variant moments (the
    * unit table itself is the caller's one shuffle), a 2-row pooled
    * fold, broadcast back — no second pass over units.
    */
  def cuped(units: DataFrame, variant: String = "variant",
      x: String = "x", y: String = "y"): DataFrame =
    cupedFromMoments(cupedMoments(units, variant, x, y))

  /** The per-variant sufficient statistics behind [[cuped]] —
    * (variant, n, sx, sy, sxy, sx2, sy2), every sum exact. ADDITIVE
    * over unit batches: new experiment units fold in by summation
    * ([[cupedFold]]), so maintaining a running CUPED readout costs one
    * batch-sized aggregation, never a re-scan — fold(moments(A),
    * moments(B)) ≡ moments(A ∪ B) EXACTLY (integer sums associate),
    * the q287 DSIR-fold law on the experiment tier. Batches must
    * partition the units (a unit straddling batches would count as two
    * units — split by unit key, not by event time).
    */
  def cupedMoments(units: DataFrame, variant: String = "variant",
      x: String = "x", y: String = "y"): DataFrame = {
    val xg = guarded(col(x).cast("long"), x)
    val yg = guarded(col(y).cast("long"), y)
    units
      .select(col(variant).as("variant"), xg.as("xv"), yg.as("yv"))
      .groupBy("variant")
      .agg(count(lit(1)).as("n"),
        sum(col("xv").cast("decimal(38,0)")).as("sx"),
        sum(col("yv").cast("decimal(38,0)")).as("sy"),
        sum((col("xv") * col("yv")).cast("decimal(38,0)")).as("sxy"),
        sum((col("xv") * col("xv")).cast("decimal(38,0)")).as("sx2"),
        sum((col("yv") * col("yv")).cast("decimal(38,0)")).as("sy2"))
  }

  /** Fold two [[cupedMoments]] tables (additive by variant). */
  def cupedFold(a: DataFrame, b: DataFrame): DataFrame =
    a.unionAll(b).groupBy("variant")
      .agg(sum(col("n")).as("n"), sum(col("sx")).as("sx"),
        sum(col("sy")).as("sy"), sum(col("sxy")).as("sxy"),
        sum(col("sx2")).as("sx2"), sum(col("sy2")).as("sy2"))

  /** The CUPED readout from a moment table — [[cuped]]'s second half. */
  def cupedFromMoments(mom: DataFrame): DataFrame = {
    val pool = mom.agg(
      sum(col("n")).cast("double").as("np"),
      sum(col("sx")).cast("double").as("sxp"),
      sum(col("sy")).cast("double").as("syp"),
      sum(col("sxy")).cast("double").as("sxyp"),
      sum(col("sx2")).cast("double").as("sx2p"))
    val withPool = mom.crossJoin(broadcast(pool))
    val nD = col("n").cast("double")
    val sxD = col("sx").cast("double"); val syD = col("sy").cast("double")
    val sxyD = col("sxy").cast("double"); val sx2D = col("sx2").cast("double")
    val sy2D = col("sy2").cast("double")
    val den = (col("np") * col("sx2p")) - (col("sxp") * col("sxp"))
    val theta = when(den === 0.0, lit(0.0))
      .otherwise(((col("np") * col("sxyp")) - (col("sxp") * col("syp"))) / den)
    val varY = (sy2D / nD) - ((syD / nD) * (syD / nD))
    val covV = (sxyD / nD) - ((sxD / nD) * (syD / nD))
    val varX = (sx2D / nD) - ((sxD / nD) * (sxD / nD))
    withPool.select(
      col("variant"), col("n").as("n_units"),
      round((syD / nD) / 1000.0, 6).as("mean_y_r6"),
      round(((syD - (theta * (sxD - (nD * (col("sxp") / col("np")))))) / nD)
        / 1000.0, 6).as("mean_cuped_r6"),
      round(varY / 1000000.0, 6).as("var_y_r6"),
      round((varY - ((lit(2.0) * theta) * covV) + ((theta * theta) * varX))
        / 1000000.0, 6).as("var_cuped_r6"),
      round(theta, 6).as("theta_r6"))
      .orderBy("variant")
  }

  /** Poisson(1) CDF thresholds, 17 significant digits — LITERALS, not
    * exp() calls, so both engines compare against bit-identical
    * doubles. P(X ≤ k) for k = 0..7; weights cap at 8
    * (P(X > 8) ≈ 1.1e-6 — the tail mass folds into 8).
    */
  private[rel] val PoissonCdf: Array[Double] = Array(
    0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
    0.9810118431238462, 0.9963401531726563, 0.9994058151824183,
    0.9999167588507119, 0.9999897508033253)

  private def poissonWeight(u: Column): Column =
    PoissonCdf.zipWithIndex.foldRight(lit(8L): Column) {
      case ((cdf, k), rest) => when(u < lit(cdf), lit(k.toLong)).otherwise(rest)
    }

  /** Deterministic Poisson-bootstrap percentile CI for per-group means.
    *
    * Each (row, replicate) gets weight w ~ Poisson(1) from the
    * Knuth-hash uniform of (id, replicate) — deterministic, so the
    * whole resample replays bit-for-bit in SQL. Replicate r's mean is
    * Σw·v / Σw (exact integer sums, one double division); the CI is
    * the ⌈0.025·R⌉-th / ⌈0.975·R⌉-th smallest replicate mean (ties by
    * replicate index). Replicates whose weights all land 0 are
    * dropped (only possible for groups with ≲ a handful of rows —
    * the CI ranks then read from the survivors).
    *
    * Output: (group, n, mean_r6, lo_r6, hi_r6) in metric units.
    *
    * Scale shape: the R-way expansion happens INSIDE the map task and
    * collapses by partial aggregation to |groups|·R rows before the
    * shuffle; the per-group rank window orders exactly R rows. No
    * data-sized resample ever exists.
    */
  /** The replicate-mean stage of [[bootstrapCi]], exposed for the
    * bench: `shuffleExpanded = true` forces the R×-expanded weighted
    * rows across the wire before aggregating (the shape a naive
    * "materialize each resample, then aggregate" implementation has) —
    * same output, cluster-hostile plan. ExperimentBench measures the
    * difference in shuffle bytes.
    */
  private[graft] def bootstrapMeans(df: DataFrame, group: String, id: String,
      valueMilli: String, reps: Int, shuffleExpanded: Boolean = false)
      : DataFrame = {
    val base = df.select(col(group).as("grp"), col(id).cast("long").as("id"),
      guarded(col(valueMilli).cast("long"), valueMilli).as("v"))
    val u = (pmod((col("id") * lit(2654435761L))
      + ((col("rep") + lit(1L)) * lit(940572985L)), lit(2147483648L))
      .cast("double") + 1) / lit(2147483649.0)
    val weighted = base
      .withColumn("rep", explode(sequence(lit(0L), lit(reps - 1L))))
      .withColumn("w", poissonWeight(u))
    val shaped = if (shuffleExpanded)
      weighted.repartition(col("grp"), col("rep")) else weighted
    shaped
      .groupBy(col("grp"), col("rep"))
      .agg(sum(col("w")).as("ws"),
        sum((col("w") * col("v")).cast("decimal(38,0)")).as("wv"))
      .filter(col("ws") > 0)
      .select(col("grp"), col("rep"),
        (col("wv").cast("double") / col("ws").cast("double")).as("rmean"))
  }

  def bootstrapCi(df: DataFrame, group: String, id: String,
      valueMilli: String, reps: Int = 40): DataFrame = {
    require(reps >= 2 && reps <= 10000, s"reps=$reps")
    val loRank = math.max(1, math.ceil(0.025 * reps).toInt)
    val hiRank = math.ceil(0.975 * reps).toInt
    val base = df.select(col(group).as("grp"), col(id).cast("long").as("id"),
      guarded(col(valueMilli).cast("long"), valueMilli).as("v"))
    val pt = base.groupBy("grp").agg(count(lit(1)).as("n"),
      sum(col("v").cast("decimal(38,0)")).as("sv"))
    val rmeans = bootstrapMeans(df, group, id, valueMilli, reps)
    val win = Window.partitionBy("grp").orderBy(col("rmean"), col("rep"))
    val ci = rmeans.withColumn("rn", row_number().over(win))
      .groupBy("grp")
      .agg(min(when(col("rn") === loRank, col("rmean"))).as("lo"),
        min(when(col("rn") === hiRank, col("rmean"))).as("hi"))
    pt.join(ci, "grp")
      .select(col("grp"), col("n"),
        round((col("sv").cast("double") / col("n").cast("double")) / 1000.0, 6)
          .as("mean_r6"),
        round(col("lo") / 1000.0, 6).as("lo_r6"),
        round(col("hi") / 1000.0, 6).as("hi_r6"))
      .orderBy("grp")
  }

  /** χ²₀.₀₅ critical values for df = 1..10 — literals so the flag is
    * reproducible anywhere (no special-function libm).
    */
  private val Chi2Crit05: Array[Double] = Array(
    3.841458820694124, 5.991464547107979, 7.814727903251179,
    9.487729036781154, 11.070497693516351, 12.591587243743977,
    14.067140449340169, 15.50731305586545, 16.918977604620448,
    18.307038053275146)

  /** SAMPLE-RATIO-MISMATCH guardrail (the standard pre-analysis gate —
    * Fabijan et al. KDD'19 "Diagnosing sample ratio mismatch"): χ²
    * goodness-of-fit of observed per-variant assignment counts against
    * expected MILLI weights (must sum to 1000). An experiment whose
    * traffic split is off is analyzed no further — every downstream
    * metric is biased.
    *
    * Output: one row (n, k, chi2_r6, crit_r6, srm) with srm = the 5%
    * flag for df = k−1 ≤ 10 (larger designs: compare chi2_r6 yourself,
    * crit/srm are null). Counts and expectations are exact integers;
    * the χ² terms are one fixed IEEE chain each, summed over ≤ k
    * values. Scale: one hash aggregation to k rows.
    */
  def srmCheck(assignments: DataFrame, variant: String,
      expectedMilli: Map[String, Long]): DataFrame = {
    require(expectedMilli.values.sum == 1000L,
      s"srmCheck: expected milli weights must sum to 1000, got ${expectedMilli.values.sum}")
    require(expectedMilli.values.forall(_ > 0), "srmCheck: zero expected weight")
    val s = assignments.sparkSession
    import s.implicits._
    val k = expectedMilli.size
    val exp = expectedMilli.toSeq.sortBy(_._1).toDF("variant", "w")
    val obs0 = assignments
      .select(col(variant).cast("string").as("variant"))
      .groupBy("variant").agg(count(lit(1)).as("obs"))
    // full join: a variant MISSING from the data still contributes its
    // (0 − exp)² term — that is the worst mismatch, not a no-op — and
    // an observed variant outside the design fails loudly
    val joined = exp.join(obs0, Seq("variant"), "full")
      .select(
        when(col("w").isNull, raise_error(concat(
          lit("srmCheck: observed variant outside the design: "),
          col("variant")))).otherwise(col("w")).as("w"),
        coalesce(col("obs"), lit(0L)).as("obs"))
    val tot = joined.agg(sum(col("obs")).as("n"))
    // χ² = Σ (obs − n·w/1000)² / (n·w/1000), written over exact
    // integers: ((1000·obs − n·w)²) / (1000·n·w) per variant
    val term = ((lit(1000L) * col("obs") - col("n") * col("w"))
      .cast("double") * (lit(1000L) * col("obs") - col("n") * col("w"))
      .cast("double")) / (lit(1000.0) * (col("n") * col("w")).cast("double"))
    val chi2 = joined.crossJoin(broadcast(tot))
      .agg(min(col("n")).as("n"), sum(term).as("chi2"))
    val crit: Option[Double] =
      if (k - 1 >= 1 && k - 1 <= 10) Some(Chi2Crit05(k - 2)) else None
    chi2.select(col("n"), lit(k).as("k"),
      round(col("chi2"), 6).as("chi2_r6"),
      crit.map(c => lit(c)).getOrElse(lit(null).cast("double")).as("crit_r6"),
      crit.map(c => col("chi2") > lit(c))
        .getOrElse(lit(null).cast("boolean")).as("srm"))
  }

  /** z₀.₉₇₅ — the two-sided 95% normal critical value, as a literal. */
  private val Z975 = 1.959963984540054

  /** DELTA-METHOD CI for a RATIO metric (Deng, Knoblich & Lu KDD'18,
    * "Applying the Delta method in metric analytics"): per variant,
    * R = Σy/Σx over units (e.g. revenue per purchase with per-user
    * purchase counts x), with Var(R) ≈ (σ²_y − 2R·σ_xy + R²·σ²_x)
    * / (n·x̄²) from per-unit moments — the unit-level CLT that a naive
    * row-level variance gets wrong when rows correlate within units.
    * CI = R ± z·SE in metric units (y MILLI per x).
    *
    * Output per variant: (variant, n_units, ratio_r6, se_r6, lo_r6,
    * hi_r6). Variants with Σx ≤ 0 fail loudly (the ratio is
    * undefined). Same exact-moment discipline and scale shape as
    * [[cuped]].
    */
  def deltaRatioCi(units: DataFrame, variant: String = "variant",
      x: String = "x", y: String = "y"): DataFrame = {
    val xg = guarded(col(x).cast("long"), x)
    val yg = guarded(col(y).cast("long"), y)
    val mom = units
      .select(col(variant).as("variant"), xg.as("xv"), yg.as("yv"))
      .groupBy("variant")
      .agg(count(lit(1)).as("n"),
        sum(col("xv").cast("decimal(38,0)")).as("sx"),
        sum(col("yv").cast("decimal(38,0)")).as("sy"),
        sum((col("xv") * col("yv")).cast("decimal(38,0)")).as("sxy"),
        sum((col("xv") * col("xv")).cast("decimal(38,0)")).as("sx2"),
        sum((col("yv") * col("yv")).cast("decimal(38,0)")).as("sy2"))
    val nD = col("n").cast("double")
    val sxD0 = col("sx").cast("double")
    val sxD = when(col("sx") <= 0, raise_error(concat(
      lit("deltaRatioCi: sum(x) <= 0 for variant "),
      col("variant").cast("string")))).otherwise(sxD0)
    val syD = col("sy").cast("double")
    val sxyD = col("sxy").cast("double"); val sx2D = col("sx2").cast("double")
    val sy2D = col("sy2").cast("double")
    val ratio = syD / sxD
    val varY = (sy2D / nD) - ((syD / nD) * (syD / nD))
    val covXY = (sxyD / nD) - ((sxD / nD) * (syD / nD))
    val varX = (sx2D / nD) - ((sxD / nD) * (sxD / nD))
    // greatest(·, 0): the delta variance is ≥ 0 analytically but its
    // fp evaluation can land −ε when y is an exact multiple of x
    val se = sqrt(greatest((varY - ((lit(2.0) * ratio) * covXY)
      + ((ratio * ratio) * varX)) / (nD * ((sxD / nD) * (sxD / nD))),
      lit(0.0)))
    mom.select(col("variant"), col("n").as("n_units"),
      round(ratio, 6).as("ratio_r6"),
      round(se, 6).as("se_r6"),
      round(ratio - (lit(Z975) * se), 6).as("lo_r6"),
      round(ratio + (lit(Z975) * se), 6).as("hi_r6"))
      .orderBy("variant")
  }

  // --------------------------------------------------------------------
  //  driver entries
  // --------------------------------------------------------------------

  /** GROUP-SEQUENTIAL MONITORING under O'Brien–Fleming boundaries
    * (O'Brien & Fleming 1979; Pocock 1977 for the framing) — the
    * peeking guardrail: an experiment read at K interim looks must
    * compare each look's z-statistic against a SPENDING BOUNDARY, not
    * the fixed-horizon 1.96, or the realized false-positive rate
    * triples. OBF boundaries at overall α = 0.05 (two-sided) are the
    * PUBLISHED table constants — literals embedded in both engines
    * (the q325 rule; they come from numerical integration no SQL
    * engine should re-run):
    *   K=2: 2.7965, 1.9774   K=3: 3.4711, 2.4544, 2.0040
    *   K=4: 4.0486, 2.8626, 2.3373, 2.0243
    * Each look is a SNAPSHOT the caller built — the full unit table
    * as of that look's calendar boundary (the metric accrues per
    * unit; enrollment need not stagger). Per look the two-sample z
    * rides exact integer (n, Σ, Σ²) moments — one fixed IEEE chain
    * each, no cross-look sums, so no ordering concern. Output per
    * look, ordered: (look, n_a, n_b, z_r6, boundary, cross) —
    * `cross` flags EACH look whose |z| exceeds that look's boundary
    * (the earliest flagged look is where an honest sequential design
    * would have stopped; later flags are the monitoring trace, not
    * additional stops).
    */
  private val ObfBounds: Map[Int, Seq[Double]] = Map(
    2 -> Seq(2.7965, 1.9774),
    3 -> Seq(3.4711, 2.4544, 2.0040),
    4 -> Seq(4.0486, 2.8626, 2.3373, 2.0243))

  def groupSequential(units: DataFrame, lookCol: String,
      variant: String = "variant", value: String = "y"): DataFrame = {
    val v = col(variant).cast("string")
    val base = units.select(col(lookCol).cast("long").as("lk"),
      when(v === "A", 0L).when(v === "B", 1L)
        .otherwise(raise_error(concat(
          lit("groupSequential: variant must be A/B: "), v))).as("g"),
      col(value).cast("long").as("yv"))
    val k = base.agg(countDistinct(col("lk")).as("k"))
    // each look is a SNAPSHOT the caller built (the full unit table as
    // of that look's boundary) — per-look moments, no cross-look sums
    val cum = base.groupBy("lk")
      .agg(sum(when(col("g") === 0L, 1L).otherwise(0L)).as("cna"),
        sum(when(col("g") === 1L, 1L).otherwise(0L)).as("cnb"),
        sum(when(col("g") === 0L, col("yv")).otherwise(0L)).as("csa"),
        sum(when(col("g") === 1L, col("yv")).otherwise(0L)).as("csb"),
        sum(when(col("g") === 0L, col("yv") * col("yv")).otherwise(0L))
          .as("cqa"),
        sum(when(col("g") === 1L, col("yv") * col("yv")).otherwise(0L))
          .as("cqb"))
      .withColumn("look", row_number().over(Window.orderBy("lk")).cast("long"))
      .crossJoin(broadcast(k))
    // boundary literal per (K, look) — a when-chain over the published
    // table; an unsupported look count raises loudly
    val boundary = ObfBounds.foldLeft(
      raise_error(concat(lit("groupSequential: no OBF table for K = "),
        col("k").cast("string"))).cast("double")) {
      case (rest, (kk, bs)) =>
        when(col("k") === kk.toLong,
          bs.zipWithIndex.foldLeft(lit(Double.NaN)) {
            case (inner, (b, i)) =>
              when(col("look") === (i + 1).toLong, lit(b)).otherwise(inner)
          }).otherwise(rest)
    }
    // variance needs >= 2 units per arm per look — raise rather than
    // let the (n-1) division surface as an engine-dependent error
    val guardN = (c: Column) => when(c >= 2L, c)
      .otherwise(raise_error(lit(
        "groupSequential: every look needs >= 2 units per arm")))
    val naD = guardN(col("cna")).cast("double")
    val nbD = guardN(col("cnb")).cast("double")
    val ma = col("csa").cast("double") / naD
    val mb = col("csb").cast("double") / nbD
    val va = (col("cqa").cast("double") - naD * ma * ma) / (naD - 1.0)
    val vb = (col("cqb").cast("double") - nbD * mb * mb) / (nbD - 1.0)
    val z = (mb - ma) / sqrt(va / naD + vb / nbD)
    cum.select(col("look"), col("cna").as("n_a"), col("cnb").as("n_b"),
        round(z, 6).as("z_r6"), boundary.as("boundary"))
      .withColumn("cross", abs(col("z_r6")) > col("boundary"))
      .orderBy("look")
  }

  /** the q290/q298 unit table: per-user purchase milli in the front /
    * back half of January, variants by user parity */
  private def cupedDemoUnits(s: SparkSession, d: String): DataFrame = {
    val split = lit("2024-01-16").cast("timestamp")
    val isP = col("event_type") === "purchase"
    val milli = round(col("value") * 1000, 0).cast("long")
    Tables.events(s, d)
      .groupBy(col("user_id"))
      .agg(
        sum(when(isP && col("ts") < split, milli).otherwise(0L)).as("x"),
        sum(when(isP && col("ts") >= split, milli).otherwise(0L)).as("y"))
      .withColumn("variant", pmod(col("user_id"), lit(2L)))
  }

  /** CASE chain matching poissonWeight, for the oracle SQL */
  private def poissonCaseSql: String =
    PoissonCdf.zipWithIndex
      .map { case (c, k) => s"WHEN u < $c THEN $k" }
      .mkString("CASE ", " ", " ELSE 8 END")

  /** the q290/q298 oracle: full-retrain CUPED over all units */
  private val cupedSql: String =
    """WITH units AS (SELECT user_id, user_id % 2 AS variant,
             |    sum(CASE WHEN event_type = 'purchase'
             |          AND ts < TIMESTAMP '2024-01-16 00:00:00'
             |        THEN CAST(round(value * 1000) AS BIGINT) ELSE 0 END) AS x,
             |    sum(CASE WHEN event_type = 'purchase'
             |          AND ts >= TIMESTAMP '2024-01-16 00:00:00'
             |        THEN CAST(round(value * 1000) AS BIGINT) ELSE 0 END) AS y
             |  FROM events GROUP BY user_id),
             |mom AS (SELECT variant, count(*) AS n,
             |    sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
             |    sum(CAST(x * y AS HUGEINT)) AS sxy,
             |    sum(CAST(x * x AS HUGEINT)) AS sx2,
             |    sum(CAST(y * y AS HUGEINT)) AS sy2
             |  FROM units GROUP BY variant),
             |pool AS (SELECT CAST(sum(n) AS DOUBLE) AS np,
             |    CAST(sum(sx) AS DOUBLE) AS sxp, CAST(sum(sy) AS DOUBLE) AS syp,
             |    CAST(sum(sxy) AS DOUBLE) AS sxyp,
             |    CAST(sum(sx2) AS DOUBLE) AS sx2p
             |  FROM mom),
             |t AS (SELECT m.*, p.np, p.sxp, p.syp,
             |    CASE WHEN ((p.np * p.sx2p) - (p.sxp * p.sxp)) = 0.0 THEN 0.0
             |      ELSE ((p.np * p.sxyp) - (p.sxp * p.syp))
             |        / ((p.np * p.sx2p) - (p.sxp * p.sxp)) END AS theta
             |  FROM mom m CROSS JOIN pool p)
             |SELECT CAST(variant AS BIGINT) AS variant, n AS n_units,
             |  round((CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) / 1000.0, 6)
             |    AS mean_y_r6,
             |  round(((CAST(sy AS DOUBLE) - (theta * (CAST(sx AS DOUBLE)
             |      - (CAST(n AS DOUBLE) * (sxp / np))))) / CAST(n AS DOUBLE))
             |    / 1000.0, 6) AS mean_cuped_r6,
             |  round(((CAST(sy2 AS DOUBLE) / CAST(n AS DOUBLE))
             |      - ((CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
             |        * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))))
             |    / 1000000.0, 6) AS var_y_r6,
             |  round((((CAST(sy2 AS DOUBLE) / CAST(n AS DOUBLE))
             |      - ((CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
             |        * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))))
             |    - ((2.0 * theta) * ((CAST(sxy AS DOUBLE) / CAST(n AS DOUBLE))
             |      - ((CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
             |        * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)))))
             |    + ((theta * theta) * ((CAST(sx2 AS DOUBLE) / CAST(n AS DOUBLE))
             |      - ((CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
             |        * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))))))
             |    / 1000000.0, 6) AS var_cuped_r6,
             |  round(theta, 6) AS theta_r6
             |FROM t ORDER BY variant""".stripMargin

  /** STANDARDIZED EFFECT SIZE — Cohen's d with the Hedges' g
    * small-sample correction (Hedges 1981): the scale-free companion
    * every raw mean difference should ship with,
    *
    *   d = (m̄₁ − m̄₀) / s_pooled,
    *   s²_pooled = ((n₁−1)s₁² + (n₀−1)s₀²) / (n₁+n₀−2),
    *   g = d · (1 − 3/(4(n₁+n₀) − 9)).
    *
    * Exactness: per-arm (n, Σy, Σy²) are exact integers from ONE hash
    * aggregation; variances, the pooled sd, d and g are each one
    * fixed IEEE chain on the 1-row aggregate. Loud guards: an empty
    * arm, n < 2 in an arm (no variance), and a zero pooled sd (the
    * statistic is undefined, not infinite).
    *
    * Output (1 row): (n_treat, n_control, mean_diff_r6, pooled_sd_r6,
    * cohens_d_r6, hedges_g_r6).
    */
  def cohensD(df: DataFrame, variant: String = "variant",
      value: String = "y"): DataFrame = {
    val t0 = col(variant).cast("long")
    val tv = when(t0 === 1L, 1L).when(t0 === 0L, 0L)
      .otherwise(raise_error(concat(
        lit("cohensD: variant must be 0 or 1: "), t0.cast("string"))))
    val dec38 = org.apache.spark.sql.types.DataTypes
      .createDecimalType(38, 0)
    val base = df.select(tv.as("t"), col(value).cast("long").as("yv"))
    val agg = base.agg(
      sum(when(col("t") === 1L, 1L).otherwise(0L)).as("n1"),
      sum(when(col("t") === 0L, 1L).otherwise(0L)).as("n0"),
      sum(when(col("t") === 1L, col("yv")).otherwise(0L)).as("s1"),
      sum(when(col("t") === 0L, col("yv")).otherwise(0L)).as("s0"),
      sum(when(col("t") === 1L, (col("yv") * col("yv")).cast(dec38))
        .otherwise(lit(0L).cast(dec38))).as("q1"),
      sum(when(col("t") === 0L, (col("yv") * col("yv")).cast(dec38))
        .otherwise(lit(0L).cast(dec38))).as("q0"))
    val g = agg.select(
      when(col("n1") < 2L || col("n0") < 2L, raise_error(lit(
        "cohensD: each arm needs n >= 2"))).otherwise(col("n1")).as("n1"),
      col("n0"), col("s1"), col("s0"), col("q1"), col("q0"))
      // per-arm sample variance from exact moments: (Σy² − (Σy)²/n)/(n−1)
      .withColumn("v1", (col("q1").cast("double")
        - col("s1").cast("double") * col("s1").cast("double")
          / col("n1").cast("double")) / (col("n1") - 1L).cast("double"))
      .withColumn("v0", (col("q0").cast("double")
        - col("s0").cast("double") * col("s0").cast("double")
          / col("n0").cast("double")) / (col("n0") - 1L).cast("double"))
      .withColumn("sp", sqrt(((col("n1") - 1L).cast("double") * col("v1")
        + (col("n0") - 1L).cast("double") * col("v0"))
        / (col("n1") + col("n0") - 2L).cast("double")))
      .withColumn("md", col("s1").cast("double") / col("n1").cast("double")
        - col("s0").cast("double") / col("n0").cast("double"))
      // guard BEFORE any division touches sp: ANSI mode evaluates
      // every output column, so a zero divisor would throw Spark's
      // DIVIDE_BY_ZERO instead of this operator's message
      .withColumn("sp", when(col("sp") <= 0.0, raise_error(lit(
        "cohensD: zero pooled sd — the standardized effect is " +
          "undefined"))).otherwise(col("sp")))
    g.select(col("n1").as("n_treat"), col("n0").as("n_control"),
      round(col("md"), 6).as("mean_diff_r6"),
      round(col("sp"), 6).as("pooled_sd_r6"),
      round(col("md") / col("sp"), 6).as("cohens_d_r6"),
      round(col("md") / col("sp")
        * (lit(1.0) - lit(3.0) / (lit(4.0)
          * (col("n1") + col("n0")).cast("double") - lit(9.0))), 6)
        .as("hedges_g_r6"))
  }

  val all: ListMap[String, Q] = ListMap(
    // ---- q403: COHEN'S d / HEDGES' g — the standardized size of the
    //      early-signup spend difference; the oracle replays the six
    //      exact moments and every chain. ----
    "q403_cohens_d" -> Q(
      (s, d) => cohensD(
        Tables.events(s, d).groupBy(col("user_id"))
          .agg(
            max(when(col("event_type") === "signup"
              && col("ts") < lit("2024-01-05").cast("timestamp"), 1L)
              .otherwise(0L)).as("variant"),
            sum(when(col("event_type") === "purchase",
              round(col("value") * 100, 0).cast("long")).otherwise(0L))
              .as("y"))),
      Some("""WITH u AS (SELECT user_id,
             |    max(CASE WHEN event_type = 'signup'
             |      AND ts < TIMESTAMP '2024-01-05 00:00:00'
             |      THEN 1 ELSE 0 END) AS t,
             |    sum(CASE WHEN event_type = 'purchase'
             |      THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS yv
             |  FROM events GROUP BY user_id),
             |ag AS (SELECT
             |    sum(CASE WHEN t = 1 THEN 1 ELSE 0 END) AS n1,
             |    sum(CASE WHEN t = 0 THEN 1 ELSE 0 END) AS n0,
             |    sum(CASE WHEN t = 1 THEN yv ELSE 0 END) AS s1,
             |    sum(CASE WHEN t = 0 THEN yv ELSE 0 END) AS s0,
             |    sum(CASE WHEN t = 1 THEN CAST(yv AS HUGEINT) * yv
             |      ELSE 0 END) AS q1,
             |    sum(CASE WHEN t = 0 THEN CAST(yv AS HUGEINT) * yv
             |      ELSE 0 END) AS q0
             |  FROM u),
             |x AS (SELECT n1, n0,
             |    CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
             |      - CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS md,
             |    sqrt(((CAST(n1 - 1 AS DOUBLE))
             |      * ((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE)
             |        * CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE))
             |        / CAST(n1 - 1 AS DOUBLE))
             |      + (CAST(n0 - 1 AS DOUBLE))
             |      * ((CAST(q0 AS DOUBLE) - CAST(s0 AS DOUBLE)
             |        * CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE))
             |        / CAST(n0 - 1 AS DOUBLE)))
             |      / CAST(n1 + n0 - 2 AS DOUBLE)) AS sp
             |  FROM ag)
             |SELECT CAST(n1 AS BIGINT) AS n_treat,
             |  CAST(n0 AS BIGINT) AS n_control,
             |  round(md, 6) AS mean_diff_r6,
             |  round(sp, 6) AS pooled_sd_r6,
             |  round(md / sp, 6) AS cohens_d_r6,
             |  round(md / sp * (1.0 - 3.0
             |    / (4.0 * CAST(n1 + n0 AS DOUBLE) - 9.0)), 6)
             |    AS hedges_g_r6
             |FROM x""".stripMargin)),

    // ---- q290: CUPED — per-user purchase revenue in the back half of
    //      January adjusted by the front half; variants by user parity.
    //      Units = every user with any event (the metric defaults to 0),
    //      so the population is fixed independent of the metric. ----
    "q290_cuped" -> Q(
      (s, d) => cuped(cupedDemoUnits(s, d), "variant", "x", "y"),
      Some(cupedSql)),

    // ---- q298: INCREMENTAL CUPED — the unit population split by user
    //      hash into two batches, per-batch moments folded by addition,
    //      readout from the fold. The oracle is q290's full-retrain SQL
    //      VERBATIM (the q287 DSIR precedent): hash-green means
    //      fold(moments(A), moments(B)) is indistinguishable from
    //      recomputing over all units. ----
    "q298_cuped_incremental" -> Q(
      (s, d) => {
        val units = cupedDemoUnits(s, d)
        val a = cupedMoments(units.filter(pmod(col("user_id"), lit(5L)) < 3),
          "variant", "x", "y")
        val b = cupedMoments(units.filter(pmod(col("user_id"), lit(5L)) >= 3),
          "variant", "x", "y")
        cupedFromMoments(cupedFold(a, b))
      },
      Some(cupedSql)),

    // ---- q299: STREAMING CUPED — the unit table arrives as a file
    //      stream (3 micro-batches by user residue, the LAST REPLAYED:
    //      at-least-once delivery); each trigger upserts user-keyed
    //      state (dedup makes replays idempotent — the q284 rule:
    //      additive moments alone would double-count a redelivery, so
    //      idempotence lives at the unit key), readout = the CUPED
    //      fold over the final state. Oracle = q290's full-retrain SQL
    //      verbatim. ----
    "q299_cuped_stream" -> Q(
      (s, d) => {
        val units = cupedDemoUnits(s, d).localCheckpoint()
        val work = java.nio.file.Files.createTempDirectory("graft-q299")
          .toString
        val in = s"$work/in"
        units.filter(pmod(col("user_id"), lit(3L)) === 0)
          .coalesce(1).write.mode("append").parquet(in)
        units.filter(pmod(col("user_id"), lit(3L)) === 1)
          .coalesce(1).write.mode("append").parquet(in)
        val b3 = units.filter(pmod(col("user_id"), lit(3L)) === 2)
        b3.coalesce(1).write.mode("append").parquet(in)
        b3.coalesce(1).write.mode("append").parquet(in) // replayed delivery
        val sch = s.read.parquet(in).schema
        val src = s.readStream.schema(sch)
          .option("maxFilesPerTrigger", 1).parquet(in)
        val stateA = s"$work/state_a"; val stateB = s"$work/state_b"
        def statePath(gen: Long) = if (gen % 2 == 0) stateA else stateB
        units.limit(0).write.parquet(stateA) // gen-0: empty, right schema
        var gen = 1L
        val q = src.writeStream
          .option("checkpointLocation", s"$work/ckpt")
          .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
            s.read.parquet(statePath(gen - 1)).unionByName(batch.toDF())
              .dropDuplicates("user_id")
              .write.mode("overwrite").parquet(statePath(gen))
            gen += 1
          }
          .start()
        try q.processAllAvailable() finally q.stop()
        require(gen >= 5, s"expected >= 4 micro-batches, got ${gen - 1}")
        cuped(s.read.parquet(statePath(gen - 1)), "variant", "x", "y")
      },
      Some(cupedSql)),

    // ---- q291: POISSON BOOTSTRAP CI — per-event-type mean value with a
    //      40-replicate deterministic resample; the whole resample
    //      replays in SQL (hash uniforms + CDF literals + rank picks). ----
    "q291_bootstrap_ci" -> Q(
      (s, d) => bootstrapCi(
        Tables.events(s, d)
          .select(col("event_type"), col("event_id"),
            round(col("value") * 1000, 0).cast("long").as("v")),
        "event_type", "event_id", "v", reps = 40)
        .withColumnRenamed("grp", "event_type"),
      Some(s"""WITH e AS (SELECT event_type AS grp, event_id AS id,
             |    CAST(round(value * 1000) AS BIGINT) AS v FROM events),
             |pt AS (SELECT grp, count(*) AS n, sum(CAST(v AS HUGEINT)) AS sv
             |  FROM e GROUP BY grp),
             |r AS (SELECT grp, rep, v,
             |    (CAST(((id * 2654435761) + ((rep + 1) * 940572985))
             |        % 2147483648 AS DOUBLE) + 1) / 2147483649.0 AS u
             |  FROM e, unnest(range(0, 40)) AS t(rep)),
             |m AS (SELECT grp, rep,
             |    CAST(sum(CAST(($poissonCaseSql) * v AS HUGEINT)) AS DOUBLE)
             |      / CAST(sum($poissonCaseSql) AS DOUBLE) AS rmean
             |  FROM r GROUP BY grp, rep
             |  HAVING sum($poissonCaseSql) > 0),
             |rk AS (SELECT grp, rmean, row_number() OVER (
             |    PARTITION BY grp ORDER BY rmean, rep) AS rn FROM m)
             |SELECT pt.grp AS event_type, pt.n,
             |  round((CAST(pt.sv AS DOUBLE) / CAST(pt.n AS DOUBLE)) / 1000.0, 6)
             |    AS mean_r6,
             |  round(min(CASE WHEN rk.rn = 1 THEN rk.rmean END) / 1000.0, 6)
             |    AS lo_r6,
             |  round(min(CASE WHEN rk.rn = 39 THEN rk.rmean END) / 1000.0, 6)
             |    AS hi_r6
             |FROM pt JOIN rk ON pt.grp = rk.grp
             |GROUP BY pt.grp, pt.n, pt.sv ORDER BY event_type""".stripMargin)),

    // ---- q307: STREAMING SRM MONITOR — assignments arrive as a file
    //      stream (3 micro-batches, last REPLAYED); each trigger
    //      upserts unit-keyed state (replays idempotent at the unit
    //      key, the q299 rule) and the guardrail reads the cumulative
    //      counts. Final readout = srmCheck over the absorbed state;
    //      oracle = q295's one-shot SQL verbatim. ----
    "q307_srm_stream" -> Q(
      (s, d) => {
        val asg = Tables.events(s, d).select(col("user_id")).distinct()
          .select(col("user_id"),
            pmod(col("user_id"), lit(2L)).cast("string").as("variant"))
          .localCheckpoint()
        val work = java.nio.file.Files.createTempDirectory("graft-q307")
          .toString
        val in = s"$work/in"
        asg.filter(pmod(col("user_id"), lit(3L)) === 0)
          .coalesce(1).write.mode("append").parquet(in)
        asg.filter(pmod(col("user_id"), lit(3L)) === 1)
          .coalesce(1).write.mode("append").parquet(in)
        val b3 = asg.filter(pmod(col("user_id"), lit(3L)) === 2)
        b3.coalesce(1).write.mode("append").parquet(in)
        b3.coalesce(1).write.mode("append").parquet(in) // replayed delivery
        val sch = s.read.parquet(in).schema
        val src = s.readStream.schema(sch)
          .option("maxFilesPerTrigger", 1).parquet(in)
        val stateA = s"$work/state_a"; val stateB = s"$work/state_b"
        def statePath(gen: Long) = if (gen % 2 == 0) stateA else stateB
        asg.limit(0).write.parquet(stateA)
        var gen = 1L
        val q = src.writeStream
          .option("checkpointLocation", s"$work/ckpt")
          .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
            s.read.parquet(statePath(gen - 1)).unionByName(batch.toDF())
              .dropDuplicates("user_id")
              .write.mode("overwrite").parquet(statePath(gen))
            gen += 1
          }
          .start()
        try q.processAllAvailable() finally q.stop()
        require(gen >= 5, s"expected >= 4 micro-batches, got ${gen - 1}")
        srmCheck(s.read.parquet(statePath(gen - 1)), "variant",
          Map("0" -> 450L, "1" -> 550L))
      },
      Some("""WITH a AS (SELECT CAST(user_id % 2 AS VARCHAR) AS variant
             |  FROM (SELECT DISTINCT user_id FROM events)),
             |o AS (SELECT variant, count(*) AS obs FROM a GROUP BY variant),
             |j AS (SELECT CASE v.variant WHEN '0' THEN 450 ELSE 550 END AS w,
             |    coalesce(o.obs, 0) AS obs
             |  FROM (VALUES ('0'), ('1')) AS v(variant)
             |  LEFT JOIN o ON v.variant = o.variant),
             |t AS (SELECT sum(obs) AS n FROM j)
             |SELECT CAST(min(t.n) AS BIGINT) AS n, CAST(2 AS INT) AS k,
             |  round(sum((CAST(1000 * j.obs - t.n * j.w AS DOUBLE)
             |      * CAST(1000 * j.obs - t.n * j.w AS DOUBLE))
             |    / (1000.0 * CAST(t.n * j.w AS DOUBLE))), 6) AS chi2_r6,
             |  CAST(3.841458820694124 AS DOUBLE) AS crit_r6,
             |  sum((CAST(1000 * j.obs - t.n * j.w AS DOUBLE)
             |      * CAST(1000 * j.obs - t.n * j.w AS DOUBLE))
             |    / (1000.0 * CAST(t.n * j.w AS DOUBLE)))
             |    > 3.841458820694124 AS srm
             |FROM j, t""".stripMargin)),

    // ---- q295: SAMPLE-RATIO MISMATCH — user parity split audited
    //      against a deliberately off 450/550 design: the χ² statistic
    //      is tiny at sf0.01 (srm = false) and crosses the 5% critical
    //      value as n grows — the guardrail's scale sensitivity is the
    //      point. ----
    "q295_srm_check" -> Q(
      (s, d) => srmCheck(
        Tables.events(s, d).select(col("user_id")).distinct()
          .select(pmod(col("user_id"), lit(2L)).cast("string").as("variant")),
        "variant", Map("0" -> 450L, "1" -> 550L)),
      Some("""WITH a AS (SELECT CAST(user_id % 2 AS VARCHAR) AS variant
             |  FROM (SELECT DISTINCT user_id FROM events)),
             |o AS (SELECT variant, count(*) AS obs FROM a GROUP BY variant),
             |j AS (SELECT CASE v.variant WHEN '0' THEN 450 ELSE 550 END AS w,
             |    coalesce(o.obs, 0) AS obs
             |  FROM (VALUES ('0'), ('1')) AS v(variant)
             |  LEFT JOIN o ON v.variant = o.variant),
             |t AS (SELECT sum(obs) AS n FROM j)
             |SELECT CAST(min(t.n) AS BIGINT) AS n, CAST(2 AS INT) AS k,
             |  round(sum((CAST(1000 * j.obs - t.n * j.w AS DOUBLE)
             |      * CAST(1000 * j.obs - t.n * j.w AS DOUBLE))
             |    / (1000.0 * CAST(t.n * j.w AS DOUBLE))), 6) AS chi2_r6,
             |  CAST(3.841458820694124 AS DOUBLE) AS crit_r6,
             |  sum((CAST(1000 * j.obs - t.n * j.w AS DOUBLE)
             |      * CAST(1000 * j.obs - t.n * j.w AS DOUBLE))
             |    / (1000.0 * CAST(t.n * j.w AS DOUBLE)))
             |    > 3.841458820694124 AS srm
             |FROM j, t""".stripMargin)),

    // ---- q296: DELTA-METHOD RATIO CI — revenue per purchase by user
    //      parity, per-user (purchase count, purchase milli) moments;
    //      the unit-level CLT a row-level variance would get wrong. ----
    "q296_delta_ratio" -> Q(
      (s, d) => {
        val isP = col("event_type") === "purchase"
        deltaRatioCi(Tables.events(s, d)
          .groupBy(col("user_id"))
          .agg(sum(when(isP, 1L).otherwise(0L)).as("x"),
            sum(when(isP, round(col("value") * 1000, 0).cast("long"))
              .otherwise(0L)).as("y"))
          .withColumn("variant", pmod(col("user_id"), lit(2L))))
      },
      Some("""WITH units AS (SELECT user_id, user_id % 2 AS variant,
             |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS x,
             |    sum(CASE WHEN event_type = 'purchase'
             |      THEN CAST(round(value * 1000) AS BIGINT) ELSE 0 END) AS y
             |  FROM events GROUP BY user_id),
             |mom AS (SELECT variant, count(*) AS n,
             |    CAST(sum(CAST(x AS HUGEINT)) AS DOUBLE) AS sx,
             |    CAST(sum(CAST(y AS HUGEINT)) AS DOUBLE) AS sy,
             |    CAST(sum(CAST(x * y AS HUGEINT)) AS DOUBLE) AS sxy,
             |    CAST(sum(CAST(x * x AS HUGEINT)) AS DOUBLE) AS sx2,
             |    CAST(sum(CAST(y * y AS HUGEINT)) AS DOUBLE) AS sy2
             |  FROM units GROUP BY variant),
             |t AS (SELECT variant, n, sy / sx AS ratio,
             |    sqrt(greatest(
             |      (((sy2 / CAST(n AS DOUBLE))
             |          - ((sy / CAST(n AS DOUBLE)) * (sy / CAST(n AS DOUBLE))))
             |        - ((2.0 * (sy / sx)) * ((sxy / CAST(n AS DOUBLE))
             |          - ((sx / CAST(n AS DOUBLE)) * (sy / CAST(n AS DOUBLE)))))
             |        + (((sy / sx) * (sy / sx)) * ((sx2 / CAST(n AS DOUBLE))
             |          - ((sx / CAST(n AS DOUBLE)) * (sx / CAST(n AS DOUBLE))))))
             |      / (CAST(n AS DOUBLE) * ((sx / CAST(n AS DOUBLE))
             |        * (sx / CAST(n AS DOUBLE)))), 0.0)) AS se
             |  FROM mom)
             |SELECT CAST(variant AS BIGINT) AS variant, n AS n_units,
             |  round(ratio, 6) AS ratio_r6, round(se, 6) AS se_r6,
             |  round(ratio - (1.959963984540054 * se), 6) AS lo_r6,
             |  round(ratio + (1.959963984540054 * se), 6) AS hi_r6
             |FROM t ORDER BY variant""".stripMargin)),

    // ---- q334: GROUP-SEQUENTIAL MONITOR — 3 calendar looks (days
    //      1-10 / 1-20 / full month as cumulative per-user purchase
    //      snapshots over the fixed enrolled population), per-user
    //      purchase milli under the parity A/B split, each look's z
    //      against the published OBF K=3 boundary. ----
    "q334_group_sequential" -> Q(
      (s, d) => {
        import s.implicits._
        val bounds = Seq((1L, "2024-01-11"), (2L, "2024-01-21"),
          (3L, "2024-01-31")).toDF("lk", "cutoff")
        val users = Tables.events(s, d).select(col("user_id")).distinct()
        val pur = Tables.events(s, d)
          .filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"),
            round(col("value") * 1000, 0).cast("long").as("milli"))
        val units = users.crossJoin(broadcast(bounds))
          .join(pur, Seq("user_id"), "left")
          .groupBy(col("user_id"), col("lk"))
          .agg(sum(when(col("ts") < col("cutoff").cast("timestamp"),
            col("milli")).otherwise(0L)).as("y0"))
          .select(col("lk"), coalesce(col("y0"), lit(0L)).as("y"),
            when(col("user_id") % 2 === 0, "A").otherwise("B").as("variant"))
        groupSequential(units, lookCol = "lk")
      },
      Some("""WITH bounds AS (SELECT * FROM (VALUES
             |    (1, TIMESTAMP '2024-01-11 00:00:00'),
             |    (2, TIMESTAMP '2024-01-21 00:00:00'),
             |    (3, TIMESTAMP '2024-01-31 00:00:00')) AS t(lk, cutoff)),
             |us AS (SELECT DISTINCT user_id FROM events),
             |pur AS (SELECT user_id, ts,
             |    CAST(round(value * 1000) AS BIGINT) AS milli
             |  FROM events WHERE event_type = 'purchase'),
             |u AS (SELECT us.user_id, b.lk,
             |    CASE WHEN us.user_id % 2 = 0 THEN 0 ELSE 1 END AS g,
             |    coalesce(sum(CASE WHEN pur.ts < b.cutoff
             |      THEN pur.milli ELSE 0 END), 0) AS yv
             |  FROM us CROSS JOIN bounds b
             |  LEFT JOIN pur ON pur.user_id = us.user_id
             |  GROUP BY us.user_id, b.lk),
             |c AS (SELECT row_number() OVER (ORDER BY lk) AS look,
             |    sum(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS cna,
             |    sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS cnb,
             |    sum(CASE WHEN g = 0 THEN yv ELSE 0 END) AS csa,
             |    sum(CASE WHEN g = 1 THEN yv ELSE 0 END) AS csb,
             |    sum(CASE WHEN g = 0 THEN yv * yv ELSE 0 END) AS cqa,
             |    sum(CASE WHEN g = 1 THEN yv * yv ELSE 0 END) AS cqb
             |  FROM u GROUP BY lk),
             |z AS (SELECT look, cna, cnb,
             |    ((CAST(csb AS DOUBLE) / CAST(cnb AS DOUBLE))
             |      - (CAST(csa AS DOUBLE) / CAST(cna AS DOUBLE)))
             |    / sqrt(
             |      ((CAST(cqa AS DOUBLE) - CAST(cna AS DOUBLE)
             |        * (CAST(csa AS DOUBLE) / CAST(cna AS DOUBLE))
             |        * (CAST(csa AS DOUBLE) / CAST(cna AS DOUBLE)))
             |        / (CAST(cna AS DOUBLE) - 1.0)) / CAST(cna AS DOUBLE)
             |      + ((CAST(cqb AS DOUBLE) - CAST(cnb AS DOUBLE)
             |        * (CAST(csb AS DOUBLE) / CAST(cnb AS DOUBLE))
             |        * (CAST(csb AS DOUBLE) / CAST(cnb AS DOUBLE)))
             |        / (CAST(cnb AS DOUBLE) - 1.0)) / CAST(cnb AS DOUBLE))
             |    AS z
             |  FROM c)
             |SELECT CAST(look AS BIGINT) AS look,
             |  CAST(cna AS BIGINT) AS n_a, CAST(cnb AS BIGINT) AS n_b,
             |  round(z, 6) AS z_r6,
             |  CAST(CASE look WHEN 1 THEN 3.4711 WHEN 2 THEN 2.4544
             |    ELSE 2.0040 END AS DOUBLE) AS boundary,
             |  abs(round(z, 6)) > CAST(CASE look WHEN 1 THEN 3.4711
             |    WHEN 2 THEN 2.4544 ELSE 2.0040 END AS DOUBLE) AS cross
             |FROM z ORDER BY look""".stripMargin)))
}
