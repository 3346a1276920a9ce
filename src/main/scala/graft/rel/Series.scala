package graft.rel

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import scala.collection.immutable.ListMap
import graft.rel.RelQueries.Q

/** TIME-SERIES OPERATORS over keyed ordered rows — the per-entity
  * sequential analytics a monitoring/feature pipeline runs after the
  * relational aggregates: exponential smoothing and robust rolling
  * anomaly detection.
  *
  * The interesting one architecturally is [[ewmaFixedPoint]]: an EWMA
  * is a NON-ASSOCIATIVE recurrence (s_i depends on s_{i-1}), so it
  * cannot be a window aggregate or a tree reduction. The engine's
  * shape for it is repartition-by-key + secondary sort + ONE
  * sequential pass per partition with O(1) state per key — the batch
  * twin of `mapGroupsWithState`. That is exactly one shuffle of the
  * (already aggregated) series rows, no window buffering, no driver
  * involvement; at 100 TB the cost is the same shuffle any groupBy on
  * the key would pay, and state never exceeds one row regardless of
  * series length.
  *
  * All arithmetic is FIXED-POINT INTEGER (the q116 PageRank trick):
  * alpha = num/den applied as `(num*x + (den-num)*s) quot den` with
  * TRUNCATING division, so results are bit-exact across engines and
  * the DuckDB oracle can replay the recurrence with a recursive CTE
  * (DuckDB's `//` truncates toward zero on negatives — probed, NOT
  * floor division; Scala's `/` on longs matches it exactly).
  */
object Series {

  /** Append column `smooth` = fixed-point EWMA of `value` within each
    * `key` group ordered by `ord`: s_1 = x_1, then
    * s_i = (num*x_i + (den-num)*s_{i-1}) quot den (truncating).
    *
    * One shuffle (repartition by key); each partition is scanned once
    * in (key, ord) order with constant state. Keys never straddle
    * partitions, so the recurrence is exact.
    */
  def ewmaFixedPoint(df: DataFrame, key: String, ord: String, value: String,
      num: Long, den: Long): DataFrame = {
    require(den > 0 && num > 0 && num < den,
      s"alpha = num/den must be in (0,1): $num/$den")
    val outSchema = df.schema.add("smooth", LongType, nullable = false)
    val keyIdx = df.schema.fieldIndex(key)
    val valIdx = df.schema.fieldIndex(value)
    df.repartition(col(key)).sortWithinPartitions(col(key), col(ord))
      .mapPartitions { it =>
        var prevKey: Any = null
        var have = false
        var state = 0L
        it.map { r =>
          val k = r.get(keyIdx)
          val x = r.getLong(valIdx)
          // TRUNCATING division (`/`), not floorDiv: DuckDB's `//`
          // truncates toward zero on negatives (probed: (-7)//2 = -3),
          // so floorDiv would silently diverge from the oracle the
          // first time a series goes negative. Identical for the
          // nonnegative common case.
          state =
            if (!have || k != prevKey) x
            else (num * x + (den - num) * state) / den
          have = true
          prevKey = k
          Row.fromSeq(r.toSeq :+ state)
        }
      }(Encoders.row(outSchema))
  }

  /** Append `level`/`trend` = fixed-point Holt double-exponential
    * smoothing of `value` within each `key` group ordered by `ord`:
    * l_1 = x_1, b_1 = 0, then
    *   l_i = (an·x_i + (ad−an)·(l_{i−1}+b_{i−1})) quot ad
    *   b_i = (bn·(l_i−l_{i−1}) + (bd−bn)·b_{i−1}) quot bd
    * with TRUNCATING division (`/` on longs): trend numerators go
    * negative, and DuckDB's `//` truncates toward zero there — the
    * recurrence must use the division both engines share.
    * Same single-shuffle shape as [[ewmaFixedPoint]].
    */
  def holtFixedPoint(df: DataFrame, key: String, ord: String, value: String,
      an: Long, ad: Long, bn: Long, bd: Long): DataFrame = {
    require(ad > 0 && an > 0 && an < ad, s"alpha = an/ad must be in (0,1): $an/$ad")
    require(bd > 0 && bn > 0 && bn < bd, s"beta = bn/bd must be in (0,1): $bn/$bd")
    val outSchema = df.schema
      .add("level", LongType, nullable = false)
      .add("trend", LongType, nullable = false)
    val keyIdx = df.schema.fieldIndex(key)
    val valIdx = df.schema.fieldIndex(value)
    df.repartition(col(key)).sortWithinPartitions(col(key), col(ord))
      .mapPartitions { it =>
        var prevKey: Any = null
        var have = false
        var l = 0L
        var b = 0L
        it.map { r =>
          val k = r.get(keyIdx)
          val x = r.getLong(valIdx)
          if (!have || k != prevKey) { l = x; b = 0L }
          else {
            val lPrev = l
            l = (an * x + (ad - an) * (l + b)) / ad
            b = (bn * (l - lPrev) + (bd - bn) * b) / bd
          }
          have = true
          prevKey = k
          Row.fromSeq(r.toSeq :+ l :+ b)
        }
      }(Encoders.row(outSchema))
  }

  /** Per-lag AUTOCORRELATION FUNCTION (Box & Jenkins 1970, "Time
    * Series Analysis") of ONE integer series keyed by a long time
    * index — the diagnostic a forecasting pipeline reads before
    * choosing its model order (is yesterday predictive? is there a
    * weekly echo at lag 7?).
    *
    *   r_k = Σ_t (x_t − x̄)(x_{t+k} − x̄) / Σ_t (x_t − x̄)²
    *
    * Exactness: both sums are computed on SCALED integer deviations
    * n·x_t − S (the q273 quantization — multiplying through by n
    * clears the mean's division), carried as decimal(38,0) so products
    * near 10²² stay exact; the n² scale factor cancels in the ratio,
    * whose ONE double division is the output. The oracle replays the
    * identical integers in HUGEINT. Zero-variance series → null acf.
    * Pairs are matched by t+k EQUALITY, so a gap in the series drops
    * exactly the same pairs in both engines.
    *
    * Scale shape: the series is an AGGREGATE keyed by calendar time —
    * domain-bounded (the Distribution.scala adjudication), so every
    * join here is on a tiny table and broadcast; the 100 TB cost is
    * the one hash aggregation that produces the series, which the
    * caller owns. The series is localCheckpointed once so the three
    * consumers (mean, denominator, lag pairs) don't re-run that
    * upstream aggregation.
    */
  def acfExact(df: DataFrame, ord: String, value: String,
      maxLag: Int): DataFrame = {
    require(maxLag >= 0, s"acfExact: maxLag must be >= 0: $maxLag")
    acfRaw(df, ord, value, maxLag)
      .select(col("lag"), col("n_pairs"), col("n"),
        round(col("r"), 6).as("acf_r6"))
      .orderBy("lag")
  }

  /** LJUNG–BOX portmanteau test (Ljung & Box 1978, Biometrika) — "is
    * this series white noise?", the one-number readout over the first
    * h autocorrelations:
    *
    *   Q = n(n+2) Σ_{k=1..h} r_k² / (n−k)   ~   χ²_h under H₀.
    *
    * Rides [[acfExact]]'s exact-integer r_k numerators/denominator;
    * each term is one fixed IEEE chain and the sum over k RIDES THE
    * ORDER-PINNED cumulative window over the h-row lag table (the
    * q300 rule). The formula's n−k presumes a REGULAR COMPLETE series
    * — enforced loudly: any lag whose pair count differs from n−k
    * raises rather than returning a silently-miscalibrated statistic.
    * Output one row: (h, n, q_r6, significant) against χ²₀.₀₅(h).
    */
  def ljungBox(df: DataFrame, ord: String, value: String, h: Int): DataFrame = {
    require(h >= 1 && h <= Inference.Chi2Crit05.length,
      s"ljungBox: 1 <= h <= ${Inference.Chi2Crit05.length}: $h")
    val crit = Inference.Chi2Crit05(h - 1)
    val r = acfRaw(df, ord, value, h).filter(col("lag") >= 1)
      .withColumn("ok", when(col("n_pairs") === col("n") - col("lag"),
        lit(1L)).otherwise(raise_error(concat(
          lit("ljungBox: series is not regular/complete at lag "),
          col("lag").cast("string")))))
      // zero-variance series: r is null by acfRaw's guard — Q is
      // undefined; raise rather than emit (h, n, null, null) a caller
      // would misread as a verdict
      .withColumn("r", when(col("r").isNotNull, col("r"))
        .otherwise(raise_error(lit(
          "ljungBox: zero-variance series (Q undefined)"))))
    val nD = col("n").cast("double")
    val term = (col("r") * col("r")) / (nD - col("lag").cast("double"))
    val wCum = Window.orderBy("lag").rowsBetween(Long.MinValue, 0)
    r.withColumn("cum", sum(term * col("ok").cast("double")).over(wCum))
      .agg(max(struct(col("lag"), col("n"), col("cum"))).as("last"))
      // a lag with ZERO pairs (h >= series length) never reaches the
      // n_pairs guard above — it has no row at all. Catch it here: the
      // last surviving lag must be h itself, else Q silently dropped
      // terms.
      .select(when(col("last.lag") === h.toLong, lit(h.toLong))
          .otherwise(raise_error(concat(
            lit(s"ljungBox: series too short for h = $h (last lag with "
              + "pairs: "), col("last.lag").cast("string"), lit(")"))))
          .as("h"),
        col("last.n").as("n"),
        round(col("last.n").cast("double") * (col("last.n").cast("double") + 2.0)
          * col("last.cum"), 6).as("q_r6"))
      .withColumn("significant", col("q_r6") > lit(crit))
  }

  /** The shared ACF core with the UNROUNDED ratio column `r` — the
    * Ljung–Box terms must square the full-precision autocorrelation,
    * not the 6-rounded display value. Zero-variance series → null r
    * (an explicit guard: a double 0/0 would be NaN, not null, and the
    * two engines disagree on NaN rendering).
    */
  private def acfRaw(df: DataFrame, ord: String, value: String,
      maxLag: Int): DataFrame = {
    val ser = df.select(col(ord).cast("long").as("t"),
      col(value).cast("long").as("x")).localCheckpoint(true)
    val tot = ser.agg(count(lit(1)).as("n"),
      sum(col("x").cast("decimal(20,0)")).as("sx"))
    val dev = ser.crossJoin(broadcast(tot))
      .select(col("t"),
        (col("x").cast("decimal(20,0)") * col("n") - col("sx")).as("dev"),
        col("n"))
      .localCheckpoint(true)
    val den = dev.agg(sum(col("dev") * col("dev")).as("den"),
      max(col("n")).as("n"))
    val lags = ser.sparkSession.range(0L, maxLag + 1L)
      .select(col("id").as("lag"))
    val a = dev.select(col("t"), col("dev"))
    val b = dev.select(col("t").as("t2"), col("dev").as("dev2"))
    a.crossJoin(broadcast(lags))
      .join(b, col("t2") === col("t") + col("lag"))
      .groupBy(col("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("dev") * col("dev2")).as("num"))
      .crossJoin(broadcast(den))
      .select(col("lag"), col("n_pairs"), col("n"),
        when(col("den") === 0, lit(null).cast("double"))
          .otherwise(col("num").cast("double") / col("den").cast("double"))
          .as("r"))
  }

  /** THEIL–SEN ROBUST TREND (Theil 1950; Sen 1968) of one integer
    * series — the lower-median of all pairwise slopes, with the
    * Hettmansperger intercept (lower-median residual). Immune to up to
    * ~29% outliers where the q138 OLS line is dragged by one bad day;
    * the natural companion readout to q306's Mann–Kendall trend TEST
    * (MK says WHETHER there is a trend, Theil–Sen says HOW STEEP).
    *
    * Determinism: each slope is ONE IEEE division of exact integer
    * differences; medians are order statistics under the TOTAL order
    * (value, tᵢ, tⱼ) — never interpolated — so both engines pick the
    * identical pair. The pair space is quadratic in the series length,
    * which is calendar-bounded (the Distribution.scala adjudication):
    * the corpus pass is the one aggregation that builds the series.
    * Output one row: (n_points, n_pairs, slope_r6, intercept_r6).
    */
  def theilSen(df: DataFrame, ord: String, value: String): DataFrame = {
    val ser = df.select(col(ord).cast("long").as("t"),
      col(value).cast("long").as("y")).localCheckpoint(true)
    val a = ser.select(col("t").as("ti"), col("y").as("yi"))
    val b = ser.select(col("t").as("tj"), col("y").as("yj"))
    val pairs = a.join(b, col("ti") < col("tj"))
      .select(col("ti"), col("tj"),
        ((col("yj") - col("yi")).cast("double")
          / (col("tj") - col("ti")).cast("double")).as("slope"))
    val wS = Window.orderBy("slope", "ti", "tj")
    val slopeMed = pairs
      .withColumn("rn", row_number().over(wS).cast("long"))
      .withColumn("np", count(lit(1)).over(Window.partitionBy()))
      .filter(col("rn") === expr("(np + 1) div 2"))
      .select(col("slope").as("ts_slope"), col("np"))
    val resid = ser.crossJoin(broadcast(slopeMed))
      .select(col("t"), col("np"), col("ts_slope"),
        (col("y").cast("double") - col("ts_slope") * col("t").cast("double"))
          .as("r"))
    val wR = Window.orderBy("r", "t")
    resid
      .withColumn("rn", row_number().over(wR).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy()))
      .filter(col("rn") === expr("(n + 1) div 2"))
      .select(col("n").as("n_points"), col("np").as("n_pairs"),
        round(col("ts_slope"), 6).as("slope_r6"),
        round(col("r"), 6).as("intercept_r6"))
  }

  /** KENDALL'S τ-b (Kendall 1938; the tie-corrected τ-b of Kendall
    * 1945) between two integer series aligned on a key — the third
    * rung of the correlation family next to Pearson (q308) and
    * Spearman (q309): concordant-minus-discordant pair counts,
    *
    *   τ-b = (C − D) / √((n₀ − n₁)(n₀ − n₂)),
    *   n₀ = n(n−1)/2, n₁ = Σ ties_x, n₂ = Σ ties_y,
    *
    * where EVERYTHING except the final two IEEE steps (one sqrt, one
    * division) is an exact integer: C, D, and the tie terms come from
    * one self-join over the aligned pair space, which is bounded
    * because the series is an AGGREGATE keyed by calendar time (the
    * Distribution.scala adjudication — the same reason q306's
    * Mann–Kendall S, which is exactly C − D against time, is safe).
    * Zero variance on either side → null (0/0 would be NaN and the
    * engines disagree on NaN rendering). Output one row:
    * (n, n_pairs, concordant, discordant, ties_x, ties_y, tau_r6).
    */
  def kendallTau(df: DataFrame, ord: String, x: String, y: String)
      : DataFrame = {
    val ser = df.select(col(ord).cast("long").as("t"),
      col(x).cast("long").as("xv"), col(y).cast("long").as("yv"))
      .localCheckpoint(true)
    val a = ser.select(col("t").as("ti"), col("xv").as("xi"),
      col("yv").as("yi"))
    val b = ser.select(col("t").as("tj"), col("xv").as("xj"),
      col("yv").as("yj"))
    val pairs = a.join(b, col("ti") < col("tj"))
      .select(
        (signum(col("xj") - col("xi")) * signum(col("yj") - col("yi")))
          .cast("long").as("sg"),
        (col("xi") === col("xj")).cast("long").as("tx"),
        (col("yi") === col("yj")).cast("long").as("ty"))
    pairs.agg(count(lit(1)).as("n_pairs"),
        sum(when(col("sg") === 1L, 1L).otherwise(0L)).as("concordant"),
        sum(when(col("sg") === -1L, 1L).otherwise(0L)).as("discordant"),
        sum(col("tx")).as("ties_x"), sum(col("ty")).as("ties_y"))
      .crossJoin(broadcast(ser.agg(count(lit(1)).as("n"))))
      .select(col("n"), col("n_pairs"), col("concordant"),
        col("discordant"), col("ties_x"), col("ties_y"),
        when(col("n_pairs") === col("ties_x")
            || col("n_pairs") === col("ties_y"),
          lit(null).cast("double"))
          .otherwise(round(
            (col("concordant") - col("discordant")).cast("double")
              / sqrt((col("n_pairs") - col("ties_x")).cast("double")
                * (col("n_pairs") - col("ties_y")).cast("double")), 6))
          .as("tau_r6"))
  }

  /** Daily value totals per user in integer cents — the shared series
    * both entries smooth/score. Exact: per-event round to cents, then
    * integer sums.
    */
  private def dailyCents(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("user_id"), to_date(date_trunc("DAY", col("ts"))).as("day"))
      .agg(sum(round(col("value") * 100, 0).cast("long")).as("daily_cents"))

  private val dailySql =
    """daily AS (
      |  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
      |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS daily_cents
      |  FROM events GROUP BY 1, 2)""".stripMargin

  /** Global (all-user) daily revenue in integer cents keyed by epoch
    * day — the single regular series the ACF/Ljung–Box entries read.
    */
  private def globalDailyCents(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(to_date(date_trunc("DAY", col("ts"))).as("day"))
      .agg(sum(round(col("value") * 100, 0).cast("long")).as("cents"))
      .select(unix_date(col("day")).cast("long").as("t"), col("cents"))

  private val globalDailySql =
    """g AS (
      |  SELECT CAST(CAST(date_trunc('day', ts) AS DATE)
      |      - DATE '1970-01-01' AS BIGINT) AS t,
      |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS HUGEINT) AS x
      |  FROM events GROUP BY 1)""".stripMargin

  /** Trailing-window LOWER MEDIAN (exact, integer): sort the window's
    * values and take element (n+1) div 2 (1-based) — no interpolation,
    * so the result stays integral and cross-engine exact.
    */
  private def lowerMedian(arr: Column): Column =
    element_at(array_sort(arr), ((size(arr) + 1) / 2).cast("int"))

  /** LEAST-SQUARES SINGLE CHANGEPOINT (the binary-segmentation step,
    * Scott & Knott 1974): the split of an ordered series minimizing
    * SSE_left + SSE_right — the mean-shift detector that reports the
    * WHERE and the BOTH-SIDE means, where the q166 CUSUM reports the
    * whether. gain = SSE_total − min split SSE; every SSE comes from
    * exact cumulative (n, Σy, Σy²) integers over the ORDER-PINNED
    * series window (distinct ordinates only — the calendar-granular
    * domain-bounded frame), one fixed IEEE chain per candidate,
    * rounded to 6 BEFORE the argmax, ties to the SMALLEST ordinate
    * (the q361 contract). Duplicate ordinates raise loudly (aggregate
    * the series first).
    *
    * Output (1 row): (split_ord, n_left, n_right, mean_left_r6,
    * mean_right_r6, gain_r6) — the split is the LAST ordinate of the
    * left segment.
    */
  def changepointSse(df: DataFrame, ord: String = "o",
      value: String = "y"): DataFrame = {
    val dec38 = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
    val base0 = df.select(col(ord).cast("long").as("o"),
      col(value).cast("long").as("yv"))
    val base = base0.groupBy("o")
      .agg(count(lit(1)).as("c"), max(col("yv")).as("yv"))
      .select(
        when(col("c") > 1L, raise_error(concat(
          lit("changepointSse: duplicate ordinate "), col("o").cast("string"),
          lit(" — aggregate the series first")))).otherwise(col("o")).as("o"),
        col("yv"))
    val wCum = Window.orderBy("o").rowsBetween(Long.MinValue, 0)
    val wAll = Window.partitionBy()
    val cand = base
      .withColumn("nl", count(lit(1)).over(wCum))
      .withColumn("syl", sum(col("yv")).over(wCum))
      .withColumn("syyl", sum((col("yv") * col("yv")).cast(dec38)).over(wCum))
      .withColumn("nt", count(lit(1)).over(wAll))
      .withColumn("syt", sum(col("yv")).over(wAll))
      .withColumn("syyt", sum((col("yv") * col("yv")).cast(dec38)).over(wAll))
      .filter(col("nl") < col("nt"))
    def d(c: Column): Column = c.cast("double")
    val sseL = d(col("syyl")) - d(col("syl")) * d(col("syl")) / d(col("nl"))
    val sseR = (d(col("syyt")) - d(col("syyl"))) -
      (d(col("syt")) - d(col("syl"))) * (d(col("syt")) - d(col("syl"))) /
        (d(col("nt")) - d(col("nl")))
    val sseT = d(col("syyt")) - d(col("syt")) * d(col("syt")) / d(col("nt"))
    cand
      .withColumn("gain_r6", round(sseT - sseL - sseR, 6))
      .agg(max(struct(col("gain_r6"), (-col("o")).as("nego"), col("o"),
        col("nl"), col("syl"), col("nt"), col("syt"))).as("z"))
      .select(col("z.o").as("split_ord"),
        col("z.nl").as("n_left"), (col("z.nt") - col("z.nl")).as("n_right"),
        round(col("z.syl").cast("double") / col("z.nl").cast("double"), 6)
          .as("mean_left_r6"),
        round((col("z.syt") - col("z.syl")).cast("double")
          / (col("z.nt") - col("z.nl")).cast("double"), 6)
          .as("mean_right_r6"),
        col("z.gain_r6").as("gain_r6"))
  }

  val all: ListMap[String, Q] = ListMap(
    // ---- q368: best mean-shift changepoint of the daily purchase-
    //      revenue series — the oracle replays the cumulative moments,
    //      every candidate's SSE chain, and the (gain desc, day asc)
    //      argmax. ----
    "q368_changepoint" -> Q(
      (s, d) => changepointSse(
        Tables.events(s, d)
          .filter(col("event_type") === "purchase")
          .groupBy(datediff(to_date(col("ts")),
            lit("2024-01-01").cast("date")).cast("long").as("o"))
          .agg(sum(round(col("value") * 100, 0).cast("long")).as("y"))),
      Some("""WITH sr AS (SELECT
             |    CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
             |      AS BIGINT) AS o,
             |    sum(CAST(round(value * 100) AS BIGINT)) AS yv
             |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
             |cw AS (SELECT o, yv,
             |    count(*) OVER w AS nl, sum(yv) OVER w AS syl,
             |    sum(CAST(yv AS HUGEINT) * yv) OVER w AS syyl,
             |    count(*) OVER () AS nt, sum(yv) OVER () AS syt,
             |    sum(CAST(yv AS HUGEINT) * yv) OVER () AS syyt
             |  FROM sr
             |  WINDOW w AS (ORDER BY o ROWS BETWEEN UNBOUNDED PRECEDING
             |    AND CURRENT ROW)),
             |g AS (SELECT o, nl, syl, nt, syt,
             |    round(
             |      (CAST(syyt AS DOUBLE) - CAST(syt AS DOUBLE)
             |        * CAST(syt AS DOUBLE) / CAST(nt AS DOUBLE))
             |      - (CAST(syyl AS DOUBLE) - CAST(syl AS DOUBLE)
             |        * CAST(syl AS DOUBLE) / CAST(nl AS DOUBLE))
             |      - ((CAST(syyt AS DOUBLE) - CAST(syyl AS DOUBLE))
             |        - (CAST(syt AS DOUBLE) - CAST(syl AS DOUBLE))
             |          * (CAST(syt AS DOUBLE) - CAST(syl AS DOUBLE))
             |          / (CAST(nt AS DOUBLE) - CAST(nl AS DOUBLE))), 6)
             |      AS gain_r6
             |  FROM cw WHERE nl < nt),
             |r AS (SELECT *, row_number() OVER
             |    (ORDER BY gain_r6 DESC, o) AS rn FROM g)
             |SELECT o AS split_ord, CAST(nl AS BIGINT) AS n_left,
             |  CAST(nt - nl AS BIGINT) AS n_right,
             |  round(CAST(syl AS DOUBLE) / CAST(nl AS DOUBLE), 6)
             |    AS mean_left_r6,
             |  round(CAST(syt - syl AS DOUBLE) / CAST(nt - nl AS DOUBLE), 6)
             |    AS mean_right_r6,
             |  gain_r6
             |FROM r WHERE rn = 1""".stripMargin)),

    // ----------------------------------------------------------------
    // q124: per-user EWMA of daily spend. alpha = 1/4:
    // s_i = (x_i + 3 s_{i-1}) div 4. The oracle replays the recurrence
    // as a recursive CTE joined on row_number (depth = series length,
    // max 30 days in the fixture).
    "q124_ewma_smooth" -> Q(
      (s, d) => {
        ewmaFixedPoint(dailyCents(s, d), "user_id", "day", "daily_cents",
            num = 1, den = 4)
          .withColumnRenamed("smooth", "smooth_cents")
          .orderBy("user_id", "day")
      },
      Some(s"""WITH RECURSIVE $dailySql,
         |base AS (SELECT user_id, day, daily_cents,
         |    row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn
         |  FROM daily),
         |r AS (
         |  SELECT user_id, day, rn, daily_cents, daily_cents AS smooth_cents
         |  FROM base WHERE rn = 1
         |  UNION ALL
         |  SELECT b.user_id, b.day, b.rn, b.daily_cents,
         |    (b.daily_cents + 3 * r.smooth_cents) // 4
         |  FROM r JOIN base b ON b.user_id = r.user_id AND b.rn = r.rn + 1)
         |SELECT user_id, day, daily_cents, smooth_cents
         |FROM r ORDER BY user_id, day""".stripMargin)),

    // ----------------------------------------------------------------
    // q125: robust rolling anomaly flags — 7-day trailing lower-median
    // and MAD (median absolute deviation), flag when the day's value
    // sits >= 5 MAD+1 units off the median. Integer throughout; the
    // window is a ROWS frame so the oracle's list()-window replays it
    // exactly. The +1 on MAD avoids the zero-MAD degenerate flag.
    "q125_rolling_anomaly" -> Q(
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("day").rowsBetween(-6, 0)
        val withArr = dailyCents(s, d).withColumn("arr",
          collect_list(col("daily_cents")).over(w))
        withArr
          .withColumn("med7", lowerMedian(col("arr")))
          .withColumn("mad7", lowerMedian(
            transform(col("arr"), e => abs(e - col("med7")))))
          .withColumn("anom",
            when(abs(col("daily_cents") - col("med7")) >= lit(5L) * (col("mad7") + 1L),
              1L).otherwise(0L))
          .select("user_id", "day", "daily_cents", "med7", "mad7", "anom")
          .orderBy("user_id", "day")
      },
      Some(s"""WITH $dailySql,
         |w1 AS (SELECT user_id, day, daily_cents,
         |    list(daily_cents) OVER (PARTITION BY user_id ORDER BY day
         |      ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS arr
         |  FROM daily),
         |m AS (SELECT user_id, day, daily_cents, arr,
         |    list_sort(arr)[(len(arr) + 1) // 2] AS med7 FROM w1),
         |f AS (SELECT user_id, day, daily_cents, med7,
         |    list_sort(list_transform(arr, e -> abs(e - med7)))
         |      [(len(arr) + 1) // 2] AS mad7 FROM m)
         |SELECT user_id, day, daily_cents, med7, mad7,
         |  CAST(CASE WHEN abs(daily_cents - med7) >= 5 * (mad7 + 1)
         |    THEN 1 ELSE 0 END AS BIGINT) AS anom
         |FROM f ORDER BY user_id, day""".stripMargin)),

    // ---- q148: PER-KEY RANK NORMALIZATION — map each value to its
    //      within-group percentile rank in exact integer milli-units
    //      ((rank−1)·1000 div (n−1)); the distribution-free feature
    //      scaling a training pipeline applies before mixing
    //      heterogeneous signals. (value, event_id) is a total order,
    //      so ranks are deterministic; groups of one row pin to 0.
    //      One window shuffle keyed by the group — the q120 shape. ----
    "q148_rank_normalize" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("event_type"))
          .orderBy(col("cents"), col("event_id"))
        Tables.events(s, d)
          .select(col("event_id"), col("event_type"),
            round(col("value") * 100, 0).cast("long").as("cents"))
          .withColumn("rk", row_number().over(w).cast("long"))
          .withColumn("n", count(lit(1)).over(Window.partitionBy(col("event_type"))))
          .select(col("event_id"), col("event_type"), col("cents"),
            when(col("n") === 1, lit(0L))
              .otherwise(expr("((rk - 1) * 1000) div (n - 1)")).as("rank_milli"))
          .orderBy("event_type", "cents", "event_id")
          .limit(500)
      },
      Some("""WITH e AS (SELECT event_id, event_type,
             |    CAST(round(value * 100) AS BIGINT) AS cents FROM events),
             |r AS (SELECT event_id, event_type, cents,
             |    CAST(row_number() OVER (PARTITION BY event_type
             |      ORDER BY cents, event_id) AS BIGINT) AS rk,
             |    count(*) OVER (PARTITION BY event_type) AS n
             |  FROM e)
             |SELECT event_id, event_type, cents,
             |  CAST(CASE WHEN n = 1 THEN 0
             |    ELSE ((rk - 1) * 1000) // (n - 1) END AS BIGINT) AS rank_milli
             |FROM r ORDER BY event_type, cents, event_id LIMIT 500""".stripMargin)),

    // ---- q149: WINSORIZED MEAN per key — clamp each value to the
    //      group's p05/p95 RANK values before averaging (the outlier-
    //      robust mean feature stores actually use; a plain mean lets
    //      one fat-finger row poison a feature). Bounds are order
    //      statistics at exact integer rank indices ((q·(n−1)) div 100
    //      + 1 in rank space), clamping is integer, and the mean is an
    //      exact-cents sum over count — the one division is the
    //      output. Two windows over one group-keyed shuffle. ----
    "q149_winsorized_mean" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("event_type"))
          .orderBy(col("cents"), col("event_id"))
        val wg = Window.partitionBy(col("event_type"))
        Tables.events(s, d)
          .select(col("event_id"), col("event_type"),
            round(col("value") * 100, 0).cast("long").as("cents"))
          .withColumn("rk", row_number().over(w).cast("long"))
          .withColumn("n", count(lit(1)).over(wg))
          .withColumn("lo", max(when(col("rk") === expr("(5 * (n - 1)) div 100 + 1"),
            col("cents"))).over(wg))
          .withColumn("hi", max(when(col("rk") === expr("(95 * (n - 1)) div 100 + 1"),
            col("cents"))).over(wg))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), max("lo").as("lo_cents"), max("hi").as("hi_cents"),
            sum(least(greatest(col("cents"), col("lo")), col("hi"))).as("wsum"))
          .select(col("event_type"), col("n"), col("lo_cents"), col("hi_cents"),
            round(col("wsum").cast("double") / col("n").cast("double"), 6)
              .as("wmean_cents_r6"))
          .orderBy("event_type")
      },
      Some("""WITH e AS (SELECT event_id, event_type,
             |    CAST(round(value * 100) AS BIGINT) AS cents FROM events),
             |r AS (SELECT event_type, cents,
             |    CAST(row_number() OVER (PARTITION BY event_type
             |      ORDER BY cents, event_id) AS BIGINT) AS rk,
             |    count(*) OVER (PARTITION BY event_type) AS n
             |  FROM e),
             |b AS (SELECT event_type, max(n) AS n,
             |    max(CASE WHEN rk = (5 * (n - 1)) // 100 + 1 THEN cents END) AS lo,
             |    max(CASE WHEN rk = (95 * (n - 1)) // 100 + 1 THEN cents END) AS hi
             |  FROM r GROUP BY event_type)
             |SELECT r.event_type, CAST(max(b.n) AS BIGINT) AS n,
             |  CAST(max(b.lo) AS BIGINT) AS lo_cents,
             |  CAST(max(b.hi) AS BIGINT) AS hi_cents,
             |  round(CAST(sum(least(greatest(r.cents, b.lo), b.hi)) AS DOUBLE)
             |    / CAST(max(b.n) AS DOUBLE), 6) AS wmean_cents_r6
             |FROM r JOIN b USING (event_type)
             |GROUP BY r.event_type ORDER BY r.event_type""".stripMargin)),

    // ---- q161: REGULAR-GRID RESAMPLE WITH FORWARD FILL — each user's
    //      irregular daily series stretched onto the dense day grid
    //      between their first and last observation, gaps carrying the
    //      last observed value (the join-ready shape time-series
    //      feature pipelines need before lags/windows make sense).
    //      Declarative throughout: sequence+explode builds the grid,
    //      last(ignoreNulls) over a rows frame fills it; one user-keyed
    //      shuffle. Grid size is calendar-bounded per user. The oracle
    //      fills via the count-partition trick (no IGNORE NULLS needed). ----
    "q161_resample_ffill" -> Q(
      (s, d) => {
        val daily = dailyCents(s, d)
          .withColumn("di", unix_date(col("day")).cast("long"))
        val grid = daily.groupBy("user_id")
          .agg(min("di").as("d0"), max("di").as("d1"))
          .select(col("user_id"), explode(sequence(col("d0"), col("d1"))).as("di"))
        val w = Window.partitionBy("user_id").orderBy("di")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        grid.join(daily.select(col("user_id"), col("di"), col("daily_cents")),
            Seq("user_id", "di"), "left")
          .withColumn("cents_filled",
            last(col("daily_cents"), ignoreNulls = true).over(w))
          .withColumn("filled", col("daily_cents").isNull)
          .select(col("user_id"), col("di").as("day_idx"), col("cents_filled"),
            col("filled"))
          .orderBy("user_id", "day_idx")
      },
      Some(s"""WITH $dailySql,
         |d2 AS (SELECT user_id, CAST(day - DATE '1970-01-01' AS BIGINT) AS di,
         |    daily_cents FROM daily),
         |b AS (SELECT user_id, min(di) AS d0, max(di) AS d1 FROM d2 GROUP BY 1),
         |grid AS (SELECT user_id, unnest(generate_series(d0, d1)) AS di FROM b),
         |j AS (SELECT g.user_id, g.di, d2.daily_cents
         |  FROM grid g LEFT JOIN d2 USING (user_id, di)),
         |f AS (SELECT *, count(daily_cents) OVER (PARTITION BY user_id
         |    ORDER BY di ROWS UNBOUNDED PRECEDING) AS grp FROM j)
         |SELECT user_id, di AS day_idx,
         |  max(daily_cents) OVER (PARTITION BY user_id, grp) AS cents_filled,
         |  daily_cents IS NULL AS filled
         |FROM f ORDER BY user_id, day_idx""".stripMargin)),

    // ---- q162: HOLT DOUBLE-EXPONENTIAL SMOOTHING — level + trend
    //      state per user (the forecasting upgrade of q124's EWMA;
    //      a trend term is what EWMA structurally cannot track). Same
    //      engine shape: repartition-by-key + secondary sort + one
    //      sequential pass with O(1) state. Fixed-point α=1/2, β=1/5
    //      with TRUNCATING long division (Scala `/`), because trend
    //      numerators go negative and DuckDB's `//` truncates toward
    //      zero there — floorDiv would silently diverge on declining
    //      series (probed: (-7)//2 = -3 in DuckDB). ----
    "q162_holt_trend" -> Q(
      (s, d) =>
        holtFixedPoint(dailyCents(s, d), "user_id", "day", "daily_cents",
            an = 1, ad = 2, bn = 1, bd = 5)
          .orderBy("user_id", "day"),
      Some(s"""WITH RECURSIVE $dailySql,
         |base AS (SELECT user_id, day, daily_cents,
         |    row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn
         |  FROM daily),
         |r AS (
         |  SELECT user_id, day, rn, daily_cents,
         |    daily_cents AS level, CAST(0 AS BIGINT) AS trend
         |  FROM base WHERE rn = 1
         |  UNION ALL
         |  SELECT b.user_id, b.day, b.rn, b.daily_cents,
         |    (b.daily_cents + (r.level + r.trend)) // 2,
         |    (((b.daily_cents + (r.level + r.trend)) // 2 - r.level)
         |      + 4 * r.trend) // 5
         |  FROM r JOIN base b ON b.user_id = r.user_id AND b.rn = r.rn + 1)
         |SELECT user_id, day, daily_cents, level, trend
         |FROM r ORDER BY user_id, day""".stripMargin)),

    // ---- q319: AUTOCORRELATION FUNCTION of the global daily-revenue
    //      series at lags 0..10 — the model-order diagnostic (lag-0
    //      pins 1.0 as the sanity anchor). Scaled-integer deviations
    //      n·x−S in decimal(38,0) / HUGEINT; the one double division
    //      per lag is the output. The series is calendar-bounded (30
    //      rows); the 100 TB cost is the one events aggregation. ----
    "q319_acf" -> Q(
      (s, d) => acfExact(globalDailyCents(s, d), "t", "cents", maxLag = 10),
      Some(s"""WITH $globalDailySql,
         |tot AS (SELECT count(*) AS n, sum(x) AS sx FROM g),
         |dv AS (SELECT t, CAST(tot.n AS HUGEINT) * x - tot.sx AS dev,
         |    tot.n AS n FROM g, tot),
         |den AS (SELECT sum(dev * dev) AS den, max(n) AS n FROM dv),
         |lags AS (SELECT CAST(unnest(generate_series(0, 10)) AS BIGINT) AS lag),
         |p AS (SELECT l.lag, count(*) AS n_pairs, sum(a.dev * b.dev) AS num
         |  FROM dv a CROSS JOIN lags l JOIN dv b ON b.t = a.t + l.lag
         |  GROUP BY l.lag)
         |SELECT p.lag AS lag, CAST(p.n_pairs AS BIGINT) AS n_pairs,
         |  CAST(den.n AS BIGINT) AS n,
         |  CASE WHEN den.den = 0 THEN NULL
         |    ELSE round(CAST(p.num AS DOUBLE) / CAST(den.den AS DOUBLE), 6)
         |  END AS acf_r6
         |FROM p, den ORDER BY lag""".stripMargin)),

    // ---- q320: LJUNG-BOX white-noise test at h=10 over the same
    //      series — per-lag terms off the identical exact integers,
    //      the lag sum order-pinned (the q300 rule), χ²₀.₀₅(10)
    //      literal. The n−k calibration is guarded: a gappy series
    //      raises loudly instead of mis-stating Q. ----
    "q320_ljung_box" -> Q(
      (s, d) => ljungBox(globalDailyCents(s, d), "t", "cents", h = 10),
      Some(s"""WITH $globalDailySql,
         |tot AS (SELECT count(*) AS n, sum(x) AS sx FROM g),
         |dv AS (SELECT t, CAST(tot.n AS HUGEINT) * x - tot.sx AS dev,
         |    tot.n AS n FROM g, tot),
         |den AS (SELECT sum(dev * dev) AS den, max(n) AS n FROM dv),
         |lags AS (SELECT CAST(unnest(generate_series(1, 10)) AS BIGINT) AS lag),
         |p AS (SELECT l.lag, sum(a.dev * b.dev) AS num
         |  FROM dv a CROSS JOIN lags l JOIN dv b ON b.t = a.t + l.lag
         |  GROUP BY l.lag),
         |r AS (SELECT p.lag, den.n,
         |    CAST(p.num AS DOUBLE) / CAST(den.den AS DOUBLE) AS r
         |  FROM p, den),
         |c AS (SELECT lag, n, sum((r * r)
         |      / (CAST(n AS DOUBLE) - CAST(lag AS DOUBLE)))
         |    OVER (ORDER BY lag ROWS BETWEEN UNBOUNDED PRECEDING
         |      AND CURRENT ROW) AS cum
         |  FROM r)
         |SELECT CAST(10 AS BIGINT) AS h, CAST(n AS BIGINT) AS n,
         |  round(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 2.0) * cum, 6)
         |    AS q_r6,
         |  round(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 2.0) * cum, 6)
         |    > 18.307038053275146 AS significant
         |FROM c WHERE lag = 10""".stripMargin)),

    // ---- q327: THEIL-SEN robust trend of the global daily-revenue
    //      series — the outlier-immune slope next to q138's OLS and
    //      q306's Mann-Kendall test; lower-median order statistics
    //      under the (value, ti, tj) total order, never interpolated. ----
    "q327_theil_sen" -> Q(
      (s, d) => theilSen(globalDailyCents(s, d), "t", "cents"),
      Some(s"""WITH $globalDailySql,
         |g2 AS (SELECT t, CAST(x AS BIGINT) AS y FROM g),
         |p AS (SELECT a.t AS ti, b.t AS tj,
         |    CAST(b.y - a.y AS DOUBLE) / CAST(b.t - a.t AS DOUBLE) AS slope
         |  FROM g2 a JOIN g2 b ON a.t < b.t),
         |pr AS (SELECT slope,
         |    row_number() OVER (ORDER BY slope, ti, tj) AS rn,
         |    count(*) OVER () AS np
         |  FROM p),
         |sm AS (SELECT slope AS ts_slope, np FROM pr WHERE rn = (np + 1) // 2),
         |r0 AS (SELECT g2.t, sm.np, sm.ts_slope,
         |    CAST(g2.y AS DOUBLE) - sm.ts_slope * CAST(g2.t AS DOUBLE) AS r
         |  FROM g2, sm),
         |rr AS (SELECT t, np, ts_slope, r,
         |    row_number() OVER (ORDER BY r, t) AS rn,
         |    count(*) OVER () AS n
         |  FROM r0)
         |SELECT CAST(n AS BIGINT) AS n_points, CAST(np AS BIGINT) AS n_pairs,
         |  round(ts_slope, 6) AS slope_r6, round(r, 6) AS intercept_r6
         |FROM rr WHERE rn = (n + 1) // 2""".stripMargin)),

    // ---- q340: KENDALL τ-b between daily revenue and daily event
    //      volume — the rank-concordance rung beside q308 Pearson /
    //      q309 Spearman; exact C/D/tie integers off the calendar-
    //      bounded pair space, two IEEE steps at the edge. ----
    "q340_kendall_tau" -> Q(
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(to_date(date_trunc("DAY", col("ts"))).as("day"))
          .agg(sum(round(col("value") * 100, 0).cast("long")).as("cents"),
            count(lit(1)).as("n_ev"))
          .select(unix_date(col("day")).cast("long").as("t"),
            col("cents"), col("n_ev"))
        kendallTau(daily, "t", "cents", "n_ev")
      },
      Some("""WITH g AS (
             |  SELECT CAST(CAST(date_trunc('day', ts) AS DATE)
             |      - DATE '1970-01-01' AS BIGINT) AS t,
             |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
             |      AS xv,
             |    count(*) AS yv
             |  FROM events GROUP BY 1),
             |p AS (SELECT
             |    CAST(sign(b.xv - a.xv) * sign(b.yv - a.yv) AS BIGINT) AS sg,
             |    CAST(a.xv = b.xv AS BIGINT) AS tx,
             |    CAST(a.yv = b.yv AS BIGINT) AS ty
             |  FROM g a JOIN g b ON a.t < b.t),
             |c AS (SELECT count(*) AS n_pairs,
             |    sum(CASE WHEN sg = 1 THEN 1 ELSE 0 END) AS concordant,
             |    sum(CASE WHEN sg = -1 THEN 1 ELSE 0 END) AS discordant,
             |    sum(tx) AS ties_x, sum(ty) AS ties_y
             |  FROM p),
             |n0 AS (SELECT count(*) AS n FROM g)
             |SELECT n0.n, CAST(c.n_pairs AS BIGINT) AS n_pairs,
             |  CAST(c.concordant AS BIGINT) AS concordant,
             |  CAST(c.discordant AS BIGINT) AS discordant,
             |  CAST(c.ties_x AS BIGINT) AS ties_x,
             |  CAST(c.ties_y AS BIGINT) AS ties_y,
             |  CASE WHEN c.n_pairs = c.ties_x OR c.n_pairs = c.ties_y
             |    THEN NULL
             |    ELSE round(CAST(c.concordant - c.discordant AS DOUBLE)
             |      / sqrt(CAST(c.n_pairs - c.ties_x AS DOUBLE)
             |        * CAST(c.n_pairs - c.ties_y AS DOUBLE)), 6)
             |  END AS tau_r6
             |FROM c, n0""".stripMargin)),
  )
}
