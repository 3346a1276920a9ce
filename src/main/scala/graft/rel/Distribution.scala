package graft.rel

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import scala.collection.immutable.ListMap
import graft.rel.RelQueries.Q
import graft.rel.Tables

/** DISTRIBUTION DIAGNOSTICS — the shape-of-the-data tier: digit-law
  * conformance (fraud screening), a nonparametric two-sample test,
  * exact higher moments, and a mergeable power-of-two histogram.
  *
  * Exactness discipline (the q138/q142/q207 house rule): every
  * aggregate that can be exact integer arithmetic IS (counts, cents,
  * rank sums in doubled units, central-moment numerators in
  * DECIMAL(38,0) ≡ DuckDB HUGEINT — exact in both engines, so
  * accumulation order is irrelevant); each floating tail is one fixed,
  * explicitly parenthesized chain of IEEE ops both engines evaluate
  * identically, rounded to 6.
  */
object Distribution {

  private val dec = DecimalType(38, 0)

  /** MANN-KENDALL TREND TEST over (grp, x, y) integer series rows
    * (Mann 1945; tie-corrected variance per Kendall): S, the exact
    * 18·Var(S) numerator, and the continuity-corrected Z per group.
    * Var = 0 (constant series) gives Z = 0 by convention. Pair space
    * is C(series length, 2) per group — bounded by the series, never
    * the data (the q215 rule). Output: (grp, n_days, s_stat, var18,
    * z_r6, significant).
    */
  def mannKendall(daily0: DataFrame): DataFrame = {
    val daily = daily0.select(col("grp"), col("x").cast("long").as("x"),
      col("y").cast("long").as("y")).localCheckpoint()
    val a = daily.select(col("grp"), col("x").as("xa"), col("y").as("ya"))
    val b = daily.select(col("grp").as("g2"), col("x").as("xb"),
      col("y").as("yb"))
    val sTab = a.join(b, col("grp") === col("g2") && col("xa") < col("xb"))
      .groupBy("grp")
      .agg(sum(when(col("yb") > col("ya"), 1L)
        .when(col("yb") < col("ya"), -1L).otherwise(0L)).as("s_stat"))
    val ties = daily.groupBy(col("grp"), col("y"))
      .agg(count(lit(1)).as("t"))
      .groupBy("grp")
      .agg(sum(col("t")).as("n_days"),
        sum(col("t") * (col("t") - 1) * (lit(2L) * col("t") + 5))
          .as("tie_corr"))
    val nD = col("n_days")
    val var18 = (nD * (nD - 1) * (lit(2L) * nD + 5)) - col("tie_corr")
    val sD = col("s_stat").cast("double")
    val sdv = sqrt(col("var18").cast("double") / lit(18.0))
    val z = when(col("var18") === 0L, lit(0.0))
      .otherwise(when(col("s_stat") > 0, (sD - 1.0) / sdv)
        .when(col("s_stat") < 0, (sD + 1.0) / sdv)
        .otherwise(lit(0.0)))
    sTab.join(ties, "grp")
      .withColumn("var18", var18)
      .select(col("grp"), col("n_days"), col("s_stat"), col("var18"),
        round(z, 6).as("z_r6"))
      .withColumn("significant", abs(col("z_r6")) > lit(1.959963984540054))
      .orderBy("grp")
  }

  val all: ListMap[String, Q] = ListMap(
    // ---- q209: BENFORD FIRST-DIGIT SCREEN — the classic fabricated-
    //      numbers diagnostic: the leading digit of naturally occurring
    //      amounts follows log10(1+1/d), so a ledger whose digit
    //      histogram strays is flagged for audit. Exact: digits from
    //      the decimal string of integer cents, counts and the observed
    //      permille's single division; expected permille pinned as the
    //      standard literal table (301...46) on BOTH sides, so no
    //      cross-libm log10 enters the compare. Scale: one narrow map
    //      + a 9-row agg; the window runs on the 9-row digit table. ----
    "q209_benford" -> Q(
      (s, d) => {
        val digits = Tables.orders(s, d)
          .select(round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
          .filter(col("cents") > 0)
          .select(substring(col("cents").cast("string"), 1, 1).cast("long").as("digit"))
          .groupBy("digit").agg(count(lit(1)).as("n_orders"))
        val expected = typedLit(Map(
          1L -> 301L, 2L -> 176L, 3L -> 125L, 4L -> 97L, 5L -> 79L,
          6L -> 67L, 7L -> 58L, 8L -> 51L, 9L -> 46L))
        digits
          .withColumn("total", sum("n_orders").over(Window.partitionBy()))
          .withColumn("obs_permille_r6",
            round(lit(1000.0) * col("n_orders").cast("double")
              / col("total").cast("double"), 6))
          .withColumn("exp_permille", expected(col("digit")))
          .select("digit", "n_orders", "obs_permille_r6", "exp_permille")
          .orderBy("digit")
      },
      Some("""WITH c AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents
             |  FROM orders),
             |dg AS (SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT) AS digit,
             |    count(*) AS n_orders
             |  FROM c WHERE cents > 0 GROUP BY 1)
             |SELECT digit, n_orders,
             |  round(1000.0 * CAST(n_orders AS DOUBLE)
             |    / CAST(sum(n_orders) OVER () AS DOUBLE), 6) AS obs_permille_r6,
             |  CAST(CASE digit WHEN 1 THEN 301 WHEN 2 THEN 176 WHEN 3 THEN 125
             |    WHEN 4 THEN 97 WHEN 5 THEN 79 WHEN 6 THEN 67 WHEN 7 THEN 58
             |    WHEN 8 THEN 51 WHEN 9 THEN 46 END AS BIGINT) AS exp_permille
             |FROM dg ORDER BY digit""".stripMargin)),

    // ---- q210: MANN-WHITNEY RANK-SUM U — the nonparametric two-sample
    //      test (complements the q155 chi-square gate): do AUTOMOBILE
    //      and BUILDING customers' order values come from the same
    //      distribution? U counts cross-pairs where one side exceeds
    //      the other (ties ½) — reported in DOUBLED units (two_u), so
    //      average tie-ranks never leave the integers. Computed from
    //      the VALUE DISTRIBUTION, not per-row ranks: aggregate to
    //      (value, count-per-side), then one cumulative sum over the
    //      distinct-value table gives, for each value, how many of the
    //      other side sit below it — 2·U₁ = Σ c₁(v)·(2·below₂(v)+c₂(v)).
    //      Scale: the global window runs on the domain-bounded distinct-
    //      value table, never the fact rows; the identity
    //      2U₁+2U₂ = 2n₁n₂ is exposed by emitting both. ----
    "q210_mannwhitney" -> Q(
      (s, d) => {
        val vals = Tables.orders(s, d)
          .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
          .filter(col("c_mktsegment").isin("AUTOMOBILE", "BUILDING"))
          .select(round(col("o_totalprice") * 100, 0).cast("long").as("v"),
            (col("c_mktsegment") === "AUTOMOBILE").cast("long").as("is_a"))
        val dist = vals.groupBy("v")
          .agg(sum(col("is_a")).as("c1"), sum(lit(1L) - col("is_a")).as("c2"))
        val below = Window.orderBy("v")
          .rowsBetween(Window.unboundedPreceding, -1)
        dist
          .withColumn("below2", coalesce(sum("c2").over(below), lit(0L)))
          .agg(sum("c1").as("n1"), sum("c2").as("n2"),
            sum(col("c1") * (lit(2L) * col("below2") + col("c2"))).as("two_u1"))
          .withColumn("two_u2",
            lit(2L) * col("n1") * col("n2") - col("two_u1"))
          .select("n1", "n2", "two_u1", "two_u2")
      },
      Some("""WITH vals AS (
             |  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v,
             |    CAST(c_mktsegment = 'AUTOMOBILE' AS BIGINT) AS is_a
             |  FROM orders JOIN customer ON o_custkey = c_custkey
             |  WHERE c_mktsegment IN ('AUTOMOBILE', 'BUILDING')),
             |dist AS (SELECT v, sum(is_a) AS c1, sum(1 - is_a) AS c2
             |  FROM vals GROUP BY v),
             |cum AS (SELECT v, c1, c2,
             |    coalesce(sum(c2) OVER (ORDER BY v
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below2
             |  FROM dist),
             |u AS (SELECT CAST(sum(c1) AS BIGINT) AS n1,
             |    CAST(sum(c2) AS BIGINT) AS n2,
             |    CAST(sum(c1 * (2 * below2 + c2)) AS BIGINT) AS two_u1
             |  FROM cum)
             |SELECT n1, n2, two_u1,
             |  CAST(2 * n1 * n2 - two_u1 AS BIGINT) AS two_u2
             |FROM u""".stripMargin)),

    // ---- q212: EXACT HIGHER MOMENTS — per-flag skewness and excess
    //      kurtosis of order quantities, the distribution-shape
    //      diagnostic behind outlier policy choices. The power sums
    //      Σx..Σx⁴ are exact longs (quantity ≤ 50); the central-moment
    //      numerators M₂ = nΣx²−(Σx)², M₃ = n²Σx³−3nΣxΣx²+2(Σx)³,
    //      M₄ = n³Σx⁴−4n²ΣxΣx³+6n(Σx)²Σx²−3(Σx)⁴ are exact integers in
    //      DECIMAL(38,0) (≡ DuckDB HUGEINT — exact in both, so the
    //      engines cannot drift however they associate). The normalized
    //      shapes need no n at all: g₁² = M₃²/M₂³ (sign of M₃) and
    //      g₂ = M₄/M₂² − 3 — the n-powers cancel — leaving one short
    //      IEEE chain per output. Scale: one narrow pass, a 3-row agg. ----
    "q212_moments" -> Q(
      (s, d) => {
        val sums = Tables.lineitem(s, d)
          .select(col("l_returnflag"), col("l_quantity").cast("long").as("q"))
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"), sum("q").as("s1"),
            sum(col("q") * col("q")).as("s2"),
            sum(col("q") * col("q") * col("q")).as("s3"),
            sum(col("q") * col("q") * col("q") * col("q")).as("s4"))
        val nD = col("n").cast(dec); val s1D = col("s1").cast(dec)
        val s2D = col("s2").cast(dec); val s3D = col("s3").cast(dec)
        val s4D = col("s4").cast(dec)
        val m2 = nD * s2D - s1D * s1D
        val m3 = nD * nD * s3D - lit(3).cast(dec) * nD * s1D * s2D +
          lit(2).cast(dec) * s1D * s1D * s1D
        val m4 = nD * nD * nD * s4D -
          lit(4).cast(dec) * nD * nD * s1D * s3D +
          lit(6).cast(dec) * nD * s1D * s1D * s2D -
          lit(3).cast(dec) * s1D * s1D * s1D * s1D
        val m2d = m2.cast("double"); val m3d = m3.cast("double")
        val m4d = m4.cast("double")
        sums.select(col("l_returnflag"), col("n"),
            round(col("s1").cast("double") / col("n").cast("double"), 6)
              .as("mean_qty_r6"),
            round(signum(m3d) * ((m3d * m3d) / ((m2d * m2d) * m2d)), 6)
              .as("skew_sq_r6"),
            round(m4d / (m2d * m2d) - lit(3.0d), 6).as("kurt_r6"))
          .orderBy("l_returnflag")
      },
      Some("""WITH sums AS (
             |  SELECT l_returnflag, count(*) AS n,
             |    sum(q) AS s1, sum(q*q) AS s2, sum(q*q*q) AS s3,
             |    sum(q*q*q*q) AS s4
             |  FROM (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS q
             |    FROM lineitem) GROUP BY l_returnflag),
             |m AS (SELECT l_returnflag, n,
             |    CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean_qty,
             |    CAST(CAST(n AS HUGEINT)*s2 - CAST(s1 AS HUGEINT)*s1 AS DOUBLE) AS m2d,
             |    CAST(CAST(n AS HUGEINT)*n*s3 - 3*CAST(n AS HUGEINT)*s1*s2
             |      + 2*CAST(s1 AS HUGEINT)*s1*s1 AS DOUBLE) AS m3d,
             |    CAST(CAST(n AS HUGEINT)*n*n*s4 - 4*CAST(n AS HUGEINT)*n*s1*s3
             |      + 6*CAST(n AS HUGEINT)*s1*s1*s2
             |      - 3*CAST(s1 AS HUGEINT)*s1*s1*s1 AS DOUBLE) AS m4d
             |  FROM sums)
             |SELECT l_returnflag, n, round(mean_qty, 6) AS mean_qty_r6,
             |  round(sign(m3d) * ((m3d * m3d) / ((m2d * m2d) * m2d)), 6)
             |    AS skew_sq_r6,
             |  round(m4d / (m2d * m2d) - 3.0, 6) AS kurt_r6
             |FROM m ORDER BY l_returnflag""".stripMargin)),

    // ---- q213: POWER-OF-TWO HISTOGRAM — the mergeable log₂ bucket
    //      sketch: bucket(x) = bitlength(x) (≡ ⌊log₂x⌋+1) computed by
    //      STRING LENGTH of the binary representation, so no floating
    //      log ever runs — the classic trick for cross-engine (and
    //      cross-libm) exactness. Buckets are mergeable by addition
    //      (map-side combine does most of the work), the cumulative
    //      column turns the histogram into a quantile sketch with
    //      relative error ≤ 2×, and bounds come from integer shifts.
    //      Scale: one narrow map, a ≤ 64-row agg, a ≤ 64-row window. ----
    "q213_log2_histogram" -> Q(
      (s, d) => {
        val b = Tables.orders(s, d)
          .select(round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
          .filter(col("cents") > 0)
          .select(length(bin(col("cents"))).cast("long").as("bucket"))
          .groupBy("bucket").agg(count(lit(1)).as("n_orders"))
        b
          .withColumn("cum_orders",
            sum("n_orders").over(Window.orderBy("bucket")
              .rowsBetween(Window.unboundedPreceding, 0)))
          .withColumn("lo_cents", expr("shiftleft(1L, cast(bucket AS int) - 1)"))
          .withColumn("hi_cents", expr("shiftleft(1L, cast(bucket AS int)) - 1L"))
          .select("bucket", "n_orders", "cum_orders", "lo_cents", "hi_cents")
          .orderBy("bucket")
      },
      Some("""WITH c AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents
             |  FROM orders),
             |b AS (SELECT CAST(length(format('{:b}', cents)) AS BIGINT) AS bucket,
             |    count(*) AS n_orders
             |  FROM c WHERE cents > 0 GROUP BY 1)
             |SELECT bucket, n_orders,
             |  CAST(sum(n_orders) OVER (ORDER BY bucket
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             |    AS cum_orders,
             |  CAST(1::BIGINT << CAST(bucket - 1 AS INT) AS BIGINT) AS lo_cents,
             |  CAST((1::BIGINT << CAST(bucket AS INT)) - 1 AS BIGINT) AS hi_cents
             |FROM b ORDER BY bucket""".stripMargin)),

    // ---- q306: MANN-KENDALL TREND TEST (Mann 1945; Kendall's τ with
    //      the tie-corrected variance) — the significance companion to
    //      q215's Theil-Sen slope: S = Σ_{i<j} sign(yⱼ − yᵢ) over each
    //      event type's daily-revenue series, 18·Var(S) = n(n−1)(2n+5)
    //      − Σ_t t(t−1)(2t+5) over tie groups, Z continuity-corrected.
    //      EXACT: S, the variance numerator, and every tie count are
    //      integers; the only floats are one sqrt + one division
    //      (rounded to 6). Var = 0 (constant series) gives Z = 0 by
    //      convention. Pair space is C(days, 2) per group — bounded by
    //      the SERIES LENGTH, never the data (the q215 rule). ----
    "q306_mann_kendall" -> Q(
      (s, d) => mannKendall(
        Tables.events(s, d)
          .groupBy(col("event_type").as("grp"),
            unix_date(to_date(date_trunc("DAY", col("ts")))).cast("long").as("x"))
          .agg(sum(round(col("value") * 100, 0).cast("long")).as("y")))
        .withColumnRenamed("grp", "event_type"),
      Some("""WITH daily AS (SELECT event_type,
             |    CAST(CAST(date_trunc('day', ts) AS DATE) - DATE '1970-01-01'
             |      AS BIGINT) AS x,
             |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
             |  FROM events GROUP BY 1, 2),
             |st AS (SELECT a.event_type,
             |    sum(CASE WHEN b.y > a.y THEN 1
             |      WHEN b.y < a.y THEN -1 ELSE 0 END) AS s_stat
             |  FROM daily a JOIN daily b
             |    ON a.event_type = b.event_type AND a.x < b.x
             |  GROUP BY a.event_type),
             |tg AS (SELECT event_type, y, count(*) AS t FROM daily
             |  GROUP BY event_type, y),
             |ti AS (SELECT event_type, CAST(sum(t) AS BIGINT) AS n_days,
             |    CAST(sum((t * (t - 1)) * ((2 * t) + 5)) AS BIGINT)
             |      AS tie_corr
             |  FROM tg GROUP BY event_type),
             |v AS (SELECT st.event_type, ti.n_days,
             |    CAST(st.s_stat AS BIGINT) AS s_stat,
             |    ((ti.n_days * (ti.n_days - 1)) * ((2 * ti.n_days) + 5))
             |      - ti.tie_corr AS var18
             |  FROM st JOIN ti ON st.event_type = ti.event_type),
             |z AS (SELECT event_type, n_days, s_stat,
             |    CAST(var18 AS BIGINT) AS var18,
             |    round(CASE WHEN var18 = 0 THEN 0.0
             |      WHEN s_stat > 0 THEN (CAST(s_stat AS DOUBLE) - 1.0)
             |        / sqrt(CAST(var18 AS DOUBLE) / 18.0)
             |      WHEN s_stat < 0 THEN (CAST(s_stat AS DOUBLE) + 1.0)
             |        / sqrt(CAST(var18 AS DOUBLE) / 18.0)
             |      ELSE 0.0 END, 6) AS z_r6
             |  FROM v)
             |SELECT event_type, n_days, s_stat, var18, z_r6,
             |  abs(z_r6) > 1.959963984540054 AS significant
             |FROM z ORDER BY event_type""".stripMargin)),

    // ---- q215: THEIL-SEN ROBUST SLOPE — the median of all pairwise
    //      slopes of each event type's daily-revenue series: immune to
    //      the outlier days that drag the q138 OLS line. Selection is
    //      EXACT-RATIONAL: slopes are never materialized as floats —
    //      pair i ranks below pair j iff dyᵢ·dxⱼ < dyⱼ·dxᵢ (dx > 0
    //      throughout), so the lower-median pair is found by integer
    //      cross-multiplication alone and the only float is the chosen
    //      pair's single division (tied-slope pairs are the same
    //      rational, hence the same double). Scale: pair count is
    //      quadratic in the SERIES LENGTH, never the data — C(days,2)
    //      per group, a bounded window; groups rank independently in
    //      one shuffle on the group key. ----
    "q215_theilsen" -> Q(
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(col("event_type"),
            unix_date(to_date(date_trunc("DAY", col("ts")))).cast("long").as("x"))
          .agg(sum(round(col("value") * 100, 0).cast("long")).as("y"))
          // |types|·|days| rows: materialize once so the self-join's two
          // branches don't each rescan the facts
          .localCheckpoint()
        val a = daily.select(col("event_type"), col("x").as("xa"), col("y").as("ya"))
        val b = daily.select(col("event_type").as("et2"), col("x").as("xb"),
          col("y").as("yb"))
        val pairs = a.join(b, col("event_type") === col("et2") && col("xa") < col("xb"))
          .select(col("event_type"), col("xa"), col("xb"),
            (col("yb") - col("ya")).as("dy"), (col("xb") - col("xa")).as("dx"))
        val p2 = pairs.select(col("event_type").as("t2"), col("dy").as("dy2"),
          col("dx").as("dx2"))
        val ranked = pairs.join(p2, col("event_type") === col("t2"))
          .groupBy(col("event_type"), col("xa"), col("xb"), col("dy"), col("dx"))
          .agg(
            sum(when(col("dy2") * col("dx") < col("dy") * col("dx2"), 1L)
              .otherwise(0L)).as("below"),
            sum(when(col("dy2") * col("dx") === col("dy") * col("dx2"), 1L)
              .otherwise(0L)).as("eq"),
            count(lit(1)).as("p_cnt"))
        ranked
          .filter(col("below") < expr("(p_cnt + 1) div 2") &&
            expr("(p_cnt + 1) div 2") <= col("below") + col("eq"))
          .groupBy("event_type")
          .agg(max(col("p_cnt")).as("n_pairs"),
            max(round(col("dy").cast("double") / col("dx").cast("double"), 6))
              .as("slope_r6"))
          .orderBy("event_type")
      },
      Some("""WITH daily AS (SELECT event_type,
             |    CAST(CAST(date_trunc('day', ts) AS DATE) - DATE '1970-01-01'
             |      AS BIGINT) AS x,
             |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
             |  FROM events GROUP BY 1, 2),
             |pairs AS (SELECT a.event_type, a.x AS xa, b.x AS xb,
             |    b.y - a.y AS dy, b.x - a.x AS dx
             |  FROM daily a JOIN daily b
             |    ON a.event_type = b.event_type AND a.x < b.x),
             |ranked AS (SELECT p.event_type, p.xa, p.xb, p.dy, p.dx,
             |    sum(CASE WHEN q.dy * p.dx < p.dy * q.dx THEN 1 ELSE 0 END)
             |      AS below,
             |    sum(CASE WHEN q.dy * p.dx = p.dy * q.dx THEN 1 ELSE 0 END)
             |      AS eq,
             |    count(*) AS p_cnt
             |  FROM pairs p JOIN pairs q ON p.event_type = q.event_type
             |  GROUP BY 1, 2, 3, 4, 5)
             |SELECT event_type, CAST(max(p_cnt) AS BIGINT) AS n_pairs,
             |  max(round(CAST(dy AS DOUBLE) / CAST(dx AS DOUBLE), 6)) AS slope_r6
             |FROM ranked
             |WHERE below < (p_cnt + 1) // 2 AND (p_cnt + 1) // 2 <= below + eq
             |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // ---- q221: TWO-PASS EXACT MEDIAN — the distributed selection
    //      algorithm that replaces a global sort: pass 1 builds the q213
    //      power-of-two histogram (one narrow map + a ≤64-row agg) and
    //      the ≤64-row table comes to the driver (bounded by the VALUE
    //      WIDTH, never the data) to locate the bucket holding rank
    //      k = (n+1) div 2; pass 2 re-scans ONLY that bucket's rows,
    //      aggregates them to (value, count), and one cumulative sum
    //      over the bucket's distinct values picks the exact k-th
    //      smallest. Lower-median semantics keep everything integral
    //      (= DuckDB quantile_disc(0.5)). At 100 TB each refinement
    //      cuts the candidate set ~2× minimum (historically ~50×: the
    //      mass concentrates); production iterates pass 2 until the
    //      bucket's distinct-value table is shuffle-tiny — one
    //      refinement suffices here and the structure is the loop body. ----
    "q221_exact_median_twopass" -> Q(
      (s, d) => {
        val cents = Tables.orders(s, d)
          .select(round(col("o_totalprice") * 100, 0).cast("long").as("c"))
          .filter(col("c") > 0)
          .localCheckpoint() // scanned by both passes
        val hist = cents
          .select(length(bin(col("c"))).cast("long").as("bucket"))
          .groupBy("bucket").agg(count(lit(1)).as("nb"))
          .orderBy("bucket")
          .collect() // ≤ 64 rows: bounded by value width, not data
        val n = hist.map(_.getLong(1)).sum
        val k = (n + 1) / 2
        var cum = 0L; var target = 0L; var before = 0L
        hist.foreach { r =>
          if (target == 0L && cum + r.getLong(1) >= k) {
            target = r.getLong(0); before = cum
          }
          cum += r.getLong(1)
        }
        val lo = 1L << (target - 1); val hi = (1L << target) - 1
        val inBucket = cents.filter(col("c") >= lo && col("c") <= hi)
          .groupBy("c").agg(count(lit(1)).as("cnt"))
        val w = Window.orderBy("c").rowsBetween(Window.unboundedPreceding, 0)
        inBucket
          .withColumn("cum_in", sum("cnt").over(w))
          .filter(col("cum_in") >= lit(k - before))
          .agg(min("c").as("median_cents"))
          .select(lit(n).as("n_orders"), col("median_cents"))
      },
      Some("""WITH c AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS c
             |  FROM orders WHERE round(o_totalprice * 100) > 0)
             |SELECT count(*) AS n_orders,
             |  CAST(quantile_disc(c, 0.5) AS BIGINT) AS median_cents
             |FROM c""".stripMargin)),

    // ---- q216: HERFINDAHL-HIRSCHMAN CONCENTRATION — per-nation revenue
    //      concentration across customers: HHI = Σ shareᵢ², the antitrust
    //      / key-account-risk read ("how much of this market is one
    //      buyer"). Exact: per-customer cents are longs, Σc² runs in
    //      DECIMAL(38,0) ≡ HUGEINT (long² would wrap at real scale), and
    //      each output is one fixed IEEE chain over exact operands. Also
    //      emits the top customer's share — HHI's max term — so the
    //      "one dominant account vs many mid-sized" cases separate.
    //      Scale: one shuffle to (nation, customer), a 25-row agg. ----
    "q216_hhi" -> Q(
      (s, d) => {
        val byCust = Tables.orders(s, d)
          .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_nationkey").cast("long").as("nation"), col("c_custkey"))
          .agg(sum(round(col("o_totalprice") * 100, 0).cast("long")).as("c"))
        val cD = col("c").cast(dec)
        byCust
          .groupBy("nation")
          .agg(count(lit(1)).as("n_cust"), sum("c").as("tot_cents"),
            sum(cD * cD).cast(dec).as("sq"), max("c").as("topc"))
          .select(col("nation"), col("n_cust"), col("tot_cents"),
            round(col("sq").cast("double") /
              (col("tot_cents").cast("double") * col("tot_cents").cast("double")),
              6).as("hhi_r6"),
            round(col("topc").cast("double") / col("tot_cents").cast("double"), 6)
              .as("top_share_r6"))
          .orderBy("nation")
      },
      Some("""WITH byCust AS (
             |  SELECT CAST(c_nationkey AS BIGINT) AS nation, c_custkey,
             |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             |      AS c
             |  FROM orders JOIN customer ON o_custkey = c_custkey
             |  GROUP BY 1, 2)
             |SELECT nation, count(*) AS n_cust,
             |  CAST(sum(c) AS BIGINT) AS tot_cents,
             |  round(CAST(sum(CAST(c AS HUGEINT) * c) AS DOUBLE)
             |    / (CAST(sum(c) AS DOUBLE) * CAST(sum(c) AS DOUBLE)), 6)
             |    AS hhi_r6,
             |  round(CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE), 6)
             |    AS top_share_r6
             |FROM byCust GROUP BY nation ORDER BY nation""".stripMargin)),

    // ---- q217: PERCENT-OF-PARENT HIERARCHY — the drill-down tree
    //      financial reporting renders: nation revenue as a share of its
    //      region, region revenue as a share of the world, in one
    //      relation with a level tag. Exact cents throughout; each pct
    //      is one division over exact operands. The parent totals come
    //      from window sums OVER the aggregated tree (≤ |nations| rows),
    //      so nothing re-reads facts — the q10 rollup gives the nodes,
    //      this gives their parent-relative weights. NULLS FIRST pinned
    //      on the region-row nation column in both dialects. ----
    "q217_pct_of_parent" -> Q(
      (s, d) => {
        val nat = Tables.orders(s, d)
          .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
          .join(Tables.nation(s, d), col("c_nationkey") === col("n_nationkey"))
          .join(Tables.region(s, d), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(sum(round(col("o_totalprice") * 100, 0).cast("long")).as("cents"))
        val natRows = nat
          .withColumn("parent_cents",
            sum("cents").over(Window.partitionBy("r_name")))
          .select(lit("nation").as("lvl"), col("r_name"), col("n_name"),
            col("cents"),
            round(col("cents").cast("double") / col("parent_cents").cast("double"),
              6).as("pct_of_parent_r6"))
        val regRows = nat.groupBy("r_name")
          .agg(sum("cents").as("cents"))
          .withColumn("parent_cents", sum("cents").over(Window.partitionBy()))
          .select(lit("region").as("lvl"), col("r_name"),
            lit(null).cast("string").as("n_name"), col("cents"),
            round(col("cents").cast("double") / col("parent_cents").cast("double"),
              6).as("pct_of_parent_r6"))
        natRows.unionAll(regRows)
          .orderBy(col("lvl"), col("r_name"), col("n_name").asc_nulls_first)
      },
      Some("""WITH nat AS (
             |  SELECT r_name, n_name,
             |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             |      AS cents
             |  FROM orders
             |  JOIN customer ON o_custkey = c_custkey
             |  JOIN nation ON c_nationkey = n_nationkey
             |  JOIN region ON n_regionkey = r_regionkey
             |  GROUP BY 1, 2),
             |natrows AS (SELECT 'nation' AS lvl, r_name, n_name, cents,
             |    round(CAST(cents AS DOUBLE)
             |      / CAST(sum(cents) OVER (PARTITION BY r_name) AS DOUBLE), 6)
             |      AS pct_of_parent_r6
             |  FROM nat),
             |reg AS (SELECT r_name, CAST(sum(cents) AS BIGINT) AS cents
             |  FROM nat GROUP BY 1),
             |regrows AS (SELECT 'region' AS lvl, r_name,
             |    CAST(NULL AS VARCHAR) AS n_name, cents,
             |    round(CAST(cents AS DOUBLE)
             |      / CAST(sum(cents) OVER () AS DOUBLE), 6) AS pct_of_parent_r6
             |  FROM reg)
             |SELECT * FROM (SELECT * FROM natrows UNION ALL SELECT * FROM regrows)
             |ORDER BY lvl, r_name, n_name NULLS FIRST""".stripMargin)),

    // ---- q229: WELCH A/B MEAN-DIFFERENCE SCREEN — the means-based
    //      two-sample test completing the tier's triad (q155 chi-square:
    //      proportions; q210 Mann-Whitney: ranks; this: means under
    //      unequal variances — the default experiment-analysis test).
    //      All 10 segment pairs screened at once. Exact: per-segment
    //      n (BIGINT) and Σv, Σv² in DECIMAL(38,0) ≡ HUGEINT (v² at
    //      cents scale overflows BIGINT, not 38 digits); float tail is
    //      ONE fixed chain both engines evaluate identically — casts of
    //      exact integers and +,−,×,÷,sqrt are all correctly rounded
    //      IEEE ops, so the doubles agree bit-for-bit (q168's two-sqrt
    //      precedent), rounded to 6. The significance flag compares the
    //      ROUNDED t so the boundary cannot float-drift. Scale: facts
    //      touched once by a 5-row keyed agg; the pair join runs on the
    //      5-row moment table. ----
    "q229_welch_ab" -> Q(
      (s, d) => {
        val vals = Tables.orders(s, d)
          .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
          .select(col("c_mktsegment").as("seg"),
            round(col("o_totalprice") * 100, 0).cast("long").as("v"))
        welchPairs(vals)
      },
      Some("""WITH vals AS (
             |  SELECT c_mktsegment AS seg,
             |    CAST(round(o_totalprice * 100) AS BIGINT) AS v
             |  FROM orders JOIN customer ON o_custkey = c_custkey),
             |m AS (SELECT seg, count(*) AS n,
             |    sum(CAST(v AS HUGEINT)) AS sv,
             |    sum(CAST(v AS HUGEINT) * v) AS qv
             |  FROM vals GROUP BY seg HAVING count(*) >= 2),
             |p AS (SELECT a.seg AS seg_a, b.seg AS seg_b,
             |    CAST(a.n AS BIGINT) AS na, CAST(b.n AS BIGINT) AS nb,
             |    CAST(a.sv AS DOUBLE) / CAST(a.n AS DOUBLE)
             |      - CAST(b.sv AS DOUBLE) / CAST(b.n AS DOUBLE) AS diff,
             |    ((CAST(a.qv AS DOUBLE)
             |          - CAST(a.sv AS DOUBLE) * CAST(a.sv AS DOUBLE)
             |            / CAST(a.n AS DOUBLE)) / (CAST(a.n AS DOUBLE) - 1.0))
             |        / CAST(a.n AS DOUBLE)
             |      + ((CAST(b.qv AS DOUBLE)
             |          - CAST(b.sv AS DOUBLE) * CAST(b.sv AS DOUBLE)
             |            / CAST(b.n AS DOUBLE)) / (CAST(b.n AS DOUBLE) - 1.0))
             |        / CAST(b.n AS DOUBLE) AS se2
             |  FROM m a, m b WHERE a.seg < b.seg),
             |t AS (SELECT seg_a, seg_b, na, nb,
             |    round(diff / sqrt(se2), 6) AS t_r6
             |  FROM p WHERE se2 > 0)
             |SELECT seg_a, seg_b, na, nb, t_r6,
             |  abs(t_r6) >= 1.96 AS significant_z196
             |FROM t ORDER BY seg_a, seg_b""".stripMargin))
  )

  /** Welch's unequal-variance t for every pair of groups in `vals`
    * (columns: seg STRING, v LONG). Moments are exact (n BIGINT; Σv,
    * Σv² in DECIMAL(38,0)); t's float tail is one fixed IEEE chain
    * mirrored verbatim in the q229 oracle SQL — keep the two in sync.
    *
    * Degenerate groups are excluded BEFORE the pair join (mirrored by
    * the oracle's HAVING/WHERE): n = 1 would divide by (n−1) = 0, and a
    * pair of zero-variance groups gives sqrt(0) in the denominator —
    * either path produces NaN/Infinity, whose round() rendering is
    * engine-version territory the bit-for-bit contract must not enter.
    * Safe-by-construction on TPC-H segments; the guard is for reuse on
    * arbitrary keyed inputs.
    *
    * The significance flag is the LARGE-SAMPLE z approximation (|t| ≥
    * 1.96, the normal 95% critical value) — named `significant_z196`
    * because for small groups the Welch–Satterthwaite t critical value
    * is materially larger (≈2.78 at df≈4); treat the flag as a screen
    * over many-row segments, not a small-n test.
    */
  private[graft] def welchPairs(vals: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val m = vals.groupBy("seg").agg(
        count(lit(1)).as("n"),
        sum(col("v").cast(dec)).as("sv"),
        sum(col("v").cast(dec) * col("v").cast(dec)).as("qv"))
      .filter(col("n") >= 2)
    val a = m.select(col("seg").as("seg_a"), col("n").as("na"),
      col("sv").as("sa"), col("qv").as("qa"))
    val b = m.select(col("seg").as("seg_b"), col("n").as("nb"),
      col("sv").as("sb"), col("qv").as("qb"))
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    val varA = (d(col("qa")) - d(col("sa")) * d(col("sa")) / d(col("na"))) /
      (d(col("na")) - lit(1.0))
    val varB = (d(col("qb")) - d(col("sb")) * d(col("sb")) / d(col("nb"))) /
      (d(col("nb")) - lit(1.0))
    a.crossJoin(b).filter(col("seg_a") < col("seg_b"))
      .withColumn("se2", varA / d(col("na")) + varB / d(col("nb")))
      .filter(col("se2") > 0)
      .withColumn("t_r6", round(
        (d(col("sa")) / d(col("na")) - d(col("sb")) / d(col("nb")))
          / sqrt(col("se2")), 6))
      .withColumn("significant_z196", abs(col("t_r6")) >= lit(1.96))
      .select("seg_a", "seg_b", "na", "nb", "t_r6", "significant_z196")
      .orderBy("seg_a", "seg_b")
  }
}
