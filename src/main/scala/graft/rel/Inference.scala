package graft.rel

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.rel.RelQueries.Q
import graft.rel.Tables

/** NONPARAMETRIC / MULTIPLE-TESTING INFERENCE — the experiment-analysis
  * completions the q290/q295 tier stops short of: the k-group rank test
  * (Kruskal & Wallis 1952, JASA 47), the deterministic randomization
  * test (Fisher 1935 "The design of experiments"; Edgington & Onghena,
  * "Randomization tests"), the Benjamini–Hochberg step-up FDR control
  * for test FAMILIES (Benjamini & Hochberg 1995, JRSS-B 57), and the
  * two-sample minimum-detectable-effect readout (standard power
  * analysis, e.g. Cohen 1988; Kohavi et al., "Trustworthy online
  * controlled experiments" §17).
  *
  * House determinism rules applied throughout:
  *   - Every sufficient statistic is an EXACT integer (cents/milli
  *     sums, rank sums as 2× doubled average ranks, permutation
  *     extremeness COUNTS); wide sums ride decimal(38,0) (HUGEINT in
  *     the oracle), cast to double once.
  *   - Floating point happens only in fixed, fully-parenthesized
  *     chains over those exact operands — identical text in both
  *     engines, bit-identical IEEE results.
  *   - Where a sum of per-group IEEE terms is unavoidable (the
  *     Kruskal–Wallis Σ S²/n), it rides an ORDER-PINNED cumulative
  *     window over the group-bounded table — the q300 ln-chain rule —
  *     never an unordered aggregate.
  *   - Randomization is the q291 bootstrap trick: the permuted side of
  *     unit u in replicate r is a pure function of the Knuth-hash
  *     mix (u·2654435761 + (r+1)·940572985) mod 2³¹, so every
  *     permutation replays bit-for-bit in SQL and the p-value is an
  *     exact integer numerator over (reps + 1).
  *
  * Scale shapes: Kruskal–Wallis is two hash aggregations (per (group,
  * value), then per distinct value) plus windows over the distinct-
  * VALUE table (domain-bounded, the q210 Mann–Whitney adjudication)
  * and the k-row group table; the permutation tests expand units ×R
  * INSIDE the map task and collapse by partial aggregation to
  * (tests·R) rows before the shuffle — the measured q291 claim
  * (ExperimentBench: 6533× shuffle cut) applies verbatim; BH is
  * arithmetic over the m-row test family.
  */
object Inference {

  /** the q291 hash-mix constants: Knuth multiplicative + replicate salt */
  private val HashA = 2654435761L
  private val HashB = 940572985L
  private val HashMod = 2147483648L // 2^31
  private val HashHalf = 1073741824L // 2^30

  /** z₀.₉₇₅ and z₀.₈₀ as literals (no special-function libm) */
  private val Z975 = 1.959963984540054
  private val Z80 = 0.8416212335729143

  /** χ²₀.₀₅ critical values, df = 1..10 (the q295 literals) */
  private[rel] val Chi2Crit05: Array[Double] = Array(
    3.841458820694124, 5.991464547107979, 7.814727903251179,
    9.487729036781154, 11.070497693516351, 12.591587243743977,
    14.067140449340169, 15.50731305586545, 16.918977604620448,
    18.307038053275146)

  /** largest per-value tie count whose cube stays in a long */
  private val TieCubeCap = 2097151L // (2^21 - 1)^3 < 2^63

  /** KRUSKAL–WALLIS H TEST across k groups on an integer metric —
    * H = 12/(N(N+1))·Σ R_j²/n_j − 3(N+1) with average ranks on ties,
    * plus the tie-corrected H' = H/(1 − Σ(t³−t)/(N³−N)).
    *
    * Rank sums are exact integers via DOUBLED average ranks (the q309
    * Spearman trick): a tied block of t values preceded by `below`
    * rows has doubled average rank 2·below + t + 1, so S_j = Σ 2·R_j
    * is an exact decimal(38,0) sum and Σ S_j²/n_j = 4·Σ R_j²/n_j folds
    * into H as 3/(N(N+1))·ΣS_j²/n_j. The Σ over groups is IEEE, so it
    * rides an order-pinned cumulative window over the k-row group
    * table (deterministic in both engines); per-value tie cubes are
    * guarded loudly against long overflow.
    *
    * Output: one row (n, k, h_r6, h_tie_r6, crit_r6, reject_05) —
    * crit/reject from the χ² df = k−1 ≤ 10 literals, null beyond.
    * Degenerate all-values-equal input (tie correction denominator 0)
    * yields null h_tie/reject.
    *
    * Scale: one (group, value) hash agg, one value agg off it, a
    * window over distinct VALUES (domain-bounded — the q210
    * adjudication; value distributions, not data), and k-row
    * arithmetic. No data-sized sort anywhere.
    */
  def kruskalWallis(df: DataFrame, group: String, value: String): DataFrame = {
    val gv = df
      .select(col(group).cast("string").as("g"), col(value).cast("long").as("v"))
      .groupBy("g", "v").agg(count(lit(1)).as("c"))
    val dist = gv.groupBy("v").agg(sum("c").as("cnt"))
      .withColumn("cnt", when(col("cnt") > TieCubeCap,
        raise_error(concat(lit("kruskalWallis: tie block exceeds cube cap: "),
          col("cnt").cast("string")))).otherwise(col("cnt")))
    // doubled average rank per distinct value: 2·below + cnt + 1
    val below = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    val dr = dist.withColumn("d2",
      lit(2L) * coalesce(sum("cnt").over(below), lit(0L)) + col("cnt") + 1L)
    val gs = gv.join(dr.select("v", "d2"), "v")
      .groupBy("g")
      .agg(sum("c").as("n"),
        sum((col("c") * col("d2")).cast("decimal(38,0)")).as("s2r"))
    val meta = gs.agg(sum("n").as("n_total"), count(lit(1)).as("k"))
      .crossJoin(dist.agg(
        sum((col("cnt") * col("cnt") * col("cnt") - col("cnt"))
          .cast("decimal(38,0)")).as("ties")))
    // order-pinned Σ S_j²/n_j over the k-row group table
    val wOrd = Window.orderBy("g")
    val wAll = wOrd.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val term = (col("s2r").cast("double") * col("s2r").cast("double")) /
      col("n").cast("double")
    val last = gs
      .withColumn("rk", row_number().over(wOrd))
      .withColumn("cum", sum(term).over(
        wOrd.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("kk", count(lit(1)).over(wAll))
      .filter(col("rk") === col("kk"))
      .select(col("cum"))
    val nd = col("n_total").cast("double")
    val h = (lit(3.0) * col("cum")) / (nd * (nd + lit(1.0))) -
      lit(3.0) * (nd + lit(1.0))
    val corr = lit(1.0) - col("ties").cast("double") /
      ((nd * nd * nd) - nd)
    val crit = (2 to 11).foldRight(lit(null).cast("double"): Column) {
      case (k, rest) => when(col("k") === k, lit(Chi2Crit05(k - 2))).otherwise(rest)
    }
    last.crossJoin(broadcast(meta))
      .withColumn("h", h)
      .withColumn("h_tie", when(corr > 0, col("h") / corr)
        .otherwise(lit(null).cast("double")))
      .withColumn("crit_r6", crit)
      .select(col("n_total").as("n"), col("k"),
        round(col("h"), 6).as("h_r6"),
        round(col("h_tie"), 6).as("h_tie_r6"),
        col("crit_r6"),
        (col("h_tie") > col("crit_r6")).as("reject_05"))
  }

  /** DETERMINISTIC RANDOMIZATION (permutation) TEST of a difference in
    * group means, per test key — the exact-replay form: replicate r
    * reassigns unit u to side B' iff (u·2654435761 + (r+1)·940572985)
    * mod 2³¹ ≥ 2³⁰ (the q291 hash mix), the replicate statistic
    * |mean_A' − mean_B'| is one IEEE chain over exact integer sums,
    * and p = (1 + #{r : stat_r ≥ stat_obs}) / (reps + 1) — an exact
    * integer numerator (Phipson & Smyth 2010's +1 convention: the
    * observed assignment is one of the permutations). A replicate that
    * empties either side counts as extreme (conservative, and
    * replayable). Input rows must carry a unique integer unit id; the
    * side column must be 0 (A) / 1 (B).
    *
    * Output: (test, n_a, n_b, p_num, p_den) — one row per test key,
    * p = p_num/p_den with p_den = reps + 1.
    *
    * Scale: the ×R expansion happens inside the map task and collapses
    * by partial aggregation to tests·R·(2 sums) before the shuffle —
    * the measured q291 bootstrap shape; the observed side is one more
    * hash agg, broadcast back onto the R-row replicate table.
    */
  def permutationPValues(df: DataFrame, test: Column, id: Column,
      valueCents: Column, sideB: Column, reps: Int = 199): DataFrame = {
    require(reps >= 19 && reps <= 10000, s"reps=$reps")
    val base = df.select(test.cast("string").as("t"),
      id.cast("long").as("id"), valueCents.cast("long").as("v"),
      when(sideB.cast("long").isin(0L, 1L), sideB.cast("long"))
        .otherwise(raise_error(lit(
          "permutationPValues: side must be 0/1"))).as("sb"))
    val obs = base.groupBy("t").agg(
      sum(when(col("sb") === 0L, col("v")).otherwise(0L)).as("sa"),
      sum(when(col("sb") === 0L, 1L).otherwise(0L)).as("n_a"),
      sum(when(col("sb") === 1L, col("v")).otherwise(0L)).as("sbv"),
      sum(when(col("sb") === 1L, 1L).otherwise(0L)).as("n_b"))
      .select(col("t"),
        when(col("n_a") === 0L || col("n_b") === 0L,
          raise_error(concat(lit("permutationPValues: one-sided test "),
            col("t")))).otherwise(col("n_a")).as("n_a"),
        col("n_b"), col("sa"), col("sbv"))
      .withColumn("d_obs",
        abs(col("sa").cast("double") / col("n_a").cast("double") -
          col("sbv").cast("double") / col("n_b").cast("double")))
    val h = pmod(col("id") * lit(HashA) + (col("rep") + lit(1L)) * lit(HashB),
      lit(HashMod))
    val rep = base
      .withColumn("rep", explode(sequence(lit(0L), lit(reps - 1L))))
      .withColumn("pb", (h >= lit(HashHalf)).cast("long"))
      .groupBy("t", "rep")
      .agg(
        sum(when(col("pb") === 0L, col("v")).otherwise(0L)).as("ra"),
        sum(when(col("pb") === 0L, 1L).otherwise(0L)).as("ma"),
        sum(when(col("pb") === 1L, col("v")).otherwise(0L)).as("rb"),
        sum(when(col("pb") === 1L, 1L).otherwise(0L)).as("mb"))
    val extreme = col("ma") === 0L || col("mb") === 0L ||
      (abs(col("ra").cast("double") / col("ma").cast("double") -
        col("rb").cast("double") / col("mb").cast("double")) >= col("d_obs"))
    rep.join(broadcast(obs), "t")
      .groupBy(col("t").as("test"))
      .agg(min("n_a").as("n_a"), min("n_b").as("n_b"),
        (lit(1L) + sum(when(extreme, 1L).otherwise(0L))).as("p_num"))
      .withColumn("p_den", lit(reps + 1L))
  }

  /** BENJAMINI–HOCHBERG STEP-UP over a family of m exact-rational
    * p-values p_i = pNum_i/pDen (Benjamini & Hochberg 1995): order
    * ascending (deterministic tie-break on the test key), find the
    * largest rank i with p_(i) ≤ (i/m)·α, reject ranks 1..i. The
    * comparison is ALL-INTEGER: p_num·1000·m ≤ i·p_den·alphaMilli —
    * no rational ever leaves exact arithmetic.
    *
    * Output: input columns + (bh_rank, rejected), callers order.
    * The rank windows span the m-row family — domain-bounded by the
    * number of TESTS (the 25-nations rule), never by data.
    */
  def bhStepUp(tests: DataFrame, testCol: String, pNum: String,
      pDen: String, alphaMilli: Long = 50L): DataFrame = {
    require(alphaMilli >= 1 && alphaMilli <= 999, s"alphaMilli=$alphaMilli")
    val wOrd = Window.orderBy(col(pNum), col(testCol))
    val wAll = wOrd.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    tests
      .withColumn("bh_rank", row_number().over(wOrd).cast("long"))
      .withColumn("__m", count(lit(1)).over(wAll))
      .withColumn("__ok",
        lit(1000L) * col("__m") * col(pNum) <=
          col("bh_rank") * col(pDen) * lit(alphaMilli))
      .withColumn("__kmax",
        max(when(col("__ok"), col("bh_rank"))).over(wAll))
      .withColumn("rejected", col("bh_rank") <= coalesce(col("__kmax"), lit(0L)))
      .drop("__m", "__ok", "__kmax")
  }

  /** TWO-SAMPLE MINIMUM DETECTABLE EFFECT at α = 0.05 (two-sided),
    * power = 0.80 — the pre-experiment sizing readout: MDE_abs =
    * (z₀.₉₇₅ + z₀.₈₀)·√(s²_0/n_0 + s²_1/n_1) with SAMPLE variances
    * from exact integer milli moments (one fixed IEEE chain), and
    * MDE_rel against the variant-0 (control) mean. Unit values beyond
    * the exact-square milli cap fail loudly (the q290 guard).
    *
    * Output: one row (n_0, n_1, mean_0_r6, mde_abs_r6, mde_rel_r6) in
    * metric units (milli/1000); mde_rel null on a zero control mean.
    *
    * Scale: one hash aggregation to a single moment row.
    */
  def mdeTwoSample(units: DataFrame, variant: String = "variant",
      valueMilli: String = "y"): DataFrame = {
    val milliCap = 3037000499L
    val v = when(col(variant).cast("long").isin(0L, 1L), col(variant).cast("long"))
      .otherwise(raise_error(lit("mdeTwoSample: variant must be 0/1")))
    val x = when(abs(col(valueMilli).cast("long")) > milliCap,
      raise_error(concat(lit("mdeTwoSample: |milli| exceeds exact-square cap: "),
        col(valueMilli).cast("string")))).otherwise(col(valueMilli).cast("long"))
    val mom = units.select(v.as("g"), x.as("x"))
      .agg(
        sum(when(col("g") === 0L, 1L).otherwise(0L)).as("n0"),
        sum(when(col("g") === 0L, col("x")).otherwise(0L)
          .cast("decimal(38,0)")).as("s0"),
        sum(when(col("g") === 0L, col("x") * col("x")).otherwise(0L)
          .cast("decimal(38,0)")).as("q0"),
        sum(when(col("g") === 1L, 1L).otherwise(0L)).as("n1"),
        sum(when(col("g") === 1L, col("x")).otherwise(0L)
          .cast("decimal(38,0)")).as("s1"),
        sum(when(col("g") === 1L, col("x") * col("x")).otherwise(0L)
          .cast("decimal(38,0)")).as("q1"))
      .select(
        when(col("n0") < 2L || col("n1") < 2L,
          raise_error(lit("mdeTwoSample: need >= 2 units per variant")))
          .otherwise(col("n0")).as("n0"),
        col("n1"), col("s0"), col("q0"), col("s1"), col("q1"))
    def d(c: String) = col(c).cast("double")
    val var0 = (d("n0") * d("q0") - d("s0") * d("s0")) /
      (d("n0") * (d("n0") - lit(1.0)))
    val var1 = (d("n1") * d("q1") - d("s1") * d("s1")) /
      (d("n1") * (d("n1") - lit(1.0)))
    val mdeAbs = lit(Z975 + Z80) *
      sqrt(var0 / d("n0") + var1 / d("n1"))
    val mean0 = d("s0") / d("n0")
    mom
      .withColumn("__mde", mdeAbs)
      .withColumn("__mean0", mean0)
      .select(col("n0").cast("long").as("n_0"), col("n1").cast("long").as("n_1"),
        round(col("__mean0") / 1000.0, 6).as("mean_0_r6"),
        round(col("__mde") / 1000.0, 6).as("mde_abs_r6"),
        when(col("__mean0") =!= 0.0,
          round(col("__mde") / col("__mean0"), 6))
          .otherwise(lit(null).cast("double")).as("mde_rel_r6"))
  }

  /** the q311/q312 oracle prelude: the hash-permuted side in SQL */
  private def permSqlSide: String =
    "((id * 2654435761) + ((rep + 1) * 940572985)) % 2147483648 >= 1073741824"

  val all: ListMap[String, Q] = ListMap(
    // ---- q310: KRUSKAL–WALLIS across the 5 order priorities on
    //      order totals — the k-group generalization of q210's
    //      Mann–Whitney, doubled average ranks exact, Σ S²/n
    //      order-pinned, χ²₄ literal. ----
    "q310_kruskal_wallis" -> Q(
      (s, d) => kruskalWallis(
        Tables.orders(s, d).select(col("o_orderpriority").as("g"),
          round(col("o_totalprice") * 100, 0).cast("long").as("v")),
        "g", "v"),
      Some("""WITH vals AS (SELECT o_orderpriority AS g,
             |    CAST(round(o_totalprice * 100) AS BIGINT) AS v FROM orders),
             |gv AS (SELECT g, v, count(*) AS c FROM vals GROUP BY g, v),
             |dist AS (SELECT v, CAST(sum(c) AS BIGINT) AS cnt FROM gv GROUP BY v),
             |dr AS (SELECT v, cnt,
             |    2 * coalesce(sum(cnt) OVER (ORDER BY v
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |      + cnt + 1 AS d2
             |  FROM dist),
             |gs AS (SELECT g, CAST(sum(c) AS BIGINT) AS n,
             |    sum(CAST(c * dr.d2 AS HUGEINT)) AS s2r
             |  FROM gv JOIN dr USING (v) GROUP BY g),
             |meta AS (SELECT CAST(sum(n) AS BIGINT) AS n_total,
             |    CAST(count(*) AS BIGINT) AS k FROM gs),
             |tie AS (SELECT sum(CAST(cnt*cnt*cnt - cnt AS HUGEINT)) AS ties
             |  FROM dist),
             |terms AS (SELECT g,
             |    row_number() OVER (ORDER BY g) AS rk,
             |    sum((CAST(s2r AS DOUBLE) * CAST(s2r AS DOUBLE))
             |        / CAST(n AS DOUBLE))
             |      OVER (ORDER BY g ROWS BETWEEN UNBOUNDED PRECEDING
             |        AND CURRENT ROW) AS cum,
             |    count(*) OVER () AS kk
             |  FROM gs),
             |last AS (SELECT cum FROM terms WHERE rk = kk),
             |calc AS (SELECT meta.n_total AS n, meta.k,
             |    ((3.0 * last.cum) / (CAST(meta.n_total AS DOUBLE)
             |        * (CAST(meta.n_total AS DOUBLE) + 1.0)))
             |      - 3.0 * (CAST(meta.n_total AS DOUBLE) + 1.0) AS h,
             |    1.0 - CAST(tie.ties AS DOUBLE)
             |      / ((CAST(meta.n_total AS DOUBLE) * CAST(meta.n_total AS DOUBLE)
             |          * CAST(meta.n_total AS DOUBLE))
             |        - CAST(meta.n_total AS DOUBLE)) AS corr,
             |    CAST(CASE meta.k - 1 WHEN 1 THEN 3.841458820694124
             |      WHEN 2 THEN 5.991464547107979 WHEN 3 THEN 7.814727903251179
             |      WHEN 4 THEN 9.487729036781154 WHEN 5 THEN 11.070497693516351
             |      WHEN 6 THEN 12.591587243743977 WHEN 7 THEN 14.067140449340169
             |      WHEN 8 THEN 15.50731305586545 WHEN 9 THEN 16.918977604620448
             |      WHEN 10 THEN 18.307038053275146 ELSE NULL END AS DOUBLE)
             |      AS crit
             |  FROM last, meta, tie)
             |SELECT n, k, round(h, 6) AS h_r6,
             |  CASE WHEN corr > 0 THEN round(h / corr, 6) ELSE NULL END
             |    AS h_tie_r6,
             |  crit AS crit_r6,
             |  CASE WHEN corr > 0 THEN (h / corr) > crit ELSE NULL END
             |    AS reject_05
             |FROM calc""".stripMargin)),

    // ---- q311: RANDOMIZATION TEST — click vs view event values,
    //      199 hash-replayable relabelings, exact integer p. ----
    "q311_permutation_test" -> Q(
      (s, d) => permutationPValues(
          Tables.events(s, d)
            .filter(col("event_type").isin("click", "view")),
          lit("click_vs_view"), col("event_id"),
          round(col("value") * 100, 0).cast("long"),
          (col("event_type") === "view").cast("long"), reps = 199)
        .select(col("n_a"), col("n_b"), col("p_num"),
          round(col("p_num").cast("double") / col("p_den").cast("double"), 6)
            .as("p_r6"),
          (col("p_num") * 20L <= col("p_den")).as("reject_05")),
      Some(s"""WITH base AS (SELECT event_id AS id,
             |    CAST(round(value * 100) AS BIGINT) AS v,
             |    CAST(event_type = 'view' AS BIGINT) AS sb
             |  FROM events WHERE event_type IN ('click', 'view')),
             |obs AS (SELECT
             |    CAST(sum(CASE WHEN sb = 0 THEN v ELSE 0 END) AS BIGINT) AS sa,
             |    CAST(sum(CASE WHEN sb = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             |    CAST(sum(CASE WHEN sb = 1 THEN v ELSE 0 END) AS BIGINT) AS sbv,
             |    CAST(sum(CASE WHEN sb = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
             |  FROM base),
             |od AS (SELECT n_a, n_b,
             |    abs(CAST(sa AS DOUBLE) / CAST(n_a AS DOUBLE)
             |      - CAST(sbv AS DOUBLE) / CAST(n_b AS DOUBLE)) AS d_obs
             |  FROM obs),
             |reps AS (SELECT CAST(range AS BIGINT) AS rep FROM range(199)),
             |perm AS (SELECT rep,
             |    CAST(sum(CASE WHEN NOT ($permSqlSide) THEN v ELSE 0 END)
             |      AS BIGINT) AS ra,
             |    CAST(sum(CASE WHEN NOT ($permSqlSide) THEN 1 ELSE 0 END)
             |      AS BIGINT) AS ma,
             |    CAST(sum(CASE WHEN $permSqlSide THEN v ELSE 0 END)
             |      AS BIGINT) AS rb,
             |    CAST(sum(CASE WHEN $permSqlSide THEN 1 ELSE 0 END)
             |      AS BIGINT) AS mb
             |  FROM base CROSS JOIN reps GROUP BY rep),
             |cnt AS (SELECT CAST(1 + sum(CASE WHEN ma = 0 OR mb = 0
             |      OR abs(CAST(ra AS DOUBLE) / CAST(ma AS DOUBLE)
             |        - CAST(rb AS DOUBLE) / CAST(mb AS DOUBLE)) >= od.d_obs
             |    THEN 1 ELSE 0 END) AS BIGINT) AS p_num
             |  FROM perm, od)
             |SELECT od.n_a, od.n_b, cnt.p_num,
             |  round(CAST(cnt.p_num AS DOUBLE) / 200.0, 6) AS p_r6,
             |  cnt.p_num * 20 <= 200 AS reject_05
             |FROM od, cnt""".stripMargin)),

    // ---- q312: BH-FDR over the per-event-type randomization family —
    //      5 tests (user-parity split within each type), step-up at
    //      α = 0.05, all-integer threshold comparisons. ----
    "q312_bh_fdr" -> Q(
      (s, d) => bhStepUp(
          permutationPValues(Tables.events(s, d), col("event_type"),
            col("event_id"), round(col("value") * 100, 0).cast("long"),
            pmod(col("user_id"), lit(2L)), reps = 199),
          "test", "p_num", "p_den", alphaMilli = 50L)
        .select(col("test").as("event_type"), col("n_a"), col("n_b"),
          col("p_num"), col("bh_rank"), col("rejected"))
        .orderBy("event_type"),
      Some(s"""WITH base AS (SELECT event_type AS t, event_id AS id,
             |    CAST(round(value * 100) AS BIGINT) AS v,
             |    user_id % 2 AS sb
             |  FROM events),
             |obs AS (SELECT t,
             |    CAST(sum(CASE WHEN sb = 0 THEN v ELSE 0 END) AS BIGINT) AS sa,
             |    CAST(sum(CASE WHEN sb = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             |    CAST(sum(CASE WHEN sb = 1 THEN v ELSE 0 END) AS BIGINT) AS sbv,
             |    CAST(sum(CASE WHEN sb = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
             |  FROM base GROUP BY t),
             |od AS (SELECT t, n_a, n_b,
             |    abs(CAST(sa AS DOUBLE) / CAST(n_a AS DOUBLE)
             |      - CAST(sbv AS DOUBLE) / CAST(n_b AS DOUBLE)) AS d_obs
             |  FROM obs),
             |reps AS (SELECT CAST(range AS BIGINT) AS rep FROM range(199)),
             |perm AS (SELECT t, rep,
             |    CAST(sum(CASE WHEN NOT ($permSqlSide) THEN v ELSE 0 END)
             |      AS BIGINT) AS ra,
             |    CAST(sum(CASE WHEN NOT ($permSqlSide) THEN 1 ELSE 0 END)
             |      AS BIGINT) AS ma,
             |    CAST(sum(CASE WHEN $permSqlSide THEN v ELSE 0 END)
             |      AS BIGINT) AS rb,
             |    CAST(sum(CASE WHEN $permSqlSide THEN 1 ELSE 0 END)
             |      AS BIGINT) AS mb
             |  FROM base CROSS JOIN reps GROUP BY t, rep),
             |pv AS (SELECT od.t, od.n_a, od.n_b,
             |    CAST(1 + sum(CASE WHEN ma = 0 OR mb = 0
             |        OR abs(CAST(ra AS DOUBLE) / CAST(ma AS DOUBLE)
             |          - CAST(rb AS DOUBLE) / CAST(mb AS DOUBLE)) >= od.d_obs
             |      THEN 1 ELSE 0 END) AS BIGINT) AS p_num
             |  FROM perm JOIN od ON perm.t = od.t
             |  GROUP BY od.t, od.n_a, od.n_b),
             |ranked AS (SELECT t, n_a, n_b, p_num,
             |    CAST(row_number() OVER (ORDER BY p_num, t) AS BIGINT)
             |      AS bh_rank,
             |    count(*) OVER () AS m
             |  FROM pv),
             |flag AS (SELECT *,
             |    1000 * m * p_num <= bh_rank * 200 * 50 AS ok FROM ranked),
             |kmax AS (SELECT max(CASE WHEN ok THEN bh_rank END) AS km FROM flag)
             |SELECT t AS event_type, n_a, n_b, p_num, bh_rank,
             |  bh_rank <= coalesce(kmax.km, 0) AS rejected
             |FROM flag, kmax ORDER BY event_type""".stripMargin)),

    // ---- q314: MDE READOUT for the q296 experiment shape — per-user
    //      purchase milli, user-parity variants, α=0.05 / power=0.80
    //      z literals, exact moments. ----
    "q314_mde_power" -> Q(
      (s, d) => mdeTwoSample(
        Tables.events(s, d)
          .groupBy(col("user_id"))
          .agg(sum(when(col("event_type") === "purchase",
            round(col("value") * 1000, 0).cast("long")).otherwise(0L)).as("y"))
          .withColumn("variant", pmod(col("user_id"), lit(2L)))),
      Some("""WITH units AS (SELECT user_id, user_id % 2 AS variant,
             |    sum(CASE WHEN event_type = 'purchase'
             |      THEN CAST(round(value * 1000) AS BIGINT) ELSE 0 END) AS y
             |  FROM events GROUP BY user_id),
             |mom AS (SELECT
             |    CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT)
             |      AS n0,
             |    CAST(sum(CASE WHEN variant = 0 THEN CAST(y AS HUGEINT)
             |      ELSE 0 END) AS DOUBLE) AS s0,
             |    CAST(sum(CASE WHEN variant = 0 THEN CAST(y * y AS HUGEINT)
             |      ELSE 0 END) AS DOUBLE) AS q0,
             |    CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT)
             |      AS n1,
             |    CAST(sum(CASE WHEN variant = 1 THEN CAST(y AS HUGEINT)
             |      ELSE 0 END) AS DOUBLE) AS s1,
             |    CAST(sum(CASE WHEN variant = 1 THEN CAST(y * y AS HUGEINT)
             |      ELSE 0 END) AS DOUBLE) AS q1
             |  FROM units),
             |calc AS (SELECT n0, n1, s0 / CAST(n0 AS DOUBLE) AS mean0,
             |    (2.8015852181129683) * sqrt(
             |      (((CAST(n0 AS DOUBLE) * q0 - s0 * s0)
             |          / (CAST(n0 AS DOUBLE) * (CAST(n0 AS DOUBLE) - 1.0)))
             |        / CAST(n0 AS DOUBLE))
             |      + (((CAST(n1 AS DOUBLE) * q1 - s1 * s1)
             |          / (CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) - 1.0)))
             |        / CAST(n1 AS DOUBLE))) AS mde
             |  FROM mom)
             |SELECT n0 AS n_0, n1 AS n_1,
             |  round(mean0 / 1000.0, 6) AS mean_0_r6,
             |  round(mde / 1000.0, 6) AS mde_abs_r6,
             |  CASE WHEN mean0 <> 0.0 THEN round(mde / mean0, 6)
             |    ELSE NULL END AS mde_rel_r6
             |FROM calc""".stripMargin)))
}
