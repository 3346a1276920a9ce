package graft.rel

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.rel.RelQueries.Q
import graft.rel.Tables

/** ROBUST OUTLIER STATISTICS: the median/MAD modified z-score screen
  * (Iglewicz & Hoaglin 1993, "How to detect and handle outliers",
  * ASQC vol. 16: M = 0.6745·(x − median)/MAD, flag |M| > 3.5) — the
  * robust sibling of the q208 mean/σ z-score, immune to the outliers
  * it hunts.
  *
  * Both medians (of the values, then of the absolute deviations) are
  * EXACT lower medians via the q221 two-pass histogram-refinement
  * selection, factored here into the reusable [[exactMedianNonNeg]]:
  * no global sort ever happens. The outlier test itself is pure
  * integer arithmetic — 0.6745·dev/MAD > 3.5 ⇔ 6745·dev > 35000·MAD —
  * so the flag count is exact, and only the reported maximum modified
  * z-score touches floating point (one fixed division, rounded to 6).
  *
  * Scale shape: two narrow scans per median (≤64-row histogram agg +
  * one-bucket refinement, driver state bounded by the VALUE WIDTH,
  * never the data), one final scan for the flags. The deviation scan
  * reuses the checkpointed cents.
  */
object Robust {

  /** Exact LOWER median ((n+1) div 2-th smallest — DuckDB
    * quantile_disc(0.5)) of a non-negative long column, by power-of-two
    * histogram + single-bucket refinement (the q221 plan, with the
    * 0-bucket handled: bin(0) and bin(1) share width 1, so bucket 1
    * spans [0, 1]). Returns (n, median); requires n > 0. The input is
    * scanned twice — callers pass something cheap to rescan
    * (checkpointed or a column off a parquet scan).
    */
  def exactMedianNonNeg(df: DataFrame, c: String): (Long, Long) = {
    val vals = df.select(col(c).cast("long").as("c"))
    val hist = vals
      .select(length(bin(col("c"))).cast("long").as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("nb"))
      .orderBy("bucket")
      .collect() // ≤ 64 rows: bounded by value width, not data
    val n = hist.map(_.getLong(1)).sum
    require(n > 0, "exactMedianNonNeg: empty input")
    val k = (n + 1) / 2
    var cum = 0L; var target = 0L; var before = 0L
    hist.foreach { r =>
      if (target == 0L && cum + r.getLong(1) >= k) {
        target = r.getLong(0); before = cum
      }
      cum += r.getLong(1)
    }
    val lo = if (target <= 1) 0L else 1L << (target - 1)
    val hi = (1L << target) - 1
    val w = org.apache.spark.sql.expressions.Window
      .orderBy("c").rowsBetween(Long.MinValue, 0)
    val med = vals.filter(col("c") >= lo && col("c") <= hi)
      .groupBy("c").agg(count(lit(1)).as("cnt"))
      .withColumn("cum_in", sum("cnt").over(w))
      .filter(col("cum_in") >= lit(k - before))
      .agg(min("c").as("m"))
      .collect()(0).getLong(0) // the k-th smallest: a 1-row result
    (n, med)
  }

  /** GROUPED exact k-th smallest (k a per-group function of n) — the
    * two-pass histogram selection run for EVERY group in one pair of
    * scans: pass 1 aggregates the (group, power-of-two bucket)
    * histogram (driver state bounded by groups × value width — this is
    * a GROUP-BOUNDED primitive, document the group count like the
    * Distribution.scala windows); the driver locates each group's
    * target bucket; pass 2 re-scans only the in-bucket rows with the
    * per-group bounds broadcast, and a per-group window over ONE
    * bucket's distinct values picks the k-th. No group is ever sorted
    * whole — the single-task full-group sort is exactly what this
    * replaces. Returns (group, n, k, value).
    */
  def groupedExactKth(df: DataFrame, group: String, c: String,
      kOf: Long => Long): DataFrame =
    groupedExactRanks(df, group, c, n => Seq(0L -> kOf(n)))
      .select(col(group), col("n"), col("k"), col("value"))
      .orderBy(group)

  /** The multi-rank core behind [[groupedExactKth]] /
    * [[conformalThresholds]] / [[groupedExactQuantiles]]: SEVERAL
    * ranks per group, selected by ITERATIVE HISTOGRAM REFINEMENT
    * (distributed quickselect — the loop q221's single refinement is
    * the body of): `ranksOf(n)` returns (tag, k) pairs; each round
    * histograms every live (group, tag) range into ≤ 64 sub-buckets
    * (one narrow scan, ≤ groups·tags·65 rows to the driver — bounded
    * by the DESIGN, never the data) and narrows each range 64×, until
    * every range spans < 4096 values; the final per-(group, tag)
    * window then orders at most 4096 distinct values — NO task ever
    * holds a group, which is the entire point vs the per-group sort
    * window (QuantileBench measures the max-task cut). Rounds ≤
    * ⌈63/6⌉ + 1; typically 2–4. Returns (group, tag, n, k, value).
    */
  def groupedExactRanks(df: DataFrame, group: String, c: String,
      ranksOf: Long => Seq[(Long, Long)]): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    val vals = df.select(col(group).cast("string").as("g"),
      col(c).cast("long").as("c")).localCheckpoint()
    // round 0: the power-of-two width histogram seeds the ranges
    val hist = vals
      .select(col("g"), length(bin(col("c"))).cast("long").as("bucket"))
      .groupBy("g", "bucket").agg(count(lit(1)).as("nb"))
      .collect() // bounded: groups × ≤64 buckets
      .groupBy(_.getString(0))
    require(hist.nonEmpty, "groupedExactRanks: empty input")
    // (g, tag, n, k, lo, hi, need): the k-th smallest in-group is the
    // need-th smallest among values in [lo, hi]
    var state = hist.toSeq.flatMap { case (g, rows) =>
      val byBucket = rows.map(r => r.getLong(1) -> r.getLong(2))
        .sortBy(_._1)
      val n = byBucket.map(_._2).sum
      ranksOf(n).map { case (tag, k) =>
        require(k >= 1 && k <= n,
          s"groupedExactRanks: k=$k outside [1, $n] for group $g (tag $tag)")
        var cum = 0L; var target = 0L; var before = 0L
        byBucket.foreach { case (b, nb) =>
          if (target == 0L && cum + nb >= k) { target = b; before = cum }
          cum += nb
        }
        val lo = if (target <= 1) 0L else 1L << (target - 1)
        val hi = (1L << target) - 1
        (g, tag, n, k, lo, hi, k - before)
      }
    }
    val MaxSpan = 4096L
    var rounds = 0
    while (state.exists { case (_, _, _, _, lo, hi, _) => hi - lo >= MaxSpan }
        && rounds < 16) {
      rounds += 1
      val live = state.filter { case (_, _, _, _, lo, hi, _) => hi - lo >= MaxSpan }
      val steps = live.map { case (g, tag, _, _, lo, hi, _) =>
        (g, tag) -> ((hi - lo) / 64L + 1L)
      }.toMap
      val bdf = live.map { case (g, tag, _, _, lo, hi, _) =>
        (g, tag, lo, hi, steps((g, tag)))
      }.toDF("g", "tag", "lo", "hi", "step")
      val subCounts = vals.join(broadcast(bdf), "g")
        .filter(col("c") >= col("lo") && col("c") <= col("hi"))
        .groupBy(col("g"), col("tag"),
          ((col("c") - col("lo")) / col("step")).cast("long").as("sub"))
        .agg(count(lit(1)).as("nb"))
        .collect() // ≤ live-ranges × 65 rows
        .map(r => (r.getString(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3)))
        .groupBy(_._1).map { case (kk, xs) => kk -> xs.map(_._2).sortBy(_._1) }
      state = state.map {
        case st @ (g, tag, n, k, lo, hi, need) if hi - lo >= MaxSpan =>
          val step = steps((g, tag))
          var cum = 0L; var sub = -1L; var before = 0L
          subCounts((g, tag)).foreach { case (sb, nb) =>
            if (sub < 0 && cum + nb >= need) { sub = sb; before = cum }
            cum += nb
          }
          (g, tag, n, k, lo + sub * step,
            math.min(hi, lo + (sub + 1) * step - 1), need - before)
        case st => st
      }
    }
    val bounds = state
      .toDF("g", "tag", "n", "k", "lo", "hi", "need")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g", "tag").orderBy("c").rowsBetween(Long.MinValue, 0)
    vals.join(broadcast(bounds), "g")
      .filter(col("c") >= col("lo") && col("c") <= col("hi"))
      .groupBy(col("g"), col("tag"), col("n"), col("k"), col("need"), col("c"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("cum_in", sum("cnt").over(w))
      .filter(col("cum_in") >= col("need"))
      .groupBy(col("g"), col("tag"), col("n"), col("k"))
      .agg(min(col("c")).as("value"))
      .select(col("g").as(group), col("tag"), col("n"), col("k"), col("value"))
      .orderBy(group, "tag")
  }

  /** GROUPED EXACT QUANTILES in one histogram pass — the scalable
    * replacement for `percentile` sorts: every requested quantile of
    * every group rides the same two scans. Rank convention =
    * quantile_disc: k = ⌊q·(n−1)⌋ + 1 (lower quantile, matching the
    * q221-pinned identity at q = 500). Output: (group, q_milli, n,
    * value).
    */
  def groupedExactQuantiles(df: DataFrame, group: String, c: String,
      qMillis: Seq[Long]): DataFrame = {
    require(qMillis.nonEmpty && qMillis.forall(q => q >= 0 && q <= 1000),
      s"qMillis=$qMillis")
    groupedExactRanks(df, group, c,
      n => qMillis.map(q => q -> ((q * (n - 1)) / 1000L + 1L)))
      .select(col(group), col("tag").as("q_milli"), col("n"), col("value"))
      .orderBy(group, "q_milli")
  }

  /** SPLIT-CONFORMAL threshold per group (Vovk et al.; Angelopoulos &
    * Bates 2021, "A gentle introduction to conformal prediction"):
    * q̂ = the ⌈(1−α)(n+1)⌉-th smallest calibration nonconformity score
    * (clamped to n) — predictions within q̂ of the point estimate then
    * cover with probability ≥ 1−α on exchangeable data. Exact integer
    * rank selection via [[groupedExactKth]] — no sort, no
    * interpolation ambiguity. Output: (group, n, k, qhat_milli).
    */
  def conformalThresholds(df: DataFrame, group: String, scoreMilli: String,
      alphaMilli: Long): DataFrame = {
    require(alphaMilli >= 1 && alphaMilli <= 999, s"alphaMilli=$alphaMilli")
    groupedExactKth(df, group, scoreMilli, n =>
      math.min(n, ((1000L - alphaMilli) * (n + 1) + 999L) / 1000L))
      .withColumnRenamed("value", "qhat_milli")
  }

  /** Modified z-score outlier summary over a non-negative long metric:
    * one row (n, median, mad, n_outliers, max_mz_r6). mad = 0 (over
    * half the values equal the median) degenerates per Iglewicz-Hoaglin
    * to flagging every value off the median, and max_mz_r6 is null
    * (the score is undefined).
    */
  def madOutlierSummary(s: SparkSession, df: DataFrame, c: String): DataFrame = {
    val vals = df.select(col(c).cast("long").as("c")).localCheckpoint()
    val (n, med) = exactMedianNonNeg(vals, "c")
    val devs = vals.select(abs(col("c") - lit(med)).as("d"))
    val (_, mad) = exactMedianNonNeg(devs, "d")
    val mz: org.apache.spark.sql.Column =
      if (mad > 0)
        round((lit(0.6745) * col("maxd").cast("double")) / lit(mad.toDouble), 6)
      else lit(null).cast("double")
    devs
      .agg(sum(when(lit(6745L) * col("d") > lit(35000L) * lit(mad), 1L)
          .otherwise(0L)).as("n_outliers"),
        max(col("d")).as("maxd"))
      .select(lit(n).as("n"), lit(med).as("median"), lit(mad).as("mad"),
        col("n_outliers"), mz.as("max_mz_r6"))
  }

  /** WINSORIZED + TRIMMED MEANS per group (Tukey & McLaughlin 1963,
    * "Less vulnerable confidence and significance procedures";
    * winsorizing after Charles P. Winsor): the standard robust-metric
    * pair over a heavy-tailed measure — clamp values outside the
    * [loMilli, hiMilli] exact group quantiles (winsorize), or drop
    * them (trim). The quantile bounds come from
    * [[groupedExactQuantiles]] (the iterative histogram selection —
    * quantile_disc rank convention, NO per-group sort), so the whole
    * operator is two narrow histogram scans plus ONE clamp/filter
    * pass; sums are exact integer cents through decimal(38,0) with a
    * single IEEE division each.
    *
    * Output per group: (group, n, lo_cents, hi_cents, wins_mean_r6,
    * n_trim, trim_mean_r6) — means in metric units (cents/100). The
    * trim subset is value-based (v within the CLOSED quantile
    * interval), matching the clamp convention exactly; it is never
    * empty (both bounds are attained group values).
    */
  def winsorizedSummary(df: DataFrame, group: String, c: String,
      loMilli: Long = 50L, hiMilli: Long = 950L): DataFrame = {
    require(loMilli < hiMilli && loMilli >= 0 && hiMilli <= 1000,
      s"winsorizedSummary: bad quantile bounds [$loMilli, $hiMilli]")
    val vals = df.select(col(group).cast("string").as("g"),
      col(c).cast("long").as("v"))
    val bounds = groupedExactQuantiles(vals, "g", "v", Seq(loMilli, hiMilli))
      .groupBy("g")
      .agg(min(when(col("q_milli") === loMilli, col("value"))).as("lo"),
        min(when(col("q_milli") === hiMilli, col("value"))).as("hi"),
        min("n").as("n"))
    val isIn = col("v") >= col("lo") && col("v") <= col("hi")
    vals.join(broadcast(bounds), "g")
      .groupBy("g")
      .agg(min("n").as("n"), min("lo").as("lo"), min("hi").as("hi"),
        sum(least(greatest(col("v"), col("lo")), col("hi"))
          .cast("decimal(38,0)")).as("sw"),
        sum(when(isIn, col("v")).otherwise(0L).cast("decimal(38,0)"))
          .as("st"),
        sum(when(isIn, 1L).otherwise(0L)).as("n_trim"))
      .select(col("g").as(group), col("n"),
        col("lo").as("lo_cents"), col("hi").as("hi_cents"),
        round((col("sw").cast("double") / col("n").cast("double")) / 100.0, 6)
          .as("wins_mean_r6"),
        col("n_trim"),
        round((col("st").cast("double") / col("n_trim").cast("double")) / 100.0,
          6).as("trim_mean_r6"))
      .orderBy(group)
  }

  val all: ListMap[String, Q] = ListMap(
    // ---- q313: WINSORIZED + TRIMMED MEANS of order totals per market
    //      segment at the p05/p95 exact quantile bounds — the robust
    //      revenue metric over heavy tails; the oracle replays the
    //      quantile_disc rank convention via row_number and the same
    //      clamp/filter chain. ----
    "q313_winsorized" -> Q(
      (s, d) => winsorizedSummary(
        Tables.orders(s, d)
          .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
          .select(col("c_mktsegment").as("seg"),
            round(col("o_totalprice") * 100, 0).cast("long").as("v")),
        "seg", "v", 50L, 950L),
      Some("""WITH c AS (SELECT c_mktsegment AS seg,
             |    CAST(round(o_totalprice * 100) AS BIGINT) AS v
             |  FROM orders JOIN customer ON o_custkey = c_custkey),
             |rk AS (SELECT seg, v, row_number() OVER (
             |    PARTITION BY seg ORDER BY v) AS rn FROM c),
             |st AS (SELECT seg, count(*) AS n FROM c GROUP BY seg),
             |q(q_milli) AS (VALUES (50), (950)),
             |t AS (SELECT st.seg, q.q_milli, st.n,
             |    ((q.q_milli * (st.n - 1)) // 1000) + 1 AS k
             |  FROM st CROSS JOIN q),
             |b AS (SELECT t.seg,
             |    min(CASE WHEN t.q_milli = 50 THEN rk.v END) AS lo,
             |    min(CASE WHEN t.q_milli = 950 THEN rk.v END) AS hi,
             |    CAST(min(t.n) AS BIGINT) AS n
             |  FROM t JOIN rk ON rk.seg = t.seg AND rk.rn = t.k
             |  GROUP BY t.seg)
             |SELECT c.seg AS seg, any_value(b.n) AS n,
             |  any_value(b.lo) AS lo_cents, any_value(b.hi) AS hi_cents,
             |  round((CAST(sum(CAST(least(greatest(c.v, b.lo), b.hi)
             |        AS HUGEINT)) AS DOUBLE)
             |      / CAST(any_value(b.n) AS DOUBLE)) / 100.0, 6)
             |    AS wins_mean_r6,
             |  CAST(sum(CASE WHEN c.v >= b.lo AND c.v <= b.hi
             |    THEN 1 ELSE 0 END) AS BIGINT) AS n_trim,
             |  round((CAST(sum(CASE WHEN c.v >= b.lo AND c.v <= b.hi
             |        THEN CAST(c.v AS HUGEINT) ELSE 0 END) AS DOUBLE)
             |      / CAST(sum(CASE WHEN c.v >= b.lo AND c.v <= b.hi
             |        THEN 1 ELSE 0 END) AS DOUBLE)) / 100.0, 6)
             |    AS trim_mean_r6
             |FROM c JOIN b ON c.seg = b.seg
             |GROUP BY c.seg ORDER BY seg""".stripMargin)),

    // ---- q305: GROUPED EXACT PERCENTILES — p50/p90/p99 of line-item
    //      prices per return flag, every quantile of every group off
    //      ONE histogram pass; the oracle replays the exact rank
    //      convention via row_number (no quantile-function
    //      interpolation ambiguity). ----
    "q305_grouped_percentiles" -> Q(
      (s, d) => groupedExactQuantiles(
        Tables.lineitem(s, d).select(col("l_returnflag").as("flag"),
          round(col("l_extendedprice") * 100, 0).cast("long").as("c")),
        "flag", "c", Seq(500L, 900L, 990L)),
      Some("""WITH c AS (SELECT l_returnflag AS flag,
             |    CAST(round(l_extendedprice * 100) AS BIGINT) AS c
             |  FROM lineitem),
             |rk AS (SELECT flag, c, row_number() OVER (
             |    PARTITION BY flag ORDER BY c) AS rn FROM c),
             |st AS (SELECT flag, count(*) AS n FROM c GROUP BY flag),
             |q(q_milli) AS (VALUES (500), (900), (990)),
             |t AS (SELECT st.flag, q.q_milli, st.n,
             |    ((q.q_milli * (st.n - 1)) // 1000) + 1 AS k
             |  FROM st CROSS JOIN q)
             |SELECT t.flag AS flag, CAST(t.q_milli AS BIGINT) AS q_milli,
             |  t.n, rk.c AS value
             |FROM t JOIN rk ON rk.flag = t.flag AND rk.rn = t.k
             |ORDER BY flag, q_milli""".stripMargin)),

    // ---- q292: MAD OUTLIER SCREEN over order totals in cents — the
    //      robust flag count + the worst offender's modified z. Oracle:
    //      DuckDB quantile_disc(0.5) twice (= lower median, the q221
    //      pinned convention) + the same integer flag rule. ----
    "q292_mad_outliers" -> Q(
      (s, d) => madOutlierSummary(s,
        Tables.orders(s, d)
          .select(round(col("o_totalprice") * 100, 0).cast("long").as("c"))
          .filter(col("c") > 0),
        "c"),
      Some("""WITH c AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS c
             |  FROM orders WHERE round(o_totalprice * 100) > 0),
             |m AS (SELECT CAST(quantile_disc(c, 0.5) AS BIGINT) AS med,
             |    count(*) AS n FROM c),
             |dv AS (SELECT abs(c.c - m.med) AS d, m.med, m.n FROM c, m),
             |md AS (SELECT CAST(quantile_disc(d, 0.5) AS BIGINT) AS mad FROM dv)
             |SELECT any_value(dv.n) AS n, any_value(dv.med) AS median,
             |  any_value(md.mad) AS mad,
             |  CAST(sum(CASE WHEN 6745 * dv.d > 35000 * md.mad
             |    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
             |  CASE WHEN any_value(md.mad) > 0
             |    THEN round((0.6745 * CAST(max(dv.d) AS DOUBLE))
             |      / CAST(any_value(md.mad) AS DOUBLE), 6)
             |    ELSE NULL END AS max_mz_r6
             |FROM dv, md""".stripMargin)))
}
