package graft.rel

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.rel.RelQueries.Q

/** PRIVACY RISK AUDIT for release/training corpora — the structural
  * complement to the PII scrub (q74): scrubbing removes direct
  * identifiers, but a row can still be re-identified through its
  * QUASI-IDENTIFIER combination (Sweeney 2002). The audit computes,
  * per QI group, k-anonymity (group size — how many records hide this
  * combination) and l-diversity (distinct sensitive values — whether
  * knowing the group reveals the sensitive attribute even without
  * singling a row out), and flags violations of both thresholds.
  *
  * Scale shape: ONE keyed aggregation over the QI columns — count is
  * map-side combinable; the exact distinct runs as Spark's standard
  * two-phase expand-agg, keyed by (QI, sensitive), so no per-group
  * state exceeds the distinct-value count and nothing is collected.
  * Suppression (the enforcement half) is the same aggregate joined
  * back on the QI key — group sizes are entity-bounded, so the join
  * broadcasts when the QI space is small and hash-partitions when it
  * is not; no windows anywhere.
  */
object Privacy {

  /** Per-QI-group audit: (qiCols…, k_size, l_div, k_violation,
    * l_violation). `k_size` = rows in the group; `l_div` = distinct
    * non-null `sensitive` values; violations flag k_size < minK /
    * l_div < minL.
    */
  def kAnonymityAudit(df: DataFrame, qiCols: Seq[String], sensitive: Column,
      minK: Long, minL: Long): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("k_size"),
        countDistinct(sensitive).as("l_div"))
      .withColumn("k_violation", col("k_size") < minK)
      .withColumn("l_violation", col("l_div") < minL)
  }

  /** Suppression: null out every QI column on rows whose QI group has
    * fewer than `minK` members, leaving compliant groups untouched —
    * the minimal-distortion enforcement for the audit's k half.
    */
  def suppressSmallGroups(df: DataFrame, qiCols: Seq[String], minK: Long)
      : DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    val counts = df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("__kanon_n"))
    val joined = df.join(counts, qiCols)
    val small = col("__kanon_n") < minK
    qiCols.foldLeft(joined) { (acc, c) =>
      acc.withColumn(c, when(small, lit(null)).otherwise(col(c)))
    }.drop("__kanon_n")
  }

  /** GLOBAL RECODING generalization — the enforcement half that keeps
    * utility where [[suppressSmallGroups]] destroys it: coarsen a
    * numeric quasi-identifier to the SMALLEST bucket width (from a
    * caller-supplied ladder, conventionally powers of two) at which
    * every (categorical QI, bucket) group reaches `minK`. One scan
    * fans each row out over the ladder (|ladder| ≤ ~20 — a bounded
    * explode, not a shuffle multiplier), one keyed agg per candidate
    * width runs inside a single groupBy(width, qi, bucket), and the
    * qualifying-width argmin is a ladder-sized aggregation. Returns
    * the generalized groups under the chosen width, with the width as
    * a column. Negative values are handled by the caller shifting to
    * non-negative (the q241 integer-cents convention) so floor ≡
    * truncation and both engines run the identical double op.
    *
    * If NO ladder width qualifies the result is empty — ladders should
    * end with a width wide enough to pool everything (the spec pins
    * this contract loudly rather than silently suppressing).
    */
  def generalizeNumericQi(df: DataFrame, catQi: String, numQi: Column,
      widths: Seq[Long], minK: Long): DataFrame = {
    require(widths.nonEmpty && widths.forall(_ > 0), "need positive widths")
    val fanned = df.select(col(catQi), numQi.as("__gq_v"))
      .withColumn("__gq_w", explode(array(widths.map(lit): _*)))
      .withColumn("__gq_b",
        floor(col("__gq_v") / col("__gq_w").cast("double")).cast("long"))
    val groups = fanned.groupBy(col("__gq_w"), col(catQi), col("__gq_b"))
      .agg(count(lit(1)).as("k_size"))
    val qualifying = groups.groupBy("__gq_w")
      .agg(min(col("k_size")).as("__gq_min"))
      .filter(col("__gq_min") >= minK)
      .agg(min(col("__gq_w")).as("__gq_w"))
    groups.join(broadcast(qualifying), "__gq_w")
      .select(col(catQi), col("__gq_w").as("width"),
        col("__gq_b").as("bucket"), col("k_size"))
  }

  /** T-CLOSENESS AUDIT, ordered EMD (Li, Li & Venkatasubramanian
    * ICDE'07, "t-closeness: privacy beyond k-anonymity and
    * l-diversity", §4's ordered-distance): k and l say nothing when a
    * small group's sensitive DISTRIBUTION leaks (all high balances in
    * one (nation, segment) cell passes l = 3 and still discloses).
    * Per QI group, the earth-mover's distance between the group's
    * sensitive-value distribution and the GLOBAL one over the ordered
    * domain:  t = (1/(m−1)) · Σ_i |Σ_{j≤i} (p_j − q_j)|.
    *
    * EXACT: with integer counts (c_v per group of size k; g_v global
    * of n), each cumulative term is |Σc·n − Σg·k| / (k·n), so
    * t_milli = (1000 · Σ_i |cumC_i·n − cumG_i·k|) div ((m−1)·k·n) —
    * pure integers (DECIMAL(38,0) against n² headroom) until the one
    * truncating div both engines share. Values ABSENT from a group
    * still shift its cumulative mass — every group is completed over
    * the full ordered domain first.
    *
    * Scale shape: the sensitive domain is value-bounded (m bands), so
    * the completion is a groups × m fan-out off a broadcast domain
    * table, the per-group window orders exactly m rows, and nothing
    * scales beyond |groups|·m. Output: (qiCols…, k_size,
    * t_emd_milli, t_violation).
    */
  def tClosenessAudit(df: DataFrame, qiCols: Seq[String], sensitive: Column,
      tMilli: Long): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    require(tMilli >= 0 && tMilli <= 1000, s"tMilli=$tMilli")
    val base = df.select(qiCols.map(col) :+ sensitive.cast("long").as("__tc_v"): _*)
      .filter(col("__tc_v").isNotNull)
    val dom = base.groupBy(col("__tc_v")).agg(count(lit(1)).as("__tc_g"))
    val groups = base.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("k_size"))
    val cv = base.groupBy(qiCols.map(col) :+ col("__tc_v"): _*)
      .agg(count(lit(1)).as("__tc_c"))
    val completed = groups.crossJoin(broadcast(dom))
      .join(cv, qiCols :+ "__tc_v", "left")
      .withColumn("__tc_c", coalesce(col("__tc_c"), lit(0L)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(qiCols.map(col): _*).orderBy("__tc_v")
      .rowsBetween(Long.MinValue, 0)
    val tot = dom.agg(sum(col("__tc_g")).as("__tc_n"),
      count(lit(1)).as("__tc_m"))
    completed
      .withColumn("__tc_cc", sum(col("__tc_c")).over(w))
      .withColumn("__tc_cg", sum(col("__tc_g")).over(w))
      .crossJoin(broadcast(tot))
      .groupBy(qiCols.map(col) :+ col("k_size") :+ col("__tc_n")
        :+ col("__tc_m"): _*)
      .agg(sum(abs((col("__tc_cc").cast("decimal(38,0)") * col("__tc_n"))
        - (col("__tc_cg").cast("decimal(38,0)") * col("k_size"))))
        .as("__tc_num"))
      .select(qiCols.map(col) :+ col("k_size") :+
        when(col("__tc_m") <= 1, lit(0L)).otherwise(
          expr("""(1000 * __tc_num) div ((__tc_m - 1)
                  * (CAST(k_size AS DECIMAL(19,0))
                    * CAST(__tc_n AS DECIMAL(19,0))))""")
            .cast("long")).as("t_emd_milli"): _*)
      .withColumn("t_violation", col("t_emd_milli") > tMilli)
  }

  /** q241: audit the customer table with QI = (nation, market segment)
    * and sensitive = the account-balance band (2000-dollar buckets via
    * the integer-cents house rule — the +100000 shift keeps the
    * dividend non-negative so floor ≡ truncation and both engines run
    * the identical exact double op). One row per QI group with k, l,
    * and both violation flags; at this corpus scale several (nation,
    * segment) cells fall under k = 10 — real findings, not an empty
    * report.
    */
  val all: ListMap[String, Q] = ListMap(
    // ---- q297: T-CLOSENESS — the q241 fixture's distribution half:
    //      per (nation, segment) group, ordered EMD between the
    //      balance-band distribution and the global one, flagged at
    //      t = 0.25. Some small cells legitimately exceed it — real
    //      findings over the same groups q241 already flags on k/l. ----
    "q297_t_closeness" -> Q(
      (s, d) => {
        val cents = round(col("c_acctbal") * 100).cast("long")
        val band = floor((cents + lit(100000L)) / lit(200000.0)).cast("long")
        tClosenessAudit(
          Tables.customer(s, d)
            .select(col("c_nationkey").cast("long").as("nation"),
              col("c_mktsegment").as("seg"), band.as("bal_band")),
          Seq("nation", "seg"), col("bal_band"), tMilli = 250L)
          .orderBy("nation", "seg")
      },
      Some("""WITH b AS (
             |  SELECT CAST(c_nationkey AS BIGINT) AS nation,
             |    c_mktsegment AS seg,
             |    CAST(floor((CAST(round(c_acctbal * 100) AS BIGINT)
             |      + 100000) / 200000.0) AS BIGINT) AS v
             |  FROM customer),
             |dom AS (SELECT v, count(*) AS g FROM b GROUP BY v),
             |tot AS (SELECT CAST(sum(g) AS HUGEINT) AS n, count(*) AS m
             |  FROM dom),
             |grp AS (SELECT nation, seg, count(*) AS k_size
             |  FROM b GROUP BY 1, 2),
             |cv AS (SELECT nation, seg, v, count(*) AS c
             |  FROM b GROUP BY 1, 2, 3),
             |comp AS (SELECT g.nation, g.seg, g.k_size, d.v, d.g,
             |    coalesce(cv.c, 0) AS c
             |  FROM grp g CROSS JOIN dom d
             |  LEFT JOIN cv ON cv.nation = g.nation AND cv.seg = g.seg
             |    AND cv.v = d.v),
             |cum AS (SELECT nation, seg, k_size,
             |    sum(c) OVER (PARTITION BY nation, seg ORDER BY v
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc,
             |    sum(g) OVER (PARTITION BY nation, seg ORDER BY v
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cg
             |  FROM comp),
             |agg AS (SELECT nation, seg, k_size,
             |    sum(abs((CAST(cc AS HUGEINT) * (SELECT n FROM tot))
             |      - (CAST(cg AS HUGEINT) * k_size))) AS num
             |  FROM cum GROUP BY 1, 2, 3),
             |fin AS (SELECT nation, seg, CAST(k_size AS BIGINT) AS k_size,
             |    CAST((1000 * num) // (((SELECT m FROM tot) - 1)
             |      * (CAST(k_size AS HUGEINT) * (SELECT n FROM tot)))
             |      AS BIGINT) AS t_emd_milli
             |  FROM agg)
             |SELECT nation, seg, k_size, t_emd_milli,
             |  t_emd_milli > 250 AS t_violation
             |FROM fin ORDER BY nation, seg""".stripMargin)),

    "q241_k_anonymity" -> Q(
      (s, d) => {
        val cents = round(col("c_acctbal") * 100).cast("long")
        val band = floor((cents + lit(100000L)) / lit(200000.0)).cast("long")
        kAnonymityAudit(
          Tables.customer(s, d)
            .select(col("c_nationkey").cast("long").as("nation"),
              col("c_mktsegment").as("seg"), band.as("bal_band")),
          Seq("nation", "seg"), col("bal_band"), minK = 10L, minL = 3L)
          .select(col("nation"), col("seg"), col("k_size").cast("long"),
            col("l_div").cast("long"), col("k_violation"), col("l_violation"))
          .orderBy("nation", "seg")
      },
      Some("""WITH b AS (
             |  SELECT CAST(c_nationkey AS BIGINT) AS nation,
             |    c_mktsegment AS seg,
             |    CAST(floor((CAST(round(c_acctbal * 100) AS BIGINT)
             |      + 100000) / 200000.0) AS BIGINT) AS bal_band
             |  FROM customer),
             |g AS (SELECT nation, seg, count(*) AS k_size,
             |    count(DISTINCT bal_band) AS l_div
             |  FROM b GROUP BY 1, 2)
             |SELECT nation, seg, CAST(k_size AS BIGINT) AS k_size,
             |  CAST(l_div AS BIGINT) AS l_div,
             |  k_size < 10 AS k_violation, l_div < 3 AS l_violation
             |FROM g ORDER BY nation, seg""".stripMargin)),

    // ---- q249: GLOBAL RECODING — coarsen the balance (shifted cents)
    //      to the smallest power-of-2-of-100 width at which every
    //      (segment, bucket) cell holds ≥ 25 customers; emit the
    //      generalized groups under that width. The oracle fans the
    //      same ladder with a VALUES CTE and replays the argmin. ----
    "q249_generalize" -> Q(
      (s, d) => {
        val cents = round(col("c_acctbal") * 100).cast("long") + lit(100000L)
        generalizeNumericQi(
          Tables.customer(s, d)
            .select(col("c_mktsegment").as("seg"), cents.as("v")),
          "seg", col("v"), widths = (0 to 14).map(j => 100L << j), minK = 25L)
          .select(col("seg"), col("width"), col("bucket"),
            col("k_size").cast("long"))
          .orderBy("seg", "bucket")
      },
      Some("""WITH w(w) AS (VALUES (100),(200),(400),(800),(1600),(3200),
             |  (6400),(12800),(25600),(51200),(102400),(204800),(409600),
             |  (819200),(1638400)),
             |b AS (SELECT c_mktsegment AS seg,
             |    CAST(round(c_acctbal * 100) AS BIGINT) + 100000 AS v
             |  FROM customer),
             |f AS (SELECT w.w, b.seg,
             |    CAST(floor(v / CAST(w.w AS DOUBLE)) AS BIGINT) AS bucket
             |  FROM b, w),
             |g AS (SELECT w, seg, bucket, count(*) AS k_size
             |  FROM f GROUP BY 1, 2, 3),
             |q AS (SELECT min(w) AS w FROM (
             |  SELECT w, min(k_size) AS mk FROM g GROUP BY 1) t
             |  WHERE mk >= 25)
             |SELECT g.seg, CAST(g.w AS BIGINT) AS width,
             |  g.bucket, CAST(g.k_size AS BIGINT) AS k_size
             |FROM g JOIN q ON g.w = q.w
             |ORDER BY seg, bucket""".stripMargin))
  )
}
