package graft.rel

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.rel.RelQueries.Q

/** DATA-QUALITY AUDIT — declarative constraint checking over a table
  * (the Deequ/Great-Expectations shape): each rule is a boolean
  * violation predicate; the audit reports exact violation counts per
  * rule. The quality gate a pipeline runs before promoting a batch.
  *
  * Scale shape (100 TB): every row-local rule is folded into ONE
  * narrow pass (a single aggregation of sum(CASE…) columns — adding a
  * rule adds zero passes); uniqueness is one keyed agg; referential
  * integrity is one anti-join (broadcast when the parent's keys fit,
  * shuffle otherwise — Catalyst picks). Violation counts, not
  * violating rows, cross the wire.
  */
object Quality {

  /** One-pass audit of row-local rules: (rule, violations) with one
    * row per rule, exact counts, single scan regardless of rule count.
    */
  def audit(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "audit needs at least one rule")
    val agg = df.agg(
      sum(when(rules.head._2, 1L).otherwise(0L)).as(rules.head._1),
      rules.tail.map { case (n, c) => sum(when(c, 1L).otherwise(0L)).as(n) }: _*)
    val stackArgs = rules.map { case (n, _) => s"'$n', `$n`" }.mkString(", ")
    agg.select(expr(s"stack(${rules.length}, $stackArgs) AS (rule, violations)"))
  }

  /** Duplicate-key violations: rows beyond the first per key. */
  def duplicateKeys(df: DataFrame, name: String, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("c"))
      .agg(coalesce(sum(col("c") - 1), lit(0L)).as("violations"))
      .select(lit(name).as("rule"), col("violations"))

  /** Referential-integrity violations: child rows whose key has no
    * parent (null-safe: a null child key is an orphan).
    */
  def orphans(child: DataFrame, name: String, childKey: String,
      parent: DataFrame, parentKey: String): DataFrame =
    child.join(parent.select(col(parentKey).as(childKey)).distinct(),
        Seq(childKey), "left_anti")
      .agg(count(lit(1)).as("violations"))
      .select(lit(name).as("rule"), col("violations"))

  /** q139: the lineitem/orders audit — three row-local rules in one
    * scan, key uniqueness, and referential integrity, all exact counts
    * the oracle recomputes directly. (The fixture is clean, so most
    * counts pin at zero — the checked claim is the counts, whatever
    * they are.)
    */
  /** FUNCTIONAL-DEPENDENCY AUDIT — does X → Y actually hold in the
    * data? Per claimed dependency: distinct X values, X values bound
    * to MORE than one Y (the violations), the worst fan-out, and the
    * verdict. One keyed count-distinct per dependency (two map-side
    * combinable aggs), one summary row out — the schema-inference /
    * normalization pre-check, and the FD sibling of the q257 key
    * audit.
    */
  def fdAudit(name: String, df: DataFrame, lhs: Seq[String], rhs: String)
      : DataFrame = {
    val per = df.groupBy(lhs.map(col): _*)
      .agg(countDistinct(col(rhs)).as("__nrhs"))
    per.agg(count(lit(1)).as("n_lhs"),
        sum(when(col("__nrhs") > 1, 1L).otherwise(0L)).as("n_violating_lhs"),
        max(col("__nrhs")).as("max_fanout"))
      .select(lit(name).as("dependency"), col("n_lhs"),
        col("n_violating_lhs"), col("max_fanout"),
        (col("n_violating_lhs") === 0).as("fd_holds"))
  }

  /** Benford first-digit expectations log₁₀(1+1/d), d = 1..9, in
    * micro units — literals generated once here and embedded in BOTH
    * the plan and the oracle (the q325 literal-table rule: no runtime
    * libm on either side).
    */
  private[rel] val BenfordMicro: IndexedSeq[Long] =
    (1 to 9).map(dd => math.round(math.log10(1.0 + 1.0 / dd) * 1e6))

  /** BENFORD'S-LAW AUDIT (Newcomb 1881, Benford 1938; Nigrini 1996's
    * fraud screen): observed first-significant-digit distribution of a
    * positive integer column vs log₁₀(1+1/d), with the χ²(8) goodness
    * of fit. A fabricated or truncated money column fails this screen
    * before any semantic check can see it. Counts exact from one hash
    * aggregation over the 9-digit domain; expectations are the literal
    * micro table; each χ² term one IEEE chain and the digit sum
    * ORDER-PINNED (q300 rule). Output per digit, ordered: (digit,
    * n_obs, obs_milli, exp_milli, chi2_r6, conforms) — the last two
    * constant across rows, the per-digit report self-contained.
    * Non-positive values are excluded (no first significant digit).
    */
  def benfordAudit(df: DataFrame, c: String): DataFrame =
    benfordFromCounts(benfordCounts(df, c))

  /** The MERGEABLE half of [[benfordAudit]]: per-first-digit counts —
    * a plain streaming-legal aggregation, so the audit can run at
    * ingest (the q330 split: the stream maintains state, the readout
    * is batch over the 9-row table).
    */
  def benfordCounts(df: DataFrame, c: String): DataFrame =
    df.select(col(c).cast("long").as("v")).filter(col("v") > 0)
      .select(substring(col("v").cast("string"), 1, 1).cast("long")
        .as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n_obs"))

  /** The readout half: (digit, n_obs) counts → the full per-digit
    * report with the χ²(8) conformance flag.
    */
  def benfordFromCounts(observed: DataFrame): DataFrame = {
    // dense 1..9 domain: a digit that never occurs still owes its
    // (0 - expected)^2/expected term — dropping it understates chi2
    val digits = observed.sparkSession.range(1, 10)
      .select(col("id").as("digit"))
      .join(observed, Seq("digit"), "left")
      .na.fill(0L, Seq("n_obs"))
    val expCol = BenfordMicro.zipWithIndex
      .map { case (vv, i) => ((i + 1).toLong, vv) }
      .foldRight(lit(null).cast("long")) { case ((dd, vv), rest) =>
        when(col("digit") === dd, lit(vv)).otherwise(rest)
      }
    // no positive values -> no first digits: raise, don't divide by 0
    val tot = digits.agg(
      when(sum("n_obs") > 0, sum("n_obs")).otherwise(raise_error(
        lit("benfordAudit: no positive values to audit"))).as("n"))
    val wCum = Window.orderBy("digit").rowsBetween(Long.MinValue, 0)
    val terms = digits.crossJoin(broadcast(tot))
      .withColumn("exp_micro", expCol)
      .withColumn("expected",
        col("n").cast("double") * col("exp_micro").cast("double") / 1e6)
      .withColumn("term",
        (col("n_obs").cast("double") - col("expected"))
          * (col("n_obs").cast("double") - col("expected")) / col("expected"))
      .withColumn("chi2", sum("term").over(wCum))
      .withColumn("chi2_last", max(struct(col("digit"), col("chi2")))
        .over(Window.partitionBy()))
    terms.select(col("digit"), col("n_obs"),
        expr("(n_obs * 1000) div n").as("obs_milli"),
        expr("exp_micro div 1000").as("exp_milli"),
        round(col("chi2_last.chi2"), 6).as("chi2_r6"))
      .withColumn("conforms",
        col("chi2_r6") <= lit(Inference.Chi2Crit05(7)))
      .orderBy("digit")
  }

  /** One oracle string for q329 and its streaming twin — the q330
    * shared-contract rule.
    */
  private val BenfordOracleSql: Option[String] = Some(
    s"""WITH v AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT)
       |    AS v FROM lineitem
       |  WHERE CAST(round(l_extendedprice * 100) AS BIGINT) > 0),
       |o AS (SELECT CAST(substr(CAST(v AS VARCHAR), 1, 1) AS BIGINT)
       |    AS digit, count(*) AS n_obs
       |  FROM v GROUP BY 1),
       |dom AS (SELECT CAST(unnest(generate_series(1, 9)) AS BIGINT)
       |    AS digit),
       |ex AS (SELECT * FROM (VALUES ${Quality.BenfordMicro.zipWithIndex
         .map { case (vv, i) => s"(${i + 1}, $vv)" }
         .mkString(", ")}) AS t(digit, exp_micro)),
       |dd AS (SELECT dom.digit, coalesce(o.n_obs, 0) AS n_obs
       |  FROM dom LEFT JOIN o USING (digit)),
       |tot AS (SELECT sum(n_obs) AS n FROM dd),
       |t AS (SELECT dd.digit, dd.n_obs, ex.exp_micro, tot.n,
       |    CAST(tot.n AS DOUBLE) * CAST(ex.exp_micro AS DOUBLE) / 1e6
       |      AS expected
       |  FROM dd JOIN ex ON ex.digit = dd.digit, tot),
       |x AS (SELECT sum((CAST(n_obs AS DOUBLE) - expected)
       |    * (CAST(n_obs AS DOUBLE) - expected) / expected
       |    ORDER BY digit) AS chi2 FROM t)
       |SELECT t.digit, CAST(t.n_obs AS BIGINT) AS n_obs,
       |  CAST((t.n_obs * 1000) // t.n AS BIGINT) AS obs_milli,
       |  CAST(t.exp_micro // 1000 AS BIGINT) AS exp_milli,
       |  round(x.chi2, 6) AS chi2_r6,
       |  round(x.chi2, 6) <= 15.50731305586545 AS conforms
       |FROM t, x ORDER BY t.digit""".stripMargin)

  /** POPULATION STABILITY INDEX between a reference and a current
    * window of the same feature (the credit-scoring drift monitor,
    * standard thresholds 0.1 "watch" / 0.2 "act"):
    *
    *   PSI = Σ_bins (p_i − q_i) · ln(p_i / q_i)
    *
    * over FIXED-WIDTH bins (replayable, no quantile machinery), with
    * Laplace-smoothed shares p_i = (c_i + 1)/(n + B) so an empty bin
    * contributes a finite, documented penalty instead of the IEEE
    * infinity. The bin table is COMPLETED to the full 0..B−1 range
    * before the fold — a bin empty in BOTH windows still carries its
    * smoothed (1/(n+B)) shares, so p and q each sum to exactly 1 and
    * n_bins is the configured B, not the observed count.
    *
    * Exactness: bin counts are exact integers from one conditional
    * hash aggregation (both windows in ONE pass — adding a window
    * adds zero passes); each bin's PSI term is one fixed IEEE chain
    * over integers; the fold rides the ORDER-PINNED ≤`bins`-row
    * window. Output (1 row): (n_ref, n_cur, n_bins, psi_r6, drifted =
    * psi ≥ 0.2).
    */
  def psi(df: DataFrame, isRef: Column, value: Column, binWidth: Long,
      bins: Int): DataFrame = {
    require(binWidth >= 1, s"binWidth must be >= 1: $binWidth")
    require(bins >= 2 && bins <= 100, s"2 <= bins <= 100: $bins")
    val base = df
      .select(when(isRef, 1L).otherwise(0L).as("r"),
        greatest(value.cast("long"), lit(0L)).as("vv"))
      .select(col("r"),
        least(expr(s"vv div $binWidth"), lit(bins - 1L)).as("b"))
    // complete to the full bin range: a bin empty in BOTH windows must
    // still carry its smoothed shares or p/q no longer sum to 1 (and
    // n_bins would silently report the observed, not configured, count)
    val cells = df.sparkSession.range(bins.toLong)
      .select(col("id").as("b"))
      .join(base.groupBy("b")
        .agg(sum(col("r")).as("cr0"), sum(lit(1L) - col("r")).as("cc0")),
        Seq("b"), "left")
      .select(col("b"), coalesce(col("cr0"), lit(0L)).as("cr"),
        coalesce(col("cc0"), lit(0L)).as("cc"))
    val tot = base.agg(sum(col("r")).as("nr"),
      sum(lit(1L) - col("r")).as("nc"))
    val terms = cells.crossJoin(broadcast(tot))
      .select(col("b"), col("nr"), col("nc"),
        ((col("cr") + 1L).cast("double")
          / (col("nr") + bins.toLong).cast("double")).as("p"),
        ((col("cc") + 1L).cast("double")
          / (col("nc") + bins.toLong).cast("double")).as("q"))
      .withColumn("term", (col("p") - col("q")) * log(col("p") / col("q")))
    val wCum = Window.orderBy("b").rowsBetween(Long.MinValue, 0)
    terms
      .withColumn("cum", sum(col("term")).over(wCum))
      .withColumn("k", count(lit(1)).over(wCum))
      .agg(max(struct(col("b"), col("nr"), col("nc"), col("k"),
        col("cum"))).as("z"))
      .select(col("z.nr").as("n_ref"), col("z.nc").as("n_cur"),
        col("z.k").as("n_bins"), round(col("z.cum"), 6).as("psi_r6"),
        (col("z.cum") >= 0.2).as("drifted"))
  }

  /** KOLMOGOROV–SMIRNOV DRIFT between two windows of the same
    * feature — the distribution-shape complement to [[psi]]'s binned
    * shares: KS = max_v |F_ref(v) − F_cur(v)|, computed EXACTLY with
    * no division until the edge: the sup runs over integer
    * cross-products |n_cur·cumRef(v) − n_ref·cumCur(v)| (ties → the
    * smallest v), divided once by n_ref·n_cur at the end. No binning
    * bias, no smoothing — the statistic a two-sample test would use.
    *
    * Scale shape: one conditional hash aggregation to the DISTINCT-
    * VALUE table (bounded for quantized features — cents, milli — by
    * their domain, not the corpus; the operator contract, like the
    * NegSample vocabulary window) + the order-pinned cumulative
    * window over it.
    *
    * Output (1 row): (n_ref, n_cur, ks_r6, ks_at).
    */
  def ksDrift(df: DataFrame, isRef: Column, value: Column): DataFrame = {
    val dec38 = org.apache.spark.sql.types.DataTypes
      .createDecimalType(38, 0)
    val base = df.select(when(isRef, 1L).otherwise(0L).as("r"),
      value.cast("long").as("v"))
    val cells = base.groupBy("v")
      .agg(sum(col("r")).as("cr"), sum(lit(1L) - col("r")).as("cc"))
    val wCum = Window.orderBy("v").rowsBetween(Long.MinValue, 0)
    val wAll = Window.partitionBy()
    val terms = cells
      .withColumn("cumr", sum(col("cr")).over(wCum))
      .withColumn("cumc", sum(col("cc")).over(wCum))
      .withColumn("nr", sum(col("cr")).over(wAll))
      .withColumn("nc", sum(col("cc")).over(wAll))
      .select(col("v"), col("nr"), col("nc"),
        abs(col("nc").cast(dec38) * col("cumr")
          - col("nr").cast(dec38) * col("cumc")).as("num"))
    terms
      .agg(max(struct(col("num"), (-col("v")).as("negv"), col("v"),
        col("nr"), col("nc"))).as("z"))
      .select(
        when(col("z.nr") === 0L || col("z.nc") === 0L, raise_error(lit(
          "ksDrift: both windows must be non-empty")))
          .otherwise(col("z.nr")).as("n_ref"),
        col("z.nc").as("n_cur"),
        round(col("z.num").cast("double")
          / (col("z.nr").cast("double") * col("z.nc").cast("double")), 6)
          .as("ks_r6"),
        col("z.v").as("ks_at"))
  }

  val all: ListMap[String, Q] = ListMap(
    // ---- q401: KS DRIFT — the exact two-sample sup statistic on the
    //      q392 purchase windows; the oracle replays the distinct-
    //      value cumulative table and the integer cross-product
    //      argmax. ----
    "q401_ks_drift" -> Q(
      (s, d) => ksDrift(
        Tables.events(s, d).filter(col("event_type") === "purchase"),
        col("ts") < lit("2024-01-16").cast("timestamp"),
        round(col("value") * 100, 0)),
      Some("""WITH base AS (SELECT
             |    CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
             |      THEN 1 ELSE 0 END AS r,
             |    CAST(round(value * 100) AS BIGINT) AS v
             |  FROM events WHERE event_type = 'purchase'),
             |cells AS (SELECT v, sum(r) AS cr, sum(1 - r) AS cc
             |  FROM base GROUP BY v),
             |cum AS (SELECT v,
             |    sum(cr) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
             |      PRECEDING AND CURRENT ROW) AS cumr,
             |    sum(cc) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
             |      PRECEDING AND CURRENT ROW) AS cumc,
             |    sum(cr) OVER () AS nr, sum(cc) OVER () AS nc
             |  FROM cells),
             |tm AS (SELECT v, nr, nc,
             |    abs(CAST(nc AS HUGEINT) * cumr
             |      - CAST(nr AS HUGEINT) * cumc) AS num
             |  FROM cum),
             |mx AS (SELECT v, nr, nc, num FROM tm
             |  ORDER BY num DESC, v LIMIT 1)
             |SELECT CAST(nr AS BIGINT) AS n_ref,
             |  CAST(nc AS BIGINT) AS n_cur,
             |  round(CAST(num AS DOUBLE)
             |    / (CAST(nr AS DOUBLE) * CAST(nc AS DOUBLE)), 6) AS ks_r6,
             |  v AS ks_at
             |FROM mx""".stripMargin)),

    // ---- q398: STREAMING PSI — the q392 monitor with the CURRENT
    //      window arriving as a 3-batch stream (last batch REPLAYED,
    //      at-least-once); appended rows dedup by event id, so the
    //      drift readout equals the one-shot batch PSI bit-for-bit —
    //      the oracle IS q392's. ----
    "q398_psi_stream" -> Q(
      (s, d) => {
        import s.implicits._
        implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
        import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
        val purch = Tables.events(s, d)
          .filter(col("event_type") === "purchase")
        val work = java.nio.file.Files.createTempDirectory("graft-q398")
        val ckDir = java.nio.file.Files.createTempDirectory("graft-q398-ck")
        sys.addShutdownHook {
          def rm(f: java.io.File): Unit = {
            Option(f.listFiles()).foreach(_.foreach(rm))
            f.delete(); ()
          }
          rm(work.toFile); rm(ckDir.toFile)
        }
        val arriving = purch
          .filter(col("ts") >= lit("2024-01-16").cast("timestamp"))
          .select(col("event_id"),
            round(col("value") * 100, 0).cast("long").as("v"))
          .as[(Long, Long)].collect()
        val (b12, b3) = arriving.partition(_._1 % 3 != 2)
        val (b1, b2) = b12.partition(_._1 % 3 == 0)
        val mem = MemoryStream[(Long, Long)]
        val q = mem.toDF.toDF("event_id", "v").writeStream
          .foreachBatch { (batch: DataFrame, _: Long) =>
            batch.write.mode("append").parquet(s"$work/cur")
          }
          .option("checkpointLocation", ckDir.toString)
          .start()
        try {
          mem.addData(b1.toSeq); q.processAllAvailable()
          mem.addData(b2.toSeq); q.processAllAvailable()
          mem.addData(b3.toSeq); q.processAllAvailable()
          mem.addData(b3.toSeq); q.processAllAvailable() // replay
        } finally q.stop()
        val cur = s.read.parquet(s"$work/cur")
          .dropDuplicates("event_id")
          .select(col("v"), lit(0L).as("r"))
        val ref = purch
          .filter(col("ts") < lit("2024-01-16").cast("timestamp"))
          .select(round(col("value") * 100, 0).cast("long").as("v"),
            lit(1L).as("r"))
        psi(ref.unionAll(cur), col("r") === 1L, col("v"),
          binWidth = 2000L, bins = 20)
      },
      Some("""WITH base AS (SELECT
             |    CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
             |      THEN 1 ELSE 0 END AS r,
             |    least(greatest(CAST(round(value * 100) AS BIGINT), 0)
             |      // 2000, 19) AS b
             |  FROM events WHERE event_type = 'purchase'),
             |cells AS (SELECT g.b, coalesce(c.cr, 0) AS cr,
             |    coalesce(c.cc2, 0) AS cc2
             |  FROM (SELECT unnest(range(0, 20)) AS b) g
             |  LEFT JOIN (SELECT b, sum(r) AS cr, sum(1 - r) AS cc2
             |    FROM base GROUP BY b) c ON c.b = g.b),
             |tot AS (SELECT sum(r) AS nr, sum(1 - r) AS nc FROM base),
             |trm AS (SELECT b, nr, nc,
             |    (CAST(cr + 1 AS DOUBLE) / CAST(nr + 20 AS DOUBLE)
             |      - CAST(cc2 + 1 AS DOUBLE) / CAST(nc + 20 AS DOUBLE))
             |    * ln((CAST(cr + 1 AS DOUBLE) / CAST(nr + 20 AS DOUBLE))
             |      / (CAST(cc2 + 1 AS DOUBLE) / CAST(nc + 20 AS DOUBLE)))
             |      AS term
             |  FROM cells, tot),
             |ag AS (SELECT max(nr) AS n_ref, max(nc) AS n_cur,
             |    count(*) AS n_bins, sum(term ORDER BY b) AS s
             |  FROM trm)
             |SELECT CAST(n_ref AS BIGINT) AS n_ref,
             |  CAST(n_cur AS BIGINT) AS n_cur,
             |  CAST(n_bins AS BIGINT) AS n_bins,
             |  round(s, 6) AS psi_r6, s >= 0.2 AS drifted
             |FROM ag""".stripMargin)),

    // ---- q392: PSI DRIFT — did the purchase-amount distribution
    //      shift between the two halves of the month? $20 fixed bins,
    //      Laplace-smoothed shares; the oracle replays the one-pass
    //      conditional counts and the order-pinned term fold. ----
    "q392_psi_drift" -> Q(
      (s, d) => psi(
        Tables.events(s, d).filter(col("event_type") === "purchase"),
        col("ts") < lit("2024-01-16").cast("timestamp"),
        round(col("value") * 100, 0), binWidth = 2000L, bins = 20),
      Some("""WITH base AS (SELECT
             |    CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
             |      THEN 1 ELSE 0 END AS r,
             |    least(greatest(CAST(round(value * 100) AS BIGINT), 0)
             |      // 2000, 19) AS b
             |  FROM events WHERE event_type = 'purchase'),
             |cells AS (SELECT g.b, coalesce(c.cr, 0) AS cr,
             |    coalesce(c.cc2, 0) AS cc2
             |  FROM (SELECT unnest(range(0, 20)) AS b) g
             |  LEFT JOIN (SELECT b, sum(r) AS cr, sum(1 - r) AS cc2
             |    FROM base GROUP BY b) c ON c.b = g.b),
             |tot AS (SELECT sum(r) AS nr, sum(1 - r) AS nc FROM base),
             |trm AS (SELECT b, nr, nc,
             |    (CAST(cr + 1 AS DOUBLE) / CAST(nr + 20 AS DOUBLE)
             |      - CAST(cc2 + 1 AS DOUBLE) / CAST(nc + 20 AS DOUBLE))
             |    * ln((CAST(cr + 1 AS DOUBLE) / CAST(nr + 20 AS DOUBLE))
             |      / (CAST(cc2 + 1 AS DOUBLE) / CAST(nc + 20 AS DOUBLE)))
             |      AS term
             |  FROM cells, tot),
             |ag AS (SELECT max(nr) AS n_ref, max(nc) AS n_cur,
             |    count(*) AS n_bins, sum(term ORDER BY b) AS s
             |  FROM trm)
             |SELECT CAST(n_ref AS BIGINT) AS n_ref,
             |  CAST(n_cur AS BIGINT) AS n_cur,
             |  CAST(n_bins AS BIGINT) AS n_bins,
             |  round(s, 6) AS psi_r6, s >= 0.2 AS drifted
             |FROM ag""".stripMargin)),
    // ---- q262: FD audit for two claimed dependencies — nation →
    //      region (holds by schema construction) and customer nation →
    //      market segment (massively violated: segments are assigned
    //      independently of geography, and the audit proves it with
    //      the fan-out). Oracle replays both audits. ----
    "q262_fd_audit" -> Q(
      (s, d) => {
        fdAudit("nation.n_nationkey->n_regionkey",
            Tables.nation(s, d), Seq("n_nationkey"), "n_regionkey")
          .unionByName(fdAudit("customer.c_nationkey->c_mktsegment",
            Tables.customer(s, d), Seq("c_nationkey"), "c_mktsegment"))
          .orderBy("dependency")
      },
      Some("""WITH f1 AS (SELECT n_nationkey,
             |    count(DISTINCT n_regionkey) AS nr
             |  FROM nation GROUP BY 1),
             |f2 AS (SELECT c_nationkey,
             |    count(DISTINCT c_mktsegment) AS nr
             |  FROM customer GROUP BY 1),
             |rel AS (
             |  SELECT 'customer.c_nationkey->c_mktsegment' AS dependency,
             |    count(*) AS n_lhs,
             |    sum(CASE WHEN nr > 1 THEN 1 ELSE 0 END) AS n_violating_lhs,
             |    max(nr) AS max_fanout
             |  FROM f2
             |  UNION ALL
             |  SELECT 'nation.n_nationkey->n_regionkey', count(*),
             |    sum(CASE WHEN nr > 1 THEN 1 ELSE 0 END), max(nr)
             |  FROM f1)
             |SELECT dependency, CAST(n_lhs AS BIGINT) AS n_lhs,
             |  CAST(n_violating_lhs AS BIGINT) AS n_violating_lhs,
             |  CAST(max_fanout AS BIGINT) AS max_fanout,
             |  n_violating_lhs = 0 AS fd_holds
             |FROM rel ORDER BY dependency""".stripMargin)),
    "q139_data_quality" -> Q(
      (s, d) => {
        val li = Tables.lineitem(s, d)
        audit(li, Seq(
            "null_or_nonpos_quantity" ->
              (col("l_quantity").isNull || col("l_quantity") <= 0),
            "negative_price" -> (col("l_extendedprice") < 0),
            "discount_out_of_range" ->
              (col("l_discount") < 0 || col("l_discount") > 1)))
          .unionByName(duplicateKeys(li, "dup_line_keys",
            Seq("l_orderkey", "l_linenumber")))
          .unionByName(orphans(li, "orphan_lineitems", "l_orderkey",
            Tables.orders(s, d), "o_orderkey"))
          .orderBy("rule")
      },
      Some("""SELECT rule, violations FROM (
             |  SELECT 'null_or_nonpos_quantity' AS rule,
             |    CAST(sum(CASE WHEN l_quantity IS NULL OR l_quantity <= 0
             |      THEN 1 ELSE 0 END) AS BIGINT) AS violations FROM lineitem
             |  UNION ALL SELECT 'negative_price',
             |    CAST(sum(CASE WHEN l_extendedprice < 0 THEN 1 ELSE 0 END) AS BIGINT)
             |    FROM lineitem
             |  UNION ALL SELECT 'discount_out_of_range',
             |    CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 1
             |      THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem
             |  UNION ALL SELECT 'dup_line_keys',
             |    CAST(coalesce(sum(c - 1), 0) AS BIGINT) FROM
             |    (SELECT count(*) AS c FROM lineitem
             |     GROUP BY l_orderkey, l_linenumber)
             |  UNION ALL SELECT 'orphan_lineitems', CAST(count(*) AS BIGINT)
             |    FROM lineitem WHERE l_orderkey NOT IN
             |      (SELECT o_orderkey FROM orders))
             |ORDER BY rule""".stripMargin)),

    // ---- q329: BENFORD first-digit audit of lineitem money values —
    //      the fraud/fabrication screen, per-digit observed vs
    //      log10(1+1/d) with the chi-square(8) readout; the expected
    //      table is the literal micro array embedded in both engines. ----
    "q329_benford_audit" -> Q(
      (s, d) => benfordAudit(
        Tables.lineitem(s, d)
          .select(round(col("l_extendedprice") * 100, 0).cast("long")
            .as("cents")),
        "cents"),
      BenfordOracleSql),

    // ---- q337: STREAMING BENFORD MONITOR — the q329 audit at
    //      ingest: the stream maintains the mergeable per-digit
    //      counts (a plain streaming aggregation), the χ² readout
    //      runs batch over the 9-row state (the q330 split). Same
    //      oracle as q329: streaming-vs-batch parity enforced by the
    //      driver hash. ----
    "q337_stream_benford" -> Q(
      (s, d) => {
        val sch = s.read.parquet(s"$d/lineitem.parquet").schema
        val raw = s.readStream.schema(sch).parquet(s"$d/{lineitem.parquet}")
        val counts = benfordCounts(
          raw.select(round(col("l_extendedprice") * 100, 0).cast("long")
            .as("cents")), "cents")
        val q = counts.writeStream.format("memory")
          .queryName("stream_benford").outputMode("complete").start()
        try q.processAllAvailable() finally q.stop()
        benfordFromCounts(s.table("stream_benford"))
      },
      BenfordOracleSql),
  )

}
