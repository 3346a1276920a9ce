package graft.rel

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.rel.RelQueries.Q

/** Dataset PROFILING — the "what is in this table" pass every pipeline
  * runs before trusting a new drop: one row per profiled column with
  * (n_rows, n_nulls, n_distinct, min_value, max_value).
  *
  * Counts and extrema come from ONE grouping-free fold over one scan
  * (all columns' aggregates evaluate together; no sort — a grouping-free
  * SortAggregate is a straight fold even with string buffers).
  *
  * Distinct counts come in two modes. `exact = true` unpivots to
  * (col_name, value) pairs and counts ONE distinct per group: Spark
  * plans that as a two-level hash aggregate (map-side (col, value)
  * dedup, then a count per column) — NOT the multi-distinct
  * Expand-plus-sort, which profiled 6+ s on a 600k-row table where
  * this shape takes well under one (the Expand replicates every row
  * per aggregate and SORTS the expansion; the pair agg's shuffle
  * carries only per-partition-distinct values). `exact = false` swaps
  * in approx_count_distinct (HyperLogLog++) inside the same single
  * fold: mergeable sketches, no second branch, ONE narrow pass however
  * many columns — the mode to run at 100 TB (ProfileSpec pins the plan
  * shapes and cross-checks the estimates).
  *
  * min/max are computed in the column's native ordering, then cast to
  * string so heterogeneous column types share one schema; distinctness
  * is counted on the string form, which is injective per type for the
  * standard types (long/int/double/string/date).
  */
object Profile {

  def profile(s: SparkSession, df: DataFrame, cols: Seq[String],
      exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__cnt_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c")) ++
        (if (exact) Nil
         else Seq(approx_count_distinct(col(c)).as(s"__nd_$c")))
    }
    val one = df.agg(count(lit(1)).as("__n_rows"), aggs: _*)
    val base = one.select(explode(array(cols.map(c => struct(
        lit(c).as("col_name"),
        col("__n_rows").as("n_rows"),
        (col("__n_rows") - col(s"__cnt_$c")).as("n_nulls"),
        (if (exact) lit(0L) else col(s"__nd_$c").cast("long"))
          .as("n_distinct"),
        col(s"__min_$c").as("min_value"),
        col(s"__max_$c").as("max_value"))): _*)).as("p"))
      .select("p.*")
    if (!exact) base
    else {
      val pairs = df.select(explode(array(cols.map(c => struct(
          lit(c).as("col_name"), col(c).cast("string").as("v"))): _*)).as("p"))
        .select("p.*")
      val nd = pairs.groupBy("col_name")
        .agg(count_distinct(col("v")).as("__nd"))
      base.drop("n_distinct")
        .join(broadcast(nd), Seq("col_name"), "left")
        .select(col("col_name"), col("n_rows"), col("n_nulls"),
          coalesce(col("__nd"), lit(0L)).as("n_distinct"),
          col("min_value"), col("max_value"))
    }
  }

  /** Equi-width HISTOGRAM of a numeric column — the profiling
    * companion a data drop gets after [[profile]] says the range:
    * `nBins` equal bins over [lo, hi), values outside the range
    * counted separately (never silently dropped). Returns one row per
    * NON-EMPTY bin plus optional `__below`/`__above` rows:
    * (bin, lo_edge, hi_edge, n). One map-side-combinable agg over one
    * scan; bin arithmetic is the same float expression both engines
    * evaluate identically (multiply/divide are IEEE-exact;
    * cross-checked by the q105 oracle).
    */
  def histogram(s: SparkSession, df: DataFrame, column: String,
      nBins: Int, lo: Double, hi: Double): DataFrame = {
    require(nBins > 0 && hi > lo, s"need nBins > 0 and hi > lo: $nBins, [$lo, $hi)")
    val w = (hi - lo) / nBins
    val v = col(column).cast("double")
    val bin = when(v.isNull, lit(null))
      .when(v < lo, lit(-1))
      .when(v >= hi, lit(nBins))
      .otherwise(floor((v - lo) / w).cast("int"))
    df.select(bin.as("bin")).filter(col("bin").isNotNull)
      .groupBy("bin").agg(count(lit(1)).as("n"))
      .select(
        when(col("bin") === -1, "__below")
          .when(col("bin") === nBins, "__above")
          .otherwise(col("bin").cast("string")).as("bin"),
        when(col("bin") === -1, lit(null))
          .when(col("bin") === nBins, lit(null))
          .otherwise(lit(lo) + col("bin") * w).as("lo_edge"),
        when(col("bin") === -1, lit(null))
          .when(col("bin") === nBins, lit(null))
          .otherwise(lit(lo) + (col("bin") + 1) * w).as("hi_edge"),
        col("n"))
  }

  /** q99 fixture: lineitem plus a null-injected flag column, so the
    * null accounting has real work (the base table is null-free)
    */
  private def fixture(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d).withColumn("rf_null",
      when(col("l_orderkey") % 7 === 0, lit(null: String))
        .otherwise(col("l_returnflag")))

  private val profCols =
    Seq("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag", "rf_null")

  private def colSql(c: String): String =
    s"""SELECT '$c' AS col_name, count(*) AS n_rows,
       |  count(*) - count($c) AS n_nulls,
       |  count(DISTINCT $c) AS n_distinct,
       |  CAST(min($c) AS VARCHAR) AS min_value,
       |  CAST(max($c) AS VARCHAR) AS max_value
       |FROM li""".stripMargin

  /** CORPUS TRAINING-READINESS REPORT — the one-row health gauge a
    * curation pipeline publishes before handing a corpus to training:
    * volume (docs, whitespace tokens), EXACT duplicate exposure (docs
    * whose full text appears more than once — the q33 hash-group
    * definition), language concentration (distinct languages, the
    * majority language and its share, and the Shannon entropy of the
    * language mix in nats), size shape (mean chars), and PII exposure
    * (docs matching the house email pattern).
    *
    * Exactness: every count is an exact integer; dup detection is one
    * text-keyed hash aggregation (text moves once); the entropy is a
    * fixed IEEE chain over the LANGUAGE-BOUNDED mix table folded in
    * label order (the q328 rule); shares round to 6.
    *
    * Output (1 row): (n_docs, n_tokens, n_dup_docs, n_langs,
    * top_lang, top_share_r6, lang_entropy_r6, avg_chars_r6,
    * n_email_docs).
    */
  def corpusReport(s: SparkSession, docs: DataFrame,
      id: String = "doc_id", text: String = "text",
      lang: String = "lang"): DataFrame = {
    val base = docs.select(col(id).as("did"), col(text).as("tx"),
      col(lang).as("lg"))
    val toks = base.select(explode(filter(
      split(trim(lower(col("tx"))), "\\s+"),
      t => length(t) > 0)).as("t")).agg(count(lit(1)).as("n_tokens"))
    val dups = base.groupBy("tx").agg(count(lit(1)).as("c"))
      .agg(sum(when(col("c") > 1L, col("c")).otherwise(0L))
        .as("n_dup_docs"))
    val chars = base.agg(count(lit(1)).as("n_docs"),
      round(avg(length(col("tx"))), 6).as("avg_chars_r6"))
    val pii = base.agg(sum(when(
      col("tx").rlike(graft.llm.Curation.emailRe), 1L).otherwise(0L))
      .as("n_email_docs"))
    val mix = base.groupBy("lg").agg(count(lit(1)).as("nl"))
    val wCum = org.apache.spark.sql.expressions.Window.orderBy("lg")
      .rowsBetween(Long.MinValue, 0)
    val langAgg = mix.crossJoin(broadcast(chars.select(col("n_docs"))))
      .withColumn("p", col("nl").cast("double") / col("n_docs")
        .cast("double"))
      .withColumn("ecum", sum(-col("p") * log(col("p"))).over(wCum))
      .withColumn("k", count(lit(1)).over(wCum))
      .agg(max(struct(col("lg"), col("k"), col("ecum"))).as("z"),
        max(struct(col("nl"), col("lg").as("top_lang"))).as("t"),
        max(col("n_docs")).as("nd"))
      .select(col("z.k").as("n_langs"), col("t.top_lang"),
        round(col("t.nl").cast("double") / col("nd").cast("double"), 6)
          .as("top_share_r6"),
        round(col("z.ecum"), 6).as("lang_entropy_r6"))
    chars.crossJoin(broadcast(toks)).crossJoin(broadcast(dups))
      .crossJoin(broadcast(langAgg)).crossJoin(broadcast(pii))
      .select(col("n_docs"), col("n_tokens"), col("n_dup_docs"),
        col("n_langs"), col("top_lang"), col("top_share_r6"),
        col("lang_entropy_r6"), col("avg_chars_r6"), col("n_email_docs"))
  }

  val all: ListMap[String, Q] = ListMap(
    // ---- q400: CORPUS REPORT — the one-row training-readiness gauge
    //      over documents; the oracle replays every pass and the
    //      label-ordered entropy fold. ----
    "q400_corpus_report" -> Q(
      (s, d) => corpusReport(s, Tables.documents(s, d)),
      Some("""WITH chars AS (SELECT count(*) AS n_docs,
             |    round(avg(length(text)), 6) AS avg_chars_r6
             |  FROM documents),
             |toks AS (SELECT count(*) AS n_tokens FROM (
             |  SELECT unnest(list_filter(regexp_split_to_array(
             |    trim(lower(text)), '\s+'), x -> len(x) > 0)) AS t
             |  FROM documents)),
             |dups AS (SELECT sum(CASE WHEN c > 1 THEN c ELSE 0 END)
             |    AS n_dup_docs
             |  FROM (SELECT text, count(*) AS c FROM documents
             |    GROUP BY text)),
             |pii AS (SELECT sum(CASE WHEN regexp_matches(text,
             |    '[a-z0-9._]+@[a-z0-9]+\.[a-z]+') THEN 1 ELSE 0 END)
             |    AS n_email_docs
             |  FROM documents),
             |mix AS (SELECT lang AS lg, count(*) AS nl FROM documents
             |  GROUP BY lang),
             |lx AS (SELECT count(*) AS n_langs,
             |    sum(-(CAST(nl AS DOUBLE) / CAST(chars.n_docs AS DOUBLE))
             |      * ln(CAST(nl AS DOUBLE) / CAST(chars.n_docs AS DOUBLE))
             |      ORDER BY lg) AS ent
             |  FROM mix, chars),
             |tp AS (SELECT lg AS top_lang, nl FROM mix
             |  ORDER BY nl DESC, lg DESC LIMIT 1)
             |SELECT CAST(chars.n_docs AS BIGINT) AS n_docs,
             |  CAST(toks.n_tokens AS BIGINT) AS n_tokens,
             |  CAST(dups.n_dup_docs AS BIGINT) AS n_dup_docs,
             |  CAST(lx.n_langs AS BIGINT) AS n_langs,
             |  tp.top_lang,
             |  round(CAST(tp.nl AS DOUBLE)
             |    / CAST(chars.n_docs AS DOUBLE), 6) AS top_share_r6,
             |  round(lx.ent, 6) AS lang_entropy_r6,
             |  chars.avg_chars_r6,
             |  CAST(pii.n_email_docs AS BIGINT) AS n_email_docs
             |FROM chars, toks, dups, pii, lx, tp""".stripMargin)),
    // ---- one-pass-per-branch table profile: per-column rows with
    //      null/distinct accounting and string-cast extrema; the
    //      oracle recomputes each column's stats independently and
    //      unions them ----
    "q99_profile" -> Q(
      (s, d) => profile(s, fixture(s, d), profCols).orderBy("col_name"),
      Some((s"""WITH li AS (SELECT *,
              |  CASE WHEN l_orderkey % 7 = 0 THEN NULL
              |       ELSE l_returnflag END AS rf_null FROM lineitem)
              |""".stripMargin +
        profCols.map(colSql).mkString("", "\nUNION ALL\n", "\nORDER BY col_name")))),

    // ---- equi-width histogram of l_extendedprice: 20 bins over
    //      [0, 80000), the out-of-range tail counted as __above (never
    //      silently dropped); the oracle replays the identical bin
    //      arithmetic (w = 4000.0 exactly; mul/div are IEEE-exact) ----
    "q105_histogram" -> Q(
      (s, d) => histogram(s, Tables.lineitem(s, d), "l_extendedprice",
          nBins = 20, lo = 0.0, hi = 80000.0)
        .orderBy("bin"),
      Some("""WITH b AS (SELECT CASE WHEN l_extendedprice < 0.0 THEN -1
             |      WHEN l_extendedprice >= 80000.0 THEN 20
             |      ELSE CAST(floor((l_extendedprice - 0.0) / 4000.0) AS INT)
             |    END AS bin
             |  FROM lineitem),
             |g AS (SELECT bin, count(*) AS n FROM b GROUP BY bin)
             |SELECT CASE WHEN bin = -1 THEN '__below'
             |            WHEN bin = 20 THEN '__above'
             |            ELSE CAST(bin AS VARCHAR) END AS bin,
             |  CAST(CASE WHEN bin = -1 OR bin = 20 THEN NULL
             |       ELSE 0.0 + bin * 4000.0 END AS DOUBLE) AS lo_edge,
             |  CAST(CASE WHEN bin = -1 OR bin = 20 THEN NULL
             |       ELSE 0.0 + (bin + 1) * 4000.0 END AS DOUBLE) AS hi_edge,
             |  n
             |FROM g ORDER BY bin""".stripMargin)),

    // ---- q141: PSI DISTRIBUTION DRIFT — population stability index of
    //      each event type's value distribution between the early and
    //      late half of the stream (the ML-ops drift monitor; PSI > 0.2
    //      is the classic retrain trigger). Deterministic to the bone:
    //      the era cut is exact integer day arithmetic ((min+max) div
    //      2), bins are fixed-width with clamped overflow, counts are
    //      integers, and the PSI sum follows q110's proven
    //      round-6-after-ordered-double-terms pattern. Zero-in-either-
    //      era bins are EXCLUDED (reported via n_bins_used, never
    //      silently) rather than epsilon-fudged — exactness beats the
    //      epsilon convention here. Scale: one narrow pass + one
    //      (type × bin)-bounded agg; the cut is a single scalar agg
    //      broadcast into the binning pass. ----
    "q141_psi_drift" -> Q(
      (s, d) => {
        val ev = Tables.events(s, d).select(col("event_type"),
          unix_date(to_date(date_trunc("DAY", col("ts")))).cast("long").as("day_i"),
          least(greatest(floor(col("value") / 50), lit(0L)), lit(9L))
            .cast("long").as("bin"))
        val cutDf = ev.agg(expr("(min(day_i) + max(day_i)) div 2").as("cut"))
        val b = ev.crossJoin(cutDf)
          .groupBy("event_type", "bin")
          .agg(sum(when(col("day_i") <= col("cut"), 1L).otherwise(0L)).as("ce"),
            sum(when(col("day_i") > col("cut"), 1L).otherwise(0L)).as("cl"))
        val t = b.groupBy("event_type").agg(sum("ce").as("te"), sum("cl").as("tl"))
        b.join(t, "event_type")
          .filter(col("ce") > 0 && col("cl") > 0)
          .withColumn("term",
            (col("ce").cast("double") / col("te") - col("cl").cast("double") / col("tl")) *
              log((col("ce").cast("double") / col("te")) /
                (col("cl").cast("double") / col("tl"))))
          .groupBy("event_type")
          .agg(max("te").as("n_early"), max("tl").as("n_late"),
            count(lit(1)).as("n_bins_used"), round(sum("term"), 6).as("psi_r6"))
          .orderBy("event_type")
      },
      Some("""WITH e AS (SELECT event_type,
             |    CAST(CAST(date_trunc('day', ts) AS DATE) - DATE '1970-01-01' AS BIGINT)
             |      AS day_i,
             |    CAST(least(greatest(floor(value/50), 0), 9) AS BIGINT) AS bin
             |  FROM events),
             |c AS (SELECT (min(day_i) + max(day_i)) // 2 AS cut FROM e),
             |b AS (SELECT event_type, bin,
             |    CAST(sum(CASE WHEN day_i <= (SELECT cut FROM c) THEN 1 ELSE 0 END) AS BIGINT)
             |      AS ce,
             |    CAST(sum(CASE WHEN day_i > (SELECT cut FROM c) THEN 1 ELSE 0 END) AS BIGINT)
             |      AS cl
             |  FROM e GROUP BY 1, 2),
             |t AS (SELECT event_type, sum(ce) AS te, sum(cl) AS tl FROM b GROUP BY 1)
             |SELECT b.event_type, CAST(max(t.te) AS BIGINT) AS n_early,
             |  CAST(max(t.tl) AS BIGINT) AS n_late,
             |  CAST(count(*) AS BIGINT) AS n_bins_used,
             |  round(sum((CAST(ce AS DOUBLE)/te - CAST(cl AS DOUBLE)/tl)
             |    * ln((CAST(ce AS DOUBLE)/te) / (CAST(cl AS DOUBLE)/tl))), 6) AS psi_r6
             |FROM b JOIN t USING (event_type)
             |WHERE ce > 0 AND cl > 0
             |GROUP BY b.event_type ORDER BY b.event_type""".stripMargin)),

    // ---- q151: two-sample KOLMOGOROV–SMIRNOV drift statistic per
    //      event type (early vs late era, q141's cut) — the sup-norm
    //      CDF distance that catches shape drift PSI's fixed bins can
    //      blur. ENTIRELY INTEGER until the final division: evaluating
    //      |F₁−F₂| at each distinct value as |cum₁·n₂ − cum₂·n₁| makes
    //      the supremum an exact long max (no float CDFs to disagree
    //      on), and D = d_num/(n₁·n₂) is one division, round-6. Scale:
    //      one narrow pass, one (type, value)-keyed agg, one ordered
    //      window per type — the CDF walk never materializes rows
    //      beyond the distinct-value table. ----
    "q151_ks_drift" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val ev = Tables.events(s, d).select(col("event_type"),
          unix_date(to_date(date_trunc("DAY", col("ts")))).cast("long").as("day_i"),
          round(col("value") * 100, 0).cast("long").as("cents"))
        val cutDf = ev.agg(expr("(min(day_i) + max(day_i)) div 2").as("cut"))
        val g = ev.crossJoin(cutDf)
          .groupBy("event_type", "cents")
          .agg(sum(when(col("day_i") <= col("cut"), 1L).otherwise(0L)).as("c1"),
            sum(when(col("day_i") > col("cut"), 1L).otherwise(0L)).as("c2"))
        val wo = Window.partitionBy(col("event_type")).orderBy(col("cents"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wg = Window.partitionBy(col("event_type"))
        g.withColumn("cum1", sum("c1").over(wo))
          .withColumn("cum2", sum("c2").over(wo))
          .withColumn("n1", sum("c1").over(wg))
          .withColumn("n2", sum("c2").over(wg))
          .filter(col("n1") > 0 && col("n2") > 0)
          .groupBy("event_type")
          .agg(max("n1").as("n1"), max("n2").as("n2"),
            max(abs(col("cum1") * col("n2") - col("cum2") * col("n1"))).as("d_num"))
          .select(col("event_type"), col("n1"), col("n2"), col("d_num"),
            round(col("d_num").cast("double") /
              (col("n1").cast("double") * col("n2").cast("double")), 6).as("ks_r6"))
          .orderBy("event_type")
      },
      Some("""WITH e AS (SELECT event_type,
             |    CAST(CAST(date_trunc('day', ts) AS DATE) - DATE '1970-01-01' AS BIGINT)
             |      AS day_i,
             |    CAST(round(value * 100) AS BIGINT) AS cents
             |  FROM events),
             |c AS (SELECT (min(day_i) + max(day_i)) // 2 AS cut FROM e),
             |g AS (SELECT event_type, cents,
             |    CAST(sum(CASE WHEN day_i <= (SELECT cut FROM c) THEN 1 ELSE 0 END) AS BIGINT)
             |      AS c1,
             |    CAST(sum(CASE WHEN day_i > (SELECT cut FROM c) THEN 1 ELSE 0 END) AS BIGINT)
             |      AS c2
             |  FROM e GROUP BY 1, 2),
             |w AS (SELECT event_type,
             |    sum(c1) OVER (PARTITION BY event_type ORDER BY cents
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum1,
             |    sum(c2) OVER (PARTITION BY event_type ORDER BY cents
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum2,
             |    sum(c1) OVER (PARTITION BY event_type) AS n1,
             |    sum(c2) OVER (PARTITION BY event_type) AS n2
             |  FROM g)
             |SELECT event_type, CAST(max(n1) AS BIGINT) AS n1,
             |  CAST(max(n2) AS BIGINT) AS n2,
             |  CAST(max(abs(cum1 * n2 - cum2 * n1)) AS BIGINT) AS d_num,
             |  round(CAST(max(abs(cum1 * n2 - cum2 * n1)) AS DOUBLE)
             |    / (CAST(max(n1) AS DOUBLE) * CAST(max(n2) AS DOUBLE)), 6) AS ks_r6
             |FROM w WHERE n1 > 0 AND n2 > 0
             |GROUP BY event_type ORDER BY event_type""".stripMargin)),
  )
}
