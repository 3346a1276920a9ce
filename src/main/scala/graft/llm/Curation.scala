package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.rel.RelQueries.Q
import graft.rel.Tables

/** Corpus-hygiene operators a training-data pipeline runs before (and
  * after) dedup: BENCHMARK DECONTAMINATION — drop training documents
  * that share long n-grams with an evaluation set, so the model is not
  * graded on its own training data — and PII SCRUBBING — count and
  * redact emails / phone numbers with patterns portable across regex
  * engines (validated against DuckDB's RE2 in the oracle).
  *
  * Scale shape (100 TB): the eval set is small BY DEFINITION (that is
  * what makes decontamination tractable), so its distinct k-gram hashes
  * broadcast and the training corpus is ONE narrow pass + one hash agg
  * keyed by doc — no shuffle carries text. PII scrubbing is a pure
  * narrow map over the scan.
  */
object Curation {

  /** POSITIONAL 64-bit FNV hashes of the k-token grams of `toks` —
    * index p holds the hash of toks[p, p+k); the k-generalized
    * [[SketchOps.shingles64Of]] (same hash, same separator), so a
    * gram's hash is a pure function of its text
    */
  private[graft] def gramHashesPos(toks: Array[String], k: Int): Array[Long] = {
    if (toks.length < k) return Array.empty
    val out = new Array[Long](toks.length - k + 1)
    var i = 0
    while (i <= toks.length - k) {
      var h = 0xcbf29ce484222325L
      var g = 0
      while (g < k) {
        val t = toks(i + g)
        var c = 0
        while (c < t.length) { h = (h ^ t.charAt(c)) * 0x100000001b3L; c += 1 }
        if (g < k - 1) h = (h ^ ' ') * 0x100000001b3L
        g += 1
      }
      out(i) = h
      i += 1
    }
    out
  }

  /** distinct k-gram hashes (the [[gramHashesPos]] set) */
  private[graft] def gramHashes(toks: Array[String], k: Int): Array[Long] =
    gramHashesPos(toks, k).distinct

  /** Training docs sharing at least one distinct k-gram with the eval
    * set: (id, n_shared_grams). The eval grams broadcast; the training
    * side never shuffles text.
    */
  def contamination(s: SparkSession, train: DataFrame, eval: DataFrame,
      k: Int = 8, id: String = "doc_id", text: String = "text"): DataFrame = {
    import s.implicits._
    def grams(df: DataFrame, keep: Boolean) =
      df.select(col(id), col(text)).as[(Long, String)]
        .flatMap { case (i, t) =>
          gramHashes(SketchOps.tokensOf(t), k).iterator.map(h => (i, h))
        }
        .toDF(if (keep) id else "eid", "gh")
    val evalGrams = grams(eval, keep = false).select("gh").distinct()
    grams(train, keep = true)
      .join(broadcast(evalGrams), "gh")
      .groupBy(id)
      .agg(countDistinct(col("gh")).as("n_shared_grams"))
  }

  /** SPAN-LEVEL decontamination — the masking form real pipelines
    * prefer over [[contamination]]'s doc dropping (a 10k-token doc
    * sharing one 8-gram with an eval benchmark is data worth keeping
    * minus 8 tokens): every train-side token covered by a k-gram that
    * also appears in the eval set is masked, and each maximal masked
    * RUN collapses to one `sentinel` token. Returns the full cleaned
    * corpus: (id, n_tokens, n_masked, n_spans, clean_text).
    *
    * Scale shape: identical to [[contamination]] — the eval set's
    * distinct gram hashes collect to the driver (small BY DEFINITION)
    * and broadcast as a lookup set; the corpus is one narrow map, no
    * shuffle, nothing text-sized leaves an executor.
    */
  def decontaminateSpans(s: SparkSession, train: DataFrame, eval: DataFrame,
      k: Int = 8, sentinel: String = "[REMOVED]",
      id: String = "doc_id", text: String = "text"): DataFrame = {
    import s.implicits._
    val evalHashes = eval.select(col(text)).as[String]
      .flatMap(t => gramHashes(SketchOps.tokensOf(t), k).iterator)
      .distinct().collect().toSet
    val bc = s.sparkContext.broadcast(evalHashes)
    train.select(col(id), col(text)).as[(Long, String)]
      .map { case (i, t) =>
        val toks = SketchOps.tokensOf(t)
        val gh = gramHashesPos(toks, k)
        val masked = new Array[Boolean](toks.length)
        var p = 0
        while (p < gh.length) {
          if (bc.value.contains(gh(p))) {
            var j = p
            while (j < p + k) { masked(j) = true; j += 1 }
          }
          p += 1
        }
        val sb = new StringBuilder
        var nMasked = 0L
        var nSpans = 0L
        var q = 0
        while (q < toks.length) {
          if (masked(q)) {
            nMasked += 1
            if (q == 0 || !masked(q - 1)) {
              nSpans += 1
              if (sb.nonEmpty) sb.append(' ')
              sb.append(sentinel)
            }
          } else {
            if (sb.nonEmpty) sb.append(' ')
            sb.append(toks(q))
          }
          q += 1
        }
        (i, toks.length.toLong, nMasked, nSpans, sb.toString)
      }
      .toDF(id, "n_tokens", "n_masked", "n_spans", "clean_text")
  }

  // regex dialect note: these run under BOTH Java regex (Spark) and RE2
  // (DuckDB), so they use only the common subset — no backrefs, no
  // lookaround
  private[graft] val emailRe = "[a-z0-9._]+@[a-z0-9]+\\.[a-z]+"
  private[graft] val phoneRe = "\\+1-[0-9]{3}-[0-9]{3}-[0-9]{4}"

  /** per-doc PII counts and the scrubbed text: emails → [EMAIL],
    * phones → [PHONE]
    */
  def piiScrub(s: SparkSession, docs: DataFrame,
      id: String = "doc_id", text: String = "text"): DataFrame =
    docs.select(col(id),
      regexp_count(col(text), lit(emailRe)).as("n_emails"),
      regexp_count(col(text), lit(phoneRe)).as("n_phones"),
      regexp_replace(regexp_replace(col(text), emailRe, "[EMAIL]"),
        phoneRe, "[PHONE]").as("scrubbed"))

  /** DETERMINISTIC mixture sampling — reweighting sources in a training
    * mix ("web 0.6, code 0.3, papers 0.1") without a random number
    * generator: a doc survives iff its md5-prefix hash falls under the
    * source's rate threshold. Pure function of (id, rate): reproducible
    * across runs/engines (the KMV hash trick), stable under
    * re-partitioning, and upgrade-friendly — raising a rate only ADDS
    * docs, never swaps the kept set. One narrow filter over the scan.
    */
  /** the Luhn predicate over a 16-digit candidate string `c`, as a
    * SQL lambda body — shared verbatim between the engine expr and the
    * oracle so the checksum arithmetic cannot drift
    */
  private def luhnBody(c: String): String =
    s"aggregate(transform(sequence(1, 16), i -> " +
      s"CASE WHEN (16 - i) % 2 = 1 " +
      s"THEN CASE WHEN 2 * CAST(substring($c, i, 1) AS INT) > 9 " +
      s"THEN 2 * CAST(substring($c, i, 1) AS INT) - 9 " +
      s"ELSE 2 * CAST(substring($c, i, 1) AS INT) END " +
      s"ELSE CAST(substring($c, i, 1) AS INT) END), 0, (a, x) -> a + x) " +
      s"% 10 = 0"

  /** PAYMENT-CARD PII: find 16-digit runs, VERIFY each with the Luhn
    * check digit (ISO/IEC 7812 — the reason card scrubbing can't be
    * regex-only: most random 16-digit strings are ids/phone
    * concatenations, and only ~10% pass Luhn), and redact the verified
    * ones to `[CARD]` via a fold over the valid candidates. Counts
    * report candidates vs verified so a pipeline can audit its
    * false-positive surface. Pure per-row expression chain — no
    * shuffle carries text (the [[piiScrub]] shape).
    */
  def piiCards(s: SparkSession, docs: DataFrame,
      id: String = "doc_id", text: String = "text"): DataFrame =
    docs
      .withColumn("cand", expr("regexp_extract_all(text, '[0-9]{16}', 0)"))
      .withColumn("valid", expr(s"filter(cand, c -> ${luhnBody("c")})"))
      .select(col(id),
        size(col("cand")).cast("long").as("n_candidates"),
        size(col("valid")).cast("long").as("n_valid"),
        expr("aggregate(valid, text, (acc, cc) -> replace(acc, cc, '[CARD]'))")
          .as("scrubbed"))

  def mixtureSample(s: SparkSession, docs: DataFrame, rates: Map[String, Double],
      id: String = "doc_id", source: String = "source"): DataFrame = {
    require(rates.values.forall(r => r >= 0 && r <= 1), s"rates must be in [0,1]: $rates")
    // 60-bit md5 prefix (both engines compute it exactly) vs rate·2^60
    val hv = conv(substring(md5(col(id).cast("string").cast("binary")), 1, 15), 16, 10)
      .cast("long")
    val threshold = rates.foldLeft(lit(0L)) { case (acc, (src, r)) =>
      when(col(source) === src, lit((r * (1L << 60).toDouble).toLong)).otherwise(acc)
    }
    docs.filter(hv < threshold)
  }

  // extraction patterns shared with the q96 oracle — RE2-portable (no
  // backrefs/lookaround), applied in this order: strip script/style
  // blocks WITH their content, strip remaining tags, decode the three
  // core entities, collapse whitespace
  private[graft] val scriptBlockRe = "<(script|style)[^>]*>[^<]*</(script|style)>"
  private[graft] val tagRe = "<[^>]*>"

  /** HTML → TEXT extraction — the first stage of every web-crawl
    * pipeline: script/style blocks drop with their payload, remaining
    * tags become spaces (so adjacent block elements don't fuse words),
    * the core entities decode (&lt; &gt; &amp; — amp LAST, or
    * "&amp;lt;" would double-decode), and whitespace collapses. Returns
    * (id, n_tags, clean_text). Pure narrow map over the scan — all
    * regexp_replace chains inside codegen, no UDF.
    */
  def extractHtmlText(s: SparkSession, pages: DataFrame,
      id: String = "doc_id", html: String = "html"): DataFrame = {
    val noScript = regexp_replace(col(html), scriptBlockRe, " ")
    val noTags = regexp_replace(noScript, tagRe, " ")
    val decoded = regexp_replace(regexp_replace(regexp_replace(
      noTags, "&lt;", "<"), "&gt;", ">"), "&amp;", "&")
    pages.select(col(id),
      regexp_count(col(html), lit(tagRe)).as("n_tags"),
      trim(regexp_replace(decoded, "\\s+", " ")).as("clean_text"))
  }

  /** Stratified mixture sampling by per-source TOKEN BUDGETS — the form
    * data mixing actually uses ("web: 300B tokens, code: 100B, papers:
    * 30B"): per source, docs are ranked by the same deterministic
    * md5-prefix hash [[mixtureSample]] thresholds on (ties broken by
    * id), and the hash-order PREFIX is kept until the cumulative token
    * count reaches the budget — a doc survives iff the tokens BEFORE it
    * in hash order total under the budget (so the crossing doc is
    * included and every source lands within one doc of its budget).
    * Deterministic, re-partitioning-stable, and monotone: raising a
    * budget only ADDS docs.
    *
    * Scale shape (100 TB): the naive formulation is a per-source global
    * sort + running sum — a single-reducer window per source. Instead,
    * the hash space is cut into `buckets` ranges (a bucket is a PREFIX
    * of the hash, so bucket order refines hash order): one map-side-
    * combinable agg yields per-(source, bucket) token sums (≤ sources ×
    * `buckets` rows to the driver), which locate each source's BOUNDARY
    * bucket — every bucket below it is kept whole by a narrow filter,
    * every bucket above dropped, and only the boundary bucket (≈ 1/
    * `buckets` of that source) pays the exact prefix-sum window. Output
    * is IDENTICAL to the naive window (CurationSpec pins it).
    */
  def mixtureSampleByBudget(s: SparkSession, docs: DataFrame,
      budgets: Map[String, Long], buckets: Int = 4096,
      id: String = "doc_id", source: String = "source",
      text: String = "text"): DataFrame = {
    require(budgets.values.forall(_ >= 0), s"budgets must be >= 0: $budgets")
    require(buckets > 0 && Integer.bitCount(buckets) == 1 && buckets <= (1 << 30),
      s"buckets must be a positive power of two: $buckets")
    import org.apache.spark.sql.expressions.Window
    // the bucket is the hash's TOP bits, extracted by shift — Spark's
    // `/` on longs is double division, inexact past 2^53, and a
    // misbucketed boundary row would break "bucket order refines hash
    // order" (the RangeJoin >2^53 lesson)
    val shift = 60 - java.lang.Integer.numberOfTrailingZeros(buckets)
    // same 60-bit md5 prefix as mixtureSample; token count = whitespace
    // tokens of the trim/lower text (the tokensOf contract, in codegen)
    val hv = conv(substring(md5(col(id).cast("string").cast("binary")), 1, 15), 16, 10)
      .cast("long")
    val nToks = size(split(trim(lower(col(text))), "\\s+")).cast("long")
    val withH = docs
      .withColumn("hv", hv).withColumn("n_toks", nToks)
      .withColumn("bucket", shiftright(col("hv"), shift).cast("int"))
    // phase 1: per-(source, bucket) token totals — partial-agg'd map-side
    val hist = withH.groupBy(source, "bucket")
      .agg(sum(col("n_toks")).as("toks"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    // per source: the boundary bucket (first whose cumulative total
    // reaches the budget) and the tokens carried into it
    val perSource = hist.groupBy(_._1).map { case (src, rows) =>
      val budget = budgets.getOrElse(src, 0L)
      var cum = 0L
      var bStar = buckets // no boundary: budget above the source's total
      var carry = 0L
      rows.sortBy(_._2).foreach { case (_, b, t) =>
        if (bStar == buckets) {
          if (cum + t >= budget) { bStar = b; carry = cum }
          cum += t
        }
      }
      src -> (bStar, carry, budget)
    }
    def perSourceLit(f: ((Int, Long, Long)) => Long) =
      perSource.foldLeft(lit(Long.MinValue)) { case (acc, (src, v)) =>
        when(col(source) === src, lit(f(v))).otherwise(acc)
      }
    val bStarCol = perSourceLit(v => v._1.toLong)
    val carryCol = perSourceLit(_._2)
    val budgetCol = perSourceLit(_._3)
    // phase 2: full buckets pass on a narrow filter; the boundary bucket
    // replays the exact hash-order prefix sum (window over ~1/buckets of
    // one source)
    val fullBuckets = withH.filter(col("bucket") < bStarCol)
    val cumBefore = sum(col("n_toks")).over(
      Window.partitionBy(col(source)).orderBy(col("hv"), col(id))
        .rowsBetween(Window.unboundedPreceding, -1))
    val boundary = withH.filter(col("bucket") === bStarCol)
      .withColumn("cum_before", coalesce(cumBefore, lit(0L)) + carryCol)
      .filter(col("cum_before") < budgetCol)
      .drop("cum_before")
    fullBuckets.unionByName(boundary).drop("hv", "n_toks", "bucket")
  }

  // URL patterns shared with the q98 oracle — RE2-portable. The
  // registered-domain rule is the last-two-labels heuristic (a public
  // suffix list is a lookup-table refinement of the same shape).
  private[graft] val urlHostRe = "^https?://([^/?#]+)"
  private[graft] val regDomainRe = "([^.]+\\.[^.]+)$"

  /** URL/DOMAIN curation stage — the web-crawl steps between HTML
    * extraction and text filtering: parse each doc's URL into host and
    * registered domain (codegen regexp, no UDF), drop blocklisted
    * domains (the UT1-blocklist move; broadcast anti-join), and cap
    * docs per registered domain (crawls are domain-skewed: without a
    * cap, one link farm dominates the corpus) keeping a DETERMINISTIC
    * hash-order prefix of each domain — the same seeded-hash order as
    * [[shuffleCorpus]], so the kept set is reproducible and raising the
    * cap only adds docs.
    *
    * Scale shape (100 TB): parsing is a narrow map; the blocklist
    * broadcasts (small by definition); the per-domain cap is
    * [[hashOrderPositions]] grouped by domain — per-(domain, bucket)
    * histogram agg (map-side combinable), offsets via a window over
    * that tiny table, exact ranking per bucket — no single-reducer
    * sort, and a million-doc link-farm domain costs its bucket-sized
    * rankings, not a global window.
    */
  def urlDomainFilter(s: SparkSession, docs: DataFrame, blocklist: Seq[String],
      maxPerDomain: Int, seed: Long = 11L, buckets: Int = 4096,
      id: String = "doc_id", url: String = "url"): DataFrame = {
    import s.implicits._
    require(maxPerDomain > 0, s"maxPerDomain must be > 0: $maxPerDomain")
    val withDom = docs
      .withColumn("host", regexp_extract(col(url), urlHostRe, 1))
      .withColumn("domain", regexp_extract(col("host"), regDomainRe, 1))
    val surv =
      if (blocklist.isEmpty) withDom
      else withDom.join(broadcast(blocklist.toDF("domain")), Seq("domain"), "left_anti")
    hashOrderPositions(s, surv, Seq("domain"), seed, buckets, id)
      .filter(col("pos") < maxPerDomain)
      .drop("pos")
  }

  /** Deterministic GLOBAL SHUFFLE for training order: every doc gets a
    * unique position 0..n-1 in the order of a seeded hash (ties by id)
    * — the "shuffle the corpus before packing" step every pretraining
    * run needs, reproducible across runs, engines and partitionings,
    * and re-shuffleable per epoch by changing `seed`.
    *
    * Scale shape: the naive `row_number() OVER (ORDER BY hash)` is a
    * single-reducer global sort. Here the hash's top bits bucket the
    * rows (bucket order refines hash order, the [[mixtureSampleByBudget]]
    * trick): per-bucket counts (one map-side-combinable agg, ≤ `buckets`
    * rows to the driver) become prefix OFFSETS, and each bucket ranks
    * independently in parallel — position = offset(bucket) +
    * rank-within-bucket. One shuffle keyed by bucket, each reducer
    * sorting ~1/`buckets` of the data.
    */
  def shuffleCorpus(s: SparkSession, docs: DataFrame, seed: Long,
      buckets: Int = 4096, id: String = "doc_id"): DataFrame =
    hashOrderPositions(s, docs, Nil, seed, buckets, id)

  /** the generalized bucket-offset machinery behind [[shuffleCorpus]]
    * and [[Pack.lengthBucketBatches]]: a `pos` column = 0..|group|-1
    * within each group of `groupCols` (the whole corpus when empty), in
    * seeded-hash order with id tie-break. The per-(group, bucket)
    * histogram is a map-side-combinable agg of ≤ |groups| × `buckets`
    * rows, its prefix-sum offsets a WINDOW OVER THAT TINY TABLE (no
    * driver collect), and the exact ranking runs per (group, bucket) in
    * parallel — no group ever pays a single-reducer global sort.
    */
  private[llm] def hashOrderPositions(s: SparkSession, docs: DataFrame,
      groupCols: Seq[String], seed: Long, buckets: Int,
      id: String): DataFrame = {
    require(buckets > 0 && Integer.bitCount(buckets) == 1 && buckets <= (1 << 30),
      s"buckets must be a positive power of two: $buckets")
    import org.apache.spark.sql.expressions.Window
    val shift = 60 - java.lang.Integer.numberOfTrailingZeros(buckets)
    val hv = conv(substring(md5(
        concat(lit(seed.toString), lit(":"), col(id).cast("string")).cast("binary")),
      1, 15), 16, 10).cast("long")
    val withH = docs.withColumn("hv", hv)
      .withColumn("bucket", shiftright(col("hv"), shift).cast("int"))
    val g = groupCols.map(col)
    val hist = withH.groupBy(g :+ col("bucket"): _*).agg(count(lit(1)).as("n"))
    // empty groupCols would make this a partition-less window — Spark
    // plans that as a RANGE-partitioned global sort, the very shape the
    // operator exists to avoid (harmless on the tiny hist, but it makes
    // "no rangepartitioning in the plan" unpinnable) — a constant key
    // keeps it a single hash-grouped reducer over ≤ buckets rows
    val offGroups = if (g.nonEmpty) g else Seq(lit(0))
    val offDf = hist.withColumn("offset",
        coalesce(sum(col("n")).over(
          Window.partitionBy(offGroups: _*).orderBy(col("bucket"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("n")
    withH
      .withColumn("rk", row_number().over(
        Window.partitionBy(g :+ col("bucket"): _*).orderBy(col("hv"), col(id)))
        .cast("long"))
      .join(broadcast(offDf), groupCols :+ "bucket")
      .withColumn("pos", col("offset") + col("rk") - 1)
      .drop("hv", "bucket", "rk", "offset")
  }

  /** EPOCH-AWARE mixture UPSAMPLING — the other half of data mixing
    * ([[mixtureSample]] downweights; this REPEATS): weight w means each
    * doc of the source appears floor(w) times, plus once more iff its
    * hash falls under frac(w) — the same deterministic md5 rule as
    * [[mixtureSample]], so w = 2.5 replays every doc twice and a
    * reproducible half of them a third time. Output carries a `copy`
    * index (0-based) so downstream shuffling/packing can separate the
    * epochs. Pure narrow flatMap (explode of a sequence), no shuffle;
    * raising a weight only ADDS rows.
    */
  def mixtureUpsample(s: SparkSession, docs: DataFrame, weights: Map[String, Double],
      id: String = "doc_id", source: String = "source"): DataFrame = {
    require(weights.values.forall(_ >= 0), s"weights must be >= 0: $weights")
    val hv = conv(substring(md5(col(id).cast("string").cast("binary")), 1, 15), 16, 10)
      .cast("long")
    val whole = weights.foldLeft(lit(0L)) { case (acc, (src, w)) =>
      when(col(source) === src, lit(math.floor(w).toLong)).otherwise(acc)
    }
    val fracThreshold = weights.foldLeft(lit(0L)) { case (acc, (src, w)) =>
      when(col(source) === src,
        lit(((w - math.floor(w)) * (1L << 60).toDouble).toLong)).otherwise(acc)
    }
    docs
      .withColumn("n_copies", whole + when(hv < fracThreshold, 1L).otherwise(0L))
      .filter(col("n_copies") > 0)
      .withColumn("copy", explode(sequence(lit(0L), col("n_copies") - 1)))
      .drop("n_copies")
  }

  /** WEIGHTED SAMPLING WITHOUT REPLACEMENT — A-ES (Efraimidis &
    * Spirakis, IPL 2006): each row gets key u^(1/w) for a uniform
    * u ∈ (0,1], and the k largest keys ARE a weighted sample without
    * replacement. The curation use: "give me k docs per stratum,
    * longer/higher-quality docs proportionally more likely" —
    * importance-weighted eval-set and inspection-set draws.
    *
    * No RNG: u derives from the same 60-bit md5-prefix hash as
    * [[mixtureSample]] (u = (hv+1)/2⁶⁰ ∈ (0,1], a pure function of the
    * id), so the sample is reproducible across runs, engines and
    * partitionings. Keys are rounded to 6 decimals BEFORE ranking with
    * ties to the lower id (the q44 cross-engine contract; the rounding
    * trades a hair of tail fidelity for an order that replays exactly
    * in SQL). Rows with w ≤ 0 are excluded — u^(1/w) → 0 is the A-ES
    * limit.
    *
    * Scale shape (100 TB): the key is a narrow map over the scan; the
    * selection is the bounded-heap [[graft.functions.TopK]] per
    * stratum — k rows per stratum per map partition cross the shuffle,
    * never the corpus. No global sort, no window.
    */
  def weightedSample(s: SparkSession, docs: DataFrame, k: Int,
      weight: org.apache.spark.sql.Column, stratum: Option[String] = None,
      id: String = "doc_id"): DataFrame = {
    require(k > 0, s"sample size must be > 0: $k")
    val hv = conv(substring(md5(col(id).cast("string").cast("binary")), 1, 15), 16, 10)
      .cast("long")
    val u = (hv + lit(1L)).cast("double") / lit((1L << 60).toDouble)
    val keyed = docs
      .withColumn("_w", weight.cast("double"))
      .filter(col("_w") > 0)
      .withColumn("key_r6", round(pow(u, lit(1.0) / col("_w")), 6))
    val strat = stratum.getOrElse {
      // single global stratum via a constant key
      "_stratum"
    }
    val withStrat =
      if (stratum.isDefined) keyed else keyed.withColumn(strat, lit(0))
    graft.functions.TopK.perKeyTopK(withStrat, k, strat, id, "key_r6")
  }

  /** SNAPSHOT DIFF — "what changed since the last drop": compare two
    * corpus snapshots by id and content hash, labeling every id
    * `added` (new only), `removed` (old only), `changed` (both, text
    * differs) or `unchanged`. The incremental-ingest primitive: a
    * pipeline reprocesses added ∪ changed, tombstones removed, and
    * skips the (overwhelming at crawl scale) unchanged majority.
    *
    * Scale shape (100 TB): both sides reduce to (id, md5) in the scan
    * projection — text never shuffles — and the diff is one full-outer
    * equi-join on id of 16-byte rows.
    */
  def snapshotDiff(s: SparkSession, oldSnap: DataFrame, newSnap: DataFrame,
      id: String = "doc_id", text: String = "text"): DataFrame = {
    def h(df: DataFrame, hn: String) =
      df.select(col(id), md5(col(text).cast("binary")).as(hn))
    h(oldSnap, "h_old").join(h(newSnap, "h_new"), Seq(id), "full_outer")
      .withColumn("status",
        when(col("h_old").isNull, "added")
          .when(col("h_new").isNull, "removed")
          .when(col("h_old") === col("h_new"), "unchanged")
          .otherwise("changed"))
      .select(col(id), col("status"))
  }

  /** Hashing-trick LINEAR MODEL scoring — the quality-classifier shape
    * (fastText-style) at corpus scale: each token maps to one of `dim`
    * features by hash, the model is a dense weight vector over those
    * features, and a doc's score is the sum of its tokens' weights.
    * Everything stays inside WHOLE-STAGE CODEGEN: the tokenization is
    * `split`, the feature hash is the md5-prefix arithmetic, and the
    * weight lookup is `element_at` on an array LITERAL (the broadcast
    * form of a small dense model) folded by `aggregate` — no UDF, no
    * shuffle, one narrow pass. Integer (milli-unit) weights make the
    * fold exact and order-independent.
    *
    * Returns (id, n_tokens, score_sum) — score_sum in milli-units;
    * callers divide by n_tokens for a per-token mean.
    */
  def scoreQualityModel(s: SparkSession, docs: DataFrame, weightsMilli: Array[Long],
      id: String = "doc_id", text: String = "text"): DataFrame = {
    val dim = weightsMilli.length
    require(dim > 0, "weightsMilli must be non-empty")
    val w = typedlit(weightsMilli.toSeq)
    val toks = filter(split(trim(lower(col(text))), "\\s+"),
      t => length(t) > 0)
    def feat(t: org.apache.spark.sql.Column) =
      pmod(conv(substring(md5(t.cast("binary")), 1, 15), 16, 10).cast("long"), lit(dim.toLong))
    docs.select(col(id),
      size(toks).cast("long").as("n_tokens"),
      aggregate(toks, lit(0L),
        (acc, t) => acc + element_at(w, feat(t).cast("int") + 1)).as("score_sum"))
  }

  /** the q89 model: dim-1024 weights from a fixed integer formula both
    * engines can replay — w(f) = ((f * 2654435761) % 2003) - 1001
    */
  private[graft] def demoWeights(dim: Int): Array[Long] =
    Array.tabulate(dim)(f => ((f.toLong * 2654435761L) % 2003L) - 1001L)

  /** Gopher-style REPETITION signals (Rae et al. 2021, "Scaling language
    * models: ... Gopher", §A1.1 repetition filters): the fraction of
    * duplicate 3-grams and the share of the most frequent 2-gram —
    * degenerate generated/boilerplate text scores high on both. Exact
    * integer ratios in milli-units, one narrow map over the scan.
    */
  def repetitionSignals(s: SparkSession, docs: DataFrame,
      id: String = "doc_id", text: String = "text"): DataFrame = {
    import s.implicits._
    docs.select(col(id), col(text)).as[(Long, String)]
      .map { case (i, t) =>
        val toks = SketchOps.tokensOf(t)
        val g3 = if (toks.length < 3) Array.empty[String]
          else Array.tabulate(toks.length - 2)(j =>
            toks(j) + " " + toks(j + 1) + " " + toks(j + 2))
        val dup3milli = if (g3.isEmpty) 0L
          else ((g3.length - g3.distinct.length) * 1000L) / g3.length
        val g2 = if (toks.length < 2) Array.empty[String]
          else Array.tabulate(toks.length - 1)(j => toks(j) + " " + toks(j + 1))
        val top2milli = if (g2.isEmpty) 0L
          else (g2.groupBy(identity).values.map(_.length).max * 1000L) / g2.length
        (i, g3.length.toLong, dup3milli, top2milli)
      }
      .toDF(id, "n_grams3", "dup3_milli", "top2_milli")
  }

  /** BIGRAM-LM QUALITY SCORING — the CCNet/Wikipedia-LM perplexity
    * filter reduced to its statistical core: an add-one-smoothed bigram
    * model is trained on `modelCorpus` and every doc in `docs` gets its
    * average token log-probability avg ln P(wᵢ | wᵢ₋₁), P = (c(wᵢ₋₁wᵢ)
    * + 1) / (c(wᵢ₋₁) + V). Low scores flag gibberish / boilerplate /
    * out-of-domain text; the downstream move is a threshold or the
    * [[weightedSample]] weight.
    *
    * Scale shape (100 TB): the model is two aggregated count tables
    * (unigrams, bigrams — Zipf-bounded distinct grams, NOT corpus-
    * sized) plus a 1-row vocab count that joins as a broadcast. Scoring
    * streams each doc's bigrams through two hash-joins keyed on the
    * gram — the q34 shingle-join shape, one wide shuffle each, no
    * driver state. Counts are exact integers; the only floats are the
    * final ln and the avg, rounded to 6 decimals (the q44 contract) so
    * the score replays across engines.
    */
  def bigramLmScore(s: SparkSession, modelCorpus: DataFrame, docs: DataFrame,
      id: String = "doc_id", text: String = "text"): DataFrame = {
    def toks(c: org.apache.spark.sql.Column) =
      filter(split(trim(lower(c)), "\\s+"), t => length(t) > 0)
    def bigrams(t: org.apache.spark.sql.Column) =
      when(size(t) < 2, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(0), size(t) - 2),
          i => concat(element_at(t, i + 1), lit(" "), element_at(t, i + 2))))

    val model = modelCorpus.select(toks(col(text)).as("t"))
    val uni = model.select(explode(col("t")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c1"))
    val vocab = uni.agg(count(lit(1)).as("v"))
    val big = model.select(explode(bigrams(col("t"))).as("g"))
      .groupBy("g").agg(count(lit(1)).as("c2"))

    val base = docs.select(col(id), toks(col(text)).as("t"))
    val docBi = base.select(col(id), explode(bigrams(col("t"))).as("g"))
      .withColumn("w1", split(col("g"), " ").getItem(0))
    // left joins: a bigram/unigram unseen by the model scores at the
    // smoothed floor (c=0), it is not silently dropped
    val scored = docBi
      .join(big, Seq("g"), "left")
      .join(uni, col("w1") === col("tok"), "left")
      .crossJoin(broadcast(vocab))
      .withColumn("lp", log(
        (coalesce(col("c2"), lit(0L)) + 1).cast("double")
          / (coalesce(col("c1"), lit(0L)) + col("v"))))
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_bigrams"), round(avg(col("lp")), 6).as("avg_lp_r6"))
    base.select(col(id))
      .join(scored, Seq(id), "left")
      .select(col(id), coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("avg_lp_r6"), lit(0.0)).as("avg_lp_r6"))
  }

  /** WITHIN-DOC REPETITION FILTER (the Gopher/MassiveText repetition
    * rules, Rae et al. 2021 §A1.1): per document, the fraction of
    * 2-grams taken by the single most frequent 2-gram (top2), same
    * for 3-grams (top3), and the fraction of 6-grams that are
    * within-doc DUPLICATES (dup6) — the signals that catch looping
    * boilerplate, keyword stuffing, and template spam that corpus-
    * level dedup structurally misses (the repetition is inside one
    * doc). All three are exact integer milli from ONE narrow pass
    * (a per-partition typed map — counting within a single doc's
    * token array, no shuffle carries text); the rollup flags docs
    * over the published-style thresholds per source.
    *
    * Output per source: (source, n_docs, flag_top2, flag_top3,
    * flag_dup6, flag_any).
    */
  def repetitionFilter(s: SparkSession, docs: DataFrame,
      top2Milli: Long = 200L, top3Milli: Long = 180L,
      dup6Milli: Long = 300L, id: String = "doc_id",
      text: String = "text", source: String = "source"): DataFrame = {
    import s.implicits._
    val sig = docs.select(col(id), col(source), col(text))
      .as[(Long, String, String)]
      .map { case (i, src, t) =>
        val toks = SketchOps.tokensOf(t)
        def counts(n: Int): java.util.HashMap[String, Long] = {
          val m = new java.util.HashMap[String, Long]()
          var p = 0
          while (p <= toks.length - n) {
            val sb = new java.lang.StringBuilder(toks(p))
            var g = 1
            while (g < n) { sb.append(' ').append(toks(p + g)); g += 1 }
            m.merge(sb.toString, 1L, (a, b) => a + b)
            p += 1
          }
          m
        }
        def topMilli(n: Int): Long = {
          if (toks.length < n) return 0L
          val m = counts(n)
          var mx = 0L
          m.values.forEach(v => if (v > mx) mx = v)
          mx * 1000L / (toks.length - n + 1)
        }
        def dupMilli(n: Int): Long = {
          if (toks.length < n) return 0L
          val m = counts(n)
          var dup = 0L
          m.values.forEach(v => if (v >= 2) dup += v)
          dup * 1000L / (toks.length - n + 1)
        }
        (i, src, topMilli(2), topMilli(3), dupMilli(6))
      }.toDF(id, source, "top2_milli", "top3_milli", "dup6_milli")
    sig.groupBy(col(source))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("top2_milli") > top2Milli, 1L).otherwise(0L))
          .as("flag_top2"),
        sum(when(col("top3_milli") > top3Milli, 1L).otherwise(0L))
          .as("flag_top3"),
        sum(when(col("dup6_milli") > dup6Milli, 1L).otherwise(0L))
          .as("flag_dup6"),
        sum(when(col("top2_milli") > top2Milli
          || col("top3_milli") > top3Milli
          || col("dup6_milli") > dup6Milli, 1L).otherwise(0L))
          .as("flag_any"))
      .orderBy(source)
  }

  /** N-GRAM NOVELTY CURVE — what fraction of each corpus slice's
    * k-grams is NEW (never seen in any earlier doc): the dataset-
    * ordering diagnostic (curriculum/dedup audits read it: a slice
    * whose novelty collapses is re-crawled or boilerplate content,
    * and the curve's tail is what another epoch of the same source
    * would buy). Growth is measured at `buckets` doc-id checkpoints,
    * the [[graft.llm.TextStats.heapsLaw]] discipline at GRAM level.
    *
    * Spark carries 64-bit FNV gram hashes; the oracle recomputes with
    * STRING grams (the q34/q73 contract: a hash collision flips the
    * check red). Per-doc DISTINCT grams count once ([[gramHashes]]).
    *
    * Scale shape: one narrow flatMap to (bucket, gram) rows, a hash
    * agg for per-bucket mass, a min-agg for each gram's first bucket
    * (monotone in doc id), then everything runs on the completed
    * ≤`buckets`-row grid. Output per bucket: (b, n_grams, n_new,
    * novelty_milli — null for an empty bucket).
    */
  def gramNovelty(s: SparkSession, docs: DataFrame, k: Int = 8,
      buckets: Int = 32, id: String = "doc_id",
      text: String = "text"): DataFrame = {
    import s.implicits._
    require(buckets >= 4 && buckets <= 256, s"4 <= buckets <= 256: $buckets")
    val dg = docs.select(col(id), col(text)).as[(Long, String)]
      .flatMap { case (i, t) =>
        gramHashes(SketchOps.tokensOf(t), k).iterator.map(h => (i, h))
      }.toDF("did", "gh")
    val mx = docs.agg(max(col(id).cast("long")).as("mx"))
    val tb = dg.crossJoin(broadcast(mx))
      .select(expr(s"(did * $buckets) div (mx + 1) + 1").as("b"), col("gh"))
    val nB = tb.groupBy("b").agg(count(lit(1)).as("n_grams"))
    val newB = tb.groupBy("gh").agg(min(col("b")).as("fb"))
      .groupBy(col("fb").as("b")).agg(count(lit(1)).as("n_new"))
    s.range(1, buckets + 1L).select(col("id").as("b"))
      .join(nB, Seq("b"), "left").join(newB, Seq("b"), "left")
      .select(col("b"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_new"), lit(0L)).as("n_new"))
      .withColumn("novelty_milli",
        when(col("n_grams") > 0, expr("(n_new * 1000) div n_grams")))
      .orderBy("b")
  }

  /** PERPLEXITY FILTER (the Gopher/CCNet LM-quality gate): train the
    * smoothed bigram LM ([[bigramLmScore]]) on a REFERENCE SLICE of
    * the corpus (here: the English-labeled docs — the "clean" side a
    * production run points at a wiki-grade corpus), score EVERY doc's
    * average bigram log-probability against that model, and keep docs
    * scoring at or above a fixed threshold τ (fixed, not a quantile:
    * that is how the published pipelines run it — the threshold comes
    * from a validation pass and then holds, so the gate is one narrow
    * comparison, reproducible across batches, with no corpus-sized
    * selection machinery). Docs with zero bigrams (too short to score)
    * drop. Output per source: (source, n_docs, n_kept, kept_bigrams,
    * drop_milli) — the curation dashboard row.
    *
    * Scale shape: the model is two Zipf-bounded count tables from ONE
    * pass over the reference slice; scoring is the q108 shape (two
    * hash joins keyed by gram/token + a per-doc agg); the gate + per-
    * source rollup is one conditional agg. Unseen grams score at the
    * smoothed floor via LEFT joins (never dropped).
    */
  def perplexityFilter(s: SparkSession, docs: DataFrame, tau: Double,
      refLang: String = "en", id: String = "doc_id",
      text: String = "text", source: String = "source",
      lang: String = "lang"): DataFrame = {
    val model = docs.filter(col(lang) === refLang)
    val scored = bigramLmScore(s, model, docs, id, text)
    val ok = col("n_bigrams") > 0 && col("avg_lp_r6") >= lit(tau)
    docs.select(col(id), col(source))
      .join(scored, Seq(id))
      .groupBy(col(source))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(ok, 1L).otherwise(0L)).as("n_kept"),
        sum(when(ok, col("n_bigrams")).otherwise(0L)).as("kept_bigrams"))
      .withColumn("drop_milli",
        expr("((n_docs - n_kept) * 1000) div n_docs"))
      .orderBy(source)
  }

  /** CROSS-SOURCE LM DIVERGENCE MATRIX — the smoothed unigram
    * cross-entropy H(Pₛ ‖ Q̂ₜ) for EVERY source pair: how well a model
    * of source t predicts source s. [[sourceDivergence]] (q110) reads
    * each source against the corpus mixture; this is the pairwise
    * form data-mixing actually wants (which sources are
    * interchangeable, which are outliers to every other source, which
    * pair a curriculum should bridge). Q̂ₜ is add-one smoothed over the
    * union vocabulary, so unseen grams take t's floor 1/(nₜ+V).
    *
    * Determinism — the [[graft.functions.IntOls]] discipline end to
    * end: each ln((cₜ+1)/(nₜ+V)) snaps to integer micro (ONE libm call
    * per (t, gram)), the per-pair fold is an exact integer weighted
    * sum Σ c_s·lnq_micro plus the exact residual-mass floor term, and
    * H lands as one exact rational round-half-up per pair — no float
    * accumulation reaches the output.
    *
    * Scale shape: one (source, token) count agg (Zipf-bounded ×
    * source domain), ONE gram-keyed join of that table with its
    * snapped twin (≤ S² rows per gram — the source DOMAIN, not the
    * corpus, is the multiplier), source-bounded totals broadcast, and
    * an S²-row output. Output per ordered pair: (src, tgt, n_tokens,
    * h_micro).
    */
  def sourceLmMatrix(s: SparkSession, docs: DataFrame,
      source: String = "source", text: String = "text"): DataFrame = {
    import graft.functions.IntOls
    val toks = filter(split(trim(lower(col(text))), "\\s+"),
      t => length(t) > 0)
    // one corpus pass -> the Zipf×source-bounded count table
    val st = docs.select(col(source).as("src"), explode(toks).as("g"))
      .groupBy(col("src"), col("g")).agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val stot = st.groupBy(col("src")).agg(sum(col("c")).as("n"))
    val v = st.select(col("g")).distinct().agg(count(lit(1)).as("v"))
    // per (t, gram): the snapped smoothed log-prob; per t: the floor
    val snap = st.select(col("src").as("tgt"), col("g"), col("c"))
      .join(broadcast(stot.select(col("src").as("tgt"), col("n"))), "tgt")
      .crossJoin(broadcast(v))
      .select(col("tgt"), col("g"),
        IntOls.lnMicro((col("c") + 1).cast("double")
          / (col("n") + col("v")).cast("double")).as("lnq"))
    val floors = stot.select(col("src").as("tgt"), col("n"))
      .crossJoin(broadcast(v))
      .select(col("tgt"),
        IntOls.lnMicro(lit(1.0) / (col("n") + col("v")).cast("double"))
          .as("lnfloor"))
    // the ONE gram-keyed join: s-side counts x t-side snapped probs
    val dec = "decimal(38,0)"
    // the weighted sum folds in decimal so it cannot overflow long at
    // token scales where c·lnq_micro sums pass 2^63
    val inter = st.join(snap, "g")
      .groupBy(col("src"), col("tgt"))
      .agg(sum(col("c").cast(dec) * col("lnq").cast(dec)).as("isum"),
        sum(col("c")).as("imass"))
    stot.select(col("src"), col("n"))
      .crossJoin(broadcast(floors))
      .join(inter, Seq("src", "tgt"), "left")
      .select(col("src"), col("tgt"), col("n").as("n_tokens"),
        IntOls.rhu(
          -(coalesce(col("isum"), lit(0L).cast(dec))
            + (col("n") - coalesce(col("imass"), lit(0L))).cast(dec)
              * col("lnfloor").cast(dec)),
          col("n").cast(dec)).as("h_micro"))
      .orderBy("src", "tgt")
  }

  /** SOURCE-DIVERGENCE DIAGNOSTIC — how far each source's unigram
    * distribution sits from the corpus mixture: KL(Pₛ ‖ Q) =
    * Σ_t Pₛ(t)·ln(Pₛ(t)/Q(t)) per source, with Pₛ the source's token
    * distribution and Q the whole corpus's. The data-mixing companion
    * to [[mixtureSample]]/[[mixtureSampleByBudget]]: divergent sources
    * are the ones whose up/down-weighting actually moves the mixture,
    * and a drift in a source's KL across snapshots flags a distribution
    * change upstream. No smoothing is needed: every source token is in
    * the corpus by construction, so Q(t) > 0 wherever Pₛ(t) > 0.
    *
    * Scale shape (100 TB): two map-side-combinable count aggs (per
    * (source, token), then per token), one join keyed on the token
    * (Zipf-bounded distinct grams, not corpus-sized), per-source totals
    * and the grand total enter as broadcasts, and the KL sum is one
    * final tiny agg. Counts are exact integers; the only floats are the
    * ratios and ln, with the per-source sum rounded to 6 decimals (the
    * q44 contract).
    */
  def sourceDivergence(s: SparkSession, docs: DataFrame,
      source: String = "source", text: String = "text"): DataFrame = {
    val toks = filter(split(trim(lower(col(text))), "\\s+"), t => length(t) > 0)
    // localCheckpoint (the jaccardPairs move): st feeds FOUR consumers
    // (itself, per-source totals, per-token totals, the grand total) —
    // without it each branch re-scans and re-explodes the corpus; with
    // it the corpus is touched once and the branches read the
    // Zipf-bounded (source, token, count) table
    val st = docs.select(col(source), explode(toks).as("tok"))
      .groupBy(col(source), col("tok")).agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val stot = st.groupBy(col(source)).agg(sum(col("c")).as("ts"))
    val ttot = st.groupBy(col("tok")).agg(sum(col("c")).as("ct"))
    val tt = st.agg(sum(col("c")).as("tot"))
    val ps = col("c").cast("double") / col("ts")
    val q = col("ct").cast("double") / col("tot")
    st.join(ttot, "tok")
      .join(broadcast(stot), source)
      .crossJoin(broadcast(tt))
      .withColumn("term", ps * log(ps / q))
      .groupBy(col(source), col("ts"))
      .agg(round(sum(col("term")), 6).as("kl_r6"))
      .select(col(source), col("ts").as("n_tokens"), col("kl_r6"))
  }

  /** LEAKAGE-FREE SPLITTING — train/val/test assignment that near-dup
    * pairs cannot straddle: the split is a pure function of the doc's
    * near-dup CLUSTER id (docs without a cluster are their own
    * singleton cluster), so every member of a cluster lands in the same
    * split by construction — the eval-contamination failure mode of
    * naive per-doc splitting ("test doc is a near-copy of a train doc")
    * is structurally impossible for any pair the dedup stage caught.
    * Assignment is the deterministic md5-prefix rule ([[mixtureSample]])
    * over cumulative fraction thresholds: no RNG, reproducible, and
    * re-splitting with a grown `fractions("train")` only MOVES docs
    * between adjacent splits in hash order.
    *
    * `fractions` is ordered (name, fraction) with the fractions summing
    * to 1; the last split takes the hash-space remainder so rounding
    * cannot orphan rows.
    *
    * Scale shape (100 TB): one left join of (id, cluster) onto the
    * corpus ids (16-byte rows — text never moves) and a narrow map for
    * hash + threshold. Cluster discovery is the dedup family's job
    * ([[Dedup.connectedComponents]]) and is priced there.
    */
  def splitByCluster(s: SparkSession, docs: DataFrame, clusters: DataFrame,
      fractions: Seq[(String, Double)], id: String = "doc_id"): DataFrame = {
    require(fractions.nonEmpty && fractions.forall(_._2 > 0),
      s"fractions must be positive: $fractions")
    require(math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      s"fractions must sum to 1: $fractions")
    val withCl = docs.select(col(id))
      .join(clusters.select(col(id), col("cluster_id")), Seq(id), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col(id)))
    val hv = conv(substring(md5(col("cluster_id").cast("string").cast("binary")), 1, 15),
      16, 10).cast("long")
    val cum = fractions.map(_._2).scanLeft(0.0)(_ + _).tail
    // first n-1 thresholds; the last split is the else-branch
    val splitCol = fractions.init.zip(cum.init).reverse
      .foldLeft(lit(fractions.last._1)) { case (acc, ((name, _), c)) =>
        when(hv < lit((c * (1L << 60).toDouble).toLong), name).otherwise(acc)
      }
    // the when-chain above evaluates thresholds ascending (reverse fold
    // builds: hv < t1 ? s1 : (hv < t2 ? s2 : ... last)
    withCl.withColumn("split", splitCol)
  }

  /** TEMPORAL train/valid/test split with EMBARGO — the time-based
    * leakage rule ([[splitByCluster]] handles near-dup leakage; this
    * handles the OTHER leak: windowed/lagged features computed near a
    * cutoff see across it). Rows at ts < `validFrom` are `train`, at
    * [`validFrom`, `testFrom`) `valid`, at ≥ `testFrom` `test` — and
    * every row within `embargo` BEFORE a cutoff is assigned `embargo`
    * (quarantined, not silently dropped: the caller decides, and the
    * counts surface in any split report). Timestamps compare as integer
    * MICROSECONDS (the q128 funnel rule), so the boundaries are exact
    * on both engines. A narrow map — no shuffle at all.
    */
  def temporalSplit(docs: DataFrame, ts: String,
      validFrom: java.sql.Timestamp, testFrom: java.sql.Timestamp,
      embargo: java.time.Duration): DataFrame = {
    require(!testFrom.before(validFrom),
      s"testFrom $testFrom must be >= validFrom $validFrom")
    require(!embargo.isNegative, s"embargo must be >= 0: $embargo")
    val tus = unix_micros(col(ts))
    val v = validFrom.toInstant.getEpochSecond * 1000000L +
      validFrom.toInstant.getNano / 1000L
    val t = testFrom.toInstant.getEpochSecond * 1000000L +
      testFrom.toInstant.getNano / 1000L
    val e = embargo.toNanos / 1000L
    docs.withColumn("split",
      when(tus >= t, "test")
        .when(tus >= t - e, "embargo")
        .when(tus >= v, "valid")
        .when(tus >= v - e, "embargo")
        .otherwise("train"))
  }

  // ---- fixtures for the driver entries ------------------------------
  // the corpus carries no PII and no eval set; both are synthesized
  // DETERMINISTICALLY from the documents table (the q40/q58 fixture
  // pattern), so the DuckDB oracle can rebuild the exact same inputs

  /** eval set: docs 0-19 with their first token dropped — each shares
    * almost all its k-grams with its source doc (and that doc's
    * near-dups), so the entry is non-vacuous by construction
    */
  private def evalSet(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).filter(col("doc_id") < 20)
      .select((col("doc_id") + 900000L).as("doc_id"),
        regexp_replace(col("text"), "^\\S+\\s+", "").as("text"))

  /** HTML-wrapped corpus for q96 (the q74/q58 fixture pattern): each
    * doc's text embedded in a deterministic page skeleton — nav/footer
    * boilerplate, a script block that must vanish WITH its payload, an
    * entity-escaped snippet derived from doc_id — so extraction has
    * real work whose result both engines can recompute
    */
  private def htmlDocs(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(col("doc_id"),
      concat(
        lit("<html><head><title>Doc "), col("doc_id"),
        lit("</title><style>body{margin:0}</style></head><body>"),
        lit("<div class=\"nav\">Home | About</div>"),
        lit("<script>var x = 1;</script>"),
        lit("<p>"), col("text"), lit("</p>"),
        lit("<p>snippet: &lt;tag&gt; &amp; more</p>"),
        lit("<footer>(c) 2026 corp</footer></body></html>")).as("html"))

  /** PII-injected corpus: every 7th doc gains an email, every 11th a
    * phone number, both derived from doc_id
    */
  private def piiDocs(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(col("doc_id"),
      concat(col("text"),
        when(col("doc_id") % 7 === 0,
          concat(lit(" contact user"), col("doc_id"), lit("@mail.com"))).otherwise(lit("")),
        when(col("doc_id") % 11 === 0,
          concat(lit(" call +1-555-"),
            lpad((col("doc_id") % 1000).cast("string"), 3, "0"),
            lit("-0199"))).otherwise(lit(""))).as("text"))

  /** URL-carrying corpus for q98: a deterministic URL per doc — 111
    * registered domains (37 bases × 3 TLDs), a www. subdomain on every
    * 4th doc (exercising host ≠ domain), a query string on every 5th
    * (must not leak into the host) — so parsing, blocklisting and the
    * per-domain cap all have real work both engines can replay
    */
  private def urlDocs(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(col("doc_id"),
      concat(lit("https://"),
        when(col("doc_id") % 4 === 0, lit("www.")).otherwise(lit("")),
        lit("site"), (col("doc_id") % 37).cast("string"),
        element_at(typedlit(Seq(".com", ".org", ".io")),
          (col("doc_id") % 3).cast("int") + 1),
        lit("/page/"), col("doc_id").cast("string"),
        when(col("doc_id") % 5 === 0, lit("?ref=rss")).otherwise(lit("")))
        .as("url"))

  private val gopherStops = Seq("the", "a", "of", "to", "and", "in",
    "is", "it")

  /** the stop-word list as a SQL IN-list fragment — shared by every
    * oracle replica of the Gopher gate so the replicas cannot drift */
  private[llm] def gopherStopsSql: String =
    gopherStops.map("'" + _ + "'").mkString(",")

  /** GOPHER QUALITY RULES (Rae et al. 2021 §A1.1, the non-repetition
    * half — [[repetitionFilter]] carries the repetition rules): per
    * doc, word count bounds, mean word length in [3, 10], fraction of
    * words containing an alphabetic character ≥ 0.8, symbol-to-char
    * ratio ≤ 0.1, and at least 2 stop words — the cheap structural
    * gates every crawled-corpus pipeline runs before any model-based
    * scoring. All signals are exact integer milli from higher-order
    * column functions over ONE tokenize (no UDF, no extra scan);
    * the rollup counts per-source flag hits.
    *
    * Output per source: (source, n_docs, flag_nwords, flag_wordlen,
    * flag_alpha, flag_symbol, flag_stop, flag_any).
    */
  def gopherQualityRules(s: SparkSession, docs: DataFrame,
      minWords: Long = 50L, maxWords: Long = 100000L,
      id: String = "doc_id", text: String = "text",
      source: String = "source"): DataFrame = {
    val sig = gopherFlags(docs, minWords, maxWords, id, text, source)
    sig.groupBy(col(source))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("f_nwords"), 1L).otherwise(0L)).as("flag_nwords"),
        sum(when(col("f_wordlen"), 1L).otherwise(0L)).as("flag_wordlen"),
        sum(when(col("f_alpha"), 1L).otherwise(0L)).as("flag_alpha"),
        sum(when(col("f_symbol"), 1L).otherwise(0L)).as("flag_symbol"),
        sum(when(col("f_stop"), 1L).otherwise(0L)).as("flag_stop"),
        sum(when(col("f_nwords") || col("f_wordlen") || col("f_alpha")
          || col("f_symbol") || col("f_stop"), 1L).otherwise(0L))
          .as("flag_any"))
      .orderBy(source)
  }

  /** The per-doc flag half of [[gopherQualityRules]] — STREAMING-LEGAL
    * (pure narrow map, no agg), so the gate can run at ingest (q420)
    * with batch/stream sharing one signal definition.
    * Output: (id, source, f_nwords, f_wordlen, f_alpha, f_symbol,
    * f_stop).
    */
  def gopherFlags(docs: DataFrame,
      minWords: Long = 50L, maxWords: Long = 100000L,
      id: String = "doc_id", text: String = "text",
      source: String = "source"): DataFrame =
    gopherSignals(docs, id, text, source)
      .select(col(id), col(source),
        (col("nw") < minWords || col("nw") > maxWords).as("f_nwords"),
        (col("nw") === 0 ||
          expr("(sumlen * 1000) div greatest(nw, 1)") < 3000L ||
          expr("(sumlen * 1000) div greatest(nw, 1)") > 10000L).as("f_wordlen"),
        (col("nw") === 0 || expr("(alpha * 1000) div greatest(nw, 1)") < 800L)
          .as("f_alpha"),
        (col("nchars") === 0 || expr("(nsym * 1000) div greatest(nchars, 1)") > 100L)
          .as("f_symbol"),
        (col("stops") < 2).as("f_stop"))

  /** The raw per-doc Gopher signal table (one tokenize, no UDF):
    * (id, source, text, nw, sumlen, alpha, nsym, nchars, stops) —
    * shared by [[gopherFlags]] and the composed plan
    * ([[trainingDataPlan]]), which adds its dedup hash to the SAME
    * pass instead of re-reading the corpus.
    */
  private[graft] def gopherSignals(docs: DataFrame,
      id: String = "doc_id", text: String = "text",
      source: String = "source"): DataFrame = {
    val toksC = filter(split(trim(lower(col(text))), "\\s+"),
      t => length(t) > 0)
    docs.select(col(id), col(source), col(text))
      .withColumn("w", toksC)
      .withColumn("nw", size(col("w")).cast("long"))
      .withColumn("sumlen", aggregate(transform(col("w"), t => length(t)),
        lit(0L), (acc, x) => acc + x))
      .withColumn("alpha",
        size(filter(col("w"), t => t.rlike("[a-z]"))).cast("long"))
      .withColumn("nsym",
        length(regexp_replace(lower(col(text)), "[a-z0-9\\s]", ""))
          .cast("long"))
      .withColumn("nchars", length(col(text)).cast("long"))
      .withColumn("stops",
        size(filter(col("w"), t => t.isin(gopherStops: _*))).cast("long"))
      .drop("w")
  }

  /** The combined fail predicate of [[gopherFlags]] over a
    * [[gopherSignals]] row — the single boolean the composed plan
    * gates on (identical OR of the five structural rules).
    */
  private[graft] def gopherFail(minWords: Long = 50L,
      maxWords: Long = 100000L): Column =
    col("nw") < minWords || col("nw") > maxWords ||
      col("nw") === 0 ||
      expr("(sumlen * 1000) div greatest(nw, 1)") < 3000L ||
      expr("(sumlen * 1000) div greatest(nw, 1)") > 10000L ||
      expr("(alpha * 1000) div greatest(nw, 1)") < 800L ||
      col("nchars") === 0 ||
      expr("(nsym * 1000) div greatest(nchars, 1)") > 100L ||
      col("stops") < 2

  /** EPOCH WATER-FILLING ALLOCATOR — the data-constrained training
    * planner (the regime Muennighoff et al. NeurIPS'23 studies: the
    * token budget exceeds the corpus, so sources REPEAT, but each
    * source carries a quality-derived max-epoch cap): find the water
    * level λ such that Σ_s min(cap_s, λ)·T_s = budget, i.e. every
    * source trains the same λ epochs except those whose cap binds.
    * All arithmetic is exact-integer token-milli: the cut is found by
    * CROSS-MULTIPLIED comparisons over the cap-sorted source table
    * (domain-bounded — the window is over sources, never tokens), and
    * λ is one truncating division at the chosen cut, so Σ alloc lands
    * at most (#uncapped sources) token-milli under budget, never
    * over.
    *
    * `budgetMilliOf` maps the corpus token total to the token-milli
    * budget (kept in-plan so the entry is scale-free). Output per
    * source, ordered: (source, n_tokens, cap_milli, epochs_milli,
    * alloc_tokens).
    */
  def epochWaterfill(s: SparkSession, docs: DataFrame, capMilli: Column,
      budgetMilliOf: Column => Column, id: String = "doc_id",
      text: String = "text", source: String = "source"): DataFrame = {
    val toksC = filter(split(trim(lower(col(text))), "\\s+"),
      t => length(t) > 0)
    val st = docs.select(col(source), size(toksC).cast("long").as("nt"))
      .groupBy(col(source)).agg(sum(col("nt")).as("t"))
      .withColumn("capm", capMilli)
    waterfillCore(s, st, budgetMilliOf, source)
  }

  /** The allocator core of [[epochWaterfill]] over a PRE-AGGREGATED
    * per-source table `st` with columns (source, t, capm) — split out
    * so the composed plan ([[trainingDataPlan]]) can water-fill the
    * post-dedup token totals it already holds without re-tokenizing
    * the corpus. Output per source, ordered: (source, n_tokens,
    * cap_milli, epochs_milli, alloc_tokens).
    */
  private[llm] def waterfillCore(s: SparkSession, st0: DataFrame,
      budgetMilliOf: Column => Column,
      source: String = "source"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val st = st0.localCheckpoint(true)
    val dec38 = "decimal(38,0)"
    val tot = st.agg(sum(col("t")).as("tt"), count(lit(1)).as("ns"),
      sum(col("capm").cast(dec38) * col("t")).as("captok"))
      .withColumn("bm", budgetMilliOf(col("tt")).cast(dec38))
    // cap-sorted prefix sums; row k = "sources 1..k are capped"
    val w = Window.orderBy(col("capm"), col(source))
      .rowsBetween(Long.MinValue, 0)
    val rows = st
      .withColumn("rn", row_number().over(Window.orderBy(col("capm"), col(source))))
      .withColumn("cumCapTok", sum(col("capm").cast(dec38) * col("t")).over(w))
      .withColumn("cumT", sum(col("t")).over(w))
      .withColumn("nextCap", lead(col("capm"), 1).over(
        Window.orderBy(col("capm"), col(source))))
      .crossJoin(broadcast(tot))
    // candidate cuts: k = 0 (nobody capped) plus one per row; validity
    // by exact cross-multiplication (num_k = token-milli left for the
    // uncapped tail; restT_k = that tail's token mass)
    val k0 = rows.filter(col("rn") === 1)
      .select(lit(0L).as("k"), col("bm").as("num"),
        col("tt").cast(dec38).as("restT"),
        col("capm").as("capNext"))
    val kRows = rows.select(col("rn").cast("long").as("k"),
      (col("bm") - col("cumCapTok")).as("num"),
      (col("tt") - col("cumT")).cast(dec38).as("restT"),
      col("nextCap").as("capNext"), col("capm").as("capHere"))
    val valid0 = k0.filter(col("num") <= col("capNext").cast(dec38) * col("restT"))
      .select(col("k"), col("num"), col("restT"))
    val validK = kRows.filter(
      (col("capHere").cast(dec38) * col("restT") <= col("num")) &&
        (col("capNext").isNull || col("restT") === 0 ||
          col("num") <= col("capNext").cast(dec38) * col("restT")))
      .select(col("k"), col("num"), col("restT"))
    // smallest valid cut is THE cut (standard water-filling uniqueness
    // up to ties at exact boundaries)
    // exact integer floor: Spark decimal division rounds HALF_UP to
    // scale 6 before a cast truncates, so a quotient within 5e-7 below
    // an integer would round UP past the oracle's HUGEINT `//`.
    // Subtracting the remainder first makes the division exact.
    val cut = valid0.unionAll(validK)
      .agg(min(struct(col("k"), col("num"), col("restT"))).as("z"))
      .select(
        when(col("z.restT") > 0,
          ((col("z.num") - col("z.num") % col("z.restT")) / col("z.restT"))
            .cast("long"))
          .otherwise(lit(Long.MaxValue)).as("lam"))
    st.crossJoin(broadcast(cut))
      .select(col(source), col("t").as("n_tokens"), col("capm").as("cap_milli"),
        least(col("capm"), col("lam")).as("epochs_milli"))
      .withColumn("alloc_tokens",
        expr("(epochs_milli * n_tokens) div 1000"))
      .orderBy(source)
  }

  /** NORMALIZED EXACT DEDUP — exact dedup AFTER the Unicode
    * normalization rung ([[normalizeText]]): docs equal modulo case,
    * whitespace runs, zero-width/format chars and NFKC compatibility
    * folds collapse to one survivor (smallest doc id) — the duplicate
    * class byte-exact dedup (q33) structurally misses and near-dup
    * machinery pays a shingle join to find. Spark groups by the
    * 64-bit hash of the normalized text (8-byte keys shuffle, text
    * never does); the oracle groups by the normalized STRING (the
    * q34 collision contract, via the ASCII reduction on this corpus).
    * Output per source: (source, n_docs, n_dropped, n_kept).
    */
  def normalizedDedup(s: SparkSession, docs: DataFrame,
      id: String = "doc_id", text: String = "text",
      source: String = "source"): DataFrame = {
    val h = docs.select(col(id), col(source),
        xxhash64(normalizeText(s, col(text))).as("nh"))
      .localCheckpoint(true)
    val w = h.groupBy("nh").agg(min(col(id)).as("wid"))
    h.join(w, "nh")
      .groupBy(col(source))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col(id) =!= col("wid"), 1L).otherwise(0L))
          .as("n_dropped"))
      .withColumn("n_kept", col("n_docs") - col("n_dropped"))
      .orderBy(source)
  }

  /** DUPLICATE-CLASS SIZE HISTOGRAM — how duplicate mass distributes
    * across family sizes (Lee et al. 2022's dedup-health readout): a
    * corpus whose duplicate docs sit in a few HUGE classes (template
    * spam, mirrored sites) needs different handling than one with
    * many pairs — and the tail bucket is exactly the hot-key mass a
    * dedup shuffle must survive. Classes are the [[normalizedDedup]]
    * equality classes (NFKC-normalized text); sizes bucket at powers
    * of two.
    *
    * Exactness: the bucket is `length(bin(size)) - 1` = floor(log2) —
    * pure integer/string ops in BOTH engines, no libm. Scale shape:
    * one hash agg to class sizes (8-byte keys move, text doesn't),
    * one size-bounded rollup. Output per bucket, ascending:
    * (log2_size, n_classes, n_docs).
    */
  def dupClassHistogram(s: SparkSession, docs: DataFrame,
      id: String = "doc_id", text: String = "text"): DataFrame = {
    docs.select(xxhash64(normalizeText(s, col(text))).as("nh"))
      .groupBy("nh").agg(count(lit(1)).as("c"))
      .select((length(bin(col("c"))) - 1).cast("long").as("log2_size"),
        col("c"))
      .groupBy("log2_size")
      .agg(count(lit(1)).as("n_classes"), sum(col("c")).as("n_docs"))
      .orderBy("log2_size")
  }

  /** END-TO-END TRAINING-DATA PLAN — the composed chain a real
    * pipeline runs, as ONE entry (the q400 composition rule: users
    * run the chain, not the rungs):
    *
    *   Gopher structural gates (q418) → NFKC-normalized exact dedup
    *   among the survivors (q423) → per-source kept-token totals →
    *   sqrt-temperature mixture weights (q143's milli-snap idiom) →
    *   epoch water-filling against a 2× token budget (q428) →
    *   WebDataset shard manifest at `shardTokens` tokens per shard
    *   (the q429/q100 sizing arithmetic).
    *
    * Scan sharing, by construction: the corpus text is read ONCE —
    * the Gopher signals, the dedup hash and the token count all come
    * out of the same [[gopherSignals]] pass, checkpointed as a narrow
    * (id, source, nt, nh, fail) table; every later stage runs on that
    * table or on SOURCE-bounded aggregates of it (the spec asserts
    * the single-scan claim against the physical plan). Dedup winners
    * are the GLOBAL min-doc-id per normalized class (the q423
    * contract); all plan arithmetic is exact integer (milli caps,
    * token-milli allocation, ceil-div shard counts) so the oracle
    * replays it bit-for-bit in HUGEINT.
    *
    * Output per source, ordered: (source, n_docs, n_quality_fail,
    * n_dup_dropped, n_kept, kept_tokens, mix_milli, cap_milli,
    * epochs_milli, alloc_tokens, n_shards, last_shard_tokens).
    */
  def trainingDataPlan(s: SparkSession, docs: DataFrame,
      shardTokens: Long = 4096L, id: String = "doc_id",
      text: String = "text", source: String = "source"): DataFrame = {
    require(shardTokens >= 1, s"shardTokens >= 1: $shardTokens")
    // ONE pass over text: structural signals + dedup hash + token count
    val sig = gopherSignals(docs, id, text, source)
      .withColumn("nh", xxhash64(normalizeText(s, col(text))))
      .select(col(id).as("did"), col(source).as("src"),
        col("nw").as("nt"), col("nh"), gopherFail().as("fail"))
      .localCheckpoint(true)
    val perSrc = sig.groupBy(col("src")).agg(
      count(lit(1)).as("n_docs"),
      sum(when(col("fail"), 1L).otherwise(0L)).as("n_quality_fail"))
    val pass = sig.filter(!col("fail"))
    // class winner via ONE window over the dedup hash — no join, so
    // the plan shape cannot flip broadcast->shuffle as the class
    // table outgrows the broadcast threshold (the 10x probe's catch);
    // one exchange on nh at every scale, tiny per-class partitions
    val wNh = org.apache.spark.sql.expressions.Window.partitionBy("nh")
    val keptAgg = pass
      .withColumn("wid", min(col("did")).over(wNh))
      .groupBy(col("src")).agg(
        sum(when(col("did") =!= col("wid"), 1L).otherwise(0L))
          .as("n_dup_dropped"),
        sum(when(col("did") === col("wid"), 1L).otherwise(0L))
          .as("n_kept"),
        sum(when(col("did") === col("wid"), col("nt")).otherwise(0L))
          .as("kept_tokens"))
    // everything below is SOURCE-bounded (the q428 domain rule);
    // broadcasts are PINNED — these tables are one-row-per-source by
    // construction, but their size estimates (inflated through the
    // checkpoint boundary + crossJoins) would flip the joins to
    // sort-merge at scale (the 10x probe's catch)
    val srcT = perSrc.join(broadcast(keptAgg), Seq("src"), "left")
      .select(col("src").as(source), col("n_docs"), col("n_quality_fail"),
        coalesce(col("n_dup_dropped"), lit(0L)).as("n_dup_dropped"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("kept_tokens"), lit(0L)).as("kept_tokens"))
      .localCheckpoint(true)
    // sqrt-temperature mixture over kept tokens (q143: sqrt is
    // IEEE-correctly-rounded, so the milli snap is cross-engine exact)
    val mixed = srcT
      .withColumn("wm",
        round(sqrt(col("kept_tokens").cast("double")) * 1000, 0).cast("long"))
      .crossJoin(broadcast(srcT
        .select(round(sqrt(col("kept_tokens").cast("double")) * 1000, 0)
          .cast("long").as("wm1"))
        .agg(sum(col("wm1")).as("wm_tot"))))
      .withColumn("mix_milli",
        expr("(wm * 1000) div greatest(wm_tot, 1)"))
    // epoch water-filling of the kept tokens against a 2x budget,
    // with the q428 source-number cap rule
    val alloc = waterfillCore(s,
      srcT.select(col(source), col("kept_tokens").as("t"))
        .withColumn("capm", expr(
          s"1000 * (1 + cast(substring($source, 4) as bigint) % 4)")),
      budgetMilliOf = tt => tt.cast("decimal(38,0)") * 2000,
      source = source)
      .select(col(source), col("cap_milli"), col("epochs_milli"),
        col("alloc_tokens"))
    mixed.join(broadcast(alloc), Seq(source))
      .withColumn("n_shards",
        when(col("alloc_tokens") === 0L, 0L)
          .otherwise(expr(
            s"(alloc_tokens + ${shardTokens - 1L}) div ${shardTokens}L")))
      .withColumn("last_shard_tokens",
        when(col("n_shards") === 0L, 0L)
          .otherwise(col("alloc_tokens")
            - (col("n_shards") - 1L) * lit(shardTokens)))
      .select(col(source), col("n_docs"), col("n_quality_fail"),
        col("n_dup_dropped"), col("n_kept"), col("kept_tokens"),
        col("mix_milli"), col("cap_milli"), col("epochs_milli"),
        col("alloc_tokens"), col("n_shards"), col("last_shard_tokens"))
      .orderBy(source)
  }

  /** CURATED SHARDS — the MATERIALIZED end of the [[trainingDataPlan]]
    * chain: Gopher gates → normalized dedup → the surviving documents
    * serialized into WebDataset tar shards ([[Pack.webdatasetShards]],
    * strict round-trip in the writer). q430 reports the plan; this
    * entry EXECUTES it — the artifact a training loader mounts.
    *
    * Scale shape: the gate+dedup pass is q430's (one corpus read into
    * the narrow signal table, winner via one window over the hash);
    * the kept-id set then joins back to the corpus ON THE ID (8-byte
    * keys) and each kept doc's bytes move once to its shard builder —
    * the same one shuffle any shard writer pays.
    *
    * Output per shard: (shard, n_members, payload_bytes, tar_bytes,
    * roundtrip_ok).
    */
  def curatedShards(s: SparkSession, docs: DataFrame, shards: Int = 4,
      id: String = "doc_id", text: String = "text",
      source: String = "source"): DataFrame = {
    val sig = gopherSignals(docs, id, text, source)
      .withColumn("nh", xxhash64(normalizeText(s, col(text))))
      .select(col(id), col("nh"), gopherFail().as("fail"))
      .localCheckpoint(true)
    val wNh = org.apache.spark.sql.expressions.Window.partitionBy("nh")
    val keptIds = sig.filter(!col("fail"))
      .withColumn("wid", min(col(id)).over(wNh))
      .filter(col(id) === col("wid"))
      .select(col(id))
    Pack.webdatasetShards(s, docs.join(keptIds, id), shards, id, text)
  }

  /** LEXICAL IDF DRIFT between the early and late half of the corpus
    * (doc-id order): the text-side drift monitor next to the numeric
    * PSI (q392) and the embedding drift (q395) — the k terms whose
    * smoothed IDF moved most. A term whose IDF collapses got common
    * (a new template, a spam burst); one whose IDF explodes is
    * vanishing vocabulary. idf_micro = round(ln((n_era+1)/(df+1))·1e6)
    * — one micro-rounded ln per (term, era), exact integer Δ, total
    * (|Δ| desc, term) order.
    *
    * Scale shape: one distinct-(doc, term) explode, a term-keyed
    * conditional count agg (Zipf-bounded), broadcast era totals, and
    * a bounded top-k heap (orderBy+limit). Output: (term, df_early,
    * df_late, idf_early_micro, idf_late_micro, delta_micro).
    */
  def idfDrift(s: SparkSession, docs: DataFrame, k: Int = 25,
      minDfTotal: Long = 10L, id: String = "doc_id",
      text: String = "text"): DataFrame = {
    require(k >= 1, s"k >= 1: $k")
    val toksC = filter(split(trim(lower(col(text))), "\\s+"),
      t => length(t) > 0)
    val base = docs.select(col(id).cast("long").as("did"), col(text))
    val mx = base.agg(max("did").as("mx"))
    val dt = base.select(col("did"), explode(toksC).as("term")).distinct()
    val eraDf = dt.crossJoin(broadcast(mx))
      .select(expr("case when did <= mx div 2 then 1 else 0 end").as("e"),
        col("term"))
      .groupBy("term")
      .agg(sum(when(col("e") === 1, 1L).otherwise(0L)).as("df_early"),
        sum(when(col("e") === 0, 1L).otherwise(0L)).as("df_late"))
    val nd = base.crossJoin(broadcast(mx))
      .agg(sum(when(expr("did <= mx div 2"), 1L).otherwise(0L)).as("n_early"),
        sum(when(expr("did > mx div 2"), 1L).otherwise(0L)).as("n_late"))
    def idf(n: Column, df: Column): Column =
      round(log((n + 1L).cast("double") / (df + 1L).cast("double"))
        * lit(1e6), 0).cast("long")
    eraDf.filter(col("df_early") + col("df_late") >= minDfTotal)
      .crossJoin(broadcast(nd))
      .withColumn("idf_early_micro", idf(col("n_early"), col("df_early")))
      .withColumn("idf_late_micro", idf(col("n_late"), col("df_late")))
      .withColumn("delta_micro",
        col("idf_late_micro") - col("idf_early_micro"))
      .select(col("term"), col("df_early"), col("df_late"),
        col("idf_early_micro"), col("idf_late_micro"), col("delta_micro"))
      .orderBy(abs(col("delta_micro")).desc, col("term"))
      .limit(k)
  }

  /** URL CANONICALIZATION + DEDUP — the crawl-frontier stage that runs
    * BEFORE fetching: scheme strip, www. strip, fragment and query
    * strip, trailing-slash strip, lowercase — all anchored or suffix
    * regexes portable across engines — then per-registered-domain
    * counts of URLs collapsing onto the same canonical form (the
    * fetch-budget a canonicalizing frontier saves). Pure narrow map +
    * one domain-keyed agg with a distinct count.
    * Output per domain: (domain, n_urls, n_canonical, n_dup).
    */
  def urlCanonicalDedup(s: SparkSession, docs: DataFrame,
      id: String = "doc_id", url: String = "url"): DataFrame = {
    val canon = regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(regexp_replace(lower(col(url)),
        "^https?://", ""), "^www\\.", ""), "#.*$", ""), "\\?.*$", ""),
      "/$", "")
    docs.select(col(id), canon.as("canon"))
      .withColumn("domain", regexp_extract(col("canon"), "^([^/]+)", 1))
      .groupBy("domain")
      .agg(count(lit(1)).as("n_urls"),
        countDistinct(col("canon")).as("n_canonical"))
      .withColumn("n_dup", col("n_urls") - col("n_canonical"))
      .orderBy("domain")
  }

  /** UNICODE NORMALIZATION rung — the first stage of C4/CCNet-class
    * pipelines: NFKC + locale-free casefold + format/control strip +
    * whitespace collapse, as the codegen'd native expression
    * [[graft.functions.TextNorm]] (one static `java.text.Normalizer`
    * call per row inside the generated stage — no UDF boundary).
    * Chained before q60's tokenize pass, it adds ZERO corpus scans.
    */
  def normalizeText(s: SparkSession, c: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    graft.functions.TextNorm.normalizeText(s, c)

  val all: ListMap[String, Q] = ListMap(
    // ---- q407: UNICODE NORMALIZATION — VALUES-pinned non-ASCII
    //      fixtures (ligature/fullwidth NFKC folds, zero-width & soft-
    //      hyphen strips, BOM & bell removal, NBSP & circled-digit
    //      compatibility folds, whitespace collapse) UNIONED with the
    //      real corpus, where the transform reduces to
    //      trim(regexp_replace(lower(text),'\s+',' ','g')) — the
    //      ASCII-fold replay DuckDB CAN express (it has no NFKC; the
    //      non-ASCII behavior is pinned by the literals, per the q72
    //      VALUES discipline — not rows-only). ----
    "q407_normalize_text" -> Q(
      (s, d) => {
        import s.implicits._
        val pinned = Seq(
          (1L, "Café  du   MONDE"),
          (2L, "ﬁne ＴＥＸＴ"),
          (3L, "a​b c­def"),
          (4L, "﻿BOMbell\tTAB  x"),
          (5L, "nb sp ①² étude"),
          (6L, "  MiXeD   Case\r\n\r\nlines  "),
          // whitespace controls OUTSIDE the oracle engines' '\s'
          // (U+000B, U+001C-U+001F; U+000C is Java-'\s' but not
          // RE2's): collapse-to-boundary behavior pinned HERE as a
          // literal, since the corpus replay's regex cannot express it
          (7L, "a\u000Bb\u001Cc\u001Dd\u001Ee\u001Ff\u000Cg")).toDF("id", "raw")
        val corpus = Tables.documents(s, d)
          .select((col("doc_id") + 1000L).as("id"), col("text").as("raw"))
        pinned.unionAll(corpus)
          .select(col("id"), normalizeText(s, col("raw")).as("norm"))
          .orderBy("id")
      },
      Some("""SELECT id, norm FROM (
             |  SELECT * FROM (VALUES
             |    (CAST(1 AS BIGINT), 'café du monde'),
             |    (2, 'fine text'),
             |    (3, 'ab cdef'),
             |    (4, 'bombell tab x'),
             |    (5, 'nb sp 12 étude'),
             |    (6, 'mixed case lines'),
             |    (7, 'a b c d e f g')) t(id, norm)
             |  UNION ALL
             |  SELECT doc_id + 1000,
             |    trim(regexp_replace(lower(text), '\s+', ' ', 'g'))
             |  FROM documents)
             |ORDER BY id""".stripMargin)),

    // ---- decontamination: which training docs share an 8-gram with
    //      the eval slice. The oracle recomputes the overlap with
    //      STRING grams (Spark compares 64-bit FNV hashes — a collision
    //      would flip this red, same contract as q34/q49/q60). ----
    "q73_decontaminate" -> Q(
      (s, d) => contamination(s, Tables.documents(s, d), evalSet(s, d))
        .orderBy("doc_id"),
      Some("""WITH ev AS (SELECT regexp_replace(text, '^\S+\s+', '') AS text
             |  FROM documents WHERE doc_id < 20),
             |eg AS (SELECT DISTINCT g FROM (
             |  SELECT unnest(list_transform(range(1, len(t)-6),
             |    i -> array_to_string(t[i:i+7], ' '))) AS g
             |  FROM (SELECT regexp_split_to_array(trim(lower(text)), '\s+') AS t
             |        FROM ev) x) y),
             |tg AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(t)-6),
             |    i -> array_to_string(t[i:i+7], ' ')))) AS g
             |  FROM (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
             |        FROM documents) x)
             |SELECT tg.doc_id, count(DISTINCT tg.g) AS n_shared_grams
             |FROM tg JOIN eg ON tg.g = eg.g
             |GROUP BY tg.doc_id ORDER BY tg.doc_id""".stripMargin)),

    // ---- HTML -> text extraction over the wrapped corpus: tag counts
    //      and the FULL cleaned text hash-compared — both engines run
    //      the same RE2-safe strip/decode/collapse chain, so any
    //      ordering or greediness drift goes red ----
    "q96_html_extract" -> Q(
      (s, d) => extractHtmlText(s, htmlDocs(s, d)).orderBy("doc_id"),
      Some("""WITH pages AS (SELECT doc_id,
             |    '<html><head><title>Doc ' || doc_id ||
             |    '</title><style>body{margin:0}</style></head><body>' ||
             |    '<div class="nav">Home | About</div>' ||
             |    '<script>var x = 1;</script>' ||
             |    '<p>' || text || '</p>' ||
             |    '<p>snippet: &lt;tag&gt; &amp; more</p>' ||
             |    '<footer>(c) 2026 corp</footer></body></html>' AS html
             |  FROM documents)
             |SELECT doc_id,
             |  CAST(len(regexp_extract_all(html, '<[^>]*>')) AS INT) AS n_tags,
             |  trim(regexp_replace(
             |    replace(replace(replace(
             |      regexp_replace(
             |        regexp_replace(html,
             |          '<(script|style)[^>]*>[^<]*</(script|style)>', ' ', 'g'),
             |        '<[^>]*>', ' ', 'g'),
             |      '&lt;', '<'), '&gt;', '>'), '&amp;', '&'),
             |    '\s+', ' ', 'g')) AS clean_text
             |FROM pages ORDER BY doc_id""".stripMargin)),

    // ---- URL/domain stage: host + registered-domain parse, domain
    //      blocklist anti-join, deterministic per-domain cap (3). The
    //      kept SET with its parsed columns is hash-compared; the
    //      oracle replays the regexes, the blocklist, and the cap as
    //      the naive per-domain window over the same md5 hash order —
    //      hash-green means the bucket-offset cap is exact. ----
    "q98_url_domain_filter" -> Q(
      (s, d) => urlDomainFilter(s, urlDocs(s, d),
          blocklist = Seq("site1.com", "site7.org", "site13.io", "site20.com"),
          maxPerDomain = 3)
        .select(col("doc_id"), col("host"), col("domain"))
        .orderBy("doc_id"),
      Some("""WITH u AS (SELECT doc_id, 'https://' ||
             |    CASE WHEN doc_id % 4 = 0 THEN 'www.' ELSE '' END ||
             |    'site' || (doc_id % 37) ||
             |    CASE doc_id % 3 WHEN 0 THEN '.com' WHEN 1 THEN '.org'
             |      ELSE '.io' END ||
             |    '/page/' || doc_id ||
             |    CASE WHEN doc_id % 5 = 0 THEN '?ref=rss' ELSE '' END AS url
             |  FROM documents),
             |h AS (SELECT doc_id,
             |    regexp_extract(url, '^https?://([^/?#]+)', 1) AS host FROM u),
             |dm AS (SELECT doc_id, host,
             |    regexp_extract(host, '([^.]+\.[^.]+)$', 1) AS domain FROM h),
             |f AS (SELECT * FROM dm WHERE domain NOT IN
             |    ('site1.com', 'site7.org', 'site13.io', 'site20.com')),
             |r AS (SELECT doc_id, host, domain,
             |    row_number() OVER (PARTITION BY domain ORDER BY
             |      ('0x' || substr(md5('11:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT,
             |      doc_id) AS rn
             |  FROM f)
             |SELECT doc_id, host, domain FROM r WHERE rn <= 3
             |ORDER BY doc_id""".stripMargin)),

    // ---- snapshot diff: old = the corpus; new = a deterministic
    //      mutation (every 13th doc removed, every 7th surviving doc's
    //      text appended, 15 fresh ids added). The full (doc_id,
    //      status) labeling is hash-compared ----
    "q101_snapshot_diff" -> Q(
      (s, d) => {
        val old = Tables.documents(s, d).select(col("doc_id"), col("text"))
        val neu = old.filter(col("doc_id") % 13 =!= 0)
          .select(col("doc_id"),
            concat(col("text"),
              when(col("doc_id") % 7 === 0, lit(" v2")).otherwise(lit("")))
              .as("text"))
          .unionByName(old.filter(col("doc_id") < 15)
            .select((col("doc_id") + 700000L).as("doc_id"), col("text")))
        snapshotDiff(s, old, neu).orderBy("doc_id")
      },
      Some("""WITH old AS (SELECT doc_id, text FROM documents),
             |new_snap AS (
             |  SELECT doc_id, text ||
             |      CASE WHEN doc_id % 7 = 0 THEN ' v2' ELSE '' END AS text
             |  FROM old WHERE doc_id % 13 <> 0
             |  UNION ALL
             |  SELECT doc_id + 700000, text FROM old WHERE doc_id < 15)
             |SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
             |  CASE WHEN o.doc_id IS NULL THEN 'added'
             |       WHEN n.doc_id IS NULL THEN 'removed'
             |       WHEN o.text = n.text THEN 'unchanged'
             |       ELSE 'changed' END AS status
             |FROM old o FULL OUTER JOIN new_snap n ON o.doc_id = n.doc_id
             |ORDER BY doc_id""".stripMargin)),

    // ---- span-level decontamination: masked-token and span counts per
    //      contaminated doc. The oracle recomputes the mask with STRING
    //      grams positionally and counts spans gaps-and-islands style —
    //      Spark's 64-bit gram hashing (a collision would flip it red)
    //      and run-collapse arithmetic both get cross-checked ----
    "q86_decontaminate_spans" -> Q(
      (s, d) => decontaminateSpans(s, Tables.documents(s, d), evalSet(s, d))
        .filter(col("n_masked") > 0)
        .select(col("doc_id"), col("n_tokens"), col("n_masked"), col("n_spans"))
        .orderBy("doc_id"),
      Some("""WITH ev AS (SELECT regexp_replace(text, '^\S+\s+', '') AS text
             |  FROM documents WHERE doc_id < 20),
             |eg AS (SELECT DISTINCT g FROM (
             |  SELECT unnest(list_transform(range(1, len(t)-6),
             |    i -> array_to_string(t[i:i+7], ' '))) AS g
             |  FROM (SELECT regexp_split_to_array(trim(lower(text)), '\s+') AS t
             |        FROM ev) x) y),
             |d AS (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
             |  FROM documents),
             |cont AS (SELECT d.doc_id, u.i AS p
             |  FROM d, unnest(range(1, len(d.t)-6)) AS u(i)
             |  WHERE array_to_string(d.t[u.i:u.i+7], ' ') IN (SELECT g FROM eg)),
             |mask AS (SELECT DISTINCT doc_id, p2
             |  FROM cont, unnest(range(p, p+8)) AS v(p2)),
             |isl AS (SELECT doc_id, p2,
             |    CASE WHEN lag(p2) OVER (PARTITION BY doc_id ORDER BY p2) = p2 - 1
             |         THEN 0 ELSE 1 END AS is_start
             |  FROM mask)
             |SELECT d.doc_id, CAST(len(d.t) AS BIGINT) AS n_tokens,
             |  CAST(count(*) AS BIGINT) AS n_masked,
             |  CAST(sum(is_start) AS BIGINT) AS n_spans
             |FROM isl JOIN d USING (doc_id)
             |GROUP BY d.doc_id, len(d.t)
             |ORDER BY d.doc_id""".stripMargin)),

    // ---- PII scrub: counts + scrubbed length over the injected
    //      corpus; both engines run the same RE2-safe patterns ----
    "q74_pii_scrub" -> Q(
      (s, d) => piiScrub(s, piiDocs(s, d))
        .select(col("doc_id"), col("n_emails"), col("n_phones"),
          length(col("scrubbed")).as("scrubbed_len"))
        .orderBy("doc_id"),
      Some("""WITH pii AS (SELECT doc_id, text ||
             |    CASE WHEN doc_id % 7 = 0
             |         THEN ' contact user' || doc_id || '@mail.com' ELSE '' END ||
             |    CASE WHEN doc_id % 11 = 0
             |         THEN ' call +1-555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-0199'
             |         ELSE '' END AS text
             |  FROM documents)
             |SELECT doc_id,
             |  CAST(len(regexp_extract_all(text, '[a-z0-9._]+@[a-z0-9]+\.[a-z]+')) AS INT) AS n_emails,
             |  CAST(len(regexp_extract_all(text, '\+1-[0-9]{3}-[0-9]{3}-[0-9]{4}')) AS INT) AS n_phones,
             |  length(regexp_replace(regexp_replace(text, '[a-z0-9._]+@[a-z0-9]+\.[a-z]+', '[EMAIL]', 'g'),
             |    '\+1-[0-9]{3}-[0-9]{3}-[0-9]{4}', '[PHONE]', 'g')) AS scrubbed_len
             |FROM pii ORDER BY doc_id""".stripMargin)),

    // ---- q354: Luhn-VERIFIED card scrubbing — every 13th doc plants
    //      a Luhn-valid card, every 17th a 16-digit run that FAILS the
    //      check digit (the false-positive a regex-only scrubber would
    //      redact); the engine and the oracle share the checksum
    //      lambda verbatim, and the scrubbed length proves only the
    //      verified runs were folded out. ----
    "q354_pii_cards" -> Q(
      (s, d) => piiCards(s,
          Tables.documents(s, d).select(col("doc_id"),
            concat(col("text"),
              when(col("doc_id") % 13 === 0,
                lit(" card 4532015112830366 on file")).otherwise(lit("")),
              when(col("doc_id") % 17 === 0,
                lit(" ref 4111111111111112 batch")).otherwise(lit("")))
              .as("text")))
        .select(col("doc_id"), col("n_candidates"), col("n_valid"),
          length(col("scrubbed")).as("scrubbed_len"))
        .orderBy("doc_id"),
      Some(s"""WITH pii AS (SELECT doc_id, text ||
             |    CASE WHEN doc_id % 13 = 0
             |      THEN ' card 4532015112830366 on file' ELSE '' END ||
             |    CASE WHEN doc_id % 17 = 0
             |      THEN ' ref 4111111111111112 batch' ELSE '' END AS text
             |  FROM documents),
             |x AS (SELECT doc_id, text,
             |    regexp_extract_all(text, '[0-9]{16}') AS cand
             |  FROM pii),
             |v AS (SELECT doc_id, text, cand,
             |    list_filter(cand, c -> list_sum(list_transform(range(1, 17),
             |      i -> CASE WHEN (16 - i) % 2 = 1
             |        THEN CASE WHEN 2 * CAST(substr(c, i, 1) AS INT) > 9
             |          THEN 2 * CAST(substr(c, i, 1) AS INT) - 9
             |          ELSE 2 * CAST(substr(c, i, 1) AS INT) END
             |        ELSE CAST(substr(c, i, 1) AS INT) END)) % 10 = 0)
             |      AS valid
             |  FROM x)
             |SELECT doc_id, CAST(len(cand) AS BIGINT) AS n_candidates,
             |  CAST(len(valid) AS BIGINT) AS n_valid,
             |  length(CASE WHEN len(valid) = 0 THEN text
             |    ELSE list_reduce(list_prepend(text, valid),
             |      (a, b) -> replace(a, b, '[CARD]')) END) AS scrubbed_len
             |FROM v ORDER BY doc_id""".stripMargin)),

    // ---- mixture sampling: per-source keep rates through the
    //      hash-threshold rule; the oracle applies the identical
    //      md5-prefix arithmetic, so the kept SET (not just counts)
    //      is cross-checked via per-source counts + id sums ----
    "q79_mixture_sample" -> Q(
      (s, d) => mixtureSample(s, Tables.documents(s, d),
          Map("src0" -> 1.0, "src1" -> 0.6, "src2" -> 0.3, "src3" -> 0.1))
        .groupBy("source")
        .agg(count(lit(1)).as("n_kept"), sum(col("doc_id")).as("id_sum"))
        .orderBy("source"),
      Some(s"""SELECT source, count(*) AS n_kept,
             |  CAST(sum(doc_id) AS BIGINT) AS id_sum
             |FROM (SELECT source, doc_id,
             |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS hv
             |  FROM documents) t
             |WHERE hv < CASE source
             |  WHEN 'src0' THEN ${(1.0 * (1L << 60).toDouble).toLong}
             |  WHEN 'src1' THEN ${(0.6 * (1L << 60).toDouble).toLong}
             |  WHEN 'src2' THEN ${(0.3 * (1L << 60).toDouble).toLong}
             |  WHEN 'src3' THEN ${(0.1 * (1L << 60).toDouble).toLong}
             |  ELSE 0 END
             |GROUP BY source ORDER BY source""".stripMargin)),

    // ---- q143: TEMPERATURE-SCALED mixture (the multilingual-/multi-
    //      corpus rebalancing rule, Arivazhagan et al. 2019: sampling
    //      weight ∝ size^α, α<1 upweights small sources) composed onto
    //      the q85 budget machinery. Exactness: α = 0.5 via IEEE sqrt
    //      (exactly rounded — pow's libm variance avoided), weights
    //      snapped to integer MILLI-units before normalization so the
    //      weight sum is an exact long and every budget is pure integer
    //      arithmetic ((B·w) div Σw) — no float-sum-order flake
    //      anywhere. Driver sees one row per source; the corpus is
    //      touched by one token-count agg + the budget sampler. ----
    "q143_temperature_mix" -> Q(
      (s, d) => {
        val totalBudget = 20000L
        val docs = Tables.documents(s, d)
        val totals = docs
          .withColumn("n_toks", size(split(trim(lower(col("text"))), "\\s+")).cast("long"))
          .groupBy("source").agg(sum("n_toks").as("toks"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        // half-up like both engines' round() (rint's half-to-even would
        // diverge from the oracle on an exact .5)
        val wMilli = totals.map { case (src, t) =>
          src -> math.floor(math.sqrt(t.toDouble) * 1000 + 0.5).toLong
        }
        val sw = wMilli.values.sum
        val budgets = wMilli.map { case (src, w) => src -> (totalBudget * w) / sw }
        val budgetCol = budgets.foldLeft(lit(-1L)) { case (acc, (src, b)) =>
          when(col("source") === src, lit(b)).otherwise(acc)
        }
        mixtureSampleByBudget(s, docs, budgets)
          .withColumn("n_toks", size(split(trim(lower(col("text"))), "\\s+")).cast("long"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_kept"), sum(col("doc_id")).as("id_sum"),
            sum(col("n_toks")).as("tok_sum"))
          .withColumn("budget", budgetCol)
          .select("source", "budget", "n_kept", "id_sum", "tok_sum")
          .orderBy("source")
      },
      Some("""WITH t AS (SELECT source, doc_id,
             |    CAST(len(regexp_split_to_array(trim(lower(text)), '\s+')) AS BIGINT) AS n_toks,
             |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS hv
             |  FROM documents),
             |tot AS (SELECT source, sum(n_toks) AS toks FROM t GROUP BY source),
             |w AS (SELECT source,
             |    CAST(round(sqrt(CAST(toks AS DOUBLE)) * 1000) AS BIGINT) AS wm
             |  FROM tot),
             |sw AS (SELECT sum(wm) AS swm FROM w),
             |b AS (SELECT source, (20000 * wm) // (SELECT swm FROM sw) AS budget FROM w),
             |u AS (SELECT source, doc_id, n_toks,
             |    coalesce(sum(n_toks) OVER (PARTITION BY source ORDER BY hv, doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
             |  FROM t)
             |SELECT u.source, CAST(b.budget AS BIGINT) AS budget,
             |  count(*) AS n_kept, CAST(sum(doc_id) AS BIGINT) AS id_sum,
             |  CAST(sum(n_toks) AS BIGINT) AS tok_sum
             |FROM u JOIN b ON u.source = b.source
             |WHERE u.cum < b.budget
             |GROUP BY u.source, b.budget ORDER BY u.source""".stripMargin)),

    // ---- stratified mixture sampling by per-source TOKEN BUDGETS:
    //      the hash-order prefix until the budget, two-phase bucketed
    //      plan; the oracle replays the NAIVE window formulation —
    //      hash-green means the bucket decomposition is exact. Budgets
    //      exercise both partial prefixes, a keep-everything source
    //      (budget above its total) and a zero-budget source (absent
    //      from the output) ----
    "q85_mixture_budget" -> Q(
      (s, d) => {
        val kept = mixtureSampleByBudget(s, Tables.documents(s, d),
          Map("src0" -> 2000L, "src1" -> 5000L, "src2" -> 10000000L, "src3" -> 0L))
        kept
          .withColumn("n_toks", size(split(trim(lower(col("text"))), "\\s+")).cast("long"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_kept"), sum(col("doc_id")).as("id_sum"),
            sum(col("n_toks")).as("tok_sum"))
          .orderBy("source")
      },
      Some("""WITH t AS (SELECT source, doc_id,
             |    CAST(len(regexp_split_to_array(trim(lower(text)), '\s+')) AS BIGINT) AS n_toks,
             |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS hv
             |  FROM documents),
             |u AS (SELECT source, doc_id, n_toks,
             |    coalesce(sum(n_toks) OVER (PARTITION BY source ORDER BY hv, doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
             |  FROM t)
             |SELECT source, count(*) AS n_kept, CAST(sum(doc_id) AS BIGINT) AS id_sum,
             |  CAST(sum(n_toks) AS BIGINT) AS tok_sum
             |FROM u
             |WHERE cum < CASE source WHEN 'src0' THEN 2000 WHEN 'src1' THEN 5000
             |  WHEN 'src2' THEN 10000000 ELSE 0 END
             |GROUP BY source ORDER BY source""".stripMargin)),

    // ---- deterministic global shuffle: the full doc_id -> position
    //      permutation, hash-compared; the oracle is the naive global
    //      row_number over the seeded hash order — hash-green means the
    //      bucket-offset decomposition is an exact permutation ----
    "q87_corpus_shuffle" -> Q(
      (s, d) => shuffleCorpus(s, Tables.documents(s, d), seed = 7L)
        .select(col("doc_id"), col("pos"))
        .orderBy("pos"),
      Some("""SELECT doc_id,
             |  CAST(row_number() OVER (ORDER BY hv, doc_id) - 1 AS BIGINT) AS pos
             |FROM (SELECT doc_id,
             |    ('0x' || substr(md5('7:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS hv
             |  FROM documents) t
             |ORDER BY pos""".stripMargin)),

    // ---- epoch-aware mixture upsampling: floor(w) whole epochs + a
    //      deterministic hash-selected fractional epoch, copy indices
    //      cross-checked via per-source count / id / copy sums ----
    "q88_mixture_upsample" -> Q(
      (s, d) => mixtureUpsample(s, Tables.documents(s, d),
          Map("src0" -> 2.5, "src1" -> 1.0, "src2" -> 0.25, "src3" -> 0.0))
        .groupBy("source")
        .agg(count(lit(1)).as("n_rows"), sum(col("doc_id")).as("id_sum"),
          sum(col("copy")).as("copy_sum"))
        .orderBy("source"),
      Some(s"""WITH c AS (SELECT source, doc_id,
             |    CAST(CASE source WHEN 'src0' THEN 2 WHEN 'src1' THEN 1
             |      ELSE 0 END AS BIGINT)
             |    + CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
             |        < CASE source WHEN 'src0' THEN ${(0.5 * (1L << 60).toDouble).toLong}
             |          WHEN 'src2' THEN ${(0.25 * (1L << 60).toDouble).toLong}
             |          ELSE 0 END
             |      THEN 1 ELSE 0 END AS n
             |  FROM documents)
             |SELECT source, count(*) AS n_rows, CAST(sum(doc_id) AS BIGINT) AS id_sum,
             |  CAST(sum(copy) AS BIGINT) AS copy_sum
             |FROM c, unnest(range(0, n)) AS u(copy)
             |GROUP BY source ORDER BY source""".stripMargin)),

    // ---- hashing-trick linear model scoring: md5-bucketed features,
    //      integer milli-weights from a shared formula, aggregate()d
    //      inside codegen; the oracle replays feature hash + weight
    //      arithmetic per token ----
    "q89_quality_model" -> Q(
      (s, d) => scoreQualityModel(s, Tables.documents(s, d), demoWeights(1024))
        .orderBy("doc_id"),
      Some("""SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens,
             |  CAST(coalesce(list_sum(list_transform(w, tok ->
             |    ((('0x' || substr(md5(tok), 1, 15))::BIGINT % 1024)
             |      * 2654435761 % 2003) - 1001)), 0) AS BIGINT) AS score_sum
             |FROM (SELECT doc_id,
             |    list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
             |      x -> len(x) > 0) AS w
             |  FROM documents) t
             |ORDER BY doc_id""".stripMargin)),

    // ---- repetition quality signals (Gopher-style): duplicate-3-gram
    //      and top-2-gram fractions in exact integer milli-units ----
    "q80_repetition_signals" -> Q(
      (s, d) => repetitionSignals(s, Tables.documents(s, d)).orderBy("doc_id"),
      Some("""WITH t AS (SELECT doc_id,
             |    regexp_split_to_array(trim(lower(text)), '\s+') AS w FROM documents),
             |g3 AS (SELECT doc_id,
             |    CASE WHEN len(w) < 3 THEN []::VARCHAR[] ELSE
             |      list_transform(range(1, len(w)-1),
             |        i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) END AS g
             |  FROM t),
             |g2 AS (SELECT doc_id, unnest(
             |    CASE WHEN len(w) < 2 THEN []::VARCHAR[] ELSE
             |      list_transform(range(1, len(w)),
             |        i -> w[i] || ' ' || w[i+1]) END) AS p
             |  FROM t),
             |top2 AS (SELECT doc_id, max(c) AS mx, sum(c) AS n FROM (
             |    SELECT doc_id, p, count(*) AS c FROM g2 GROUP BY doc_id, p) x
             |  GROUP BY doc_id)
             |SELECT t.doc_id,
             |  CAST(len(g3.g) AS BIGINT) AS n_grams3,
             |  CAST(CASE WHEN len(g3.g) = 0 THEN 0 ELSE
             |    ((len(g3.g) - len(list_distinct(g3.g))) * 1000) // len(g3.g) END AS BIGINT)
             |    AS dup3_milli,
             |  CAST(coalesce((top2.mx * 1000) // top2.n, 0) AS BIGINT) AS top2_milli
             |FROM t JOIN g3 USING (doc_id) LEFT JOIN top2 USING (doc_id)
             |ORDER BY t.doc_id""".stripMargin)),

    // ---- A-ES weighted sampling without replacement: top-8 docs per
    //      source, token count as the weight, keys from the md5-prefix
    //      uniform; the oracle replays u, pow and the rounded ranking ----
    "q107_weighted_sample" -> Q(
      (s, d) => weightedSample(s, Tables.documents(s, d), k = 8,
          weight = size(filter(split(trim(lower(col("text"))), "\\s+"),
            t => length(t) > 0)),
          stratum = Some("source"))
        .orderBy("source", "rn"),
      Some(s"""WITH t AS (SELECT source, doc_id,
             |    CAST(len(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
             |      x -> len(x) > 0)) AS DOUBLE) AS w,
             |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS hv
             |  FROM documents),
             |k AS (SELECT source, doc_id,
             |    round(pow(CAST(hv + 1 AS DOUBLE) / ${(1L << 60).toDouble},
             |      CAST(1.0 AS DOUBLE) / w), 6) AS key_r6
             |  FROM t WHERE w > 0),
             |r AS (SELECT source, doc_id, key_r6,
             |    row_number() OVER (PARTITION BY source
             |      ORDER BY key_r6 DESC, doc_id) AS rn
             |  FROM k)
             |SELECT source, CAST(rn AS INT) AS rn, doc_id, key_r6
             |FROM r WHERE rn <= 8 ORDER BY source, rn""".stripMargin)),

    // ---- bigram-LM quality score, model trained on the corpus itself
    //      (the in-domain perplexity shape); the oracle replays the
    //      count tables, smoothing and avg-log arithmetic exactly ----
    "q108_bigram_lm" -> Q(
      (s, d) => {
        val docs = Tables.documents(s, d)
        bigramLmScore(s, docs, docs).orderBy("doc_id")
      },
      Some("""WITH t AS (SELECT doc_id,
             |    list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
             |      x -> len(x) > 0) AS w
             |  FROM documents),
             |db AS (SELECT doc_id, unnest(
             |    CASE WHEN len(w) < 2 THEN []::VARCHAR[] ELSE
             |      list_transform(range(1, len(w)),
             |        i -> w[i] || ' ' || w[i+1]) END) AS g
             |  FROM t),
             |u AS (SELECT tok, count(*) AS c1
             |  FROM (SELECT unnest(w) AS tok FROM t) x GROUP BY tok),
             |v AS (SELECT count(*) AS v FROM u),
             |b AS (SELECT g, count(*) AS c2 FROM db GROUP BY g),
             |sc AS (SELECT db.doc_id,
             |    ln(CAST(b.c2 + 1 AS DOUBLE) / (u.c1 + v.v)) AS lp
             |  FROM db JOIN b USING (g)
             |  JOIN u ON u.tok = split_part(db.g, ' ', 1)
             |  CROSS JOIN v),
             |agg AS (SELECT doc_id, count(*) AS n_bigrams,
             |    round(avg(lp), 6) AS avg_lp_r6
             |  FROM sc GROUP BY doc_id)
             |SELECT t.doc_id,
             |  CAST(coalesce(agg.n_bigrams, 0) AS BIGINT) AS n_bigrams,
             |  coalesce(agg.avg_lp_r6, 0.0) AS avg_lp_r6
             |FROM t LEFT JOIN agg USING (doc_id) ORDER BY t.doc_id""".stripMargin)),

    // ---- per-source KL divergence from the corpus mixture: the oracle
    //      replays the count tables and the ratio/ln arithmetic ----
    "q110_source_kl" -> Q(
      (s, d) => sourceDivergence(s, Tables.documents(s, d)).orderBy("source"),
      Some("""WITH t AS (SELECT source, unnest(
             |    list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
             |      x -> len(x) > 0)) AS tok
             |  FROM documents),
             |st AS (SELECT source, tok, count(*) AS c FROM t GROUP BY source, tok),
             |stot AS (SELECT source, sum(c) AS ts FROM st GROUP BY source),
             |ttot AS (SELECT tok, sum(c) AS ct FROM st GROUP BY tok),
             |tt AS (SELECT sum(c) AS tot FROM st)
             |SELECT source, CAST(ts AS BIGINT) AS n_tokens,
             |  round(sum((CAST(c AS DOUBLE) / ts)
             |    * ln((CAST(c AS DOUBLE) / ts) / (CAST(ct AS DOUBLE) / tot))), 6)
             |    AS kl_r6
             |FROM st JOIN stot USING (source) JOIN ttot USING (tok) CROSS JOIN tt
             |GROUP BY source, ts ORDER BY source""".stripMargin)),

    // ---- q420: STREAMING QUALITY GATE — the q418 per-doc Gopher
    //      flags applied AT INGEST (the q391 classify-at-ingest
    //      pattern): 3-batch stream, last batch replayed
    //      (at-least-once), replays collapse in the id-keyed dedup;
    //      the surviving set must equal the one-shot batch gate —
    //      the oracle computes it directly. ----
    "q420_stream_quality_gate" -> Q(
      (s, d) => {
        import s.implicits._
        implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
        import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
        val docs = Tables.documents(s, d)
        val work = java.nio.file.Files.createTempDirectory("graft-q420")
        val ckDir = java.nio.file.Files.createTempDirectory("graft-q420-ck")
        sys.addShutdownHook {
          def rm(f: java.io.File): Unit = {
            Option(f.listFiles()).foreach(_.foreach(rm))
            f.delete(); ()
          }
          rm(work.toFile); rm(ckDir.toFile)
        }
        val arriving = docs.select(col("doc_id"), col("text"), col("source"))
          .as[(Long, String, String)].collect()
        val (b12, b3) = arriving.partition(_._1 % 3 != 2)
        val (b1, b2) = b12.partition(_._1 % 3 == 0)
        val mem = MemoryStream[(Long, String, String)]
        val q = mem.toDF.toDF("doc_id", "text", "source").writeStream
          .foreachBatch { (batch: DataFrame, _: Long) =>
            gopherFlags(batch)
              .filter(!(col("f_nwords") || col("f_wordlen")
                || col("f_alpha") || col("f_symbol") || col("f_stop")))
              .select(col("doc_id"), col("source"))
              .write.mode("append").parquet(s"$work/kept")
          }
          .option("checkpointLocation", ckDir.toString)
          .start()
        try {
          mem.addData(b1.toSeq); q.processAllAvailable()
          mem.addData(b2.toSeq); q.processAllAvailable()
          mem.addData(b3.toSeq); q.processAllAvailable()
          mem.addData(b3.toSeq); q.processAllAvailable() // replay
        } finally q.stop()
        s.read.parquet(s"$work/kept")
          .dropDuplicates("doc_id")
          .orderBy("doc_id")
      },
      Some(s"""WITH t AS (SELECT doc_id, source, text,
             |    list_filter(regexp_split_to_array(trim(lower(text)),
             |      '\\s+'), x -> len(x) > 0) AS w
             |  FROM documents),
             |sig AS (SELECT doc_id, source,
             |    len(w) AS nw,
             |    list_sum(list_transform(w, x -> len(x))) AS sumlen,
             |    len(list_filter(w, x -> regexp_matches(x, '[a-z]')))
             |      AS alpha,
             |    length(regexp_replace(lower(text), '[a-z0-9\\s]', '',
             |      'g')) AS nsym,
             |    length(text) AS nchars,
             |    len(list_filter(w, x -> x IN (${gopherStops
              .map("'" + _ + "'").mkString(",")}))) AS stops
             |  FROM t)
             |SELECT doc_id, source FROM sig
             |WHERE NOT (nw < 50 OR nw > 100000
             |  OR nw = 0 OR (sumlen * 1000) // greatest(nw, 1) < 3000
             |  OR (sumlen * 1000) // greatest(nw, 1) > 10000
             |  OR (alpha * 1000) // greatest(nw, 1) < 800
             |  OR nchars = 0 OR (nsym * 1000) // greatest(nchars, 1) > 100
             |  OR stops < 2)
             |ORDER BY doc_id""".stripMargin)),

    // ---- q428: EPOCH WATER-FILLING — the data-constrained allocator:
    //      budget 2× the corpus, per-source caps 1–4 epochs (src-number
    //      derived); the cut is found by exact cross-multiplied
    //      comparisons over the cap-sorted source table and λ is one
    //      floor division. The oracle replays the prefix sums, the
    //      validity window, and the per-source min(cap, λ) allocation
    //      in HUGEINT. ----
    "q428_epoch_waterfill" -> Q(
      (s, d) => epochWaterfill(s, Tables.documents(s, d),
        capMilli = expr("1000 * (1 + cast(substring(source, 4) as bigint) % 4)"),
        budgetMilliOf = tt => tt.cast("decimal(38,0)") * 2000),
      Some("""WITH st AS (SELECT source,
             |    sum(len(list_filter(regexp_split_to_array(
             |      trim(lower(text)), '\s+'), x -> len(x) > 0))) AS t,
             |    1000 * (1 + CAST(substr(source, 4) AS BIGINT) % 4)
             |      AS capm
             |  FROM documents GROUP BY source),
             |b AS (SELECT CAST(sum(t) AS HUGEINT) * 2000 AS bm,
             |    sum(t) AS tt FROM st),
             |r AS (SELECT source, t, capm,
             |    row_number() OVER (ORDER BY capm, source) AS rn,
             |    sum(CAST(capm AS HUGEINT) * t) OVER (ORDER BY capm, source
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS cumCapTok,
             |    sum(t) OVER (ORDER BY capm, source
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumT,
             |    lead(capm) OVER (ORDER BY capm, source) AS nextCap
             |  FROM st),
             |v0 AS (SELECT CAST(0 AS BIGINT) AS k, b.bm AS num,
             |    CAST(b.tt AS HUGEINT) AS restT
             |  FROM r, b WHERE rn = 1
             |    AND b.bm <= CAST(capm AS HUGEINT) * b.tt),
             |vk AS (SELECT CAST(rn AS BIGINT) AS k,
             |    b.bm - cumCapTok AS num,
             |    CAST(b.tt - cumT AS HUGEINT) AS restT
             |  FROM r, b
             |  WHERE CAST(capm AS HUGEINT) * (b.tt - cumT)
             |      <= b.bm - cumCapTok
             |    AND (nextCap IS NULL OR b.tt - cumT = 0
             |      OR b.bm - cumCapTok
             |        <= CAST(nextCap AS HUGEINT) * (b.tt - cumT))),
             |cut AS (SELECT num, restT FROM
             |  (SELECT * FROM v0 UNION ALL SELECT * FROM vk)
             |  ORDER BY k LIMIT 1),
             |lam AS (SELECT CASE WHEN restT > 0 THEN num // restT
             |    ELSE 9223372036854775807 END AS lam FROM cut)
             |SELECT st.source, CAST(st.t AS BIGINT) AS n_tokens,
             |  CAST(st.capm AS BIGINT) AS cap_milli,
             |  CAST(least(CAST(st.capm AS HUGEINT),
             |    (SELECT lam FROM lam)) AS BIGINT) AS epochs_milli,
             |  CAST((least(CAST(st.capm AS HUGEINT),
             |    (SELECT lam FROM lam)) * st.t) // 1000 AS BIGINT)
             |    AS alloc_tokens
             |FROM st ORDER BY st.source""".stripMargin)),

    // ---- q430: END-TO-END TRAINING-DATA PLAN — the composed chain
    //      (Gopher gates -> normalized dedup -> sqrt-temperature mix
    //      -> epoch water-filling -> shard manifest) as one entry;
    //      the oracle replays every stage: the signal table, the
    //      combined fail predicate, global min-id winners over the
    //      normalized string (the q423 contract), the HUGEINT
    //      water-filling cut, the milli mixture and the ceil-div
    //      shard arithmetic. ----
    "q430_training_data_plan" -> Q(
      (s, d) => trainingDataPlan(s, Tables.documents(s, d)),
      Some(s"""WITH t AS (SELECT doc_id, source, text,
             |    list_filter(regexp_split_to_array(trim(lower(text)),
             |      '\\s+'), x -> len(x) > 0) AS w
             |  FROM documents),
             |sig AS (SELECT doc_id, source,
             |    len(w) AS nw,
             |    list_sum(list_transform(w, x -> len(x))) AS sumlen,
             |    len(list_filter(w, x -> regexp_matches(x, '[a-z]')))
             |      AS alpha,
             |    length(regexp_replace(lower(text), '[a-z0-9\\s]', '',
             |      'g')) AS nsym,
             |    length(text) AS nchars,
             |    len(list_filter(w, x -> x IN (${gopherStops
              .map("'" + _ + "'").mkString(",")}))) AS stops,
             |    trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS ct
             |  FROM t),
             |fl AS (SELECT doc_id, source, nw AS nt, ct,
             |    (nw < 50 OR nw > 100000
             |      OR nw = 0 OR (sumlen * 1000) // greatest(nw, 1) < 3000
             |      OR (sumlen * 1000) // greatest(nw, 1) > 10000
             |      OR (alpha * 1000) // greatest(nw, 1) < 800
             |      OR nchars = 0
             |      OR (nsym * 1000) // greatest(nchars, 1) > 100
             |      OR stops < 2) AS fail
             |  FROM sig),
             |ps AS (SELECT source, count(*) AS n_docs,
             |    CAST(sum(CASE WHEN fail THEN 1 ELSE 0 END) AS BIGINT)
             |      AS n_quality_fail
             |  FROM fl GROUP BY source),
             |win AS (SELECT ct, min(doc_id) AS wid FROM fl
             |  WHERE NOT fail GROUP BY ct),
             |ka AS (SELECT f.source,
             |    CAST(sum(CASE WHEN f.doc_id <> w.wid THEN 1 ELSE 0 END)
             |      AS BIGINT) AS n_dup_dropped,
             |    CAST(sum(CASE WHEN f.doc_id = w.wid THEN 1 ELSE 0 END)
             |      AS BIGINT) AS n_kept,
             |    CAST(sum(CASE WHEN f.doc_id = w.wid THEN f.nt ELSE 0 END)
             |      AS BIGINT) AS kept_tokens
             |  FROM fl f JOIN win w ON w.ct = f.ct
             |  WHERE NOT f.fail GROUP BY f.source),
             |srct AS (SELECT ps.source, ps.n_docs, ps.n_quality_fail,
             |    coalesce(ka.n_dup_dropped, 0) AS n_dup_dropped,
             |    coalesce(ka.n_kept, 0) AS n_kept,
             |    coalesce(ka.kept_tokens, 0) AS kept_tokens
             |  FROM ps LEFT JOIN ka USING (source)),
             |mixw AS (SELECT source,
             |    CAST(round(sqrt(CAST(kept_tokens AS DOUBLE)) * 1000, 0)
             |      AS HUGEINT) AS wm
             |  FROM srct),
             |mixt AS (SELECT sum(wm) AS wmt FROM mixw),
             |wst AS (SELECT source, kept_tokens AS t,
             |    1000 * (1 + CAST(substr(source, 4) AS BIGINT) % 4)
             |      AS capm
             |  FROM srct),
             |b AS (SELECT CAST(sum(t) AS HUGEINT) * 2000 AS bm,
             |    sum(t) AS tt FROM wst),
             |r AS (SELECT source, t, capm,
             |    row_number() OVER (ORDER BY capm, source) AS rn,
             |    sum(CAST(capm AS HUGEINT) * t) OVER (ORDER BY capm, source
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS cumCapTok,
             |    sum(t) OVER (ORDER BY capm, source
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumT,
             |    lead(capm) OVER (ORDER BY capm, source) AS nextCap
             |  FROM wst),
             |v0 AS (SELECT CAST(0 AS BIGINT) AS k, b.bm AS num,
             |    CAST(b.tt AS HUGEINT) AS restT
             |  FROM r, b WHERE rn = 1
             |    AND b.bm <= CAST(capm AS HUGEINT) * b.tt),
             |vk AS (SELECT CAST(rn AS BIGINT) AS k,
             |    b.bm - cumCapTok AS num,
             |    CAST(b.tt - cumT AS HUGEINT) AS restT
             |  FROM r, b
             |  WHERE CAST(capm AS HUGEINT) * (b.tt - cumT)
             |      <= b.bm - cumCapTok
             |    AND (nextCap IS NULL OR b.tt - cumT = 0
             |      OR b.bm - cumCapTok
             |        <= CAST(nextCap AS HUGEINT) * (b.tt - cumT))),
             |cut AS (SELECT num, restT FROM
             |  (SELECT * FROM v0 UNION ALL SELECT * FROM vk)
             |  ORDER BY k LIMIT 1),
             |lam AS (SELECT CASE WHEN restT > 0 THEN num // restT
             |    ELSE 9223372036854775807 END AS lam FROM cut),
             |alloc AS (SELECT wst.source,
             |    CAST(wst.capm AS BIGINT) AS cap_milli,
             |    CAST(least(CAST(wst.capm AS HUGEINT),
             |      (SELECT lam FROM lam)) AS BIGINT) AS epochs_milli,
             |    CAST((least(CAST(wst.capm AS HUGEINT),
             |      (SELECT lam FROM lam)) * wst.t) // 1000 AS BIGINT)
             |      AS alloc_tokens
             |  FROM wst)
             |SELECT srct.source, srct.n_docs, srct.n_quality_fail,
             |  srct.n_dup_dropped, srct.n_kept, srct.kept_tokens,
             |  CAST((mixw.wm * 1000)
             |    // greatest((SELECT wmt FROM mixt), 1) AS BIGINT)
             |    AS mix_milli,
             |  alloc.cap_milli, alloc.epochs_milli, alloc.alloc_tokens,
             |  CAST(CASE WHEN alloc.alloc_tokens = 0 THEN 0
             |    ELSE (alloc.alloc_tokens + 4095) // 4096 END AS BIGINT)
             |    AS n_shards,
             |  CAST(CASE WHEN alloc.alloc_tokens = 0 THEN 0
             |    ELSE alloc.alloc_tokens
             |      - ((alloc.alloc_tokens + 4095) // 4096 - 1) * 4096
             |    END AS BIGINT) AS last_shard_tokens
             |FROM srct JOIN mixw USING (source) JOIN alloc USING (source)
             |ORDER BY srct.source""".stripMargin)),

    // ---- q435: CROSS-SOURCE LM DIVERGENCE MATRIX — smoothed unigram
    //      cross-entropy H(P_s, Q_t) for every source pair, in the
    //      IntOls discipline (per-(t,gram) snapped log-probs, exact
    //      integer weighted sums + residual floor mass, one exact
    //      rational round-half-up per pair). The oracle replays the
    //      count tables, the snap, the gram join and the rhu. ----
    "q435_source_lm_matrix" -> Q(
      (s, d) => sourceLmMatrix(s, Tables.documents(s, d)),
      Some("""WITH t AS (SELECT source AS src, unnest(list_filter(
             |    regexp_split_to_array(trim(lower(text)), '\s+'),
             |    x -> len(x) > 0)) AS g
             |  FROM documents),
             |st AS (SELECT src, g, count(*) AS c FROM t GROUP BY src, g),
             |stot AS (SELECT src, sum(c) AS n FROM st GROUP BY src),
             |vv AS (SELECT count(DISTINCT g) AS v FROM st),
             |snap AS (SELECT st.src AS tgt, st.g,
             |    CAST(round(ln(CAST(st.c + 1 AS DOUBLE)
             |      / (stot.n + vv.v)) * 1e6, 0) AS HUGEINT) AS lnq
             |  FROM st JOIN stot ON stot.src = st.src
             |  CROSS JOIN vv),
             |fl AS (SELECT stot.src AS tgt,
             |    CAST(round(ln(1.0 / (stot.n + vv.v)) * 1e6, 0)
             |      AS HUGEINT) AS lnfloor
             |  FROM stot, vv),
             |inter AS (SELECT st.src, sn.tgt,
             |    sum(CAST(st.c AS HUGEINT) * sn.lnq) AS isum,
             |    sum(st.c) AS imass
             |  FROM st JOIN snap sn ON sn.g = st.g
             |  GROUP BY st.src, sn.tgt),
             |pairs AS (SELECT a.src, f.tgt, a.n, f.lnfloor
             |  FROM stot a, fl f),
             |h AS (SELECT p.src, p.tgt, p.n,
             |    -(coalesce(i.isum, 0)
             |      + CAST(p.n - coalesce(i.imass, 0) AS HUGEINT)
             |        * p.lnfloor) AS hp,
             |    CAST(p.n AS HUGEINT) AS hq
             |  FROM pairs p LEFT JOIN inter i
             |    ON i.src = p.src AND i.tgt = p.tgt)
             |SELECT src, tgt, CAST(n AS BIGINT) AS n_tokens,
             |  CAST(((2 * hp + hq) - ((((2 * hp + hq) % (2 * hq))
             |    + 2 * hq) % (2 * hq))) // (2 * hq) AS BIGINT)
             |    AS h_micro
             |FROM h ORDER BY src, tgt""".stripMargin)),

    // ---- q436: CURATED SHARDS — the materialized end of the q430
    //      chain: gates -> normalized dedup -> WebDataset tar shards
    //      of the survivors, strict-round-tripped in the writer; the
    //      oracle replays the gate predicate, the normalized-string
    //      winners, and the q429 tar byte arithmetic over the kept
    //      set. ----
    "q436_curated_shards" -> Q(
      (s, d) => curatedShards(s, Tables.documents(s, d)),
      Some(s"""WITH t AS (SELECT doc_id, text,
             |    list_filter(regexp_split_to_array(trim(lower(text)),
             |      '\\s+'), x -> len(x) > 0) AS w
             |  FROM documents),
             |sig AS (SELECT doc_id, text,
             |    len(w) AS nw,
             |    list_sum(list_transform(w, x -> len(x))) AS sumlen,
             |    len(list_filter(w, x -> regexp_matches(x, '[a-z]')))
             |      AS alpha,
             |    length(regexp_replace(lower(text), '[a-z0-9\\s]', '',
             |      'g')) AS nsym,
             |    length(text) AS nchars,
             |    len(list_filter(w, x -> x IN (${gopherStops
              .map("'" + _ + "'").mkString(",")}))) AS stops,
             |    trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS ct
             |  FROM t),
             |fl AS (SELECT doc_id, text, ct,
             |    (nw < 50 OR nw > 100000
             |      OR nw = 0 OR (sumlen * 1000) // greatest(nw, 1) < 3000
             |      OR (sumlen * 1000) // greatest(nw, 1) > 10000
             |      OR (alpha * 1000) // greatest(nw, 1) < 800
             |      OR nchars = 0
             |      OR (nsym * 1000) // greatest(nchars, 1) > 100
             |      OR stops < 2) AS fail
             |  FROM sig),
             |win AS (SELECT ct, min(doc_id) AS wid FROM fl
             |  WHERE NOT fail GROUP BY ct),
             |kept AS (SELECT f.doc_id, f.text FROM fl f
             |  JOIN win w ON w.ct = f.ct
             |  WHERE NOT f.fail AND f.doc_id = w.wid)
             |SELECT doc_id % 4 AS shard, count(*) AS n_members,
             |  CAST(sum(strlen(text)) AS BIGINT) AS payload_bytes,
             |  CAST(sum(512 + ((strlen(text) + 511) // 512) * 512)
             |    + 1024 AS BIGINT) AS tar_bytes,
             |  TRUE AS roundtrip_ok
             |FROM kept GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- q434: DUPLICATE-CLASS SIZE HISTOGRAM — power-of-two buckets
    //      over the normalized-equality class sizes; the oracle
    //      replays the class counts over the normalized STRING (the
    //      q423 contract) and the integer bin-length bucket. ----
    "q434_dup_class_histogram" -> Q(
      (s, d) => dupClassHistogram(s, Tables.documents(s, d)),
      Some("""WITH c AS (SELECT trim(regexp_replace(lower(text), '\s+',
             |    ' ', 'g')) AS ct
             |  FROM documents),
             |k AS (SELECT ct, count(*) AS c FROM c GROUP BY ct)
             |SELECT CAST(length(bin(c)) - 1 AS BIGINT) AS log2_size,
             |  count(*) AS n_classes, CAST(sum(c) AS BIGINT) AS n_docs
             |FROM k GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- q423: NORMALIZED DEDUP — exact dedup after the q407
    //      normalization rung; Spark groups by the 64-bit hash of the
    //      normalized text, the oracle by the normalized string
    //      (trim/lower/collapse — the ASCII reduction). ----
    "q423_normalized_dedup" -> Q(
      (s, d) => normalizedDedup(s, Tables.documents(s, d)),
      Some("""WITH c AS (SELECT doc_id, source,
             |    trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS ct
             |  FROM documents),
             |w AS (SELECT ct, min(doc_id) AS wid FROM c GROUP BY ct)
             |SELECT c.source, count(*) AS n_docs,
             |  CAST(sum(CASE WHEN c.doc_id <> w.wid THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_dropped,
             |  CAST(count(*) - sum(CASE WHEN c.doc_id <> w.wid
             |    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
             |FROM c JOIN w ON w.ct = c.ct
             |GROUP BY c.source ORDER BY c.source""".stripMargin)),

    // ---- q421: LEXICAL IDF DRIFT — the 25 terms whose smoothed IDF
    //      moved most between the doc-id halves; the text-side drift
    //      monitor next to q392 (numeric PSI) and q395 (embedding).
    //      The oracle replays the distinct-(doc, term) counts, both
    //      micro-rounded IDFs, and the (|Δ| desc, term) top-k. ----
    "q421_idf_drift" -> Q(
      (s, d) => idfDrift(s, Tables.documents(s, d)),
      Some("""WITH mx AS (SELECT max(doc_id) AS mx FROM documents),
             |dt AS (SELECT DISTINCT doc_id AS did, unnest(list_filter(
             |    regexp_split_to_array(trim(lower(text)), '\s+'),
             |    x -> len(x) > 0)) AS term
             |  FROM documents),
             |ed AS (SELECT term,
             |    sum(CASE WHEN did <= (SELECT mx FROM mx) // 2
             |      THEN 1 ELSE 0 END) AS df_early,
             |    sum(CASE WHEN did > (SELECT mx FROM mx) // 2
             |      THEN 1 ELSE 0 END) AS df_late
             |  FROM dt GROUP BY term),
             |nd AS (SELECT
             |    sum(CASE WHEN doc_id <= (SELECT mx FROM mx) // 2
             |      THEN 1 ELSE 0 END) AS n_early,
             |    sum(CASE WHEN doc_id > (SELECT mx FROM mx) // 2
             |      THEN 1 ELSE 0 END) AS n_late
             |  FROM documents),
             |j AS (SELECT term, df_early, df_late,
             |    CAST(round(ln(CAST(n_early + 1 AS DOUBLE)
             |      / CAST(df_early + 1 AS DOUBLE)) * 1e6, 0) AS BIGINT)
             |      AS idf_early_micro,
             |    CAST(round(ln(CAST(n_late + 1 AS DOUBLE)
             |      / CAST(df_late + 1 AS DOUBLE)) * 1e6, 0) AS BIGINT)
             |      AS idf_late_micro
             |  FROM ed, nd WHERE df_early + df_late >= 10)
             |SELECT term, CAST(df_early AS BIGINT) AS df_early,
             |  CAST(df_late AS BIGINT) AS df_late,
             |  idf_early_micro, idf_late_micro,
             |  idf_late_micro - idf_early_micro AS delta_micro
             |FROM j
             |ORDER BY abs(idf_late_micro - idf_early_micro) DESC, term
             |LIMIT 25""".stripMargin)),

    // ---- q418: GOPHER QUALITY RULES — the structural gates (word
    //      count, mean word length, alphabetic-word fraction, symbol
    //      ratio, stop-word floor) in exact truncating milli, flagged
    //      per source; the oracle recomputes every signal with DuckDB
    //      list functions. ----
    "q418_gopher_quality_rules" -> Q(
      (s, d) => gopherQualityRules(s, Tables.documents(s, d)),
      Some(s"""WITH t AS (SELECT doc_id, source, text,
             |    list_filter(regexp_split_to_array(trim(lower(text)),
             |      '\\s+'), x -> len(x) > 0) AS w
             |  FROM documents),
             |sig AS (SELECT source,
             |    len(w) AS nw,
             |    list_sum(list_transform(w, x -> len(x))) AS sumlen,
             |    len(list_filter(w, x -> regexp_matches(x, '[a-z]')))
             |      AS alpha,
             |    length(regexp_replace(lower(text), '[a-z0-9\\s]', '',
             |      'g')) AS nsym,
             |    length(text) AS nchars,
             |    len(list_filter(w, x -> x IN (${gopherStops
              .map("'" + _ + "'").mkString(",")}))) AS stops
             |  FROM t),
             |f AS (SELECT source,
             |    (nw < 50 OR nw > 100000) AS f_nwords,
             |    (nw = 0 OR (sumlen * 1000) // greatest(nw, 1) < 3000
             |      OR (sumlen * 1000) // greatest(nw, 1) > 10000) AS f_wordlen,
             |    (nw = 0 OR (alpha * 1000) // greatest(nw, 1) < 800) AS f_alpha,
             |    (nchars = 0 OR (nsym * 1000) // greatest(nchars, 1) > 100)
             |      AS f_symbol,
             |    (stops < 2) AS f_stop
             |  FROM sig)
             |SELECT source, count(*) AS n_docs,
             |  CAST(sum(CASE WHEN f_nwords THEN 1 ELSE 0 END) AS BIGINT)
             |    AS flag_nwords,
             |  CAST(sum(CASE WHEN f_wordlen THEN 1 ELSE 0 END) AS BIGINT)
             |    AS flag_wordlen,
             |  CAST(sum(CASE WHEN f_alpha THEN 1 ELSE 0 END) AS BIGINT)
             |    AS flag_alpha,
             |  CAST(sum(CASE WHEN f_symbol THEN 1 ELSE 0 END) AS BIGINT)
             |    AS flag_symbol,
             |  CAST(sum(CASE WHEN f_stop THEN 1 ELSE 0 END) AS BIGINT)
             |    AS flag_stop,
             |  CAST(sum(CASE WHEN f_nwords OR f_wordlen OR f_alpha
             |    OR f_symbol OR f_stop THEN 1 ELSE 0 END) AS BIGINT)
             |    AS flag_any
             |FROM f GROUP BY source ORDER BY source""".stripMargin)),

    // ---- q417: URL CANONICALIZATION DEDUP — scheme/www/fragment/
    //      query/trailing-slash strips + lowercase over a planted
    //      fixture whose decorations vary per doc while the canonical
    //      form collides by construction (doc_id mod 50); per-domain
    //      collapse counts. The oracle replays fixture, regex chain,
    //      and rollup. ----
    "q417_url_canonical_dedup" -> Q(
      (s, d) => {
        val k = col("doc_id") % 50
        val urls = Tables.documents(s, d).select(col("doc_id"),
          concat(
            element_at(typedlit(Seq("https://", "http://")),
              (col("doc_id") % 2).cast("int") + 1),
            when(col("doc_id") % 4 === 0, lit("www.")).otherwise(lit("")),
            lit("Site"), (k % 19).cast("string"),
            lit(".com/p/"), k.cast("string"),
            when(col("doc_id") % 7 === 0, lit("/")).otherwise(lit("")),
            when(col("doc_id") % 5 === 0, lit("?utm_source=feed"))
              .otherwise(lit("")),
            when(col("doc_id") % 6 === 0, lit("#top")).otherwise(lit("")))
            .as("url"))
        urlCanonicalDedup(s, urls)
      },
      Some("""WITH u AS (SELECT doc_id,
             |    (CASE WHEN doc_id % 2 = 0 THEN 'https://'
             |          ELSE 'http://' END) ||
             |    (CASE WHEN doc_id % 4 = 0 THEN 'www.' ELSE '' END) ||
             |    'Site' || CAST((doc_id % 50) % 19 AS VARCHAR) ||
             |    '.com/p/' || CAST(doc_id % 50 AS VARCHAR) ||
             |    (CASE WHEN doc_id % 7 = 0 THEN '/' ELSE '' END) ||
             |    (CASE WHEN doc_id % 5 = 0 THEN '?utm_source=feed'
             |          ELSE '' END) ||
             |    (CASE WHEN doc_id % 6 = 0 THEN '#top' ELSE '' END) AS url
             |  FROM documents),
             |c AS (SELECT doc_id,
             |    regexp_replace(regexp_replace(regexp_replace(
             |      regexp_replace(regexp_replace(lower(url),
             |        '^https?://', ''), '^www\.', ''), '#.*$', ''),
             |      '\?.*$', ''), '/$', '') AS canon
             |  FROM u),
             |d AS (SELECT doc_id, canon,
             |    regexp_extract(canon, '^([^/]+)', 1) AS domain FROM c)
             |SELECT domain, count(*) AS n_urls,
             |  CAST(count(DISTINCT canon) AS BIGINT) AS n_canonical,
             |  CAST(count(*) - count(DISTINCT canon) AS BIGINT) AS n_dup
             |FROM d GROUP BY domain ORDER BY domain""".stripMargin)),

    // ---- q415: WITHIN-DOC REPETITION FILTER — the Gopher repetition
    //      rules (top-2/3-gram share, duplicate-6-gram share, integer
    //      milli) flagged per source. The oracle recomputes every
    //      doc's n-gram count tables and the truncating-milli
    //      signals. ----
    "q415_repetition_filter" -> Q(
      (s, d) => repetitionFilter(s, Tables.documents(s, d)),
      Some {
        def gram(n: Int): String = {
          val terms = (0 until n).map(j =>
            if (j == 0) "w[i]" else s"w[i+$j]").mkString(" || ' ' || ")
          s"""SELECT doc_id, unnest(list_transform(
             |    range(1, len(w) - ${n - 2}), i -> $terms)) AS g
             |  FROM t WHERE len(w) >= $n""".stripMargin
        }
        s"""WITH t AS (SELECT doc_id, source,
           |    regexp_split_to_array(trim(lower(text)), '\\s+') AS w
           |  FROM documents),
           |c2 AS (SELECT doc_id, g, count(*) AS c FROM (${gram(2)}) x
           |  GROUP BY 1, 2),
           |s2 AS (SELECT doc_id, (max(c) * 1000) // sum(c) AS v
           |  FROM c2 GROUP BY doc_id),
           |c3 AS (SELECT doc_id, g, count(*) AS c FROM (${gram(3)}) x
           |  GROUP BY 1, 2),
           |s3 AS (SELECT doc_id, (max(c) * 1000) // sum(c) AS v
           |  FROM c3 GROUP BY doc_id),
           |c6 AS (SELECT doc_id, g, count(*) AS c FROM (${gram(6)}) x
           |  GROUP BY 1, 2),
           |s6 AS (SELECT doc_id,
           |    (sum(CASE WHEN c >= 2 THEN c ELSE 0 END) * 1000)
           |      // sum(c) AS v
           |  FROM c6 GROUP BY doc_id),
           |sig AS (SELECT t.doc_id, t.source,
           |    coalesce(s2.v, 0) AS top2, coalesce(s3.v, 0) AS top3,
           |    coalesce(s6.v, 0) AS dup6
           |  FROM t LEFT JOIN s2 USING (doc_id)
           |  LEFT JOIN s3 USING (doc_id) LEFT JOIN s6 USING (doc_id))
           |SELECT source, count(*) AS n_docs,
           |  CAST(sum(CASE WHEN top2 > 200 THEN 1 ELSE 0 END) AS BIGINT)
           |    AS flag_top2,
           |  CAST(sum(CASE WHEN top3 > 180 THEN 1 ELSE 0 END) AS BIGINT)
           |    AS flag_top3,
           |  CAST(sum(CASE WHEN dup6 > 300 THEN 1 ELSE 0 END) AS BIGINT)
           |    AS flag_dup6,
           |  CAST(sum(CASE WHEN top2 > 200 OR top3 > 180 OR dup6 > 300
           |    THEN 1 ELSE 0 END) AS BIGINT) AS flag_any
           |FROM sig GROUP BY source ORDER BY source""".stripMargin
      }),

    // ---- q413: N-GRAM NOVELTY CURVE — per-checkpoint new-8-gram
    //      fraction in doc-id order. Spark compares 64-bit FNV gram
    //      hashes; the oracle recomputes with STRING grams (q73's
    //      contract) plus the monotone bucket map and the completed
    //      grid. ----
    "q413_ngram_novelty" -> Q(
      (s, d) => gramNovelty(s, Tables.documents(s, d)),
      Some("""WITH t AS (SELECT doc_id AS did,
             |    regexp_split_to_array(trim(lower(text)), '\s+') AS w
             |  FROM documents),
             |dg AS (SELECT did, unnest(list_distinct(
             |    list_transform(range(1, len(w) - 6),
             |      i -> array_to_string(w[i:i+7], ' ')))) AS g
             |  FROM t),
             |mx AS (SELECT max(doc_id) AS mx FROM documents),
             |tb AS (SELECT (did * 32) // ((SELECT mx FROM mx) + 1) + 1 AS b,
             |    g FROM dg),
             |nb AS (SELECT b, count(*) AS n_grams FROM tb GROUP BY b),
             |fv AS (SELECT g, min(b) AS fb FROM tb GROUP BY g),
             |nv AS (SELECT fb AS b, count(*) AS n_new FROM fv GROUP BY fb),
             |grid AS (SELECT unnest(range(1, 33)) AS b)
             |SELECT g.b, CAST(coalesce(nb.n_grams, 0) AS BIGINT) AS n_grams,
             |  CAST(coalesce(nv.n_new, 0) AS BIGINT) AS n_new,
             |  CASE WHEN coalesce(nb.n_grams, 0) > 0
             |    THEN CAST((coalesce(nv.n_new, 0) * 1000)
             |      // nb.n_grams AS BIGINT) END AS novelty_milli
             |FROM grid g LEFT JOIN nb ON nb.b = g.b
             |LEFT JOIN nv ON nv.b = g.b
             |ORDER BY g.b""".stripMargin)),

    // ---- q411: PERPLEXITY FILTER — the Gopher/CCNet LM-quality gate:
    //      bigram LM trained on the English slice, every doc scored,
    //      keep avg_lp ≥ −3.5 (fixed threshold, validation-derived —
    //      sits between this corpus's p05 and p10). The oracle replays
    //      the reference-slice model, every doc's smoothed-floor LEFT-
    //      join scoring, the gate, and the per-source rollup. ----
    "q411_perplexity_filter" -> Q(
      (s, d) => perplexityFilter(s, Tables.documents(s, d), tau = -3.5),
      Some("""WITH t AS (SELECT doc_id, source, lang,
             |    list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
             |      x -> len(x) > 0) AS w
             |  FROM documents),
             |mt AS (SELECT w FROM t WHERE lang = 'en'),
             |u AS (SELECT tok, count(*) AS c1
             |  FROM (SELECT unnest(w) AS tok FROM mt) x GROUP BY tok),
             |v AS (SELECT count(*) AS v FROM u),
             |b AS (SELECT g, count(*) AS c2 FROM (SELECT unnest(
             |    CASE WHEN len(w) < 2 THEN []::VARCHAR[] ELSE
             |      list_transform(range(1, len(w)),
             |        i -> w[i] || ' ' || w[i+1]) END) AS g FROM mt) x
             |  GROUP BY g),
             |db AS (SELECT doc_id, unnest(
             |    CASE WHEN len(w) < 2 THEN []::VARCHAR[] ELSE
             |      list_transform(range(1, len(w)),
             |        i -> w[i] || ' ' || w[i+1]) END) AS g
             |  FROM t),
             |sc AS (SELECT db.doc_id,
             |    ln(CAST(coalesce(b.c2, 0) + 1 AS DOUBLE)
             |      / (coalesce(u.c1, 0) + (SELECT v FROM v))) AS lp
             |  FROM db LEFT JOIN b USING (g)
             |  LEFT JOIN u ON u.tok = split_part(db.g, ' ', 1)),
             |agg AS (SELECT doc_id, count(*) AS nb,
             |    round(avg(lp), 6) AS alp
             |  FROM sc GROUP BY doc_id),
             |j AS (SELECT t.doc_id, t.source,
             |    coalesce(agg.nb, 0) AS nb, coalesce(agg.alp, 0.0) AS alp
             |  FROM t LEFT JOIN agg USING (doc_id)),
             |g2 AS (SELECT source, count(*) AS n_docs,
             |    sum(CASE WHEN nb > 0 AND alp >= -3.5 THEN 1 ELSE 0 END)
             |      AS n_kept,
             |    sum(CASE WHEN nb > 0 AND alp >= -3.5 THEN nb ELSE 0 END)
             |      AS kept_bigrams
             |  FROM j GROUP BY source)
             |SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
             |  CAST(n_kept AS BIGINT) AS n_kept,
             |  CAST(kept_bigrams AS BIGINT) AS kept_bigrams,
             |  CAST(((n_docs - n_kept) * 1000) // n_docs AS BIGINT)
             |    AS drop_milli
             |FROM g2 ORDER BY source""".stripMargin)),

    // ---- q235: TEMPORAL SPLIT WITH EMBARGO — the time-based
    //      leakage-free split over the event stream: train < Jan 22,
    //      valid [Jan 22, Jan 27), test >= Jan 27, with a 12 h embargo
    //      band QUARANTINED before each cutoff (windowed features
    //      computed near a boundary would otherwise see across it).
    //      Per-split counts, distinct users, and exact micro bounds pin
    //      the boundary semantics; micros compare identically on both
    //      engines (the q128 rule). Scale: a narrow map + a 4-row agg —
    //      zero data shuffles beyond the agg. ----
    "q235_temporal_split" -> Q(
      (s, d) => {
        val split = temporalSplit(
          Tables.events(s, d).select(col("event_id"), col("user_id"), col("ts")),
          "ts",
          java.sql.Timestamp.from(java.time.Instant.parse("2024-01-22T00:00:00Z")),
          java.sql.Timestamp.from(java.time.Instant.parse("2024-01-27T00:00:00Z")),
          java.time.Duration.ofHours(12))
        split.groupBy("split")
          .agg(count(lit(1)).as("n_events"),
            countDistinct(col("user_id")).as("n_users"),
            min(unix_micros(col("ts"))).as("min_us"),
            max(unix_micros(col("ts"))).as("max_us"))
          .orderBy("split")
      },
      Some("""WITH e AS (SELECT event_id, user_id,
             |    epoch_us(CAST(ts AS TIMESTAMP)) AS tus
             |  FROM events),
             |b(v, t, emb) AS (VALUES (
             |  epoch_us(TIMESTAMP '2024-01-22 00:00:00'),
             |  epoch_us(TIMESTAMP '2024-01-27 00:00:00'),
             |  12 * 3600 * CAST(1000000 AS BIGINT))),
             |s AS (SELECT event_id, user_id, tus,
             |    CASE WHEN tus >= t THEN 'test'
             |      WHEN tus >= t - emb THEN 'embargo'
             |      WHEN tus >= v THEN 'valid'
             |      WHEN tus >= v - emb THEN 'embargo'
             |      ELSE 'train' END AS split
             |  FROM e CROSS JOIN b)
             |SELECT split, count(*) AS n_events,
             |  count(DISTINCT user_id) AS n_users,
             |  min(tus) AS min_us, max(tus) AS max_us
             |FROM s GROUP BY split ORDER BY split""".stripMargin)),
  )
}
