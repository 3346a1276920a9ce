package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.rel.RelQueries.Q
import graft.rel.Tables

/** READABILITY SCORING (Flesch 1948 / Kincaid et al. 1975) — the
  * classic text-difficulty features next to the q60 quality signals:
  * both the Flesch Reading Ease and the Flesch–Kincaid grade level are
  * fixed linear functions of words-per-sentence and
  * syllables-per-word, so the whole operator is the three integer
  * counts plus one pinned IEEE chain per doc.
  *
  * Counting rules (deterministic, regex-replayable — real syllable
  * counting needs a pronunciation lexicon; the vowel-group heuristic
  * is the standard corpus-scale proxy and the one the oracle can
  * recompute):
  *   - words: whitespace tokens of the lowercased text
  *   - sentences: occurrences of [.!?], floored at 1
  *   - syllables: per word, the count of maximal [aeiouy]+ runs,
  *     floored at 1; summed over words
  *
  * Scale shape: one narrow pass, no shuffle carries text; per-row
  * expression chain only (the piiScrub shape).
  *
  * Output per doc: (id, n_words, n_sentences, n_syllables, fk_r6,
  * ease_r6).
  */
object TextStats {

  def readability(s: SparkSession, docs: DataFrame,
      id: String = "doc_id", text: String = "text"): DataFrame =
    docs
      .withColumn("w",
        expr("filter(split(trim(lower(text)), '\\\\s+'), x -> length(x) > 0)"))
      .withColumn("n_words", greatest(lit(1L), size(col("w")).cast("long")))
      .withColumn("n_sentences",
        greatest(lit(1L), expr("regexp_count(text, '[.!?]')").cast("long")))
      .withColumn("n_syllables", expr(
        "aggregate(transform(w, x -> greatest(1, " +
          "size(regexp_extract_all(x, '[aeiouy]+', 0)))), " +
          "CAST(0 AS BIGINT), (a, v) -> a + CAST(v AS BIGINT))"))
      .select(col(id), col("n_words"), col("n_sentences"), col("n_syllables"),
        round(lit(0.39) * (col("n_words").cast("double")
            / col("n_sentences").cast("double"))
          + lit(11.8) * (col("n_syllables").cast("double")
            / col("n_words").cast("double"))
          - lit(15.59), 6).as("fk_r6"),
        round(lit(206.835)
          - lit(1.015) * (col("n_words").cast("double")
            / col("n_sentences").cast("double"))
          - lit(84.6) * (col("n_syllables").cast("double")
            / col("n_words").cast("double")), 6).as("ease_r6"))

  /** CHARACTER-ENTROPY quality signal — Shannon entropy of the per-doc
    * character distribution, the classic gibberish/boilerplate
    * detector (natural prose sits ~4.0–4.5 bits-of-e; runs of one
    * character → 0; uniform noise → ln(alphabet)): low-entropy docs
    * are repetition/padding, implausibly-high ones are encoded blobs.
    *
    * Exactness: per-(doc, char) counts are exact integers from one
    * hash aggregation; entropy is computed as ln(n) − (Σ c·ln c)/n
    * with the Σ folded over the ORDER-PINNED per-doc character window
    * (chars sort lexicographically in both engines), so the IEEE chain
    * replays. The window frame is the doc's distinct-character set —
    * alphabet-bounded, never text-length-bounded.
    *
    * Output per doc: (id, n_chars, n_distinct, entropy_r6) in nats.
    * Empty texts are excluded (entropy undefined).
    */
  def charEntropy(s: SparkSession, docs: DataFrame,
      id: String = "doc_id", text: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = docs
      .filter(length(col(text)) > 0)
      .select(col(id), explode(split(col(text), "")).as("ch"))
      .filter(length(col("ch")) > 0)
      .groupBy(col(id), col("ch")).agg(count(lit(1)).as("c"))
    val wCum = Window.partitionBy(id).orderBy("ch")
      .rowsBetween(Long.MinValue, 0)
    counts
      .withColumn("tcum",
        sum(col("c").cast("double") * log(col("c").cast("double"))).over(wCum))
      .groupBy(col(id))
      .agg(sum(col("c")).as("n_chars"),
        count(lit(1)).as("n_distinct"),
        max(struct(col("ch"), col("tcum"))).as("z"))
      .select(col(id), col("n_chars"), col("n_distinct"),
        round(log(col("n_chars").cast("double"))
          - col("z.tcum") / col("n_chars").cast("double"), 6)
          .as("entropy_r6"))
      .orderBy(id)
  }

  /** ZIPF-LAW FIT of the corpus token frequencies — the classic
    * corpus-health audit (natural language sits near slope −1; heavy
    * boilerplate flattens the head, synthetic/templated text steepens
    * or staircases it): OLS of ln(freq) on ln(rank) over the top
    * `topK` tokens,
    *
    *   slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²).
    *
    * Determinism: token counts are exact integers; ranks are the
    * (count desc, token asc) total order; the fit follows the
    * [[graft.functions.IntOls]] discipline — per-point ln snapped to
    * integer micro, exact integer moments, exact rational
    * round-half-up — so no cross-engine libm chain reaches the
    * output. Output (1 row): (n_tokens, vocab, top_k, slope_micro,
    * intercept_micro) — slope and ln-intercept in integer micro-units.
    */
  def zipfFit(s: SparkSession, docs: DataFrame, topK: Int = 100,
      text: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(topK >= 10, s"topK >= 10: $topK")
    val toks = docs
      .select(explode(expr(
        s"filter(split(trim(lower($text)), '\\\\s+'), x -> length(x) > 0)"))
        .as("tok"))
    val counts = toks.groupBy("tok").agg(count(lit(1)).as("f"))
    val tot = counts.agg(sum(col("f")).as("n_tokens"),
      count(lit(1)).as("vocab"))
    // orderBy+limit compiles to TakeOrderedAndProject — per-partition
    // bounded heaps, never a global vocabulary sort; the rank window
    // then runs over ≤ topK rows
    val top = counts.orderBy(col("f").desc, col("tok").asc).limit(topK)
      .withColumn("rn", row_number().over(
        Window.orderBy(col("f").desc, col("tok").asc)))
    // integer moments are order-free — no order-pinned window needed
    val dec = "decimal(38,0)"
    top
      .withColumn("x", graft.functions.IntOls.lnMicro(col("rn")))
      .withColumn("y", graft.functions.IntOls.lnMicro(col("f")))
      .agg(count(lit(1)).as("k"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"))
      .crossJoin(broadcast(tot))
      .withColumn("num", col("k").cast(dec) * col("sxy").cast(dec)
        - col("sx").cast(dec) * col("sy").cast(dec))
      .withColumn("den", col("k").cast(dec) * col("sxx").cast(dec)
        - col("sx").cast(dec) * col("sx").cast(dec))
      .select(col("n_tokens"), col("vocab"), col("k").as("top_k"),
        when(col("den") > 0, graft.functions.IntOls.rhu(
          col("num") * lit(1000000L), col("den"))).as("slope_micro"),
        when(col("den") > 0, graft.functions.IntOls.rhu(
          col("sy").cast(dec) * col("den") - col("num") * col("sx").cast(dec),
          col("k").cast(dec) * col("den"))).as("intercept_micro"))
  }

  /** HEAPS'-LAW VOCABULARY GROWTH FIT (Herdan 1960, Heaps 1978):
    * V(N) ≈ K·N^β — how fast the vocabulary grows as the corpus is
    * read in doc-id order. The sub-linear exponent β is the corpus-
    * planning number (how much NEW vocabulary another 10× of data
    * buys) and a diversity audit: boilerplate-heavy corpora bend low.
    *
    * Scale shape: growth is measured at `buckets` doc-id CHECKPOINTS,
    * not per doc — a term's first-occurrence bucket is one hash agg
    * (min over the monotone bucket of its min doc id), token mass per
    * bucket another, and everything after runs on the completed
    * ≤`buckets`-row grid (the q392 bin-completion rule): cumulative
    * sums, the two ln's per point, and the log-log OLS, all on
    * domain-bounded frames. No global window ever sees corpus-sized
    * data. The fit follows the [[graft.functions.IntOls]] discipline:
    * each point's ln is snapped to integer micro-units, the moments
    * fold in exact integers, and β / ln K emerge from exact rational
    * round-half-up — no cross-engine libm chain survives to the
    * output (the r13 q410 hash mismatch was exactly that chain).
    *
    * Output (1 row): (n_tokens, vocab, n_points, beta_micro,
    * lnk_micro) — β and ln K in integer micro-units (BIGINT; K itself
    * is exp(lnk_micro/1e6), left to the reader because exp is the
    * libm call the discipline exists to keep out of hashed output).
    */
  def heapsLaw(s: SparkSession, docs: DataFrame, buckets: Int = 32,
      id: String = "doc_id", text: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(buckets >= 4 && buckets <= 256, s"4 <= buckets <= 256: $buckets")
    val toks = docs
      .select(col(id).cast("long").as("did"),
        explode(expr(
          s"filter(split(trim(lower($text)), '\\\\s+'), x -> length(x) > 0)"))
          .as("tok"))
    val mx = docs.agg(max(col(id).cast("long")).as("mx"))
    val tb = toks.crossJoin(broadcast(mx))
      .select(expr(s"(did * $buckets) div (mx + 1) + 1").as("b"), col("tok"))
    val ntokB = tb.groupBy("b").agg(count(lit(1)).as("ntok"))
    // a term's first bucket = bucket of its first doc (monotone map)
    val nnewB = tb.groupBy("tok").agg(min(col("b")).as("fb"))
      .groupBy(col("fb").as("b")).agg(count(lit(1)).as("nnew"))
    val grid = s.range(1, buckets + 1L).select(col("id").as("b"))
    val wCum = Window.orderBy("b").rowsBetween(Long.MinValue, 0)
    val pts = grid
      .join(ntokB, Seq("b"), "left").join(nnewB, Seq("b"), "left")
      .select(col("b"), coalesce(col("ntok"), lit(0L)).as("ntok"),
        coalesce(col("nnew"), lit(0L)).as("nnew"))
      .withColumn("cumn", sum(col("ntok")).over(wCum))
      .withColumn("cumv", sum(col("nnew")).over(wCum))
      .filter(col("cumn") > 0 && col("cumv") > 0)
      .withColumn("x", graft.functions.IntOls.lnMicro(col("cumn")))
      .withColumn("y", graft.functions.IntOls.lnMicro(col("cumv")))
    // integer moments are order-free — no order-pinned window needed
    val dec = "decimal(38,0)"
    pts
      .agg(count(lit(1)).as("k"),
        max(col("cumn")).as("n_tokens"), max(col("cumv")).as("vocab"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"))
      .withColumn("num", col("k").cast(dec) * col("sxy").cast(dec)
        - col("sx").cast(dec) * col("sy").cast(dec))
      .withColumn("den", col("k").cast(dec) * col("sxx").cast(dec)
        - col("sx").cast(dec) * col("sx").cast(dec))
      .select(col("n_tokens"), col("vocab"), col("k").as("n_points"),
        when(col("den") > 0, graft.functions.IntOls.rhu(
          col("num") * lit(1000000L), col("den"))).as("beta_micro"),
        when(col("den") > 0, graft.functions.IntOls.rhu(
          col("sy").cast(dec) * col("den") - col("num") * col("sx").cast(dec),
          col("k").cast(dec) * col("den"))).as("lnk_micro"))
  }

  /** VOCABULARY COVERAGE CURVE — what share of all token OCCURRENCES
    * the k most frequent types cover, at doubling rungs k = 1, 2, 4,
    * …, 4096: the tokenizer-sizing readout (where the curve flattens
    * is where growing the vocabulary stops buying coverage, and
    * 1000 − covered_milli at the chosen k is the byte-fallback/OOV
    * rate a word-level vocab would pay). Ranks ride a window over the
    * Zipf-bounded TYPE table (the q366 contract — never over token
    * occurrences); all 13 rungs come from ONE conditional aggregation
    * (adding a rung adds zero passes).
    *
    * Output per rung, ascending k: (k, n_types, covered, covered_milli).
    */
  def vocabCoverageCurve(s: SparkSession, docs: DataFrame,
      maxLogK: Int = 12, text: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(maxLogK >= 0 && maxLogK <= 24, s"0 <= maxLogK <= 24: $maxLogK")
    val toks = docs
      .select(explode(expr(
        s"filter(split(trim(lower($text)), '\\\\s+'), x -> length(x) > 0)"))
        .as("tok"))
    val ranked = toks.groupBy("tok").agg(count(lit(1)).as("c"))
      .withColumn("rn", row_number().over(
        Window.orderBy(col("c").desc, col("tok").asc)))
    val ks = (0 to maxLogK).map(1L << _)
    val aggCols = ks.flatMap { k =>
      Seq(sum(when(col("rn") <= k, col("c")).otherwise(0L)).as(s"cov_$k"),
        sum(when(col("rn") <= k, 1L).otherwise(0L)).as(s"nt_$k"))
    } :+ sum(col("c")).as("total")
    val one = ranked.agg(aggCols.head, aggCols.tail: _*)
    val stackArgs = ks.map(k => s"${k}L, nt_$k, cov_$k").mkString(", ")
    one.select(col("total"),
        expr(s"stack(${ks.length}, $stackArgs) AS (k, n_types, covered)"))
      .select(col("k"), col("n_types"), col("covered"),
        expr("(covered * 1000) div greatest(total, 1)").as("covered_milli"))
      .orderBy("k")
  }

  /** TOKEN BURSTINESS (Church & Gale 1995): collection frequency over
    * document frequency per token — cf/df ≈ 1 marks evenly-spread
    * function words; high cf/df marks bursty content terms (and, in a
    * crawled corpus, boilerplate that repeats WITHIN pages). Two hash
    * aggregations (token occurrences; per-(token, doc) presence), a
    * bounded top-k by cf. Output, ordered (cf desc, token asc):
    * (tok, cf, df, burst_r6).
    */
  def tokenBurstiness(s: SparkSession, docs: DataFrame, topK: Int = 20,
      id: String = "doc_id", text: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col(id),
      explode(expr(
        s"filter(split(trim(lower($text)), '\\\\s+'), x -> length(x) > 0)"))
        .as("tok"))
    val perDoc = toks.groupBy(col(id), col("tok"))
      .agg(count(lit(1)).as("c"))
    val stats = perDoc.groupBy("tok")
      .agg(sum(col("c")).as("cf"), count(lit(1)).as("df"))
    stats.orderBy(col("cf").desc, col("tok").asc).limit(topK)
      .withColumn("rn", row_number().over(
        Window.orderBy(col("cf").desc, col("tok").asc)))
      .select(col("rn"), col("tok"), col("cf"), col("df"),
        round(col("cf").cast("double") / col("df").cast("double"), 6)
          .as("burst_r6"))
  }

  val all: ListMap[String, Q] = ListMap(
    // ---- q369: burstiness of the corpus's top-20 tokens — cf/df per
    //      token; the oracle replays both aggregations and the
    //      (cf desc, token asc) bounded ranking. ----
    "q369_burstiness" -> Q(
      (s, d) => tokenBurstiness(s, Tables.documents(s, d)),
      Some("""WITH t AS (SELECT doc_id, unnest(list_filter(
             |    regexp_split_to_array(trim(lower(text)), '\s+'),
             |    x -> len(x) > 0)) AS tok FROM documents),
             |pd AS (SELECT doc_id, tok, count(*) AS c
             |  FROM t GROUP BY doc_id, tok),
             |st AS (SELECT tok, sum(c) AS cf, count(*) AS df
             |  FROM pd GROUP BY tok),
             |r AS (SELECT tok, cf, df, row_number() OVER
             |    (ORDER BY cf DESC, tok) AS rn
             |  FROM st QUALIFY rn <= 20)
             |SELECT CAST(rn AS INT) AS rn, tok, CAST(cf AS BIGINT) AS cf,
             |  CAST(df AS BIGINT) AS df,
             |  round(CAST(cf AS DOUBLE) / CAST(df AS DOUBLE), 6) AS burst_r6
             |FROM r ORDER BY rn""".stripMargin)),

    // ---- q366: Zipf slope of the corpus token distribution — the
    //      oracle replays the (count desc, token asc) ranking and the
    //      INTEGER-EXACT micro-snapped OLS (the IntOls discipline:
    //      per-point ln snapped to micro, HUGEINT moments, exact
    //      rational round-half-up). ----
    "q366_zipf_fit" -> Q(
      (s, d) => zipfFit(s, Tables.documents(s, d)),
      Some("""WITH t AS (SELECT unnest(list_filter(
             |    regexp_split_to_array(trim(lower(text)), '\s+'),
             |    x -> len(x) > 0)) AS tok FROM documents),
             |c AS (SELECT tok, count(*) AS f FROM t GROUP BY tok),
             |tot AS (SELECT sum(f) AS n_tokens, count(*) AS vocab FROM c),
             |r AS (SELECT tok, f, row_number() OVER
             |    (ORDER BY f DESC, tok) AS rn
             |  FROM c QUALIFY rn <= 100),
             |p AS (SELECT
             |    CAST(round(ln(CAST(rn AS DOUBLE)) * 1e6, 0) AS HUGEINT) AS x,
             |    CAST(round(ln(CAST(f AS DOUBLE)) * 1e6, 0) AS HUGEINT) AS y
             |  FROM r),
             |m AS (SELECT count(*) AS k, sum(x) AS sx, sum(y) AS sy,
             |    sum(x * x) AS sxx, sum(x * y) AS sxy
             |  FROM p),
             |d AS (SELECT k, sx, sy,
             |    CAST(k AS HUGEINT) * sxy - sx * sy AS num,
             |    CAST(k AS HUGEINT) * sxx - sx * sx AS den
             |  FROM m),
             |e AS (SELECT *,
             |    2 * num * 1000000 + den AS bp, 2 * den AS bq,
             |    2 * (sy * den - num * sx) + CAST(k AS HUGEINT) * den AS ip,
             |    2 * CAST(k AS HUGEINT) * den AS iq
             |  FROM d)
             |SELECT CAST(tot.n_tokens AS BIGINT) AS n_tokens,
             |  CAST(tot.vocab AS BIGINT) AS vocab,
             |  CAST(e.k AS BIGINT) AS top_k,
             |  CASE WHEN den > 0 THEN
             |    CAST((bp - ((bp % bq + bq) % bq)) // bq AS BIGINT)
             |  END AS slope_micro,
             |  CASE WHEN den > 0 THEN
             |    CAST((ip - ((ip % iq + iq) % iq)) // iq AS BIGINT)
             |  END AS intercept_micro
             |FROM tot, e""".stripMargin)),

    // ---- q426: VOCABULARY COVERAGE CURVE — cumulative token-mass
    //      share of the top-k types at doubling rungs; the oracle
    //      replays the (freq desc, tok) ranking and every rung's
    //      conditional sums. ----
    "q426_vocab_coverage_curve" -> Q(
      (s, d) => vocabCoverageCurve(s, Tables.documents(s, d)),
      Some {
        val ks = (0 to 12).map(1L << _)
        s"""WITH t AS (SELECT unnest(list_filter(
           |    regexp_split_to_array(trim(lower(text)), '\\s+'),
           |    x -> len(x) > 0)) AS tok FROM documents),
           |c AS (SELECT tok, count(*) AS c FROM t GROUP BY tok),
           |r AS (SELECT c, row_number() OVER (ORDER BY c DESC, tok)
           |    AS rn FROM c),
           |tot AS (SELECT sum(c) AS total FROM r)
           |${ks.map(k =>
          s"""SELECT CAST($k AS BIGINT) AS k,
             |  CAST((SELECT count(*) FROM r WHERE rn <= $k) AS BIGINT)
             |    AS n_types,
             |  CAST((SELECT coalesce(sum(c), 0) FROM r WHERE rn <= $k)
             |    AS BIGINT) AS covered,
             |  CAST(((SELECT coalesce(sum(c), 0) FROM r WHERE rn <= $k)
             |    * 1000) // greatest((SELECT total FROM tot), 1)
             |    AS BIGINT) AS covered_milli""".stripMargin)
          .mkString("\nUNION ALL\n")}
           |ORDER BY k""".stripMargin
      }),

    // ---- q410: HEAPS'-LAW vocabulary growth — V(N) = K·N^β fit at 32
    //      doc-id checkpoints; the oracle replays the monotone bucket
    //      map, the completed grid, the cumulative token/vocab sums,
    //      and the INTEGER-EXACT micro-snapped OLS (the IntOls
    //      discipline: per-point ln snapped to micro, HUGEINT moments,
    //      exact rational round-half-up — the r13 libm-chain hash
    //      mismatch cannot recur by construction). ----
    "q410_heaps_law" -> Q(
      (s, d) => heapsLaw(s, Tables.documents(s, d)),
      Some("""WITH tk AS (SELECT doc_id AS did, unnest(list_filter(
             |    regexp_split_to_array(trim(lower(text)), '\s+'),
             |    x -> len(x) > 0)) AS tok FROM documents),
             |mx AS (SELECT max(doc_id) AS mx FROM documents),
             |tb AS (SELECT (did * 32) // ((SELECT mx FROM mx) + 1) + 1 AS b,
             |    tok FROM tk),
             |nt AS (SELECT b, count(*) AS ntok FROM tb GROUP BY b),
             |fv AS (SELECT tok, min(b) AS fb FROM tb GROUP BY tok),
             |nv AS (SELECT fb AS b, count(*) AS nnew FROM fv GROUP BY fb),
             |grid AS (SELECT unnest(range(1, 33)) AS b),
             |cum AS (SELECT g.b,
             |    sum(coalesce(nt.ntok, 0)) OVER (ORDER BY g.b
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumn,
             |    sum(coalesce(nv.nnew, 0)) OVER (ORDER BY g.b
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumv
             |  FROM grid g LEFT JOIN nt ON nt.b = g.b
             |  LEFT JOIN nv ON nv.b = g.b),
             |pts AS (SELECT b, cumn, cumv,
             |    CAST(round(ln(CAST(cumn AS DOUBLE)) * 1e6, 0) AS HUGEINT) AS x,
             |    CAST(round(ln(CAST(cumv AS DOUBLE)) * 1e6, 0) AS HUGEINT) AS y
             |  FROM cum WHERE cumn > 0 AND cumv > 0),
             |m AS (SELECT count(*) AS k, max(cumn) AS n_tokens,
             |    max(cumv) AS vocab,
             |    sum(x) AS sx, sum(y) AS sy,
             |    sum(x * x) AS sxx, sum(x * y) AS sxy
             |  FROM pts),
             |d AS (SELECT k, n_tokens, vocab, sx, sy,
             |    CAST(k AS HUGEINT) * sxy - sx * sy AS num,
             |    CAST(k AS HUGEINT) * sxx - sx * sx AS den
             |  FROM m),
             |e AS (SELECT *,
             |    2 * num * 1000000 + den AS bp, 2 * den AS bq,
             |    2 * (sy * den - num * sx) + CAST(k AS HUGEINT) * den AS ip,
             |    2 * CAST(k AS HUGEINT) * den AS iq
             |  FROM d)
             |SELECT CAST(n_tokens AS BIGINT) AS n_tokens,
             |  CAST(vocab AS BIGINT) AS vocab,
             |  CAST(k AS BIGINT) AS n_points,
             |  CASE WHEN den > 0 THEN
             |    CAST((bp - ((bp % bq + bq) % bq)) // bq AS BIGINT)
             |  END AS beta_micro,
             |  CASE WHEN den > 0 THEN
             |    CAST((ip - ((ip % iq + iq) % iq)) // iq AS BIGINT)
             |  END AS lnk_micro
             |FROM e""".stripMargin)),

    // ---- q357: per-doc character entropy — counts + the ordered
    //      Σ c·ln c fold, replayed in DuckDB with its ordered
    //      aggregate over the same lexicographic character order. ----
    "q357_char_entropy" -> Q(
      (s, d) => charEntropy(s, Tables.documents(s, d)),
      Some("""WITH ch AS (SELECT doc_id, unnest(string_split(text, '')) AS ch
             |  FROM documents WHERE length(text) > 0),
             |ct AS (SELECT doc_id, ch, count(*) AS c FROM ch GROUP BY 1, 2)
             |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_chars,
             |  count(*) AS n_distinct,
             |  round(ln(CAST(sum(c) AS DOUBLE))
             |    - sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)) ORDER BY ch)
             |      / CAST(sum(c) AS DOUBLE), 6) AS entropy_r6
             |FROM ct GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // ---- q355: Flesch-Kincaid grade + Reading Ease over the corpus —
    //      the oracle recomputes the three counts with the identical
    //      regex rules and replays both pinned linear chains. ----
    "q355_readability" -> Q(
      (s, d) => readability(s, Tables.documents(s, d)).orderBy("doc_id"),
      Some("""WITH t AS (SELECT doc_id,
             |    list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
             |      x -> len(x) > 0) AS w,
             |    greatest(1, len(regexp_extract_all(text, '[.!?]')))
             |      AS n_sentences
             |  FROM documents),
             |c AS (SELECT doc_id,
             |    greatest(1, len(w)) AS n_words,
             |    CAST(n_sentences AS BIGINT) AS n_sentences,
             |    list_sum(list_transform(w, x -> greatest(1,
             |      len(regexp_extract_all(x, '[aeiouy]+'))))) AS n_syllables
             |  FROM t)
             |SELECT doc_id, CAST(n_words AS BIGINT) AS n_words, n_sentences,
             |  CAST(n_syllables AS BIGINT) AS n_syllables,
             |  round(0.39 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
             |    + 11.8 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE))
             |    - 15.59, 6) AS fk_r6,
             |  round(206.835
             |    - 1.015 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
             |    - 84.6 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE)),
             |    6) AS ease_r6
             |FROM c ORDER BY doc_id""".stripMargin)),
  )
}
