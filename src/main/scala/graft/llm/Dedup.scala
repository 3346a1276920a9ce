package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Library-shaped deduplication over caller DataFrames — the public API
  * behind the q33/q34/q35 driver entries. Input: `docs` with (`id`:
  * long, `text`: string); column names are parameters. Every pair
  * producer is keyed (hash / shingle / band) — the n² pair space is
  * never materialized, which is the whole design at 100 TB.
  */
object Dedup {

  /** Exact duplicate groups by content hash: one row per distinct
    * content with the canonical (minimum) id and the copy count.
    */
  def exactGroups(docs: DataFrame, id: String = "id", text: String = "text"): DataFrame =
    docs
      .groupBy(md5(col(text).cast("binary")).as("content_hash"))
      .agg(min(col(id)).as("canonical_id"), count(lit(1)).as("n_copies"))

  /** Keep one row per distinct content (the canonical id's row). */
  def dropExactDuplicates(docs: DataFrame, id: String = "id", text: String = "text"): DataFrame =
    docs.join(
      exactGroups(docs, id, text).select(col("canonical_id").as(id)), id)

  /** Near-duplicate pairs by exact n-gram Jaccard over word 3-shingles,
    * with the document-frequency cap (shared with q34): shingles in more
    * than `dfCap` docs are dropped from the pairs AND the sizes, so the
    * Jaccard is exact over the capped shingle universe. Returns (ida,
    * idb, inter, jac) for pairs with jac ≥ `minJaccard`.
    *
    * Physical shape — ONE wide shuffle: shingle rows group by shingle
    * (sort-based, streamed), and each group's posting list emits its
    * C(df, 2) doc pairs plus one size marker per member, with the df cap
    * applied INLINE: the group buffers at most dfCap+1 ids, so a
    * boilerplate shingle in a million docs costs one streamed, skipped
    * group — bounded memory, no hot-key blowup at 100 TB. The two final
    * aggregations (pair counts, per-doc sizes) read the cached tagged
    * output, which is orders smaller than the shingle table. This
    * replaced a df-count + anti-join + self-join chain (5 shuffles, 2
    * caches) — same semantics, same oracle, ~2 fewer wide stages.
    *
    * `observePrefix` attaches `<prefix>_pre_cap` / `<prefix>_post_cap`
    * row-count metrics (kept-vs-dropped visibility; Verify/Bench print
    * them via ObservedMetricsLog).
    *
    * The shared intermediate (posting-list pairs + size markers) is
    * localCheckpoint'ed, not cache()d: it feeds two consumers either
    * way, but checkpoint blocks release with the reference — a
    * long-lived session calling this per batch (dedup-on-ingest) no
    * longer accrues one CacheManager entry per call.
    */
  def jaccardPairs(s: SparkSession, docs: DataFrame, minJaccard: Double,
      dfCap: Int = LlmOps.shingleDfCap,
      id: String = "id", text: String = "text",
      observePrefix: Option[String] = None): DataFrame =
    pairCounts(s, docs, dfCap, id, text, observePrefix)
      .withColumn("jac",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .filter(col("jac") >= minJaccard)
      .select("ida", "idb", "inter", "jac")

  /** SOURCE-PRIORITY DEDUP — near-dup clusters resolved by SOURCE
    * PRIORITY instead of smallest-id: within each ≥`minJaccard`
    * cluster the survivor is the member minimizing (priority(source),
    * doc_id) — the production rule ("keep the curated mirror, drop
    * the crawl") that plain min-id dedup cannot express. Docs in no
    * cluster are their own survivors. `prio` is any deterministic
    * integer column expression over the source name (broadcast-sized
    * domain).
    *
    * Scale shape: pairs from the capped-shingle space
    * ([[jaccardPairs]]), clusters from the iterated label fold
    * ([[connectedComponents]], diameter-bounded); the survivor argmax
    * is one cluster-keyed min(struct) agg; the report one per-source
    * rollup. Output per source: (source, n_docs, n_dropped, n_kept).
    */
  def priorityDedup(s: SparkSession, docs: DataFrame, prio: Column,
      minJaccard: Double, id: String = "doc_id", text: String = "text",
      source: String = "source"): DataFrame = {
    val pairs = jaccardPairs(s,
      docs.select(col(id).as("id"), col(text).as("text")), minJaccard)
    val comp = connectedComponents(pairs)
    val members = comp
      .join(docs.select(col(id).as("id"), col(source), prio.as("pr")), "id")
    val winner = members.groupBy(col("cluster_id"))
      .agg(min(struct(col("pr"), col("id"))).as("w"))
      .select(col("w.id").as("id"), lit(1L).as("is_winner"))
    val dropped = members.join(winner, Seq("id"), "left")
      .filter(col("is_winner").isNull)
      .select(col("id"))
    docs.select(col(id).as("id"), col(source))
      .join(dropped.withColumn("d", lit(1L)), Seq("id"), "left")
      .groupBy(col(source))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("d").isNotNull, 1L).otherwise(0L)).as("n_dropped"))
      .withColumn("n_kept", col("n_docs") - col("n_dropped"))
      .orderBy(source)
  }

  /** CROSS-SOURCE DUPLICATION MATRIX — near-dup pair counts rolled up
    * by (source, source): the provenance diagnostic a dedup run emits
    * before deciding WHICH copy survives (a source that is mostly
    * duplicates of another is a re-crawl / mirror and gets its dedup
    * priority demoted; heavy diagonal mass is within-source
    * boilerplate). Pairs come from [[jaccardPairs]] (capped-shingle
    * LSH-free pair space, never n²); the rollup is one broadcast-sized
    * join of the pair list to the (id, source) map and a
    * (src_a, src_b)-keyed count, sources ordered least/greatest so the
    * matrix is upper-triangular. Output: (src_a, src_b, n_pairs).
    */
  def sourceDupMatrix(s: SparkSession, docs: DataFrame, minJaccard: Double,
      id: String = "doc_id", text: String = "text",
      source: String = "source"): DataFrame = {
    val pairs = jaccardPairs(s,
      docs.select(col(id).as("id"), col(text).as("text")), minJaccard)
    val src = docs.select(col(id).as("id"), col(source).as("src"))
    pairs
      .join(src.select(col("id").as("ida"), col("src").as("sa")), "ida")
      .join(src.select(col("id").as("idb"), col("src").as("sb")), "idb")
      .select(least(col("sa"), col("sb")).as("src_a"),
        greatest(col("sa"), col("sb")).as("src_b"))
      .groupBy("src_a", "src_b").agg(count(lit(1)).as("n_pairs"))
      .orderBy("src_a", "src_b")
  }

  /** Asymmetric CONTAINMENT pairs over the same capped-shingle pair
    * machinery: containment = |A∩B| / min(|A|,|B|) — the quote /
    * excerpt / superset-document modality Jaccard structurally misses
    * (a 100-shingle doc fully embedded in a 10,000-shingle doc has
    * Jaccard ≈ 0.01 but containment 1.0; Broder's resemblance-vs-
    * containment distinction, SEQUENCES 1997). Reported in exact
    * integer milli-units ((inter·1000) div min(na,nb)), so the pair
    * list is hash-pinnable cross-engine. Same single-wide-shuffle
    * physical shape and df-cap bounds as [[jaccardPairs]].
    */
  def containmentPairs(s: SparkSession, docs: DataFrame, minContMilli: Long,
      dfCap: Int = LlmOps.shingleDfCap,
      id: String = "id", text: String = "text",
      observePrefix: Option[String] = None): DataFrame =
    pairCounts(s, docs, dfCap, id, text, observePrefix)
      .withColumn("n_small", least(col("na"), col("nb")))
      .withColumn("cont_milli", expr("(inter * 1000) div least(na, nb)"))
      .filter(col("cont_milli") >= minContMilli)
      .select("ida", "idb", "inter", "n_small", "cont_milli")

  /** The shared pair core: (ida, idb, inter, na, nb) for every doc pair
    * sharing ≥ 1 kept shingle, under the inline df cap.
    */
  private def pairCounts(s: SparkSession, docs: DataFrame,
      dfCap: Int, id: String, text: String,
      observePrefix: Option[String]): DataFrame = {
    import s.implicits._
    val cap = dfCap
    // shingles travel as 64-bit FNV hashes, not strings: same grouping
    // semantics (collision odds ~1e-8 corpus-wide, and the string-based
    // oracle would catch one), a third of the shuffle bytes
    val sh = docs.select(col(id), col(text)).as[(Long, String)]
      .flatMap { case (i, t) =>
        SketchOps.shingles64Of(SketchOps.tokensOf(t)).iterator.map(g => (i, g))
      }
    val shObs = observePrefix.fold(sh)(p =>
      sh.observe(s"${p}_pre_cap", count(lit(1)).as("rows")))
    // grams are distinct per doc, so group size = document frequency.
    // Emission per kept group: (doc, -1) size markers + ascending (a, b)
    // pairs; overflow groups (df > cap) emit nothing and never buffer
    // more than cap+1 ids.
    val tagged0 = shObs
      .groupByKey(_._2)
      .flatMapGroups { (_, it) =>
        val buf = new Array[Long](cap + 1)
        var n = 0
        var overflow = false
        while (it.hasNext && !overflow) {
          val v = it.next()._1
          if (n <= cap - 1) { buf(n) = v; n += 1 }
          else overflow = true
        }
        if (overflow) Iterator.empty
        else {
          val ids = java.util.Arrays.copyOf(buf, n)
          java.util.Arrays.sort(ids)
          val markers = ids.iterator.map(i => (i, -1L))
          val pairs = for {
            i <- (0 until n).iterator
            j <- (i + 1 until n).iterator
          } yield (ids(i), ids(j))
          markers ++ pairs
        }
      }
      .toDF("ida", "idb")
    val tagged = observePrefix.fold(tagged0)(p =>
      tagged0.observe(s"${p}_post_cap",
        sum(when(col("idb") === -1L, 1L).otherwise(0L)).as("rows")))
      .localCheckpoint() // feeds the pair counts AND the per-doc sizes
    val sizes = tagged.filter(col("idb") === -1L)
      .groupBy(col("ida").as(id)).agg(count(lit(1)).as("n"))
    tagged.filter(col("idb") =!= -1L)
      .groupBy("ida", "idb").agg(count(lit(1)).as("inter"))
      .join(sizes.withColumnRenamed(id, "ida").withColumnRenamed("n", "na"), "ida")
      .join(sizes.withColumnRenamed(id, "idb").withColumnRenamed("n", "nb"), "idb")
      .select("ida", "idb", "inter", "na", "nb")
  }

  /** PREFIX-FILTERED Jaccard join (Chaudhuri et al. ICDE 2006 prefix
    * filter; Xiao et al. WWW 2008 PPJoin's length filter) — the
    * scale-path upgrade of [[jaccardPairs]] for REAL thresholds: under
    * a global shingle order (df ascending, rarest first), two sets
    * with Jaccard ≥ t MUST share a shingle inside their first
    * |x| − ⌈t·|x|⌉ + 1 shingles, so only that prefix emits postings.
    * Common shingles (the big posting lists that dominate the q34 pair
    * space) sort LAST and fall outside every prefix — the candidate
    * space shrinks by the frequency skew of the corpus, which is
    * exactly what grows with corpus size. Candidates then pass the
    * length filter (1000·min(n) ≥ tMilli·max(n)) and are EXACT-verified
    * by intersecting the full kept-shingle arrays, so the output is
    * bit-identical to filtering [[jaccardPairs]] at the same threshold
    * (spec-pinned equivalence; the q34 oracle preamble replays it).
    *
    * The jac ≥ t acceptance itself is INTEGER (1000·inter ≥
    * tMilli·(na+nb−inter)) — a float `>=` at the threshold boundary is
    * exactly where two engines disagree. The df cap and 64-bit shingle
    * hashing follow [[jaccardPairs]] verbatim.
    *
    * Scale shape (100 TB): df agg + per-doc rank window + prefix
    * posting self-join (groups bounded by BOTH the cap and the prefix
    * shrinkage) + one candidate-keyed verify join against the per-doc
    * array table. No driver state; `observe` counters surface postings
    * and candidate counts for the prefix-vs-full comparison — measured
    * at sf0.01, t = 0.4: 1,804 candidates vs 11,533 distinct co-sharing
    * pairs in the full q34 space (6.4×), on a synthetic corpus with
    * almost no frequency skew; real corpora skew harder and prune more.
    */
  def prefixJaccardPairs(s: SparkSession, docs: DataFrame, minJacMilli: Int,
      dfCap: Int = LlmOps.shingleDfCap,
      id: String = "id", text: String = "text",
      observePrefix: Option[String] = None): DataFrame = {
    import s.implicits._
    require(minJacMilli > 0 && minJacMilli <= 1000,
      s"minJacMilli in (0, 1000]: $minJacMilli (at 0 there is no prefix to filter with — use jaccardPairs)")
    val cap = dfCap
    val sh = docs.select(col(id), col(text)).as[(Long, String)]
      .flatMap { case (i, t) =>
        SketchOps.shingles64Of(SketchOps.tokensOf(t)).iterator.map(g => (i, g))
      }
      .toDF("doc", "g")
    val dfTab = sh.groupBy("g").agg(count(lit(1)).as("df"))
      .filter(col("df") <= cap) // hot shingles dropped, the q34 contract
    val kept = sh.join(dfTab, "g").localCheckpoint() // feeds rank, sets, verify
    val sizes = kept.groupBy("doc").agg(count(lit(1)).as("n"))
    // global total order (df, g): per-doc prefix = the rarest
    // n − ceil(t·n) + 1 shingles
    val wDoc = org.apache.spark.sql.expressions.Window
      .partitionBy("doc").orderBy("df", "g")
    val pref = kept
      .withColumn("rk", row_number().over(wDoc))
      .join(sizes, "doc")
      .filter(col("rk") <=
        col("n") - expr(s"($minJacMilli * n + 999) div 1000") + 1)
      .select(col("g"), col("doc"), col("n"))
    val prefObs = observePrefix.fold(pref)(p =>
      pref.observe(s"${p}_prefix_postings", count(lit(1)).as("rows")))
    // candidate pairs: ascending self-pairs inside each prefix posting
    // list (bounded by cap; prefix shrinkage makes them far smaller),
    // then the length filter
    val cand = prefObs.select(col("g"), struct(col("doc"), col("n")).as("dn"))
      .as[(Long, (Long, Long))]
      .groupByKey(_._1)
      .flatMapGroups { (_, it) =>
        val xs = it.map(_._2).toArray.sortBy(_._1)
        for {
          i <- (0 until xs.length).iterator
          j <- (i + 1 until xs.length).iterator
          na = xs(i)._2; nb = xs(j)._2
          if 1000L * math.min(na, nb) >= minJacMilli.toLong * math.max(na, nb)
        } yield (xs(i)._1, xs(j)._1)
      }
      .toDF("ida", "idb")
      .distinct()
    val candObs = observePrefix.fold(cand)(p =>
      cand.observe(s"${p}_candidates", count(lit(1)).as("rows")))
    // exact verify against the full kept-shingle arrays
    val sets = kept.groupBy("doc")
      .agg(sort_array(collect_list(col("g"))).as("gs"), count(lit(1)).as("n"))
    candObs
      .join(sets.select(col("doc").as("ida"), col("gs").as("ga"), col("n").as("na")), "ida")
      .join(sets.select(col("doc").as("idb"), col("gs").as("gb"), col("n").as("nb")), "idb")
      .withColumn("inter", size(array_intersect(col("ga"), col("gb"))).cast("long"))
      .filter(col("inter") * 1000 >= lit(minJacMilli) * (col("na") + col("nb") - col("inter")))
      .withColumn("jac",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .select("ida", "idb", "inter", "jac")
  }

  /** Connected components over an undirected pair list — the step that
    * turns near-dup PAIRS into duplicate CLUSTERS (each doc labeled with
    * the minimum id reachable from it), so a pipeline can keep one
    * canonical doc per cluster. Iterative min-label propagation: each
    * round every vertex takes the min of its own and its neighbors'
    * labels; converges in O(component diameter) rounds — dup clusters
    * are near-cliques, so typically 2-3. Each round is one shuffle;
    * lineage is truncated per round (iterative plans otherwise grow
    * unboundedly) via localCheckpoint — executor-local blocks, so on a
    * cluster losing an executor mid-run fails the job rather than
    * recomputing (set a checkpoint dir and swap to reliable checkpoint()
    * when running on preemptible nodes). Driver sees only the per-round
    * convergence count. THROWS if maxIter rounds don't converge —
    * partial labels would silently split components, so a component
    * whose diameter exceeds maxIter must be an explicit caller decision.
    * The returned labels stay persisted (they are already materialized
    * by the convergence check); callers owning session memory can
    * `.unpersist()` them when done.
    */
  def connectedComponents(pairs: DataFrame,
      a: String = "ida", b: String = "idb", maxIter: Int = 20): DataFrame = {
    val edges = pairs.select(col(a).as("u"), col(b).as("v"))
      .union(pairs.select(col(b).as("u"), col(a).as("v")))
      .distinct()
      .persist()
    var labels = edges.select(col("u").as("id")).distinct()
      .withColumn("comp", col("id"))
      .persist()
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      val viaNbr = edges.join(labels, col("v") === col("id"))
        .select(col("u").as("id"), col("comp"))
      val next = labels.select(col("id"), col("comp")).union(viaNbr)
        .groupBy("id").agg(min(col("comp")).as("comp"))
        .localCheckpoint() // truncate the per-iteration lineage
        .persist()
      val changed = next.join(labels.withColumnRenamed("comp", "prev"), "id")
        .filter(col("comp") =!= col("prev")).count()
      labels.unpersist()
      labels = next
      converged = changed == 0
      iter += 1
    }
    edges.unpersist()
    require(converged,
      s"connectedComponents did not converge in $maxIter rounds — a component's " +
        "diameter exceeds maxIter; raise maxIter rather than consuming split labels")
    labels.select(col("id"), col("comp").as("cluster_id"))
  }

  /** MinHash+LSH candidate pairs: 64 permutations, 16 bands × 4 rows
    * (SketchOps family). Returns distinct (ida, idb) whose signatures
    * collide in ≥1 band — the scale path that finds ~all pairs above
    * Jaccard ≈ 0.5 without computing any exact intersection.
    */
  def minhashCandidates(s: SparkSession, docs: DataFrame,
      id: String = "id", text: String = "text"): DataFrame = {
    import s.implicits._
    // docs with no shingles (<3 tokens) emit NO bands: their minhash
    // would be the identical all-MaxValue signature, turning every pair
    // of short docs into a false candidate AND one band bucket into a
    // k-choose-2 clique — the exact skew-bomb this op exists to avoid
    val bands = docs.select(col(id), col(text)).as[(Long, String)]
      .flatMap { case (i, t) =>
        val sh = SketchOps.shinglesOf(SketchOps.tokensOf(t))
        if (sh.isEmpty) None
        else Some((i, SketchOps.bandHashes(SketchOps.minhash(sh))))
      }
      .toDF(id, "bands")
      .select(col(id), posexplode(col("bands")).as(Seq("band", "bh")))
    bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col(s"a.$id") < col(s"b.$id"))
      .select(col(s"a.$id").as("ida"), col(s"b.$id").as("idb")).distinct()
  }

  /** LINE-level exact dedup — the C4 move (Raffel et al., "Exploring the
    * limits of transfer learning with a unified text-to-text
    * transformer", JMLR 2020, §2.2: discard all but one of any span
    * occurring more than once in the corpus), applied at line
    * granularity as CCNet/RefinedWeb-style pipelines run it: every
    * exact line keeps only its FIRST occurrence corpus-wide (smallest
    * (id, line_no)); all later occurrences — boilerplate nav bars,
    * cookie banners, repeated footers — drop. Returns the full corpus,
    * one row per doc: (id, n_lines, n_kept, clean_text), where
    * clean_text re-joins the kept lines with '\n' (empty when every
    * line lost, e.g. an exact-duplicate doc).
    *
    * Scale shape (100 TB): line TEXT never shuffles on the decision
    * path, and there is NO join back to the line stream — a kept line
    * IS its hash's winner, so the winner aggregation's output (one
    * (id, line_no) row per DISTINCT line, map-side-combinable min of
    * the struct) regroups by doc directly into keep-index arrays.
    * Those meet the corpus in ONE doc-keyed join — the only stage that
    * moves text — feeding a codegen'd filter-by-index rebuild (no
    * UDF). Cross-engine contract: Spark dedups by hash, the oracle by
    * line string — a collision goes red (the q34 contract). Measured
    * vs the naive text-keyed formulation at 10M lines:
    * LineDedupBench, BASELINE.md.
    */
  def dedupLines(s: SparkSession, docs: DataFrame,
      id: String = "id", text: String = "text"): DataFrame = {
    val le = docs
      .select(col(id), posexplode(split(col(text), "\n")).as(Seq("line_no", "line")))
      .select(col(id), col("line_no"), xxhash64(col("line")).as("lh"))
    val winners = le.groupBy("lh")
      .agg(min(struct(col(id), col("line_no"))).as("w"))
      .select(col(s"w.$id").as(id), col("w.line_no").as("line_no"))
    val keptIdx = winners
      .groupBy(col(id))
      .agg(sort_array(collect_list(col("line_no"))).as("keep"))
    val lines = split(col(text), "\n")
    docs.join(keptIdx, Seq(id), "left")
      .withColumn("keep", coalesce(col("keep"), lit(Array.empty[Int])))
      .select(col(id),
        size(lines).cast("long").as("n_lines"),
        size(col("keep")).cast("long").as("n_kept"),
        array_join(
          filter(lines, (x, i) => array_contains(col("keep"), i)), "\n")
          .as("clean_text"))
  }

  /** SUBSTRING-level exact dedup (Lee, Ippolito, Nystrom et al.,
    * "Deduplicating training data makes language models better", ACL
    * 2022 — the ExactSubstr modality): find, per doc, the merged token
    * spans covered by k-token grams that occur at least `minCount`
    * times ANYWHERE in the corpus (other docs or elsewhere in the same
    * doc). A repeated substring of length ≥ k is exactly a run of such
    * grams, so the merged spans are the text that modality removes —
    * without the suffix array: for a fixed k the posting-list
    * formulation suffices.
    *
    * Output: (id, n_spans, n_repeated_tokens, max_span_tokens,
    * spans: array<struct<start,end>>) — token index intervals,
    * inclusive, adjacency-merged; docs with no repeated gram are absent.
    * Callers implementing removal cut `spans` from the token stream.
    *
    * Scale shape (100 TB): positions never pair up — the plan is
    * per-POSITION classification, linear in the corpus. One hash agg
    * over (gh) counts gram occurrences (8-byte keys, map-side
    * partials); one equi-join marks the positions of grams past
    * `minCount` (fan-out = the left side's own row count — no pair
    * space, so no q34-style cap is needed); one per-doc group merges
    * intervals (group size ≤ the doc's token count). The gram stream is
    * recomputed for the join rather than cached — a second narrow
    * tokenize pass beats pinning a corpus-sized cache at this scale.
    * Cross-engine contract: grams compare by 64-bit FNV hash (q34/q73's
    * contract — the string-gram oracle goes red on a collision).
    */
  def repeatedSpans(s: SparkSession, docs: DataFrame, k: Int,
      minCount: Long = 2, id: String = "id", text: String = "text"): DataFrame = {
    import s.implicits._
    require(k >= 1, s"k must be >= 1, got $k")
    require(minCount >= 2, s"minCount must be >= 2, got $minCount")
    def grams = docs.select(col(id), col(text)).as[(Long, String)]
      .flatMap { case (i, t) =>
        Curation.gramHashesPos(SketchOps.tokensOf(t), k)
          .iterator.zipWithIndex.map { case (h, p) => (i, p, h) }
      }
      .toDF(id, "pos", "gh")
    val heavy = grams.groupBy("gh")
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
      .select("gh")
    grams.join(heavy, "gh")
      .select(col(id), col("pos")).as[(Long, Int)]
      .groupByKey(_._1)
      .mapGroups { (i, it) =>
        val ps = it.map(_._2).toArray.sorted
        val spans = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
        var st = ps(0)
        var en = ps(0) + k - 1
        var j = 1
        while (j < ps.length) {
          val p = ps(j)
          if (p <= en + 1) en = math.max(en, p + k - 1) // overlap or adjacency
          else { spans += ((st, en)); st = p; en = p + k - 1 }
          j += 1
        }
        spans += ((st, en))
        (i, spans.length.toLong,
          spans.iterator.map(x => x._2 - x._1 + 1L).sum,
          spans.iterator.map(x => x._2 - x._1 + 1L).max,
          spans.toSeq)
      }
      .toDF(id, "n_spans", "n_repeated_tokens", "max_span_tokens", "spans")
  }
}
