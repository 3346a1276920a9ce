package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.rel.RelQueries.Q
import graft.rel.Tables

/** LEXICAL search — the keyword counterpart to the ANN serving path:
  * BM25 scoring (Robertson & Zaragoza 2009, "The probabilistic
  * relevance framework: BM25 and beyond"; the idf is the
  * ln(1 + (N − df + 0.5)/(df + 0.5)) form) of a query batch against
  * the corpus, top-k docs per query.
  *
  * Scale shape (100 TB): the query term set broadcasts (small by
  * definition) and FILTERS the exploded token stream before any
  * aggregation — the full inverted index is never built for a query
  * batch; postings exist only for queried terms. Per-term df and the
  * (qid, term) table are |terms|-bounded broadcasts; corpus size and
  * average length enter the plan as a broadcast 1-row aggregate (no
  * driver round-trip); the final ranking is the bounded-heap
  * [[graft.functions.TopK]] aggregator — k rows per query per map
  * partition cross the shuffle, never the full scored list.
  *
  * Cross-engine determinism: scores are rounded to 6 decimals BEFORE
  * ranking (float sums across terms are order-sensitive at ~1e-15;
  * the rounding absorbs it — the q44 contract) and ties break by doc
  * id, so the (qid, rank → doc) mapping is total and replayable.
  */
object Lexical {

  /** normalized tokens + per-doc length: (id, len, t) */
  private def withLen(docs: DataFrame, id: String, text: String): DataFrame = {
    val toks = filter(split(trim(lower(col(text))), "\\s+"), t => length(t) > 0)
    docs.select(col(id), toks.as("t"))
      .select(col(id), size(col("t")).as("len"), col("t"))
  }

  /** the shared scoring core: postings (term, id, len, tf) + per-term
    * df + 1-row corpus stats + (qid, term) → BM25 top-k. Both the
    * scan path ([[bm25TopK]]) and the index probe ([[probeBm25]]) end
    * here, which is what makes them bit-identical by construction.
    */
  private[graft] def scoreAndRank(post: DataFrame, dfd: DataFrame, stats: DataFrame,
      qdf: DataFrame, k: Int, k1: Double, b: Double, id: String): DataFrame =
    graft.functions.TopK.perKeyTopK(
      scoreOf(post, dfd, stats, qdf, k1, b, id), k, "qid", id, "score_r6")

  /** the scoring half of [[scoreAndRank]]: every matching (qid, id)
    * with its rounded BM25 score, UNranked — for consumers that
    * aggregate before ranking (the chunk→document collapse in
    * [[Pipeline.hybridChunkRetrieve]])
    */
  private[graft] def scoreOf(post: DataFrame, dfd: DataFrame, stats: DataFrame,
      qdf: DataFrame, k1: Double, b: Double, id: String): DataFrame =
    post
      .join(broadcast(dfd), "term")
      .join(broadcast(qdf), "term")
      .crossJoin(broadcast(stats))
      .withColumn("tscore",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
          * (col("tf") * lit(k1 + 1))
          / (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("len") / col("avg_len"))))
      .groupBy(col("qid"), col(id))
      .agg(round(sum(col("tscore")), 6).as("score_r6"))

  /** ALL (qid, id, score_r6) BM25 matches of a query batch — the
    * [[bm25TopK]] scoring chain without the final bounded heap.
    */
  def bm25Scores(s: SparkSession, docs: DataFrame, queries: Seq[(Int, Seq[String])],
      k1: Double = 1.2, b: Double = 0.75,
      id: String = "doc_id", text: String = "text"): DataFrame = {
    import s.implicits._
    require(queries.nonEmpty)
    val dl = withLen(docs, id, text)
    val stats = dl.agg(count(lit(1)).as("n_docs"), avg(col("len")).as("avg_len"))
    val qterms = queries.flatMap(_._2).distinct
    val post = dl.select(col(id), col("len"), explode(col("t")).as("term"))
      .filter(col("term").isin(qterms: _*))
      .groupBy(col("term"), col(id), col("len"))
      .agg(count(lit(1)).as("tf"))
    val dfd = post.groupBy("term").agg(count(lit(1)).as("df"))
    val qdf = queries.flatMap { case (qi, ts) => ts.map(t => (qi, t)) }
      .toDF("qid", "term")
    scoreOf(post, dfd, stats, qdf, k1, b, id)
  }

  def bm25TopK(s: SparkSession, docs: DataFrame, queries: Seq[(Int, Seq[String])],
      k: Int, k1: Double = 1.2, b: Double = 0.75,
      id: String = "doc_id", text: String = "text"): DataFrame = {
    require(k > 0)
    graft.functions.TopK.perKeyTopK(
      bm25Scores(s, docs, queries, k1, b, id, text), k, "qid", id, "score_r6")
  }

  /** the (term, doc_id, len, tf, bucket) posting rows of a doc batch */
  private def postingsOf(docs: DataFrame, buckets: Int,
      id: String, text: String): DataFrame =
    withLen(docs, id, text)
      .select(col(id), col("len"), explode(col("t")).as("term"))
      .groupBy(col("term"), col(id), col("len"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("bucket", pmod(xxhash64(col("term")), lit(buckets.toLong)).cast("int"))

  /** Persist a LEXICAL INDEX under `dir` — the serving-path shape of
    * [[bm25TopK]] (which tokenizes the corpus per query batch; right
    * for one-shot analytics, wrong for a query service):
    *   - `postings/` — (term, doc_id, len, tf) parquet **partitioned
    *     by `bucket` = hash(term) mod `buckets`**. The partitioning is
    *     the point: a probe touches only its query terms' buckets and
    *     hive partition pruning keeps every other bucket's files
    *     UNREAD (`PartitionFilters` — LexicalSpec pins it), the
    *     [[AnnIndex]] move applied to text.
    *   - `doclens/` — (doc_id, len), INCLUDING zero-token docs (which
    *     have no postings but do count toward the corpus stats).
    *   - `stats/` — one row (n_docs, avg_len), derived from doclens.
    * Per-term df is NOT stored: it re-derives exactly from the pruned
    * postings at probe time (count of a term's posting rows), so
    * appends cannot strand a stale df column.
    */
  def saveLexical(s: SparkSession, docs: DataFrame, dir: String,
      buckets: Int = 64, id: String = "doc_id", text: String = "text"): Unit = {
    require(buckets > 0, s"buckets must be > 0: $buckets")
    postingsOf(docs, buckets, id, text)
      .write.mode("overwrite").partitionBy("bucket").parquet(s"$dir/postings")
    withLen(docs, id, text).select(col(id), col("len"))
      .write.mode("overwrite").parquet(s"$dir/doclens")
    writeStats(s, dir, id)
  }

  private def writeStats(s: SparkSession, dir: String, id: String): Unit =
    s.read.parquet(s"$dir/doclens")
      .dropDuplicates(id)
      .agg(count(lit(1)).as("n_docs"), avg(col("len")).as("avg_len"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/stats")

  /** Streaming index MAINTENANCE — the [[AnnIndex.appendIvfStream]]
    * move: NEW docs' postings and doclens append per micro-batch.
    * Delivery is at-least-once, which is SAFE here by construction:
    * replays append bit-identical rows, and [[probeBm25]] dedups
    * postings by (term, doc_id) before counting anything (identical
    * copies collapse; df and tf cannot inflate). The contract is
    * append-of-NEW-docs — an UPDATED doc needs rebuild/compaction, not
    * append (two different posting rows for the same (term, doc) would
    * be an arbitrary pick). `stats/` is NOT rewritten per batch: idf
    * drifts slightly stale between [[compactLexical]] runs — the
    * standard serving tradeoff (the IVF centroid-drift shape), while
    * df stays exact because it is never stored.
    */
  def appendLexicalStream(s: SparkSession, stream: DataFrame, dir: String,
      checkpoint: String, buckets: Int = 64,
      id: String = "doc_id", text: String = "text")
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        appendLexicalBatch(s, batch, dir, buckets, id, text)
      }
      .option("checkpointLocation", checkpoint)
      .start()

  /** one micro-batch's append — shared with the chunk-index stream
    * ([[Pipeline.appendChunkLexicalStream]]), which chunks first
    */
  private[llm] def appendLexicalBatch(s: SparkSession, batch: DataFrame,
      dir: String, buckets: Int, id: String, text: String): Unit = {
    postingsOf(batch, buckets, id, text)
      .write.mode("append").partitionBy("bucket").parquet(s"$dir/postings")
    withLen(batch, id, text).select(col(id), col("len"))
      .write.mode("append").parquet(s"$dir/doclens")
  }

  /** Compact the appended index: postings dedup by (term, doc_id),
    * doclens by doc_id (at-least-once copies are bit-identical, so
    * content is unchanged), both rewritten via the temp-dir swap
    * ([[AnnIndex.compactIvf]]'s caveats apply), and `stats/` REFRESHES
    * from the deduped doclens — after compaction a probe is
    * bit-identical to [[bm25TopK]] over the full appended corpus
    * (LexicalSpec pins it).
    */
  def compactLexical(s: SparkSession, dir: String, id: String = "doc_id"): Unit = {
    val conf = s.sparkContext.hadoopConfiguration
    def swap(sub: String)(rewrite: (DataFrame, String) => Unit): Unit = {
      val cur = new org.apache.hadoop.fs.Path(s"$dir/$sub")
      val tmp = new org.apache.hadoop.fs.Path(s"$dir/${sub}__compact")
      val fs = cur.getFileSystem(conf)
      if (fs.exists(tmp)) fs.delete(tmp, true)
      rewrite(s.read.parquet(cur.toString), tmp.toString)
      fs.delete(cur, true)
      require(fs.rename(tmp, cur), s"compaction swap failed for $cur")
    }
    swap("postings") { (df, out) =>
      df.dropDuplicates("term", id)
        .write.partitionBy("bucket").parquet(out)
    }
    swap("doclens") { (df, out) => df.dropDuplicates(id).write.parquet(out) }
    writeStats(s, dir, id)
  }

  /** BM25 top-k against a saved index — bit-identical to [[bm25TopK]]
    * on the same corpus (same postings, same df derivation, same
    * scoring core), reading ONLY the query terms' bucket partitions.
    * The (term, doc_id) dedup makes at-least-once appended duplicates
    * harmless (bit-identical copies collapse before df/tf counting).
    */
  def probeBm25(s: SparkSession, dir: String, queries: Seq[(Int, Seq[String])],
      k: Int, buckets: Int = 64, k1: Double = 1.2, b: Double = 0.75,
      id: String = "doc_id"): DataFrame = {
    require(k > 0)
    val (post, dfd, stats, qdf) = probeParts(s, dir, queries, buckets, id)
    scoreAndRank(post, dfd, stats, qdf, k, k1, b, id)
  }

  /** ALL (qid, id, score_r6) BM25 matches against a saved index — the
    * [[probeBm25]] chain without the final bounded heap (the probe-path
    * twin of [[bm25Scores]]), for consumers that aggregate before
    * ranking — the chunk→document collapse in
    * [[Pipeline.hybridProbeRetrieve]]. Same pruned-bucket read, same
    * (term, doc) dedup, so appended duplicates stay harmless.
    */
  def probeBm25Scores(s: SparkSession, dir: String, queries: Seq[(Int, Seq[String])],
      buckets: Int = 64, k1: Double = 1.2, b: Double = 0.75,
      id: String = "doc_id"): DataFrame = {
    val (post, dfd, stats, qdf) = probeParts(s, dir, queries, buckets, id)
    scoreOf(post, dfd, stats, qdf, k1, b, id)
  }

  /** the shared probe-side derivation: pruned postings, re-derived df,
    * stored stats, (qid, term) batch
    */
  private def probeParts(s: SparkSession, dir: String,
      queries: Seq[(Int, Seq[String])], buckets: Int, id: String)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    import s.implicits._
    require(queries.nonEmpty)
    val qterms = queries.flatMap(_._2).distinct
    // the terms' buckets via the same engine hash the writer used —
    // one |qterms|-row local computation (collected like probeIvf's
    // probe cells; nothing corpus-sized)
    val qBuckets = qterms.toDF("term")
      .select(pmod(xxhash64(col("term")), lit(buckets.toLong)).cast("int").as("bucket"))
      .distinct().collect().map(_.getInt(0)).toSeq
    val post = s.read.parquet(s"$dir/postings")
      .filter(col("bucket").isin(qBuckets: _*))
      .filter(col("term").isin(qterms: _*))
      .select(col("term"), col(id), col("len"), col("tf"))
      .dropDuplicates("term", id)
    val dfd = post.groupBy("term").agg(count(lit(1)).as("df"))
    val stats = s.read.parquet(s"$dir/stats")
    val qdf = queries.flatMap { case (qi, ts) => ts.map(t => (qi, t)) }
      .toDF("qid", "term")
    (post, dfd, stats, qdf)
  }

  // ---- VERSIONED (upsert-able) index ---------------------------------
  // The append-only index above handles NEW docs; an UPDATED doc would
  // leave two generations of posting rows with no way to tell them
  // apart. The versioned layout makes updates first-class without ever
  // rewriting storage on the write path: every doc row carries a `ver`
  // (any monotone long per doc — a snapshot id, an ingest timestamp),
  // postings/doclens APPEND under (doc_id, ver), and the probe resolves
  // "current" at read time by joining postings against each doc's
  // latest version — stale generations drop even for terms the new
  // text no longer contains (the case probe-side (term, doc) dedup
  // cannot fix). Same at-least-once safety: replayed appends are
  // bit-identical rows, collapsed by (term, doc, ver) dedup.

  /** (id, ver, len, t) tokens of a versioned doc batch */
  private def withLenV(docs: DataFrame, id: String, text: String,
      ver: String): DataFrame = {
    val toks = filter(split(trim(lower(col(text))), "\\s+"), t => length(t) > 0)
    docs.select(col(id), col(ver), toks.as("t"))
      .select(col(id), col(ver), size(col("t")).as("len"), col("t"))
  }

  private def postingsOfV(docs: DataFrame, buckets: Int, id: String,
      text: String, ver: String): DataFrame =
    withLenV(docs, id, text, ver)
      .select(col(id), col(ver), col("len"), explode(col("t")).as("term"))
      .groupBy(col("term"), col(id), col(ver), col("len"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("bucket", pmod(xxhash64(col("term")), lit(buckets.toLong)).cast("int"))

  /** Base build of a VERSIONED lexical index: same bucket-partitioned
    * layout as [[saveLexical]] plus the `ver` column; no `stats/` — the
    * versioned probe derives corpus stats from the latest doclens at
    * read time (exactness over staleness: one agg over 24-byte rows per
    * probe batch, the price of update-correct idf).
    */
  def saveLexicalVersioned(s: SparkSession, docs: DataFrame, dir: String,
      buckets: Int = 64, id: String = "doc_id", text: String = "text",
      ver: String = "ver"): Unit = {
    require(buckets > 0, s"buckets must be > 0: $buckets")
    postingsOfV(docs, buckets, id, text, ver)
      .write.mode("overwrite").partitionBy("bucket").parquet(s"$dir/postings")
    withLenV(docs, id, text, ver).select(col(id), col(ver), col("len"))
      .write.mode("overwrite").parquet(s"$dir/doclens")
  }

  /** Streaming UPSERTS: new docs AND new versions of existing docs
    * append per micro-batch — no read-modify-write, no storage rewrite;
    * [[probeBm25Latest]] resolves currency at read time. At-least-once
    * replays are safe (bit-identical rows collapse in the probe's
    * (term, doc, ver) dedup). A version must be ≥ any previous version
    * of the same doc — the caller's snapshot/ingest clock provides it.
    */
  def upsertLexicalStream(s: SparkSession, stream: DataFrame, dir: String,
      checkpoint: String, buckets: Int = 64, id: String = "doc_id",
      text: String = "text", ver: String = "ver")
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        postingsOfV(batch, buckets, id, text, ver)
          .write.mode("append").partitionBy("bucket").parquet(s"$dir/postings")
        withLenV(batch, id, text, ver).select(col(id), col(ver), col("len"))
          .write.mode("append").parquet(s"$dir/doclens")
      }
      .option("checkpointLocation", checkpoint)
      .start()

  /** BM25 top-k against the LATEST VERSION of every doc in a versioned
    * index — bit-identical to [[bm25TopK]] over the effective corpus
    * (each doc's newest text), with stale generations excluded by the
    * (doc, latest-ver) join. Bucket pruning as in [[probeBm25]]; df and
    * corpus stats derive from surviving rows only, so idf is exact
    * under updates, not drifting-stale.
    */
  def probeBm25Latest(s: SparkSession, dir: String, queries: Seq[(Int, Seq[String])],
      k: Int, buckets: Int = 64, k1: Double = 1.2, b: Double = 0.75,
      id: String = "doc_id", ver: String = "ver"): DataFrame = {
    import s.implicits._
    require(k > 0 && queries.nonEmpty)
    val dl = s.read.parquet(s"$dir/doclens").dropDuplicates(id, ver)
    val latest = dl.groupBy(col(id)).agg(max(col(ver)).as(ver))
    val stats = dl.join(latest, Seq(id, ver))
      .agg(count(lit(1)).as("n_docs"), avg(col("len")).as("avg_len"))
    val qterms = queries.flatMap(_._2).distinct
    val qBuckets = qterms.toDF("term")
      .select(pmod(xxhash64(col("term")), lit(buckets.toLong)).cast("int").as("bucket"))
      .distinct().collect().map(_.getInt(0)).toSeq
    val post = s.read.parquet(s"$dir/postings")
      .filter(col("bucket").isin(qBuckets: _*))
      .filter(col("term").isin(qterms: _*))
      .select(col("term"), col(id), col(ver), col("len"), col("tf"))
      .dropDuplicates("term", id, ver)
      .join(latest, Seq(id, ver))
      .select(col("term"), col(id), col("len"), col("tf"))
    val dfd = post.groupBy("term").agg(count(lit(1)).as("df"))
    val qdf = queries.flatMap { case (qi, ts) => ts.map(t => (qi, t)) }
      .toDF("qid", "term")
    scoreAndRank(post, dfd, stats, qdf, k, k1, b, id)
  }

  /** Compact a versioned index: drop every non-latest generation (and
    * at-least-once duplicates), temp-dir swap as [[compactLexical]].
    * Probes are bit-identical before and after — compaction reclaims
    * storage, it does not change semantics (q114 asserts it).
    */
  def compactLexicalVersioned(s: SparkSession, dir: String,
      id: String = "doc_id", ver: String = "ver"): Unit = {
    val conf = s.sparkContext.hadoopConfiguration
    val latest = s.read.parquet(s"$dir/doclens")
      .groupBy(col(id)).agg(max(col(ver)).as(ver))
    def swap(sub: String)(rewrite: (DataFrame, String) => Unit): Unit = {
      val cur = new org.apache.hadoop.fs.Path(s"$dir/$sub")
      val tmp = new org.apache.hadoop.fs.Path(s"$dir/${sub}__compact")
      val fs = cur.getFileSystem(conf)
      if (fs.exists(tmp)) fs.delete(tmp, true)
      rewrite(s.read.parquet(cur.toString), tmp.toString)
      fs.delete(cur, true)
      require(fs.rename(tmp, cur), s"compaction swap failed for $cur")
    }
    // materialize latest to disk BEFORE the swaps delete its source
    // files — distributed, never collected (doc-count-sized)
    val ltPath = new org.apache.hadoop.fs.Path(s"$dir/__latest_compact")
    latest.write.mode("overwrite").parquet(ltPath.toString)
    try {
      val lt = s.read.parquet(ltPath.toString)
      swap("postings") { (df, out) =>
        df.dropDuplicates("term", id, ver).join(lt, Seq(id, ver))
          .write.partitionBy("bucket").parquet(out)
      }
      swap("doclens") { (df, out) =>
        df.dropDuplicates(id, ver).join(lt, Seq(id, ver)).write.parquet(out)
      }
    } finally ltPath.getFileSystem(conf).delete(ltPath, true)
  }

  /** the q102 query batch: corpus-frequent terms, one single-term query
    * and two multi-term ones so idf mixing and score summing both have
    * real work
    */
  private[llm] val demoQueries = Seq(
    0 -> Seq("join", "hash"),
    1 -> Seq("vector", "scan", "filter"),
    2 -> Seq("customer"))

  /** one index build per dataset for q103 */
  private val builtIdx = scala.collection.concurrent.TrieMap[String, String]()

  private def indexDirFor(s: SparkSession, d: String): String =
    builtIdx.getOrElseUpdate(d, {
      val work = java.nio.file.Files.createTempDirectory("graft-q103")
      sys.addShutdownHook {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm))
          f.delete(); ()
        }
        rm(work.toFile)
      }
      saveLexical(s, Tables.documents(s, d), work.toString)
      work.toString
    })

  /** the shared q102/q103 oracle: replays postings, df, idf and tf
    * normalization with the identical expression shape, rounds to 6
    * decimals, ranks with the same (score desc, id asc) tie-break
    */
  /** MORE-LIKE-THIS (the Lucene MLT contract): for each probe
    * document, select its `nTerms` most characteristic terms by
    * integer TF-IDF (tf · round(ln(N/df)·10⁶), ties → term asc) and
    * run them as a BM25 query over the corpus, excluding the probe
    * itself — "find documents like this one" from nothing but the
    * corpus statistics.
    *
    * Scale shape: the probe set is the query (driver-bounded by
    * contract — it IS the request); df comes from one corpus pass;
    * the BM25 scan is [[bm25Scores]]'s query-term-filtered posting
    * stream. Probe-id collisions with the q103 index path: serve the
    * same terms through [[probeBm25]] when an index exists.
    *
    * Output: (qid = probe id, rn, doc_id, score_r6), top-k per probe.
    */
  def moreLikeThis(s: SparkSession, docs: DataFrame, probeIds: Seq[Long],
      nTerms: Int = 5, k: Int = 5, id: String = "doc_id",
      text: String = "text"): DataFrame = {
    import s.implicits._
    require(probeIds.nonEmpty && probeIds.size <= 64,
      s"1 <= probes <= 64: ${probeIds.size}")
    require(nTerms >= 1 && k >= 1, s"nTerms=$nTerms k=$k")
    require(probeIds.forall(p => p >= 0 && p <= Int.MaxValue),
      "probe ids must fit an int qid")
    val dl = withLen(docs, id, text)
    val nn = dl.count()
    val dfall = dl.select(col(id), explode(col("t")).as("term"))
      .distinct()
      .groupBy("term").agg(count(lit(1)).as("df"))
    val ptf = dl.filter(col(id).isin(probeIds: _*))
      .select(col(id).as("pid"), explode(col("t")).as("term"))
      .groupBy("pid", "term").agg(count(lit(1)).as("tf"))
    val sel = ptf.join(dfall, "term")
      .select(col("pid"), col("term"),
        (col("tf") * round(log(lit(nn.toDouble) / col("df").cast("double"))
          * lit(1e6), 0).cast("long")).as("s"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("pid")
      .orderBy(col("s").desc, col("term"))
    val queries = sel.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= nTerms)
      .select(col("pid"), col("term"))
      .as[(Long, String)].collect()
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (pid, ts) => (pid.toInt, ts.map(_._2).sorted.toSeq) }
    val scored = bm25Scores(s, docs, queries, id = id, text = text)
      .filter(col(id) =!= col("qid").cast("long"))
    graft.functions.TopK.perKeyTopK(scored, k, "qid", id, "score_r6")
      .orderBy("qid", "rn")
  }

  private[llm] val bm25OracleSql =
    """WITH t AS (SELECT doc_id,
      |    list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
      |      x -> len(x) > 0) AS w
      |  FROM documents),
      |dl AS (SELECT doc_id, len(w) AS len, w FROM t),
      |stats AS (SELECT count(*) AS n_docs, avg(len) AS avg_len FROM dl),
      |post AS (SELECT term, doc_id, len, count(*) AS tf
      |  FROM (SELECT doc_id, len, unnest(w) AS term FROM dl) u
      |  WHERE term IN ('join','hash','vector','scan','filter','customer')
      |  GROUP BY term, doc_id, len),
      |dfd AS (SELECT term, count(*) AS df FROM post GROUP BY term),
      |q(qid, term) AS (VALUES (0,'join'),(0,'hash'),(1,'vector'),
      |  (1,'scan'),(1,'filter'),(2,'customer')),
      |sc AS (SELECT q.qid, p.doc_id,
      |    round(sum(ln(1.0 + (s.n_docs - d.df + 0.5)/(d.df + 0.5))
      |      * (p.tf * 2.2)
      |      / (p.tf + 1.2 * (0.25 + 0.75 * p.len / s.avg_len))), 6)
      |      AS score_r6
      |  FROM post p JOIN dfd d USING (term) JOIN q USING (term)
      |  CROSS JOIN stats s
      |  GROUP BY q.qid, p.doc_id),
      |r AS (SELECT qid, doc_id, score_r6,
      |    row_number() OVER (PARTITION BY qid
      |      ORDER BY score_r6 DESC, doc_id) AS rn
      |  FROM sc)
      |SELECT qid, CAST(rn AS INT) AS rn, doc_id, score_r6
      |FROM r WHERE rn <= 5 ORDER BY qid, rn""".stripMargin

  val all: ListMap[String, Q] = ListMap(
    // ---- q399: MORE-LIKE-THIS — the 5 documents most similar to
    //      each of three probe docs, querying each probe's top-5
    //      integer-TF-IDF terms through BM25 with the probe itself
    //      excluded. The oracle replays term selection and the full
    //      scoring chain. ----
    "q399_more_like_this" -> Q(
      (s, d) => moreLikeThis(s, Tables.documents(s, d),
        Seq(10L, 20L, 30L)),
      Some("""WITH t AS (SELECT doc_id,
             |    list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
             |      x -> len(x) > 0) AS w
             |  FROM documents),
             |dl AS (SELECT doc_id, len(w) AS len, w FROM t),
             |nn AS (SELECT count(*) AS n FROM dl),
             |un AS (SELECT doc_id, len, unnest(w) AS term FROM dl),
             |dfall AS (SELECT term, count(*) AS df
             |  FROM (SELECT DISTINCT doc_id, term FROM un) GROUP BY term),
             |ptf AS (SELECT doc_id AS pid, term, count(*) AS tf
             |  FROM un WHERE doc_id IN (10, 20, 30) GROUP BY 1, 2),
             |qsel AS (SELECT pid, term FROM (SELECT pid, term,
             |    row_number() OVER (PARTITION BY pid ORDER BY
             |      tf * CAST(round(ln(CAST(nn.n AS DOUBLE)
             |        / CAST(df AS DOUBLE)) * 1e6, 0) AS BIGINT) DESC,
             |      term) AS rn
             |    FROM ptf JOIN dfall USING (term) CROSS JOIN nn)
             |  WHERE rn <= 5),
             |post AS (SELECT term, doc_id, len, count(*) AS tf FROM un
             |  WHERE term IN (SELECT term FROM qsel)
             |  GROUP BY term, doc_id, len),
             |dfd AS (SELECT term, count(*) AS df FROM post GROUP BY term),
             |stats AS (SELECT count(*) AS n_docs, avg(len) AS avg_len
             |  FROM dl),
             |sc AS (SELECT q.pid AS qid, p.doc_id,
             |    round(sum(ln(1.0 + (s.n_docs - d.df + 0.5)/(d.df + 0.5))
             |      * (p.tf * 2.2)
             |      / (p.tf + 1.2 * (0.25 + 0.75 * p.len / s.avg_len))), 6)
             |      AS score_r6
             |  FROM post p JOIN dfd d USING (term) JOIN qsel q USING (term)
             |  CROSS JOIN stats s
             |  GROUP BY q.pid, p.doc_id),
             |r AS (SELECT qid, doc_id, score_r6,
             |    row_number() OVER (PARTITION BY qid
             |      ORDER BY score_r6 DESC, doc_id) AS rn
             |  FROM sc WHERE doc_id <> qid)
             |SELECT CAST(qid AS INT) AS qid, CAST(rn AS INT) AS rn,
             |  doc_id, score_r6
             |FROM r WHERE rn <= 5 ORDER BY qid, rn""".stripMargin)),

    // ---- BM25 top-5 per query from the corpus scan ----
    "q102_bm25_topk" -> Q(
      (s, d) => bm25TopK(s, Tables.documents(s, d), demoQueries, k = 5)
        .orderBy("qid", "rn"),
      Some(bm25OracleSql)),

    // ---- the same query batch served from the SAVED lexical index:
    //      bucket-pruned postings scan, df re-derived from the pruned
    //      postings, same scoring core — bit-identical to q102, so it
    //      shares q102's oracle ----
    "q103_lexical_index" -> Q(
      (s, d) => probeBm25(s, indexDirFor(s, d), demoQueries, k = 5)
        .orderBy("qid", "rn"),
      Some(bm25OracleSql)),

    // ---- index LIFECYCLE under streaming appends: build on the first
    //      480 docs, stream the tail in through the real micro-batch
    //      engine in two batches PLUS a replayed batch (at-least-once),
    //      compact (dedup + stats refresh), probe. Bit-identical to
    //      q102 over the FULL corpus — shares the oracle — so the
    //      append path, the duplicate collapse, and the stats refresh
    //      all sit under the hash compare ----
    "q104_lexical_append" -> Q(
      (s, d) => {
        import s.implicits._
        implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
        import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
        val work = java.nio.file.Files.createTempDirectory("graft-q104")
        val ckDir = java.nio.file.Files.createTempDirectory("graft-q104-ck")
        sys.addShutdownHook {
          def rm(f: java.io.File): Unit = {
            Option(f.listFiles()).foreach(_.foreach(rm))
            f.delete(); ()
          }
          rm(work.toFile); rm(ckDir.toFile)
        }
        val dir = work.toString
        val ck = ckDir.toString
        val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
        saveLexical(s, docs.filter(col("doc_id") < 480), dir)
        val tail = docs.filter(col("doc_id") >= 480).as[(Long, String)].collect()
        val (b1, b2) = tail.partition(_._1 < 490)
        val mem = MemoryStream[(Long, String)]
        val q = appendLexicalStream(s, mem.toDF.toDF("doc_id", "text"), dir, ck)
        try {
          mem.addData(b1.toSeq); q.processAllAvailable()
          mem.addData(b2.toSeq); q.processAllAvailable()
          mem.addData(b2.toSeq); q.processAllAvailable() // at-least-once replay
        } finally q.stop()
        compactLexical(s, dir)
        probeBm25(s, dir, demoQueries, k = 5).orderBy("qid", "rn")
      },
      Some(bm25OracleSql)),

    // ---- UPSERTS through the versioned index: base build on the full
    //      corpus at ver 0, docs 0-99 UPDATED at ver 1 through the real
    //      micro-batch engine (two batches + a replayed batch), probed
    //      PRE-compaction — stale generations must drop at read time,
    //      including terms the new text no longer contains (the update
    //      mangles each doc's first token). The oracle replays BM25
    //      over the EFFECTIVE corpus; a query on the term 'updated'
    //      (df exactly 100 iff versioning works) makes staleness bugs
    //      unmissable. Compaction parity is asserted in-entry: the
    //      post-compaction probe must equal the pre-compaction one
    //      bit-for-bit. ----
    "q114_lexical_upsert" -> Q(
      (s, d) => {
        import s.implicits._
        implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
        import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
        val work = java.nio.file.Files.createTempDirectory("graft-q114")
        val ckDir = java.nio.file.Files.createTempDirectory("graft-q114-ck")
        sys.addShutdownHook {
          def rm(f: java.io.File): Unit = {
            Option(f.listFiles()).foreach(_.foreach(rm))
            f.delete(); ()
          }
          rm(work.toFile); rm(ckDir.toFile)
        }
        val dir = work.toString
        val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
        saveLexicalVersioned(s, docs.withColumn("ver", lit(0L)), dir)
        val updates = docs.filter(col("doc_id") < 100)
          .select(col("doc_id"),
            concat(lit("updated "), expr("substring(text, 4)")).as("text"),
            lit(1L).as("ver"))
          .as[(Long, String, Long)].collect()
        val (b1, b2) = updates.partition(_._1 < 50)
        val mem = MemoryStream[(Long, String, Long)]
        val q = upsertLexicalStream(s,
          mem.toDF.toDF("doc_id", "text", "ver"), dir, ckDir.toString)
        try {
          mem.addData(b1.toSeq); q.processAllAvailable()
          mem.addData(b2.toSeq); q.processAllAvailable()
          mem.addData(b1.toSeq); q.processAllAvailable() // at-least-once replay
        } finally q.stop()
        val qs = demoQueries :+ (3 -> Seq("updated"))
        val pre = probeBm25Latest(s, dir, qs, k = 5).orderBy("qid", "rn")
        // materialize BEFORE compaction swaps the files under the plan
        val preRows = pre.collect().toSeq
        compactLexicalVersioned(s, dir)
        val postRows = probeBm25Latest(s, dir, qs, k = 5)
          .orderBy("qid", "rn").collect().toSeq
        require(preRows == postRows,
          "compaction changed the versioned probe's output")
        s.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](
            scala.jdk.CollectionConverters.SeqHasAsJava(preRows).asJava),
          pre.schema)
      },
      Some("""WITH eff AS (SELECT doc_id,
             |    CASE WHEN doc_id < 100 THEN 'updated ' || substr(text, 4)
             |      ELSE text END AS text
             |  FROM documents),
             |t AS (SELECT doc_id,
             |    list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
             |      x -> len(x) > 0) AS w
             |  FROM eff),
             |dl AS (SELECT doc_id, len(w) AS len, w FROM t),
             |stats AS (SELECT count(*) AS n_docs, avg(len) AS avg_len FROM dl),
             |post AS (SELECT term, doc_id, len, count(*) AS tf
             |  FROM (SELECT doc_id, len, unnest(w) AS term FROM dl) u
             |  WHERE term IN ('join','hash','vector','scan','filter',
             |    'customer','updated')
             |  GROUP BY term, doc_id, len),
             |dfd AS (SELECT term, count(*) AS df FROM post GROUP BY term),
             |q(qid, term) AS (VALUES (0,'join'),(0,'hash'),(1,'vector'),
             |  (1,'scan'),(1,'filter'),(2,'customer'),(3,'updated')),
             |sc AS (SELECT q.qid, p.doc_id,
             |    round(sum(ln(1.0 + (s.n_docs - d.df + 0.5)/(d.df + 0.5))
             |      * (p.tf * 2.2)
             |      / (p.tf + 1.2 * (0.25 + 0.75 * p.len / s.avg_len))), 6)
             |      AS score_r6
             |  FROM post p JOIN dfd d USING (term) JOIN q USING (term)
             |  CROSS JOIN stats s
             |  GROUP BY q.qid, p.doc_id),
             |r AS (SELECT qid, doc_id, score_r6,
             |    row_number() OVER (PARTITION BY qid
             |      ORDER BY score_r6 DESC, doc_id) AS rn
             |  FROM sc)
             |SELECT qid, CAST(rn AS INT) AS rn, doc_id, score_r6
             |FROM r WHERE rn <= 5 ORDER BY qid, rn""".stripMargin)),
  )
}
