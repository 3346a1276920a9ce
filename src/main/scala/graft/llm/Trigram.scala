package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.rel.RelQueries.Q
import graft.rel.Tables

/** TRIGRAM INFIX-SEARCH INDEX (the pg_trgm / Google Code Search
  * design, Cox 2012 "Regular Expression Matching with a Trigram
  * Index"): `LIKE '%pattern%'` over a corpus is a full scan UNLESS a
  * character-trigram posting table turns it into
  *   candidates = ⋂_{g ∈ trigrams(pattern)} postings(g)
  * followed by exact `contains` verification of the (small) candidate
  * set. The index is filter-only, never lossy: every true match
  * contains every pattern trigram, so the intersection can only
  * over-approximate — correctness comes from the verify step, the
  * index just deletes the scan.
  *
  * Scale shape: the posting build is one explode + distinct (gram,
  * id) pass; a query touches ONLY the pattern's trigram postings (a
  * pushed `IN` filter on the gram column — with the postings table
  * persisted sorted/bucketed by gram this is a pruned read, the
  * lexical-index pattern), then one groupBy(id) counting distinct
  * matched grams with HAVING count = |trigrams(pattern)|, then the
  * verify join against just the candidates. The corpus is scanned
  * once at BUILD time, never per query.
  *
  * Trigrams are RAW CHARACTER windows of the lowercased text (no
  * token split — infix search must cross word boundaries), distinct
  * per doc. Patterns shorter than 3 chars have no trigrams and raise
  * loudly rather than degrade to a full scan.
  */
object Trigram {

  /** Character trigrams, lowercased, distinct — empty below 3 chars
    * (the q264 sequence-step guard). Built via expr because the
    * Scala-DSL substring takes only literal positions; the text column
    * is pre-projected to this fixed internal name before the expr is
    * built, so caller-supplied names needing backtick quoting (spaces,
    * dots, keywords) can never break the spliced SQL string.
    */
  private val GramCol = "__graft_trgm_text"

  private def gramsExpr: Column =
    when(length(lower(col(GramCol))) >= 3,
      array_distinct(expr(
        s"transform(sequence(1, length(lower($GramCol)) - 2), " +
          s"i -> substring(lower($GramCol), i, 3))")))
      .otherwise(array().cast("array<string>"))

  /** Posting table (gram, id), distinct — build once, persist sorted
    * by gram for pruned query reads.
    */
  def buildTrigramPostings(docs: DataFrame, id: String = "id",
      text: String = "text"): DataFrame = {
    // backtick-quote: a name with dots/spaces must resolve as ONE
    // attribute, not a struct path (the ADVICE r11 finding)
    def qc(n: String): Column = col(s"`${n.replace("`", "``")}`")
    docs.select(qc(id).as(id), qc(text).as(GramCol))
      .select(col(s"`${id.replace("`", "``")}`"), explode(gramsExpr).as("gram"))
  }

  /** All docs whose text contains `pattern` (case-insensitive), via
    * posting intersection + exact verification. Output (id), ordered.
    */
  def likeSearch(s: SparkSession, docs: DataFrame, postings: DataFrame,
      pattern: String, id: String = "id", text: String = "text"): DataFrame = {
    val p = pattern.toLowerCase
    val grams = gramsOf(pattern)
    val cand = postings
      .filter(col("gram").isin(grams: _*)) // pushed to the posting scan
      .groupBy(col(id))
      .agg(countDistinct(col("gram")).as("hit"))
      .filter(col("hit") === grams.size.toLong)
      .select(col(id))
    docs.join(cand, Seq(id), "left_semi")
      .filter(contains(lower(col(text)), lit(p))) // the verify step
      .select(col(id))
      .orderBy(col(id))
  }

  // ---- persisted index lifecycle (the saveLexical layout) -----------

  /** the pattern's trigram set — shared by scan and probe so the
    * candidate semantics cannot drift between them
    */
  private def gramsOf(pattern: String): Seq[String] = {
    require(pattern.length >= 3,
      s"trigram search: pattern needs >= 3 chars for pruning: '$pattern'")
    val p = pattern.toLowerCase
    (0 to p.length - 3).map(i => p.substring(i, i + 3)).distinct
  }

  /** Persist a TRIGRAM INDEX under `dir` — the serving shape of
    * [[likeSearch]] (which re-shingles the corpus per posting build;
    * right for one-shot analytics, wrong for a search service):
    *   - `postings/` — (id, gram) parquet **partitioned by `bucket` =
    *     hash(gram) mod `buckets`** so a probe reads only its pattern's
    *     gram buckets (hive partition pruning — TrigramIndexSpec pins
    *     `PartitionFilters`), the [[Lexical.saveLexical]] move.
    *   - `docs/` — (id, text): the verify step's store, so serving
    *     never touches the source corpus. Only candidate rows survive
    *     past the semi join; the store is scanned, the text of
    *     non-candidates never crosses an exchange.
    * Build cost is the one corpus shingle pass [[likeSearch]] pays PER
    * QUERY BATCH — amortized across every future probe.
    */
  def saveTrigram(s: SparkSession, docs: DataFrame, dir: String,
      buckets: Int = 64, id: String = "id", text: String = "text"): Unit = {
    require(buckets > 0, s"buckets must be > 0: $buckets")
    buildTrigramPostings(docs, id, text)
      .withColumn("bucket", pmod(xxhash64(col("gram")), lit(buckets.toLong)).cast("int"))
      .write.mode("overwrite").partitionBy("bucket").parquet(s"$dir/postings")
    docs.select(col(id), col(text))
      .write.mode("overwrite").parquet(s"$dir/docs")
  }

  /** All docs containing `pattern` via the persisted index —
    * bit-identical to [[likeSearch]] over the same corpus (same gram
    * intersection, same exact-contains verify; TrigramIndexSpec pins
    * it). Reads ONLY the pattern's gram buckets. At-least-once
    * appended duplicates are harmless BY CONSTRUCTION: the
    * intersection counts DISTINCT grams per id, and candidate ids
    * dedup through the semi join.
    */
  def probeTrigram(s: SparkSession, dir: String, pattern: String,
      buckets: Int = 64, id: String = "id", text: String = "text"): DataFrame = {
    import s.implicits._
    val grams = gramsOf(pattern)
    // the grams' buckets via the same engine hash the writer used —
    // one |grams|-row local computation (the probeBm25 move)
    val gBuckets = grams.toDF("gram")
      .select(pmod(xxhash64(col("gram")), lit(buckets.toLong)).cast("int").as("bucket"))
      .distinct().collect().map(_.getInt(0)).toSeq
    val cand = s.read.parquet(s"$dir/postings")
      .filter(col("bucket").isin(gBuckets: _*))
      .filter(col("gram").isin(grams: _*))
      .groupBy(col(id))
      .agg(countDistinct(col("gram")).as("hit"))
      .filter(col("hit") === grams.size.toLong)
      .select(col(id))
    s.read.parquet(s"$dir/docs").dropDuplicates(id)
      .join(cand, Seq(id), "left_semi")
      .filter(contains(lower(col(text)), lit(pattern.toLowerCase)))
      .select(col(id))
      .orderBy(col(id))
  }

  /** Streaming index MAINTENANCE — NEW docs' postings and text append
    * per micro-batch ([[Lexical.appendLexicalStream]]'s contract:
    * at-least-once replays append bit-identical rows, which the probe
    * collapses; an UPDATED doc needs rebuild, not append).
    */
  def appendTrigramStream(s: SparkSession, stream: DataFrame, dir: String,
      checkpoint: String, buckets: Int = 64,
      id: String = "id", text: String = "text")
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        buildTrigramPostings(batch, id, text)
          .withColumn("bucket", pmod(xxhash64(col("gram")), lit(buckets.toLong)).cast("int"))
          .write.mode("append").partitionBy("bucket").parquet(s"$dir/postings")
        batch.select(col(id), col(text))
          .write.mode("append").parquet(s"$dir/docs")
      }
      .option("checkpointLocation", checkpoint)
      .start()

  /** Compact the appended index: postings dedup by (gram, id), docs by
    * id (replayed copies are bit-identical), temp-dir swap
    * ([[Lexical.compactLexical]]'s shape — after compaction a probe
    * reads the same bytes a fresh [[saveTrigram]] build would write).
    */
  def compactTrigram(s: SparkSession, dir: String, id: String = "id"): Unit = {
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
      df.dropDuplicates("gram", id).write.partitionBy("bucket").parquet(out)
    }
    swap("docs") { (df, out) => df.dropDuplicates(id).write.parquet(out) }
  }

  /** one index build per dataset for q343 (the q103 pattern) */
  private val builtIdx = scala.collection.concurrent.TrieMap[String, String]()

  private def indexDirFor(s: SparkSession, d: String): String =
    builtIdx.getOrElseUpdate(d, {
      val work = java.nio.file.Files.createTempDirectory("graft-q343")
      sys.addShutdownHook {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm))
          f.delete(); ()
        }
        rm(work.toFile)
      }
      saveTrigram(s, Tables.documents(s, d)
        .select(col("doc_id").as("id"), col("text")), work.toString)
      work.toString
    })

  val all: ListMap[String, Q] = ListMap(
    // ---- q336: TRIGRAM-ACCELERATED INFIX SEARCH — '%fast merge%'
    //      over the documents corpus through the posting
    //      intersection; the oracle is the brute LIKE scan, so the
    //      driver hash proves the index path is EXACTLY the scan's
    //      answer (the filter-only-index contract). ----
    "q336_trigram_like" -> Q(
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("doc_id").as("id"), col("text"))
        val postings = buildTrigramPostings(docs)
        likeSearch(s, docs, postings, "fast merge")
          .withColumnRenamed("id", "doc_id")
      },
      Some("""SELECT doc_id FROM documents
             |WHERE lower(text) LIKE '%fast merge%'
             |ORDER BY doc_id""".stripMargin)),

    // ---- q353: the index LIFECYCLE under streaming appends — build
    //      on the first 480 docs, stream the tail through the real
    //      micro-batch engine (two batches + a replayed batch:
    //      at-least-once), compact, probe. Bit-identical to the brute
    //      LIKE over the FULL corpus, so append, duplicate collapse
    //      and compaction all sit under the hash compare (the q104
    //      lexical-lifecycle pattern on the trigram store). ----
    "q353_trigram_stream" -> Q(
      (s, d) => {
        import s.implicits._
        implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
        import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
        val work = java.nio.file.Files.createTempDirectory("graft-q353")
        val ckDir = java.nio.file.Files.createTempDirectory("graft-q353-ck")
        sys.addShutdownHook {
          def rm(f: java.io.File): Unit = {
            Option(f.listFiles()).foreach(_.foreach(rm))
            f.delete(); ()
          }
          rm(work.toFile); rm(ckDir.toFile)
        }
        val docs = Tables.documents(s, d)
          .select(col("doc_id").as("id"), col("text"))
        saveTrigram(s, docs.filter(col("id") < 480), work.toString)
        val tail = docs.filter(col("id") >= 480).as[(Long, String)].collect()
        val (b1, b2) = tail.partition(_._1 < 490)
        val mem = MemoryStream[(Long, String)]
        val q = appendTrigramStream(s, mem.toDF.toDF("id", "text"),
          work.toString, ckDir.toString)
        try {
          mem.addData(b1.toSeq); q.processAllAvailable()
          mem.addData(b2.toSeq); q.processAllAvailable()
          mem.addData(b2.toSeq); q.processAllAvailable() // at-least-once replay
        } finally q.stop()
        compactTrigram(s, work.toString)
        probeTrigram(s, work.toString, "fast merge")
          .withColumnRenamed("id", "doc_id")
      },
      Some("""SELECT doc_id FROM documents
             |WHERE lower(text) LIKE '%fast merge%'
             |ORDER BY doc_id""".stripMargin)),

    // ---- q343: the same search through the PERSISTED index — build
    //      once per dataset, probe reads only the pattern's gram
    //      buckets; same brute-LIKE oracle, so the driver hash proves
    //      the served path is exactly the scan's answer. ----
    "q343_trigram_index" -> Q(
      (s, d) => probeTrigram(s, indexDirFor(s, d), "fast merge")
        .withColumnRenamed("id", "doc_id"),
      Some("""SELECT doc_id FROM documents
             |WHERE lower(text) LIKE '%fast merge%'
             |ORDER BY doc_id""".stripMargin)),
  )
}
