package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.rel.RelQueries.Q
import graft.rel.Tables

/** Persisted near-dup index — incremental dedup of NEW documents
  * against an existing corpus without recomputing (or even keeping) the
  * corpus text. The primitive a continuously-crawling training-data
  * pipeline actually runs: "is this page a near-dup of anything we
  * already hold?"
  *
  * Layout under `dir`:
  *   - `buckets/`  — (id, band, bh): the MinHash LSH band-bucket table
  *     (q35's banding — collisions in ≥1 band make a candidate)
  *   - `shingles/` — (id, sh): each doc's SORTED distinct 64-bit
  *     shingle hashes, the compact witness for EXACT Jaccard at probe
  *     time (longs, not text — ~8 bytes per shingle, and the corpus
  *     text never needs to exist again)
  *
  * Probe = explode new docs' bands → equi-join the bucket table →
  * distinct candidates → two-pointer intersection of stored shingle
  * sets → exact Jaccard filter. The n² space is never formed; shuffle
  * volume is bands + candidates, exactly the q35 scale shape.
  *
  * Append (streaming or batch) is at-least-once-safe BY CONSTRUCTION:
  * candidates are distinct()ed and the shingle store is deduped by id
  * on read, so replayed rows cannot change probe results
  * (DedupIndexSpec pins it).
  *
  * Jaccard here is over each doc's FULL shingle set (no df-cap): the
  * probe verifies a handful of candidate pairs exactly, not the n²
  * space the cap exists to bound in [[Dedup.jaccardPairs]].
  */
object DedupIndex {

  /** (id, sh sorted distinct 64-bit shingles, bands) for each doc with
    * ≥1 shingle; shingle-less docs are excluded for the same clique-bomb
    * reason as [[Dedup.minhashCandidates]]
    */
  private def prepared(s: SparkSession, docs: DataFrame, id: String, text: String) = {
    import s.implicits._
    docs.select(col(id), col(text)).as[(Long, String)]
      .flatMap { case (i, t) =>
        val toks = SketchOps.tokensOf(t)
        val sh32 = SketchOps.shinglesOf(toks) // banding domain (q35's)
        if (sh32.isEmpty) None
        else {
          val sh64 = SketchOps.shingles64Of(toks).sorted
          Some((i, sh64, SketchOps.bandHashes(SketchOps.minhash(sh32))))
        }
      }
  }

  /** Build and persist the index of `docs` under `dir`. */
  def save(s: SparkSession, docs: DataFrame, dir: String,
      id: String = "id", text: String = "text"): Unit = {
    import s.implicits._
    val p = prepared(s, docs, id, text).cache()
    p.map { case (i, sh, _) => (i, sh) }.toDF(id, "sh")
      .write.mode("overwrite").parquet(s"$dir/shingles")
    p.map { case (i, _, bands) => (i, bands) }.toDF(id, "bands")
      .select(col(id), posexplode(col("bands")).as(Seq("band", "bh")))
      .write.mode("overwrite").parquet(s"$dir/buckets")
    p.unpersist()
  }

  /** sorted-array intersection size (two pointers) */
  private def interSize(a: Array[Long], b: Array[Long]): Int = {
    var i = 0; var j = 0; var n = 0
    while (i < a.length && j < b.length) {
      if (a(i) < b(j)) i += 1
      else if (a(i) > b(j)) j += 1
      else { n += 1; i += 1; j += 1 }
    }
    n
  }

  /** Near-dups of `newDocs` against the SAVED corpus: (new_id,
    * corpus_id, inter, jac) for pairs colliding in ≥1 LSH band with
    * exact Jaccard ≥ `minJaccard` over the stored shingle sets.
    *
    * `maxCandidates` bounds the exact-verification fan-out PER PROBE
    * DOC (the q34 df-cap idea at the candidate stage): a pathological
    * probe whose bands collide with everything verifies only its
    * `maxCandidates` smallest corpus ids — deterministic, bounded-heap
    * selection — instead of shipping the whole corpus's shingle sets.
    * Pre/post-cap candidate counts surface through `observe()` metrics
    * (`dedup_probe_pre_cap` / `dedup_probe_post_cap`), so capping is
    * visible, never silent.
    */
  def probe(s: SparkSession, dir: String, newDocs: DataFrame,
      minJaccard: Double, maxCandidates: Int = 4096,
      id: String = "id", text: String = "text"): DataFrame = {
    import s.implicits._
    require(maxCandidates > 0, s"maxCandidates must be > 0, got $maxCandidates")
    val p = prepared(s, newDocs, id, text).cache()
    val probeBuckets = p.map { case (i, _, bands) => (i, bands) }
      .toDF("new_id", "bands")
      .select(col("new_id"), posexplode(col("bands")).as(Seq("band", "bh")))
    val corpusBuckets = s.read.parquet(s"$dir/buckets")
      .select(col(id).as("corpus_id"), col("band"), col("bh"))
    val candAll = probeBuckets.join(corpusBuckets, Seq("band", "bh"))
      .select(col("new_id"), col("corpus_id")).distinct()
      .observe("dedup_probe_pre_cap", count(lit(1)).as("rows"))
    // smallest corpus ids first: a total order, so the capped set is
    // stable under partitioning; the bounded-heap partial agg keeps
    // per-task memory at maxCandidates rows per probe doc. Materialized
    // (localCheckpoint, GC-scoped) because THREE consumers read it —
    // the shingle-store filter, the verify join, and the observe sink
    val cand = graft.functions.TopK.perKeyTopK(
        candAll.withColumn("nega", -col("corpus_id")),
        maxCandidates, "new_id", "corpus_id", "nega")
      .select(col("new_id"), col("corpus_id"))
      .observe("dedup_probe_post_cap", count(lit(1)).as("rows"))
      .localCheckpoint(true)
    // the corpus shingle store is filtered to candidate ids by a
    // BROADCAST semi-join (cand is capped, the store is corpus-sized —
    // the store streams through a narrow scan and never shuffles), and
    // only then deduped: at-least-once appended duplicates are
    // bit-identical rows, so dedup-after-filter equals dedup-on-read
    // at a candidate-sized cost instead of a corpus-wide shuffle
    val corpusSh = s.read.parquet(s"$dir/shingles")
      .select(col(id).as("corpus_id"), col("sh").as("csh"))
      .join(broadcast(cand.select("corpus_id").distinct()), "corpus_id")
      .dropDuplicates("corpus_id")
    val newSh = p.map { case (i, sh, _) => (i, sh) }.toDF("new_id", "nsh")
    val res = cand.join(corpusSh, "corpus_id").join(broadcast(newSh), "new_id")
      .as[(Long, Long, Array[Long], Array[Long])]
      .map { case (nid, cid, csh, nsh) =>
        val inter = interSize(nsh, csh)
        val jac = inter.toDouble / (nsh.length + csh.length - inter)
        (nid, cid, inter.toLong, jac)
      }
      .toDF("new_id", "corpus_id", "inter", "jac")
      .filter(col("jac") >= minJaccard)
    // serving hygiene (the advertised long-lived path): materialize the
    // (near-dup pairs only) result so the prepared-probe cache releases
    // per batch instead of accruing in executor storage
    val out = res.localCheckpoint(true)
    p.unpersist()
    out
  }

  /** Streaming index maintenance: index arriving docs (shingles +
    * band buckets) via foreachBatch appends. At-least-once delivery is
    * safe — see the object doc.
    */
  def appendStream(s: SparkSession, stream: DataFrame, dir: String,
      checkpoint: String,
      id: String = "id", text: String = "text")
      : org.apache.spark.sql.streaming.StreamingQuery = {
    import s.implicits._
    stream.select(col(id), col(text)).as[(Long, String)]
      .flatMap { case (i, t) =>
        val toks = SketchOps.tokensOf(t)
        val sh32 = SketchOps.shinglesOf(toks)
        if (sh32.isEmpty) None
        else Some((i, SketchOps.shingles64Of(toks).sorted,
          SketchOps.bandHashes(SketchOps.minhash(sh32))))
      }
      .toDF(id, "sh", "bands")
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val b = batch.cache()
        b.select(col(id), col("sh"))
          .write.mode("append").parquet(s"$dir/shingles")
        b.select(col(id), posexplode(col("bands")).as(Seq("band", "bh")))
          .write.mode("append").parquet(s"$dir/buckets")
        b.unpersist(); ()
      }
      .option("checkpointLocation", checkpoint)
      .start()
  }

  /** Index MAINTENANCE: compact the appended shingle/bucket logs —
    * at-least-once appends leave bit-identical duplicate rows and small
    * files; probes stay correct through them (dedup on read) but pay
    * for it per probe. Dedup here is by full row (duplicates are
    * identical), so content — and probe output — is unchanged
    * (DedupIndexSpec). Same non-atomic swap caveat as
    * [[AnnIndex.compactIvf]]: serving deployments compact into a new
    * dir and flip a pointer.
    */
  def compact(s: SparkSession, dir: String, id: String = "id"): Unit = {
    val conf = s.sparkContext.hadoopConfiguration
    def swap(name: String)(rewrite: String => Unit): Unit = {
      val cur = new org.apache.hadoop.fs.Path(s"$dir/$name")
      val tmp = new org.apache.hadoop.fs.Path(s"$dir/${name}__compact")
      val fs = cur.getFileSystem(conf)
      if (fs.exists(tmp)) fs.delete(tmp, true)
      rewrite(tmp.toString)
      fs.delete(cur, true)
      require(fs.rename(tmp, cur), s"compaction swap failed for $cur")
    }
    swap("shingles") { out =>
      s.read.parquet(s"$dir/shingles").dropDuplicates(id)
        .write.parquet(out)
    }
    swap("buckets") { out =>
      s.read.parquet(s"$dir/buckets").dropDuplicates(id, "band", "bh")
        .write.parquet(out)
    }
  }

  /** DEDUP-ON-INGEST — the crawler loop a continuously-fed training
    * pipeline actually runs, composed from the pieces above: per
    * micro-batch, (1) drop docs that are near-dups of a SMALLER-ID doc
    * in the same batch ([[Dedup.jaccardPairs]] — the index can't know
    * them yet), (2) drop docs that are near-dups of the INDEXED corpus
    * ([[probe]]), (3) emit the survivors to `outDir` and APPEND them to
    * the index — so later batches (and later crawls) dedup against
    * them.
    *
    * Replay idempotency falls out of the index itself: a re-delivered
    * batch re-probes docs that are NOW IN THE INDEX, each matches its
    * own stored shingle set at Jaccard 1.0, and the whole batch drops —
    * at-least-once delivery cannot emit a doc twice or double-append
    * it. (Caveat: shingle-less docs — shorter than one shingle window —
    * are never indexed, pass every probe, and WOULD re-emit on replay;
    * a deployment that cares filters them upstream.)
    *
    * Scale shape per batch: the intra-batch pass is the q34 single
    * shuffle over the BATCH (not the corpus); the probe is the capped
    * band-bucket join against the stored index; appends are two
    * partitioned parquet writes. The corpus text is never read.
    */
  def ingestStream(s: SparkSession, stream: DataFrame, dir: String,
      outDir: String, checkpoint: String, minJaccard: Double,
      maxCandidates: Int = 4096,
      id: String = "id", text: String = "text")
      : org.apache.spark.sql.streaming.StreamingQuery = {
    import s.implicits._
    stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val b = batch.select(col(id), col(text)).cache()
        // (1) intra-batch: keep the smallest id of each near-dup pair
        val intraDup = Dedup.jaccardPairs(s, b, minJaccard, id = id, text = text)
          .select(col("idb").as(id)).distinct()
        val c1 = b.join(intraDup, Seq(id), "left_anti")
        // (2) cross-batch/corpus: probe the persisted index
        val crossDup = probe(s, dir, c1, minJaccard, maxCandidates, id, text)
          .select(col("new_id").as(id)).distinct()
        val fresh = c1.join(crossDup, Seq(id), "left_anti")
          .localCheckpoint(true) // consumed by the emit AND two appends
        // (3) emit survivors and index them
        fresh.write.mode("append").parquet(outDir)
        val prep = prepared(s, fresh, id, text).cache()
        prep.map { case (i, sh, _) => (i, sh) }.toDF(id, "sh")
          .write.mode("append").parquet(s"$dir/shingles")
        prep.map { case (i, _, bands) => (i, bands) }.toDF(id, "bands")
          .select(col(id), posexplode(col("bands")).as(Seq("band", "bh")))
          .write.mode("append").parquet(s"$dir/buckets")
        prep.unpersist()
        b.unpersist(); ()
      }
      .option("checkpointLocation", checkpoint)
      .start()
  }

  /** one index build per (session, dataset) for the q67 entry */
  private val built = scala.collection.concurrent.TrieMap[String, String]()

  private def indexDirFor(s: SparkSession, d: String): String =
    built.getOrElseUpdate(d, {
      val work = java.nio.file.Files.createTempDirectory("graft-q67")
      sys.addShutdownHook {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm))
          f.delete(); ()
        }
        rm(work.toFile)
      }
      save(s, Tables.documents(s, d).select(col("doc_id").as("id"), col("text")),
        work.toString)
      work.toString
    })

  val all: ListMap[String, Q] = ListMap(
    // ---- incremental dedup against the persisted corpus index: probes
    //      are docs 0-9 with their first token dropped (near-dups by
    //      construction), new_id = doc_id + 100000. The oracle
    //      recomputes the SAME probe transformation and the exact
    //      cross Jaccard in SQL — candidate banding at jac >= 0.8 has
    //      miss probability (1-0.8^4)^16 ≈ 2e-4 per pair, and on this
    //      FIXED fixture the entry being hash-green pins that no such
    //      miss occurs ----
    "q67_dedup_index_probe" -> Q(
      (s, d) => {
        val dir = indexDirFor(s, d)
        val probes = Tables.documents(s, d).filter(col("doc_id") < 10)
          .select((col("doc_id") + 100000L).as("id"),
            regexp_replace(col("text"), "^\\S+\\s+", "").as("text"))
        probe(s, dir, probes, minJaccard = 0.8)
          .orderBy("new_id", "corpus_id")
      },
      Some("""WITH probes AS (
             |  SELECT doc_id + 100000 AS new_id,
             |         regexp_replace(text, '^\S+\s+', '') AS text
             |  FROM documents WHERE doc_id < 10),
             |ps AS (SELECT new_id,
             |    list_distinct(list_transform(range(1, len(t)-1),
             |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS sh
             |  FROM (SELECT new_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
             |        FROM probes)),
             |cs AS (SELECT doc_id AS corpus_id,
             |    list_distinct(list_transform(range(1, len(t)-1),
             |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS sh
             |  FROM (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
             |        FROM documents)),
             |j AS (SELECT p.new_id, c.corpus_id,
             |    len(list_intersect(p.sh, c.sh)) AS inter,
             |    CAST(len(list_intersect(p.sh, c.sh)) AS DOUBLE)
             |      / (len(p.sh) + len(c.sh) - len(list_intersect(p.sh, c.sh))) AS jac
             |  FROM ps p, cs c
             |  WHERE len(list_intersect(p.sh, c.sh)) > 0)
             |SELECT new_id, corpus_id, CAST(inter AS BIGINT) AS inter, jac
             |FROM j WHERE jac >= 0.8 ORDER BY new_id, corpus_id""".stripMargin)),
  )
}
