package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.llm.Trigram

/** Measured demo for the persisted trigram index (q343,
  * [[graft.llm.Trigram]]): per-query-batch posting REBUILD (what
  * [[Trigram.likeSearch]] does when handed freshly-built postings —
  * the q336 shape) vs the PERSISTED probe ([[Trigram.probeTrigram]]).
  *
  * Two numbers transfer to cluster scale:
  *   - input BYTES READ per query: the rebuild re-tokenizes the whole
  *     text corpus per batch (corpus-sized, grows with data); the
  *     probe reads only the pattern's gram bucket partitions of the
  *     posting store (bounded by the pattern's gram count × bucket
  *     width — independent of how many OTHER grams the corpus has).
  *   - wall per query once the index exists: build cost amortizes
  *     across every future batch; a search service pays it once.
  *
  * Result sets are asserted IDENTICAL before timing (the probe is the
  * same intersection + verify on the same postings).
  *
  * Run: sbt "runMain graft.examples.TrigramBench [sfDir] [pattern]"
  */
object TrigramBench {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val pattern = args.lift(1).getOrElse("fast merge")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$src/documents.parquet")
      .select(col("doc_id").as("id"), col("text"))

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // index build (timed separately: the one-time cost)
    val dir = java.nio.file.Files.createTempDirectory("graft-trgm-bench").toString
    val (_, buildWall) = time {
      Trigram.saveTrigram(spark, docs, dir)
    }

    // rebuild path: what a no-index deployment pays PER BATCH —
    // postings derived from the raw corpus (one full shingle pass),
    // then intersect + verify
    val (scanRows, scanWall) = time {
      Trigram.likeSearch(spark, docs, Trigram.buildTrigramPostings(docs),
        pattern).collect().map(_.getLong(0)).toSeq
    }
    // probe path: pruned bucket reads of the persisted store
    val (probeRows, probeWall) = time {
      Trigram.probeTrigram(spark, dir, pattern)
        .collect().map(_.getLong(0)).toSeq
    }
    require(scanRows == probeRows,
      s"probe must equal the scan answer: ${scanRows.size} vs ${probeRows.size}")

    // the pruning fraction, measured at the FILESYSTEM level (the
    // upper bound on what the probe's partition filter can touch):
    // bytes under the pattern's gram-bucket directories vs the whole
    // posting store. This is the number that transfers — the probe's
    // IO is bounded by the pattern's buckets regardless of corpus size.
    def dirBytes(f: java.io.File): Long =
      if (f.isFile) f.length()
      else Option(f.listFiles()).map(_.map(dirBytes).sum).getOrElse(0L)
    val p = pattern.toLowerCase
    val grams = (0 to p.length - 3).map(i => p.substring(i, i + 3)).distinct
    import spark.implicits._
    val qBuckets = grams.toDF("g")
      .select(pmod(xxhash64(col("g")), lit(64L)).cast("int"))
      .distinct().collect().map(_.getInt(0)).toSet
    val store = new java.io.File(s"$dir/postings")
    val total = dirBytes(store)
    val pruned = Option(store.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith("bucket=") &&
        qBuckets.contains(f.getName.stripPrefix("bucket=").toInt))
      .map(dirBytes).sum
    println(f"[trgm] corpus docs: ${docs.count()}, matches: ${scanRows.size}, pattern grams: ${grams.size}")
    println(f"[trgm] one-time index build: $buildWall%.2f s; posting store ${total / 1e6}%.2f MB")
    println(f"[trgm] per-query REBUILD: $scanWall%.2f s (full corpus shingle pass)")
    println(f"[trgm] per-query PROBE:   $probeWall%.2f s, touching ${pruned / 1e6}%.2f MB (${100.0 * pruned / total}%.1f%% of the store; ${qBuckets.size}/64 buckets)")
    println(f"[trgm] wall cut ${scanWall / probeWall}%.1fx; store fraction cut ${total.toDouble / pruned.max(1)}%.1fx")
    println(s"""TRGMBENCH {"build_s": $buildWall, "scan_s": $scanWall, "probe_s": $probeWall, "store_mb": ${total / 1e6}, "probe_mb": ${pruned / 1e6}}""")
    spark.stop()
  }
}
