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

    val bytesRead = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        bytesRead.addAndGet(sc.stageInfo.taskMetrics.inputMetrics.bytesRead)
    })
    def settle(): Long = { Thread.sleep(1500); bytesRead.get() }
    def time[T](f: => T): (T, Double, Long) = {
      val b0 = settle()
      val t0 = System.nanoTime(); val r = f
      val dt = (System.nanoTime() - t0) / 1e9
      (r, dt, settle() - b0)
    }

    // index build (timed separately: the one-time cost)
    val dir = java.nio.file.Files.createTempDirectory("graft-trgm-bench").toString
    val (_, buildWall, _) = time {
      Trigram.saveTrigram(spark, docs, dir)
    }

    // rebuild path: what a no-index deployment pays PER BATCH —
    // postings derived from the raw corpus, then intersect + verify
    val (scanRows, scanWall, scanBytes) = time {
      Trigram.likeSearch(spark, docs, Trigram.buildTrigramPostings(docs),
        pattern).collect().map(_.getLong(0)).toSeq
    }
    // probe path: pruned bucket reads of the persisted store
    val (probeRows, probeWall, probeBytes) = time {
      Trigram.probeTrigram(spark, dir, pattern)
        .collect().map(_.getLong(0)).toSeq
    }
    require(scanRows == probeRows,
      s"probe must equal the scan answer: ${scanRows.size} vs ${probeRows.size}")

    println(f"[trgm] corpus docs: ${docs.count()}, matches: ${scanRows.size}")
    println(f"[trgm] one-time index build: $buildWall%.2f s")
    println(f"[trgm] per-query REBUILD: $scanWall%.2f s, ${scanBytes / 1e6}%.2f MB read")
    println(f"[trgm] per-query PROBE:   $probeWall%.2f s, ${probeBytes / 1e6}%.2f MB read")
    println(f"[trgm] cut: wall ${scanWall / probeWall}%.1fx, bytes ${scanBytes.toDouble / probeBytes.max(1)}%.1fx")
    println(s"""TRGMBENCH {"build_s": $buildWall, "scan_s": $scanWall, "probe_s": $probeWall, "scan_mb": ${scanBytes / 1e6}, "probe_mb": ${probeBytes / 1e6}}""")
    spark.stop()
  }
}
