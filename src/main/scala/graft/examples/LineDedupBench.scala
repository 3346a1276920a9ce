package graft.examples

import java.util.concurrent.atomic.LongAdder
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.llm.Dedup

/** Measured demo for [[graft.llm.Dedup.dedupLines]]: the decision path
  * carries 64-bit line hashes, so the winner aggregation and the keep
  * join ship 8-byte keys — against the NAIVE formulation whose
  * grouping key and join key are the line TEXT itself (the full corpus
  * text crosses the shuffle twice before the rebuild). Same output —
  * asserted by fingerprint before timing — different bytes: at crawl
  * scale the shuffle bytes ARE the cost.
  *
  * A listener records actual shuffle-write bytes (the BloomBench
  * method). Results go to BASELINE.md.
  * Run: sbt "runMain graft.examples.LineDedupBench [nDocs]"
  */
object LineDedupBench {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(1000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val shuffleBytes = new LongAdder
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null)
          shuffleBytes.add(e.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })

    // 10 lines per doc; ~30% drawn from a 1000-line boilerplate pool
    // (nav bars, footers — the C4 target), the rest unique per (doc,
    // line). Materialized to parquet so both formulations read the
    // same scan.
    val dir = java.nio.file.Files.createTempDirectory("linededup").toString
    def corpus(n: Long): DataFrame = spark.range(0, n, 1, 32)
      .select(col("id").as("doc_id"),
        concat_ws("\n", (0 until 10).map { j =>
          val h = xxhash64(col("id"), lit(j))
          val pool = pmod(xxhash64(col("id"), lit(j), lit(7)), lit(1000L))
          when(pmod(h, lit(10L)) < 3,
            concat(lit("boilerplate navigation block number "), pool,
              lit(" subscribe to our newsletter for updates")))
            .otherwise(concat(lit("unique line "), col("id"), lit("-"), lit(j),
              lit(" payload lorem ipsum dolor sit amet consectetur")))
        }: _*).as("text"))

    /** the naive formulation: line TEXT is the winner-agg grouping key
      * AND the keep-join key — corpus text crosses the shuffle twice
      */
    def naive(docs: DataFrame): DataFrame = {
      val le = docs.select(col("doc_id"),
        posexplode(split(col("text"), "\n")).as(Seq("line_no", "line")))
      val winners = le.groupBy("line")
        .agg(min(struct(col("doc_id"), col("line_no"))).as("w"))
      val kept = le.join(winners, "line")
        .filter(col("doc_id") === col("w.doc_id") && col("line_no") === col("w.line_no"))
      kept.groupBy("doc_id")
        .agg(count(lit(1)).as("n_kept"),
          array_join(transform(array_sort(collect_list(struct(col("line_no"), col("line")))),
            x => x("line")), "\n").as("clean_text"))
    }

    def fingerprint(df: DataFrame, textCol: String): java.math.BigDecimal =
      df.agg(sum(xxhash64(col("doc_id"), col(textCol)).cast("decimal(38,0)")))
        .collect()(0).getDecimal(0)

    // equivalence gate at a smaller size before any timing
    val smallDir = s"$dir/small"
    corpus(100000L).write.mode("overwrite").parquet(smallDir)
    val small = spark.read.parquet(smallDir)
    val fpHash = fingerprint(
      Dedup.dedupLines(spark, small, id = "doc_id").filter(col("n_kept") > 0),
      "clean_text")
    val fpNaive = fingerprint(naive(small), "clean_text")
    require(fpHash == fpNaive,
      s"formulations disagree: hash=$fpHash naive=$fpNaive")
    println(s"[linededupbench] equivalence ok at 100k docs (fp=$fpHash)")

    corpus(nDocs).write.mode("overwrite").parquet(s"$dir/corpus")
    def docs: DataFrame = spark.read.parquet(s"$dir/corpus")

    def measure(df: => DataFrame): (Double, Long) = {
      Thread.sleep(500)
      shuffleBytes.reset()
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      (sec, shuffleBytes.sum())
    }

    def hashPath = Dedup.dedupLines(spark, docs, id = "doc_id")
    def naivePath = naive(docs)

    measure(hashPath); measure(naivePath) // warm-up
    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_LINEDEDUP_REPS", "3").toInt)
    val runs = (1 to reps).map(_ => (measure(naivePath), measure(hashPath)))
    val nSec = runs.map(_._1._1).min; val nBytes = runs.map(_._1._2).max
    val hSec = runs.map(_._2._1).min; val hBytes = runs.map(_._2._2).max
    println(f"[linededupbench] nDocs=$nDocs reps=$reps " +
      f"naive=${nSec}%.2fs/${nBytes / 1e6}%.1fMB " +
      f"hash=${hSec}%.2fs/${hBytes / 1e6}%.1fMB " +
      f"speedup=${nSec / hSec}%.2fx shuffle_cut=${nBytes.toDouble / hBytes}%.2fx")
    println(s"""{"metric":"line_dedup","ndocs":$nDocs,""" +
      s""""naive_sec":$nSec,"naive_shuffle_bytes":$nBytes,""" +
      s""""hash_sec":$hSec,"hash_shuffle_bytes":$hBytes}""")
    spark.stop()
  }
}
