package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import graft.llm.Lexical

/** Measured demo for the persisted lexical index
  * ([[graft.llm.Lexical.saveLexical]]/[[graft.llm.Lexical.probeBm25]]):
  * the same BM25 query batch served from bucket-partitioned postings
  * (probe reads only the query terms' buckets via hive partition
  * pruning) vs an UNPARTITIONED postings table (every posting row
  * decodes on every query). The measure is the postings scan's
  * numOutputRows — rows the parquet reader actually decoded (the
  * LayoutBench metric; local bytesRead is not column-IO-aware) — plus
  * wall time; outputs are asserted identical before timing.
  *
  * Expected shape: the pruned probe decodes ~(query buckets)/buckets
  * of the index. Results go to BASELINE.md.
  * Run: sbt "runMain graft.examples.LexicalBench [nDocs]"
  */
object LexicalBench {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(1000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // plain plan tree so the scan node's metrics are directly reachable
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // ~20 tokens/doc over a 20k-term vocabulary with a frequent head
    // (every doc carries a couple of stop-ish terms) — enough term
    // spread that 64 buckets are all populated
    val dir = java.nio.file.Files.createTempDirectory("lexbench").toString
    val docs = spark.range(0, nDocs, 1, 32)
      .select(col("id").as("doc_id"),
        concat_ws(" ",
          (0 until 18).map(j =>
            concat(lit("t"), pmod(xxhash64(col("id"), lit(j)), lit(20000L)))) ++
            Seq(lit("common"), lit("filler")): _*).as("text"))
    docs.write.mode("overwrite").parquet(s"$dir/docs")
    def corpus: DataFrame = spark.read.parquet(s"$dir/docs")

    val buckets = 64
    val t0 = System.nanoTime()
    Lexical.saveLexical(spark, corpus, s"$dir/idx", buckets)
    // the unpartitioned baseline: identical rows, no bucket dirs
    spark.read.parquet(s"$dir/idx/postings")
      .drop("bucket").repartition(32)
      .write.mode("overwrite").parquet(s"$dir/flat")
    println(f"[lexicalbench] build ${(System.nanoTime() - t0) / 1e9}%.1f s")

    val queries = Seq(0 -> Seq("t17", "t4242"), 1 -> Seq("t9999"))
    val qterms = queries.flatMap(_._2).distinct

    def flatProbe(k: Int): DataFrame = {
      // the probe tail over the unpartitioned postings — same filters,
      // same dedup, same df derivation, same scoring core entry point
      val post = spark.read.parquet(s"$dir/flat")
        .filter(col("term").isin(qterms: _*))
        .select(col("term"), col("doc_id"), col("len"), col("tf"))
        .dropDuplicates("term", "doc_id")
      val dfd = post.groupBy("term").agg(count(lit(1)).as("df"))
      val stats = spark.read.parquet(s"$dir/idx/stats")
      val qdf = queries.flatMap { case (qi, ts) => ts.map(t => (qi, t)) }
        .toDF("qid", "term")
      Lexical.scoreAndRank(post, dfd, stats, qdf, k, 1.2, 0.75, "doc_id")
    }
    def prunedProbe(k: Int): DataFrame =
      Lexical.probeBm25(spark, s"$dir/idx", queries, k, buckets)

    def measure(df: => DataFrame): (Double, Long, Seq[(Int, Int, Long, Double)]) = {
      val d = df
      val t1 = System.nanoTime()
      val rows = d.collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
      val sec = (System.nanoTime() - t1) / 1e9
      val scanned = d.queryExecution.executedPlan.collectLeaves()
        .collect { case s: FileSourceScanExec
          if s.metadata.get("Location").exists(l =>
            l.contains("flat") || l.contains("postings")) =>
          s.metrics("numOutputRows").value }
        .sum
      (sec, scanned, rows.sortBy(t => (t._1, t._2)))
    }

    measure(flatProbe(10)); measure(prunedProbe(10)) // warm
    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_LEX_REPS", "3").toInt)
    val runs = (1 to reps).map(_ => (measure(flatProbe(10)), measure(prunedProbe(10))))
    require(runs.forall(r => r._1._3 == r._2._3),
      "flat and pruned probes disagree")
    val fSec = runs.map(_._1._1).min; val fRows = runs.map(_._1._2).max
    val pSec = runs.map(_._2._1).min; val pRows = runs.map(_._2._2).max
    println(f"[lexicalbench] nDocs=$nDocs buckets=$buckets qterms=${qterms.size} " +
      f"flat=${fSec}%.2fs/${fRows} rows decoded " +
      f"pruned=${pSec}%.2fs/${pRows} rows decoded " +
      f"decode_cut=${fRows.toDouble / math.max(pRows, 1)}%.1fx speedup=${fSec / pSec}%.2fx")
    println(s"""{"metric":"lexical_index","ndocs":$nDocs,""" +
      s""""flat_sec":$fSec,"flat_rows":$fRows,""" +
      s""""pruned_sec":$pSec,"pruned_rows":$pRows}""")
    spark.stop()
  }
}
