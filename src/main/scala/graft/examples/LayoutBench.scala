package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import graft.io.Layout

/** Measured demo for [[graft.io.Layout.zorderWrite]]: the same 10M-row
  * table written three ways — unsorted, sorted by k1 only, z-ordered on
  * (k1, k2) — then scanned with a rectangle predicate selecting 1/256 of
  * the key space. The measure is the scan's numOutputRows: rows the
  * parquet reader actually DECODED after row-group/page pruning (local
  * `inputMetrics.bytesRead` is not column-IO-aware, so rows decoded is
  * the honest pruning metric). Expected shape: unsorted decodes all
  * rows, the k1 sort prunes one axis (~1/16), z-order prunes both.
  *
  * Results go to BASELINE.md next to the Layout scaladoc.
  * Run: sbt "runMain graft.examples.LayoutBench [nRows [files]]"
  */
object LayoutBench {
  def main(args: Array[String]): Unit = {
    val nRows = args.headOption.map(_.toLong).getOrElse(10000000L)
    val files = args.lift(1).map(_.toInt).getOrElse(32)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // plain plan tree so the scan node's metrics are directly reachable
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = java.nio.file.Files.createTempDirectory("layoutbench").toString
    val k = 4096L
    def base: DataFrame = spark.range(0, nRows, 1, 32)
      .select(pmod(col("id") * 2654435761L, lit(k)).as("k1"),
        pmod(col("id") * 40503L, lit(k)).as("k2"),
        col("id").as("payload"))
    base.repartition(files).write.mode("overwrite").parquet(s"$dir/unsorted")
    base.repartitionByRange(files, col("k1")).sortWithinPartitions("k1")
      .write.mode("overwrite").parquet(s"$dir/sorted_k1")
    Layout.zorderWrite(spark, base, "k1", "k2", s"$dir/zorder", files)

    // rectangle: 1/16 of each axis → 1/256 of the space
    def rect(df: DataFrame): DataFrame = df
      .filter(col("k1").between(1024, 1279) && col("k2").between(2048, 2303))
      .groupBy().agg(count(lit(1)).as("n"), sum("payload").as("s"))

    /** (seconds, rows the scan decoded, rows matching the rectangle) */
    def measure(path: String): (Double, Long, Long) = {
      val df = rect(spark.read.parquet(path))
      val t0 = System.nanoTime()
      val n = df.collect()(0).getLong(0)
      val sec = (System.nanoTime() - t0) / 1e9
      val scanned = df.queryExecution.executedPlan.collectLeaves()
        .collect { case s: FileSourceScanExec => s.metrics("numOutputRows").value }
        .sum
      (sec, scanned, n)
    }

    Seq("unsorted", "sorted_k1", "zorder").foreach(l => measure(s"$dir/$l")) // warm
    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_LAYOUT_REPS", "3").toInt)
    val runs = (1 to reps).map(_ =>
      (measure(s"$dir/unsorted"), measure(s"$dir/sorted_k1"), measure(s"$dir/zorder")))
    val rows = Seq(runs.head._1._3, runs.head._2._3, runs.head._3._3)
    require(rows.distinct.size == 1, s"layouts disagree on the rectangle: $rows")
    val (uS, uR) = (runs.map(_._1._1).min, runs.map(_._1._2).max)
    val (sS, sR) = (runs.map(_._2._1).min, runs.map(_._2._2).max)
    val (zS, zR) = (runs.map(_._3._1).min, runs.map(_._3._2).max)
    println(f"[layoutbench] nRows=$nRows files=$files rectRows=${rows.head} " +
      f"decoded: unsorted=$uR sorted_k1=$sR zorder=$zR " +
      f"(cut_vs_unsorted=${uR.toDouble / zR}%.1fx cut_vs_sorted=${sR.toDouble / zR}%.1fx) " +
      f"secs: ${uS}%.2f/${sS}%.2f/${zS}%.2f")
    println(s"""{"metric":"zorder_layout","nrows":$nRows,"files":$files,"rect_rows":${rows.head},""" +
      s""""unsorted_scan_rows":$uR,"sorted_k1_scan_rows":$sR,"zorder_scan_rows":$zR,""" +
      s""""unsorted_sec":$uS,"sorted_k1_sec":$sS,"zorder_sec":$zS}""")
    spark.stop()
  }
}
