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
}
