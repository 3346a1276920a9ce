package graft.io

import java.nio.charset.StandardCharsets
import org.apache.spark.sql.{Encoder, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Block, BlockGrid, GridMeta}

/** Parquet source/sink for block grids — the engine's storage edge
  * (SURVEY.md §2b "Scans/sources/sinks": the reference has no I/O at all;
  * arrays live in memory. At 100 TB the grid IS a parquet dataset).
  *
  * Layout: one row per block (bx,by,bz,nx,ny,nz,c,data:array<float>),
  * written partitioned-by nothing but sortable on (bx,by,bz); the grid
  * metadata travels in a `_grid_meta.json` sidecar next to the parquet
  * files (Spark carries no per-dataset user metadata). At cluster scale
  * the same layout works on any Hadoop-compatible FS; the sidecar write
  * goes through the same filesystem API.
  */
object BlockIO {
  private implicit val blockEnc: Encoder[Block] = BlockGrid.blockEncoder

  private def metaJson(m: GridMeta): String = {
    def arr[T](a: Array[T]): String = a.mkString("[", ",", "]")
    s"""{"shape":${arr(m.shape)},"blocksize":${arr(m.blocksize)},""" +
      s""""overlap":${arr(m.overlap)},"blockGrid":${arr(m.blockGrid)},""" +
      s""""components":${m.components}}"""
  }

  private def parseMeta(s: String): GridMeta = {
    def ints(k: String): Array[Int] =
      s"""$k":\\[([^\\]]*)\\]""".r.findFirstMatchIn(s).get.group(1).split(",").map(_.trim.toInt)
    GridMeta(
      shape = ints("shape").map(_.toLong),
      blocksize = ints("blocksize"),
      overlap = ints("overlap"),
      blockGrid = ints("blockGrid"),
      components = s"""components":(\\d+)""".r.findFirstMatchIn(s).get.group(1).toInt)
  }

  /** Write a grid to `path` as parquet rows + a `_grid_meta.json` sidecar.
    * The sidecar goes through the Hadoop FileSystem API, so any scheme the
    * parquet write supports (file://, hdfs://, s3a://, ...) works.
    */
  def write(grid: BlockGrid, path: String): Unit = {
    val spark = grid.ds.sparkSession
    grid.ds
      .select(col("bi.bx").as("bx"), col("bi.by").as("by"), col("bi.bz").as("bz"),
        col("nx"), col("ny"), col("nz"), col("c"), col("data"))
      .write.mode("overwrite").parquet(path)
    val p = new org.apache.hadoop.fs.Path(path, "_grid_meta.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(metaJson(grid.meta).getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Read a grid written by [[write]]; lazy Dataset + sidecar meta. */
  def read(spark: SparkSession, path: String): BlockGrid = {
    val p = new org.apache.hadoop.fs.Path(path, "_grid_meta.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val metaBytes =
      try {
        val buf = new java.io.ByteArrayOutputStream()
        val chunk = new Array[Byte](4096)
        var n = in.read(chunk)
        while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
        buf.toByteArray
      } finally in.close()
    val meta = parseMeta(new String(metaBytes, StandardCharsets.UTF_8))
    val ds = spark.read.parquet(path)
      .select(struct(col("bx"), col("by"), col("bz")).as("bi"),
        col("nx"), col("ny"), col("nz"), col("c"), col("data"))
      .as[Block]
    BlockGrid(meta, ds)
  }
}
