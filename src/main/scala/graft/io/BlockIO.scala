package graft.io

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
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

  /** Write a grid to `path` as parquet rows + a `_grid_meta.json` sidecar. */
  def write(grid: BlockGrid, path: String): Unit = {
    grid.ds
      .select(col("bi.bx").as("bx"), col("bi.by").as("by"), col("bi.bz").as("bz"),
        col("nx"), col("ny"), col("nz"), col("c"), col("data"))
      .write.mode("overwrite").parquet(path)
    Files.write(Paths.get(path, "_grid_meta.json"),
      metaJson(grid.meta).getBytes(StandardCharsets.UTF_8))
  }

  /** Read a grid written by [[write]]; lazy Dataset + sidecar meta. */
  def read(spark: SparkSession, path: String): BlockGrid = {
    val meta = parseMeta(new String(
      Files.readAllBytes(Paths.get(path, "_grid_meta.json")), StandardCharsets.UTF_8))
    val ds = spark.read.parquet(path)
      .select(struct(col("bx"), col("by"), col("bz")).as("bi"),
        col("nx"), col("ny"), col("nz"), col("c"), col("data"))
      .as[Block]
    BlockGrid(meta, ds)
  }
}
