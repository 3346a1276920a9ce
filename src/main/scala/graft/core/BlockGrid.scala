package graft.core

import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}

/** A lazy block-partitioned dense N-d array: `Dataset[Block]` + static
  * [[GridMeta]] — the Spark-native counterpart of a dask array
  * (SURVEY.md §1.3). All transformations are lazy (the reference never
  * calls compute — stitch.py:113, local_affine.py:139); only
  * [[collectDense]] / IO trigger actions.
  */
final case class BlockGrid(meta: GridMeta, ds: Dataset[Block]) {

  /** Narrow per-chunk kernel — the analogue of `da.map_blocks`
    * (stitch.py:105-110). Chained maps fuse inside one
    * whole-stage-codegen stage (SURVEY.md §4.2).
    */
  def mapBlocks(newMeta: GridMeta)(f: Block => Block): BlockGrid =
    BlockGrid(newMeta, ds.map(f)(BlockGrid.blockEncoder))

  /** Collect into one dense row-major float buffer (tests / small outputs
    * only — the 100 TB path writes Parquet instead, see graft.io).
    * Blocks are placed at bi*blocksize; partial edge blocks (post-crop)
    * use their own extents.
    */
  def collectDense(): Array[Float] = {
    val sx = meta.shape(0).toInt; val sy = meta.shape(1).toInt; val sz = meta.shape(2).toInt
    val c = meta.components
    val out = new Array[Float](sx * sy * sz * c)
    val bs = meta.blocksize
    ds.collect().foreach { b =>
      val x0 = b.bi.bx * bs(0); val y0 = b.bi.by * bs(1); val z0 = b.bi.bz * bs(2)
      val rowLen = b.nz * c
      var pi = 0
      var x = 0
      while (x < b.nx) {
        var y = 0
        while (y < b.ny) {
          var di = (((x0 + x) * sy + (y0 + y)) * sz + z0) * c
          System.arraycopy(b.data, pi, out, di, rowLen)
          pi += rowLen
          y += 1
        }
        x += 1
      }
    }
    out
  }
}

object BlockGrid {
  implicit val blockEncoder: Encoder[Block] = Encoders.product[Block]

  /** Build a grid from an in-memory dense array of extended tiles (tests,
    * small inputs). `tiles` maps BlockIndex -> flat row-major chunk of
    * extent blocksize+2*overlap per axis (the stitch input contract,
    * stitch.py:19-20).
    */
  def fromTiles(
      spark: SparkSession,
      tiles: Seq[Block],
      blocksize: Array[Int],
      overlap: Array[Int],
      blockGrid: Array[Int],
      components: Int): BlockGrid = {
    val shape = Array.tabulate(3)(i => blocksize(i).toLong * blockGrid(i))
    val meta = GridMeta(shape, blocksize, overlap, blockGrid, components)
    // parallelize to one partition per block: blocks are the unit of work
    val n = math.max(1, math.min(tiles.size, spark.sparkContext.defaultParallelism))
    BlockGrid(meta, spark.createDataset(spark.sparkContext.parallelize(tiles, n))(blockEncoder))
  }
}
