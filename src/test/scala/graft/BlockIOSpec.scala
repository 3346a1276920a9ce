package graft

import java.nio.file.Files
import graft.core.{Block, BlockGrid, BlockIndex}
import graft.io.BlockIO
import graft.ndarray.Nd
import graft.stitch.Stitch

/** Round-trip + end-to-end through the storage edge: write a tile grid,
  * read it back, stitch the read grid, match the in-memory result.
  */
class BlockIOSpec extends SparkSpec {
  test("block grid round-trips through parquet with sidecar meta") {
    val dir = Files.createTempDirectory("blockio").toString
    val bs = Array(6, 6, 6); val o = Array(2, 2, 2); val g = Array(2, 2, 1)
    val rnd = new scala.util.Random(3)
    val tiles = for {
      x <- 0 until 2; y <- 0 until 2; z <- 0 until 1
    } yield Block(BlockIndex(x, y, z), 10, 10, 10, 1, Array.fill(1000)(rnd.nextFloat()))
    val grid = BlockGrid.fromTiles(spark, tiles, bs, o, g, 1)
    BlockIO.write(grid, s"$dir/grid")

    val back = BlockIO.read(spark, s"$dir/grid")
    assert(back.meta.blocksize.toSeq == bs.toSeq)
    assert(back.meta.overlap.toSeq == o.toSeq)
    assert(back.meta.blockGrid.toSeq == g.toSeq)
    assert(back.meta.components == 1)

    val a = Stitch.stitchBlocks(grid).collectDense()
    val b = Stitch.stitchBlocks(back).collectDense()
    assert(Nd.maxAbsDiff(a, b) == 0.0f)

    // stitched output is itself writable/readable (overlap 0 grid)
    val stitched = Stitch.stitchBlocks(back)
    BlockIO.write(stitched, s"$dir/out")
    val out2 = BlockIO.read(spark, s"$dir/out")
    assert(Nd.maxAbsDiff(out2.collectDense(), a) == 0.0f)
  }
}
