package graft

import java.nio.file.Files
import graft.core.{Block, BlockGrid, BlockIndex}
import graft.io.{BlockIO, Npy}
import graft.ndarray.Nd

/** npy interop: spec-exact headers, byte-level round-trip, and the
  * distributed per-block export/import path.
  */
class NpySpec extends SparkSpec {

  test("npy bytes round-trip and the header is spec-exact") {
    val data = Array.tabulate(24)(_.toFloat * 0.5f)
    val bytes = Npy.toBytes(Array(2, 3, 4), data)
    // v1.0: 10-byte preamble + header padded so the total is 64-aligned
    assert(bytes(0) == 0x93.toByte)
    assert(new String(bytes.slice(1, 6), "US-ASCII") == "NUMPY")
    assert(bytes(6) == 1 && bytes(7) == 0)
    val hlen = (bytes(8) & 0xff) | ((bytes(9) & 0xff) << 8)
    assert((10 + hlen) % 64 == 0, s"header end not 64-aligned: ${10 + hlen}")
    val header = new String(bytes.slice(10, 10 + hlen), "US-ASCII")
    assert(header.startsWith("{'descr': '<f4', 'fortran_order': False, 'shape': (2, 3, 4), }"))
    assert(header.endsWith("\n"))
    val (shape, back) = Npy.fromBytes(bytes)
    assert(shape.toSeq == Seq(2, 3, 4))
    assert(back.toSeq == data.toSeq)
  }

  test("block grid round-trips through per-block npy export/import") {
    val dir = Files.createTempDirectory("npyio").toString
    val bs = Array(5, 4, 3); val g = Array(2, 2, 2)
    val rnd = new scala.util.Random(73)
    val tiles = for {
      x <- 0 until 2; y <- 0 until 2; z <- 0 until 2
    } yield Block(BlockIndex(x, y, z), 5, 4, 3, 3,
      Array.fill(5 * 4 * 3 * 3)(rnd.nextFloat()))
    val grid = BlockGrid.fromTiles(spark, tiles, bs, Array(0, 0, 0), g, 3)
    BlockIO.exportNpy(grid, s"$dir/npy")
    val back = BlockIO.importNpy(spark, s"$dir/npy")
    assert(back.meta.components == 3)
    assert(back.ds.count() == 8)
    assert(Nd.maxAbsDiff(back.collectDense(), grid.collectDense()) == 0.0f)
  }
}
