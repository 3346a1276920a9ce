package graft

import graft.core.{Block, BlockGrid, BlockIndex}
import graft.ndarray.Nd
import graft.stitch.Stitch

/** Golden parity vs the reference's own kernels (fixtures from
  * tools/gen_goldens.py; tolerance 1e-5 absolute per SURVEY.md §5.2).
  */
class StitchGoldenSpec extends SparkSpec {

  private def runFixture(name: String): Unit = {
    val sc = Golden.sidecar(name)
    val grid = sc.ints("grid")
    val bs = sc.ints("blocksize")
    val o = sc.ints("overlap")
    val c = math.max(1, sc.int("components"))
    val tiles = for {
      x <- 0 until grid(0); y <- 0 until grid(1); z <- 0 until grid(2)
    } yield {
      val data = Golden.readFloats(s"$name.in_${x}_${y}_$z.raw")
      Block(BlockIndex(x, y, z), bs(0) + 2 * o(0), bs(1) + 2 * o(1), bs(2) + 2 * o(2), c, data)
    }
    val in = BlockGrid.fromTiles(spark, tiles, bs, o, grid, c)
    val out = Stitch.stitchBlocks(in)
    val got = out.collectDense()
    val want = Golden.readFloats(s"$name.out.raw")
    assert(got.length == want.length, s"$name: size ${got.length} != ${want.length}")
    val diff = Nd.maxAbsDiff(got, want)
    assert(diff <= 1e-5f, s"$name: max abs diff $diff > 1e-5")
  }

  test("stitch_const: partition of unity (constant tiles -> constant)") {
    runFixture("stitch_const")
  }
  test("stitch_aniso: anisotropic geometry + boundary faces") {
    runFixture("stitch_aniso")
  }
  test("stitch_rand: elementwise golden, accumulation order") {
    runFixture("stitch_rand")
  }
  test("stitch_vec: vector-field component broadcast") {
    runFixture("stitch_vec")
  }
}
