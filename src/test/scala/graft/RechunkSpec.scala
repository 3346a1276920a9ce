package graft

import graft.affine.LocalAffine
import graft.core.{Block, BlockGrid, BlockIndex}
import graft.ndarray.Nd

/** `rechunk` re-partitions voxels without changing them: collectDense
  * must be invariant across chunk geometries, including non-divisible
  * shapes with partial edge blocks on both the input and output side,
  * and vector fields.
  */
class RechunkSpec extends SparkSpec {

  test("rechunk preserves the dense array over random geometries") {
    val r = new scala.util.Random(71)
    (1 to 5).foreach { _ =>
      val bs = Array(2 + r.nextInt(5), 2 + r.nextInt(5), 2 + r.nextInt(5))
      val g = Array(1 + r.nextInt(3), 1 + r.nextInt(3), 1 + r.nextInt(3))
      val c = if (r.nextBoolean()) 1 else 3
      val tiles = for {
        x <- 0 until g(0); y <- 0 until g(1); z <- 0 until g(2)
      } yield Block(BlockIndex(x, y, z), bs(0), bs(1), bs(2), c,
        Array.fill(bs(0) * bs(1) * bs(2) * c)(r.nextFloat()))
      val in = BlockGrid.fromTiles(spark, tiles, bs, Array(0, 0, 0), g, c)
      val want = in.collectDense()
      val nbs = Array(1 + r.nextInt(7), 1 + r.nextInt(7), 1 + r.nextInt(7))
      val out = in.rechunk(nbs)
      assert(out.meta.blocksize.sameElements(nbs))
      val got = out.collectDense()
      assert(got.length == want.length)
      assert(Nd.maxAbsDiff(got, want) == 0.0f,
        s"bs=${bs.toSeq} g=${g.toSeq} nbs=${nbs.toSeq} c=$c")
    }
  }

  test("rechunk of a cropped position grid (the reference's own usage)") {
    // local_affine.py:13 rechunks the position grid to the blocksize;
    // shape 7x9x5 is not divisible by either geometry
    val pg = LocalAffine.positionGrid(spark, Array(7L, 9L, 5L), Array(4, 4, 4))
    val want = pg.collectDense()
    val out = pg.rechunk(Array(3, 5, 2))
    assert(out.ds.count() == 3L * 2 * 3) // ceil(7/3) x ceil(9/5) x ceil(5/2)
    assert(Nd.maxAbsDiff(out.collectDense(), want) == 0.0f)
  }

  test("rechunk refuses overlapped grids") {
    val tiles = Seq(Block(BlockIndex(0, 0, 0), 8, 8, 8, 1, new Array[Float](512)))
    val in = BlockGrid.fromTiles(spark, tiles, Array(4, 4, 4), Array(2, 2, 2), Array(1, 1, 1), 1)
    intercept[IllegalArgumentException] { in.rechunk(Array(2, 2, 2)) }
  }
}
