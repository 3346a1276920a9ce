package graft

import scala.util.Random
import graft.core.{Block, BlockGrid, BlockIndex, GridMeta}

/** [[BlockGrid.downsample]] vs a straight dense-array reference pool:
  * same x→y→z double accumulation, so parity is BIT-exact, across
  * divisible and trailing-partial geometries, vector components, and
  * an irregular source grid.
  */
class DownsampleSpec extends SparkSpec {

  /** reference mean-pool on a dense row-major array */
  private def refPool(in: Array[Float], sh: Array[Int], c: Int,
      f: Array[Int]): (Array[Float], Array[Int]) = {
    val osh = Array.tabulate(3)(ax => (sh(ax) + f(ax) - 1) / f(ax))
    val out = new Array[Float](osh(0) * osh(1) * osh(2) * c)
    for (ox <- 0 until osh(0); oy <- 0 until osh(1); oz <- 0 until osh(2); ch <- 0 until c) {
      var acc = 0.0d; var cnt = 0
      for (x <- ox * f(0) until math.min((ox + 1) * f(0), sh(0));
           y <- oy * f(1) until math.min((oy + 1) * f(1), sh(1));
           z <- oz * f(2) until math.min((oz + 1) * f(2), sh(2))) {
        acc += in(((x * sh(1) + y) * sh(2) + z) * c + ch); cnt += 1
      }
      out(((ox * osh(1) + oy) * osh(2) + oz) * c + ch) = (acc / cnt).toFloat
    }
    (out, osh)
  }

  /** dense random grid with the given regular blocksize */
  private def randomGrid(sh: Array[Int], bs: Array[Int], c: Int, seed: Int)
      : (BlockGrid, Array[Float]) = {
    val rnd = new Random(seed)
    val dense = Array.fill(sh(0) * sh(1) * sh(2) * c)(rnd.nextFloat() * 10f - 5f)
    val g = Array.tabulate(3)(ax => (sh(ax) + bs(ax) - 1) / bs(ax))
    val tiles = for {
      bx <- 0 until g(0); by <- 0 until g(1); bz <- 0 until g(2)
    } yield {
      val x0 = bx * bs(0); val y0 = by * bs(1); val z0 = bz * bs(2)
      val nx = math.min(bs(0), sh(0) - x0); val ny = math.min(bs(1), sh(1) - y0)
      val nz = math.min(bs(2), sh(2) - z0)
      val data = new Array[Float](nx * ny * nz * c)
      var i = 0
      for (x <- 0 until nx; y <- 0 until ny; z <- 0 until nz; ch <- 0 until c) {
        data(i) = dense((((x0 + x) * sh(1) + (y0 + y)) * sh(2) + (z0 + z)) * c + ch)
        i += 1
      }
      Block(BlockIndex(bx, by, bz), nx, ny, nz, c, data)
    }
    val meta = GridMeta(sh.map(_.toLong), bs, Array(0, 0, 0), g, c)
    val s = spark
    (BlockGrid(meta, s.createDataset(tiles)(BlockGrid.blockEncoder)), dense)
  }

  private def check(sh: Array[Int], bs: Array[Int], c: Int, f: Array[Int],
      seed: Int): Unit = {
    val (grid, dense) = randomGrid(sh, bs, c, seed)
    val got = grid.downsample(f)
    val (want, osh) = refPool(dense, sh, c, f)
    assert(got.meta.shape.toSeq == osh.map(_.toLong).toSeq)
    val gotDense = got.collectDense()
    assert(gotDense.length == want.length)
    val bad = gotDense.zip(want).zipWithIndex.filter { case ((a, b), _) => a != b }
    assert(bad.isEmpty, s"${bad.length} mismatches, first: ${bad.headOption}")
  }

  test("divisible geometry, factor 2") {
    check(Array(8, 8, 8), Array(4, 4, 4), 1, Array(2, 2, 2), 1)
  }

  test("trailing-partial cells average actual voxels") {
    check(Array(9, 7, 5), Array(4, 4, 4), 1, Array(2, 2, 2), 2)
  }

  test("anisotropic factor and vector components") {
    check(Array(12, 9, 6), Array(5, 4, 6), 3, Array(2, 3, 1), 3)
  }

  test("irregular source grid rechunks then pools") {
    val (regular, dense) = randomGrid(Array(10, 8, 6), Array(4, 4, 4), 1, 4)
    val irregular = regular.rechunk(Array(Array(3, 5, 2), Array(6, 2), Array(4, 2)))
    val got = irregular.downsample(Array(2, 2, 2))
    val (want, _) = refPool(dense, Array(10, 8, 6), 1, Array(2, 2, 2))
    assert(got.collectDense().toSeq == want.toSeq)
  }

  test("factor 1 is identity") {
    val (grid, dense) = randomGrid(Array(6, 6, 6), Array(3, 3, 3), 1, 5)
    assert(grid.downsample(Array(1, 1, 1)).collectDense().toSeq == dense.toSeq)
  }

  test("two pyramid levels compose") {
    val (grid, dense) = randomGrid(Array(8, 8, 8), Array(4, 4, 4), 1, 6)
    val l2 = grid.downsample(Array(2, 2, 2)).downsample(Array(2, 2, 2))
    val (l1, _) = refPool(dense, Array(8, 8, 8), 1, Array(2, 2, 2))
    val (want, osh) = refPool(l1, Array(4, 4, 4), 1, Array(2, 2, 2))
    assert(l2.meta.shape.toSeq == osh.map(_.toLong).toSeq)
    assert(l2.collectDense().toSeq == want.toSeq)
  }
}
