package graft

import graft.affine.{AffineGrid, LocalAffine}
import graft.core.{Block, BlockGrid, BlockIndex}
import graft.ndarray.Nd
import graft.stitch.Stitch

/** Property tests from SURVEY.md §5.2 (a)–(g): invariants of the
  * reference semantics that must hold for ALL geometries, not just the
  * golden fixtures.
  */
class StitchPropertySpec extends SparkSpec {

  /** deterministic random geometries (seeded — reproducible failures) */
  private def geoms(seed: Int, n: Int): Seq[(Array[Int], Array[Int], Array[Int])] = {
    val r = new scala.util.Random(seed)
    def pick(lo: Int, hi: Int) = lo + r.nextInt(hi - lo + 1)
    Seq.fill(n) {
      val bs = Array(pick(4, 10), pick(4, 10), pick(4, 10))
      val o = bs.map(b => pick(1, math.max(1, b / 2 - 1)))
      val g = Array(pick(1, 3), pick(1, 3), pick(1, 3))
      (bs, o, g)
    }
  }

  private def constGrid(bs: Array[Int], o: Array[Int], g: Array[Int], v: Float): BlockGrid = {
    val cs = Array(bs(0) + 2 * o(0), bs(1) + 2 * o(1), bs(2) + 2 * o(2))
    val tiles = for {
      x <- 0 until g(0); y <- 0 until g(1); z <- 0 until g(2)
    } yield Block(BlockIndex(x, y, z), cs(0), cs(1), cs(2), 1,
      Array.fill(cs(0) * cs(1) * cs(2))(v))
    BlockGrid.fromTiles(spark, tiles, bs, o, g, 1)
  }

  test("(a) partition of unity: stitching constant-c tiles returns c everywhere") {
    val rv = new scala.util.Random(21)
    geoms(17, 8).foreach { case (bs, o, g) =>
      val v = rv.nextFloat() * 10f - 5f
      val out = Stitch.stitchBlocks(constGrid(bs, o, g, v)).collectDense()
      assert(out.forall(x => math.abs(x - v) <= 2e-5f * math.max(1f, math.abs(v))),
        s"bs=${bs.toSeq} o=${o.toSeq} g=${g.toSeq} v=$v")
    }
  }

  test("(b) single-block grid acts as identity on the core") {
    geoms(23, 4).foreach { case (bs, o, _) =>
      val g = Array(1, 1, 1)
      val cs = Array(bs(0) + 2 * o(0), bs(1) + 2 * o(1), bs(2) + 2 * o(2))
      val rnd = new scala.util.Random(7)
      val data = Array.fill(cs(0) * cs(1) * cs(2))(rnd.nextFloat())
      val tile = Block(BlockIndex(0, 0, 0), cs(0), cs(1), cs(2), 1, data)
      val out = Stitch.stitchBlocks(BlockGrid.fromTiles(spark, Seq(tile), bs, o, g, 1))
        .collectDense()
      // single block, all faces are domain boundaries: weights are 1 on the
      // whole tile; output = central bs region of the tile
      val want = Nd.sliceCopy(data, cs(0), cs(1), cs(2), 1, o(0), o(1), o(2), bs(0), bs(1), bs(2))
      assert(Nd.maxAbsDiff(out, want) <= 1e-6f)
    }
  }

  test("(c) linearity: stitch(aX + bY) = a*stitch(X) + b*stitch(Y)") {
    val bs = Array(6, 6, 6); val o = Array(2, 2, 2); val g = Array(2, 2, 2)
    val cs = Array(10, 10, 10)
    val rnd = new scala.util.Random(11)
    def tiles(seed: Int) = {
      val r = new scala.util.Random(seed)
      (for {
        x <- 0 until 2; y <- 0 until 2; z <- 0 until 2
      } yield Block(BlockIndex(x, y, z), 10, 10, 10, 1,
        Array.fill(1000)(r.nextFloat()))).toSeq
    }
    val tx = tiles(1); val ty = tiles(2)
    val a = 2.5f; val b = -1.25f
    val mixed = tx.zip(ty).map { case (p, q) =>
      p.copy(data = p.data.zip(q.data).map { case (u, v) => a * u + b * v })
    }
    val sx = Stitch.stitchBlocks(BlockGrid.fromTiles(spark, tx, bs, o, g, 1)).collectDense()
    val sy = Stitch.stitchBlocks(BlockGrid.fromTiles(spark, ty, bs, o, g, 1)).collectDense()
    val sm = Stitch.stitchBlocks(BlockGrid.fromTiles(spark, mixed, bs, o, g, 1)).collectDense()
    val combo = sx.zip(sy).map { case (u, v) => a * u + b * v }
    assert(Nd.maxAbsDiff(sm, combo) <= 1e-4f)
  }

  test("(d) identity affines + displacement=true give exactly zero field") {
    val rg = new scala.util.Random(29)
    Seq.fill(4)((1 + rg.nextInt(3), 1 + rg.nextInt(3), 1 + rg.nextInt(3))).foreach { case (gx, gy, gz) =>
      val m = Array.tabulate(gx * gy * gz)(_ =>
        Array(1.0, 0, 0, 0, 0, 1.0, 0, 0, 0, 0, 1.0, 0, 0, 0, 0, 1.0)).flatten
      val aff = AffineGrid(gx, gy, gz, 4, 4, m)
      val shape = Array(6L * gx, 6L * gy, 6L * gz)
      val out = LocalAffine.localAffinesToField(
        spark, shape, Array(1f, 2f, 0.5f), aff, Array(6, 6, 6), Array(2, 2, 2), displacement = true)
        .collectDense()
      assert(out.forall(_ == 0.0f))
    }
  }

  test("(e) quirk invariant: uniform translation inflates seams by (4/3)^d") {
    // 2x2x2 grid, +1 x-translation: interior corner voxels see weight sum
    // (4/3)^3 = 2.370 (reference local_affine.py:85-94 reversed slices)
    val m = Array.tabulate(8)(_ =>
      Array(1.0, 0, 0, 1.0, 0, 1.0, 0, 0, 0, 0, 1.0, 0, 0, 0, 0, 1.0)).flatten
    val aff = AffineGrid(2, 2, 2, 4, 4, m)
    val out = LocalAffine.localAffinesToField(
      spark, Array(12L, 12L, 12L), Array(1f, 1f, 1f), aff, Array(6, 6, 6), Array(2, 2, 2))
      .collectDense()
    val dx = out.indices.collect { case i if i % 3 == 0 => out(i) }
    assert(math.abs(dx.max - math.pow(4.0 / 3.0, 3)) < 1e-3)
    assert(math.abs(dx.min - 1.0f) < 1e-6) // core keeps exact weight 1
  }

  test("(e2) overlap=1 degenerates to seam weight sum 2") {
    val m = Array.tabulate(2)(_ =>
      Array(1.0, 0, 0, 1.0, 0, 1.0, 0, 0, 0, 0, 1.0, 0, 0, 0, 0, 1.0)).flatten
    val aff = AffineGrid(2, 1, 1, 4, 4, m)
    val out = LocalAffine.localAffinesToField(
      spark, Array(8L, 4L, 4L), Array(1f, 1f, 1f), aff, Array(4, 4, 4), Array(1, 1, 1))
      .collectDense()
    val dx = out.indices.collect { case i if i % 3 == 0 => out(i) }
    assert(math.abs(dx.max - 2.0f) < 1e-6)
  }

  test("(f) crop to shape smaller than the padded domain") {
    val m = Array.tabulate(8)(_ =>
      Array(1.0, 0, 0, 0.5, 0, 1.0, 0, 0, 0, 0, 1.0, 0, 0, 0, 0, 1.0)).flatten
    val aff = AffineGrid(2, 2, 2, 4, 4, m)
    val full = LocalAffine.localAffinesToField(
      spark, Array(12L, 12L, 12L), Array(1f, 1f, 1f), aff, Array(6, 6, 6), Array(2, 2, 2))
      .collectDense()
    val shape = Array(7L, 9L, 5L)
    val cropped = LocalAffine.localAffinesToField(
      spark, shape, Array(1f, 1f, 1f), aff, Array(6, 6, 6), Array(2, 2, 2))
      .collectDense()
    assert(cropped.length == 7 * 9 * 5 * 3)
    // cropped values = full values at the same coordinates
    var ok = true
    for (x <- 0 until 7; y <- 0 until 9; z <- 0 until 5; k <- 0 until 3) {
      val c = cropped((((x * 9) + y) * 5 + z) * 3 + k)
      val f = full((((x * 12) + y) * 12 + z) * 3 + k)
      if (c != f) ok = false
    }
    assert(ok)
  }

  test("weightBlock (reference-shaped kernel) agrees with the fused weighted slice") {
    // weightBlock is the documentation-grade form of the weighting; the
    // production path fuses the multiply into piece extraction. Pin their
    // equivalence so they can never diverge silently.
    val bs = Array(6, 7, 8); val o = Array(2, 3, 2); val g = Array(2, 2, 2)
    val cs = Array(10, 13, 12)
    val rnd = new scala.util.Random(31)
    val meta = graft.core.GridMeta(
      Array(12L, 14L, 16L), bs, o, g, 1)
    val tile = Block(BlockIndex(1, 0, 1), cs(0), cs(1), cs(2), 1,
      Array.fill(cs(0) * cs(1) * cs(2))(rnd.nextFloat()))
    val weighted = Stitch.weightBlock(tile, meta)
    val wx = Nd.stitchProfile(bs(0), o(0), isLo = false, isHi = true)
    val wy = Nd.stitchProfile(bs(1), o(1), isLo = true, isHi = false)
    val wz = Nd.stitchProfile(bs(2), o(2), isLo = false, isHi = true)
    val fused = Nd.sliceCopyWeighted(tile.data, cs(0), cs(1), cs(2), 1,
      0, 0, 0, cs(0), cs(1), cs(2), wx, wy, wz)
    assert(Nd.maxAbsDiff(weighted.data, fused) == 0.0f)
  }

  test("stitch rejects overlap out of the reference's valid range") {
    val cs = Array(12, 12, 12)
    val tiles = Seq(Block(BlockIndex(0, 0, 0), cs(0), cs(1), cs(2), 1,
      new Array[Float](cs(0) * cs(1) * cs(2))))
    val bad = BlockGrid.fromTiles(spark, tiles, Array(4, 4, 4), Array(4, 4, 4), Array(1, 1, 1), 1)
    intercept[IllegalArgumentException] { Stitch.stitchBlocks(bad) }
  }

  test("(g) vector-field stitch equals per-component scalar stitch") {
    val bs = Array(6, 6, 6); val o = Array(2, 2, 2); val g = Array(2, 1, 2)
    val rnd = new scala.util.Random(13)
    val vecTiles = for {
      x <- 0 until 2; y <- 0 until 1; z <- 0 until 2
    } yield Block(BlockIndex(x, y, z), 10, 10, 10, 3,
      Array.fill(3000)(rnd.nextFloat()))
    val vecOut = Stitch.stitchBlocks(BlockGrid.fromTiles(spark, vecTiles, bs, o, g, 3))
      .collectDense()
    for (comp <- 0 until 3) {
      val scalarTiles = vecTiles.map { b =>
        b.copy(c = 1, data = b.data.indices.collect {
          case i if i % 3 == comp => b.data(i)
        }.toArray)
      }
      val sOut = Stitch.stitchBlocks(BlockGrid.fromTiles(spark, scalarTiles, bs, o, g, 1))
        .collectDense()
      val vComp = vecOut.indices.collect { case i if i % 3 == comp => vecOut(i) }.toArray
      assert(Nd.maxAbsDiff(sOut, vComp) <= 1e-6f, s"component $comp")
    }
  }
}
