package graft

import graft.core.{Block, BlockGrid, BlockIndex, GridMeta}
import graft.ndarray.Nd
import graft.stitch.Stitch

/** Validation of the generic halo-exchange primitive
  * [[BlockGrid.mapOverlap]] and the reference-shaped stitch composition
  * [[Stitch.stitchBlocksViaMapOverlap]] (stitch.py:104-121):
  *  - golden parity on all four stitch fixtures,
  *  - path equivalence vs the fused [[Stitch.stitchBlocks]] on random
  *    geometries,
  *  - direct kernel semantics (asymmetric depth, boundary fill,
  *    dense-grid output cardinality).
  */
class MapOverlapSpec extends SparkSpec {

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
    val out = Stitch.stitchBlocksViaMapOverlap(in)
    // dense-grid precondition: every block of the grid must come back
    assert(out.ds.count() == grid(0).toLong * grid(1) * grid(2),
      s"$name: output block count != grid volume")
    val got = out.collectDense()
    val want = Golden.readFloats(s"$name.out.raw")
    assert(got.length == want.length, s"$name: size ${got.length} != ${want.length}")
    val diff = Nd.maxAbsDiff(got, want)
    assert(diff <= 1e-5f, s"$name: max abs diff $diff > 1e-5")
  }

  test("golden: stitch_const via mapOverlap") { runFixture("stitch_const") }
  test("golden: stitch_aniso via mapOverlap") { runFixture("stitch_aniso") }
  test("golden: stitch_rand via mapOverlap") { runFixture("stitch_rand") }
  test("golden: stitch_vec via mapOverlap") { runFixture("stitch_vec") }

  test("property: stitchBlocksViaMapOverlap equals stitchBlocks on random geometries") {
    val r = new scala.util.Random(41)
    def pick(lo: Int, hi: Int) = lo + r.nextInt(hi - lo + 1)
    (1 to 6).foreach { _ =>
      val bs = Array(pick(4, 9), pick(4, 9), pick(4, 9))
      val o = bs.map(b => pick(1, math.max(1, b / 2)))
      val g = Array(pick(1, 3), pick(1, 3), pick(1, 3))
      val c = if (r.nextBoolean()) 1 else 3
      val cs = Array(bs(0) + 2 * o(0), bs(1) + 2 * o(1), bs(2) + 2 * o(2))
      val tiles = for {
        x <- 0 until g(0); y <- 0 until g(1); z <- 0 until g(2)
      } yield Block(BlockIndex(x, y, z), cs(0), cs(1), cs(2), c,
        Array.fill(cs(0) * cs(1) * cs(2) * c)(r.nextFloat() * 4f - 2f))
      val mk = () => BlockGrid.fromTiles(spark, tiles, bs, o, g, c)
      val fused = Stitch.stitchBlocks(mk()).collectDense()
      val viaMo = Stitch.stitchBlocksViaMapOverlap(mk()).collectDense()
      // both paths sum the same float32 pieces; only accumulation order
      // differs, so they agree to float rounding
      val diff = Nd.maxAbsDiff(fused, viaMo)
      assert(diff <= 1e-5f,
        s"bs=${bs.toSeq} o=${o.toSeq} g=${g.toSeq} c=$c: diff $diff")
    }
  }

  test("mapOverlap depth=0 with identity kernel is the identity") {
    val bs = Array(5, 6, 4); val g = Array(2, 1, 3)
    val r = new scala.util.Random(43)
    val tiles = for {
      x <- 0 until g(0); y <- 0 until g(1); z <- 0 until g(2)
    } yield Block(BlockIndex(x, y, z), bs(0), bs(1), bs(2), 1,
      Array.fill(bs(0) * bs(1) * bs(2))(r.nextFloat()))
    val in = BlockGrid.fromTiles(spark, tiles, bs, Array(0, 0, 0), g, 1)
    val out = in.mapOverlap(Array(0, 0, 0), in.meta)(identity).collectDense()
    assert(Nd.maxAbsDiff(out, in.collectDense()) == 0.0f)
  }

  test("mapOverlap asymmetric depth: shift kernel matches dense reference") {
    // kernel reads the extended buffer at offset 0 per axis, i.e. output
    // voxel (x,y,z) = input at global (x-dx, y-dy, z-dz), boundary where
    // that falls off the array — exercises per-axis depth independently
    val bs = Array(4, 5, 6); val g = Array(3, 2, 1)
    val depth = Array(2, 1, 0)
    val bnd = 0.5f
    val sx = bs(0) * g(0); val sy = bs(1) * g(1); val sz = bs(2) * g(2)
    val r = new scala.util.Random(47)
    val dense = Array.fill(sx * sy * sz)(r.nextFloat())
    def at(x: Int, y: Int, z: Int): Float =
      if (x < 0 || y < 0 || z < 0 || x >= sx || y >= sy || z >= sz) bnd
      else dense((x * sy + y) * sz + z)
    val tiles = for {
      bx <- 0 until g(0); by <- 0 until g(1); bz <- 0 until g(2)
    } yield {
      val buf = new Array[Float](bs(0) * bs(1) * bs(2))
      var i = 0
      for (x <- 0 until bs(0); y <- 0 until bs(1); z <- 0 until bs(2)) {
        buf(i) = at(bx * bs(0) + x, by * bs(1) + y, bz * bs(2) + z); i += 1
      }
      Block(BlockIndex(bx, by, bz), bs(0), bs(1), bs(2), 1, buf)
    }
    val in = BlockGrid.fromTiles(spark, tiles, bs, Array(0, 0, 0), g, 1)
    val out = in.mapOverlap(depth, in.meta, boundary = graft.core.Boundary.Constant(bnd)) { b =>
      // extended extent per axis is bs + 2*depth; take the slice starting
      // at offset 0 (not depth) => a +depth shift of the content
      Block(b.bi, bs(0), bs(1), bs(2), 1,
        Nd.sliceCopy(b.data, b.nx, b.ny, b.nz, 1, 0, 0, 0, bs(0), bs(1), bs(2)))
    }.collectDense()
    var worst = 0.0f
    for (x <- 0 until sx; y <- 0 until sy; z <- 0 until sz) {
      val want = at(x - depth(0), y - depth(1), z - depth(2))
      val got = out((x * sy + y) * sz + z)
      worst = math.max(worst, math.abs(want - got))
    }
    assert(worst == 0.0f, s"max abs diff $worst")
  }

  test("mapOverlap boundary modes reflect/nearest/periodic match dense reference") {
    import graft.core.Boundary
    val bs = Array(4, 5, 3); val g = Array(2, 1, 3)
    val depth = Array(2, 2, 1)
    val sx = bs(0) * g(0); val sy = bs(1) * g(1); val sz = bs(2) * g(2)
    val r = new scala.util.Random(67)
    val dense = Array.fill(sx * sy * sz)(r.nextFloat())
    def inD(v: Int, n: Int) = v >= 0 && v < n
    def mapped(mode: Boundary, v: Int, n: Int): Int = mode match {
      case Boundary.Reflect => if (v < 0) -1 - v else if (v >= n) 2 * n - 1 - v else v
      case Boundary.Nearest => math.max(0, math.min(n - 1, v))
      case Boundary.Periodic => Math.floorMod(v, n)
      case Boundary.Constant(_) => v
    }
    def at(mode: Boundary)(x: Int, y: Int, z: Int): Float =
      if (inD(x, sx) && inD(y, sy) && inD(z, sz))
        dense((x * sy + y) * sz + z)
      else mode match {
        case Boundary.Constant(v) => v
        case m =>
          dense((mapped(m, x, sx) * sy + mapped(m, y, sy)) * sz + mapped(m, z, sz))
      }
    val tiles = for {
      bx <- 0 until g(0); by <- 0 until g(1); bz <- 0 until g(2)
    } yield {
      val buf = new Array[Float](bs(0) * bs(1) * bs(2))
      var i = 0
      for (x <- 0 until bs(0); y <- 0 until bs(1); z <- 0 until bs(2)) {
        buf(i) = dense(((bx * bs(0) + x) * sy + (by * bs(1) + y)) * sz + (bz * bs(2) + z))
        i += 1
      }
      Block(BlockIndex(bx, by, bz), bs(0), bs(1), bs(2), 1, buf)
    }
    Seq(Boundary.Reflect, Boundary.Nearest, Boundary.Periodic).foreach { mode =>
      val in = BlockGrid.fromTiles(spark, tiles, bs, Array(0, 0, 0), g, 1)
      // shift kernel (reads the extended buffer at offset 0): every output
      // voxel shows what the halo assembly put at (x-dx, y-dy, z-dz) —
      // including every out-of-domain fill cell
      val out = in.mapOverlap(depth, in.meta, boundary = mode) { b =>
        Block(b.bi, bs(0), bs(1), bs(2), 1,
          Nd.sliceCopy(b.data, b.nx, b.ny, b.nz, 1, 0, 0, 0, bs(0), bs(1), bs(2)))
      }.collectDense()
      var worst = 0.0f
      for (x <- 0 until sx; y <- 0 until sy; z <- 0 until sz) {
        val want = at(mode)(x - depth(0), y - depth(1), z - depth(2))
        worst = math.max(worst, math.abs(want - out((x * sy + y) * sz + z)))
      }
      assert(worst == 0.0f, s"$mode: max abs diff $worst")
    }
  }

  test("mapOverlap NoPad: edge tiles shrink and carry only real data") {
    import graft.core.Boundary
    val bs = Array(4, 5, 3); val g = Array(3, 1, 2)
    val depth = Array(2, 1, 3)
    val sx = bs(0) * g(0); val sy = bs(1) * g(1); val sz = bs(2) * g(2)
    val r = new scala.util.Random(71)
    val dense = Array.fill(sx * sy * sz)(r.nextFloat())
    val tiles = for {
      bx <- 0 until g(0); by <- 0 until g(1); bz <- 0 until g(2)
    } yield {
      val buf = new Array[Float](bs(0) * bs(1) * bs(2))
      var i = 0
      for (x <- 0 until bs(0); y <- 0 until bs(1); z <- 0 until bs(2)) {
        buf(i) = dense(((bx * bs(0) + x) * sy + (by * bs(1) + y)) * sz + (bz * bs(2) + z))
        i += 1
      }
      Block(BlockIndex(bx, by, bz), bs(0), bs(1), bs(2), 1, buf)
    }
    val in = BlockGrid.fromTiles(spark, tiles, bs, Array(0, 0, 0), g, 1)
    val bsL = bs; val gL = g; val depthL = depth
    // kernel asserts the variable extent contract on the executor, then
    // reduces its whole buffer to one sum voxel — pinning extents AND
    // piece offsets against an independently computed dense-slice sum
    val newMeta = GridMeta(Array(g(0).toLong, g(1).toLong, g(2).toLong),
      Array(1, 1, 1), Array(0, 0, 0), g, 1)
    val out = in.mapOverlap(depth, newMeta, Boundary.NoPad) { b =>
      val lo = Array.tabulate(3)(ax => if (b.bi(ax) == 0) 0 else depthL(ax))
      val hi = Array.tabulate(3)(ax => if (b.bi(ax) == gL(ax) - 1) 0 else depthL(ax))
      require(b.nx == bsL(0) + lo(0) + hi(0) && b.ny == bsL(1) + lo(1) + hi(1) &&
        b.nz == bsL(2) + lo(2) + hi(2),
        s"NoPad extents wrong at ${b.bi}: ${b.nx}x${b.ny}x${b.nz}")
      var s = 0.0
      b.data.foreach(s += _)
      Block(b.bi, 1, 1, 1, 1, Array(s.toFloat))
    }.collectDense()
    for (bx <- 0 until g(0); by <- 0 until g(1); bz <- 0 until g(2)) {
      val b = Array(bx, by, bz)
      val loG = Array.tabulate(3)(ax => b(ax) * bs(ax) - (if (b(ax) == 0) 0 else depth(ax)))
      val hiG = Array.tabulate(3)(ax =>
        (b(ax) + 1) * bs(ax) + (if (b(ax) == g(ax) - 1) 0 else depth(ax)))
      var want = 0.0
      for (x <- loG(0) until hiG(0); y <- loG(1) until hiG(1); z <- loG(2) until hiG(2))
        want += dense((x * sy + y) * sz + z)
      val got = out((bx * g(1) + by) * g(2) + bz)
      assert(got == want.toFloat, s"block ($bx,$by,$bz): sum $got != ${want.toFloat}")
    }
  }

  test("mapOverlap box filter with nonzero boundary matches dense reference") {
    val bs = Array(4, 4, 4); val g = Array(2, 2, 2)
    val bnd = -1.5f
    val sx = 8; val sy = 8; val sz = 8
    val r = new scala.util.Random(53)
    val dense = Array.fill(sx * sy * sz)(r.nextFloat())
    def at(x: Int, y: Int, z: Int): Float =
      if (x < 0 || y < 0 || z < 0 || x >= sx || y >= sy || z >= sz) bnd
      else dense((x * sy + y) * sz + z)
    val tiles = for {
      bx <- 0 until 2; by <- 0 until 2; bz <- 0 until 2
    } yield {
      val buf = new Array[Float](64)
      var i = 0
      for (x <- 0 until 4; y <- 0 until 4; z <- 0 until 4) {
        buf(i) = at(bx * 4 + x, by * 4 + y, bz * 4 + z); i += 1
      }
      Block(BlockIndex(bx, by, bz), 4, 4, 4, 1, buf)
    }
    val in = BlockGrid.fromTiles(spark, tiles, bs, Array(0, 0, 0), g, 1)
    val out = in.mapOverlap(Array(1, 1, 1), in.meta,
        boundary = graft.core.Boundary.Constant(bnd)) { b =>
      val ex = b.nx; val ey = b.ny; val ez = b.nz
      val buf = new Array[Float](64)
      var i = 0
      for (x <- 1 to 4; y <- 1 to 4; z <- 1 to 4) {
        var s = 0.0
        for (ddx <- -1 to 1; ddy <- -1 to 1; ddz <- -1 to 1)
          s += b.data(((x + ddx) * ey + (y + ddy)) * ez + (z + ddz))
        buf(i) = (s / 27.0).toFloat; i += 1
      }
      Block(b.bi, 4, 4, 4, 1, buf)
    }.collectDense()
    var worst = 0.0f
    for (x <- 0 until sx; y <- 0 until sy; z <- 0 until sz) {
      var s = 0.0
      for (ddx <- -1 to 1; ddy <- -1 to 1; ddz <- -1 to 1)
        s += at(x + ddx, y + ddy, z + ddz)
      val want = (s / 27.0).toFloat
      worst = math.max(worst, math.abs(want - out((x * sy + y) * sz + z)))
    }
    assert(worst <= 1e-6f, s"max abs diff $worst")
  }
}
