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

  test("rechunk (8,8,8) -> (5,7,3) on a non-divisible domain") {
    // shape 13x11x9: neither geometry divides any axis — partial edge
    // blocks on the input AND output side
    val pg = LocalAffine.positionGrid(spark, Array(13L, 11L, 9L), Array(8, 8, 8))
    val want = pg.collectDense()
    val out = pg.rechunk(Array(5, 7, 3))
    assert(out.ds.count() == 3L * 2 * 3) // ceil(13/5) x ceil(11/7) x ceil(9/3)
    assert(Nd.maxAbsDiff(out.collectDense(), want) == 0.0f)
  }

  test("irregular rechunk: dask's explicit chunk-tuple form") {
    // da.rechunk(chunks=((5,3),(7,2),(3,2))) over an 8x9x5 domain
    val pg = LocalAffine.positionGrid(spark, Array(8L, 9L, 5L), Array(4, 4, 4))
    val want = pg.collectDense()
    val out = pg.rechunk(Array(Array(5, 3), Array(7, 2), Array(3, 2)))
    assert(!out.meta.isRegular)
    assert(out.meta.blockGrid.sameElements(Array(2, 2, 2)))
    assert(out.ds.count() == 8)
    // each block carries exactly its declared irregular extent
    val extents = out.ds.collect().map(b => ((b.bi.bx, b.bi.by, b.bi.bz), (b.nx, b.ny, b.nz))).toMap
    assert(extents((0, 0, 0)) == ((5, 7, 3)))
    assert(extents((1, 1, 1)) == ((3, 2, 2)))
    assert(Nd.maxAbsDiff(out.collectDense(), want) == 0.0f)
  }

  test("irregular source grids rechunk back to uniform (roundtrip)") {
    val r = new scala.util.Random(72)
    def cuts(total: Int): Array[Int] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Int]
      var left = total
      while (left > 0) { val c = 1 + r.nextInt(left); out += c; left -= c }
      out.toArray
    }
    (1 to 3).foreach { _ =>
      val sh = Array(3 + r.nextInt(8), 3 + r.nextInt(8), 3 + r.nextInt(8))
      val pg = LocalAffine.positionGrid(spark, sh.map(_.toLong), Array(4, 4, 4))
      val want = pg.collectDense()
      val irregular = pg.rechunk(Array(cuts(sh(0)), cuts(sh(1)), cuts(sh(2))))
      assert(Nd.maxAbsDiff(irregular.collectDense(), want) == 0.0f)
      // irregular -> irregular, then back to a uniform geometry
      val again = irregular.rechunk(Array(cuts(sh(0)), cuts(sh(1)), cuts(sh(2))))
      val uniform = again.rechunk(Array(2, 3, 2))
      assert(uniform.meta.isRegular)
      assert(Nd.maxAbsDiff(uniform.collectDense(), want) == 0.0f, s"sh=${sh.toSeq}")
    }
  }

  test("irregular chunk spec must sum to the domain shape") {
    val pg = LocalAffine.positionGrid(spark, Array(8L, 8L, 8L), Array(4, 4, 4))
    intercept[IllegalArgumentException] {
      pg.rechunk(Array(Array(5, 2), Array(4, 4), Array(4, 4))) // 5+2 != 8
    }
  }

  test("mapOverlap refuses irregular grids") {
    val pg = LocalAffine.positionGrid(spark, Array(8L, 8L, 8L), Array(4, 4, 4))
    val irr = pg.rechunk(Array(Array(5, 3), Array(4, 4), Array(4, 4)))
    intercept[IllegalArgumentException] {
      irr.mapOverlap(Array(1, 1, 1), irr.meta)(identity)
    }
  }

  test("irregular grid meta roundtrips through the parquet sidecar") {
    val pg = LocalAffine.positionGrid(spark, Array(8L, 9L, 5L), Array(4, 4, 4))
    val irr = pg.rechunk(Array(Array(5, 3), Array(7, 2), Array(3, 2)))
    val dir = java.nio.file.Files.createTempDirectory("graft-irr").toString
    graft.io.BlockIO.write(irr, s"$dir/grid")
    val back = graft.io.BlockIO.read(spark, s"$dir/grid")
    assert(!back.meta.isRegular)
    assert(back.meta.chunks.map(_.toSeq).toSeq == irr.meta.chunks.map(_.toSeq).toSeq)
    assert(Nd.maxAbsDiff(back.collectDense(), pg.collectDense()) == 0.0f)
  }
}
