package graft.affine

import org.apache.spark.sql.{Encoder, SparkSession}
import graft.core.{Block, BlockGrid, BlockIndex, GridMeta}
import graft.ndarray.Nd

/** A small dense grid of per-block affine matrices — the side input of
  * /root/reference/dask_stitch/local_affine.py (shape (gx,gy,gz,4,4) or
  * (gx,gy,gz,3,4); only rows [:3], cols [:3] and [-1] are read,
  * local_affine.py:21-22). Kept float64 like the reference's einsum.
  * Flat layout: m[(((x*gy)+y)*gz + z)*rows*cols + r*cols + col].
  */
final case class AffineGrid(gx: Int, gy: Int, gz: Int, rows: Int, cols: Int, m: Array[Double]) {
  require(m.length == gx.toLong * gy * gz * rows * cols, "affine buffer size mismatch")
  def gridDims: Array[Int] = Array(gx, gy, gz)
  def matOffset(x: Int, y: Int, z: Int): Int = (((x * gy) + y) * gz + z) * rows * cols
}

/** One block's affine matrix as a distributed row — the side-input shape
  * of the join path (at real scale this is read from storage, not built
  * from a driver-held AffineGrid).
  */
final case class BlockAffine(bx: Int, by: Int, bz: Int, rows: Int, cols: Int, m: Array[Double])

/** Dense blended deformation-field synthesis from a grid of local affines —
  * the Spark-native re-expression of local_affine.py:110-139.
  *
  * Physical plan: ZERO shuffles. The coordinate grid is never
  * materialized or rechunked (the reference's meshgrid+rechunk at
  * local_affine.py:11-13 becomes per-executor generation from
  * BlockIndex); the affines ship once via `broadcast` (= `delayed`,
  * local_affine.py:124); each task applies <=27 neighbor affines to its
  * own overlap sub-grids and blends — the reference's
  * recompute-over-communicate design, which is exactly right at scale.
  * Beyond ~10^6 blocks the broadcast should become a join on BlockIndex
  * against a small DataFrame (SURVEY.md §7.5); below that it is ~MBs.
  *
  * Fidelity notes (SURVEY.md §7.5, verified): the seam weighting is NOT a
  * partition of unity — voxels on the higher-index side of each seam sum
  * to (4/3)^d for d seam axes (reversed weight slices,
  * local_affine.py:85-94). Reproduced bug-for-bug. Coordinates are exact
  * Float (not the reference's int16, which overflows >32767 voxels/axis —
  * documented divergence, SURVEY.md §1.2).
  */
object LocalAffine {
  private implicit val blockEnc: Encoder[Block] = BlockGrid.blockEncoder

  /** The merge_neighbors kernel (local_affine.py:33-107) for one block:
    * generates this block's world-space coordinate sub-grid on the fly and
    * accumulates <=27 weighted neighbor affine fields. Neighbor iteration
    * is offset-lexicographic like the reference's itertools.product
    * (local_affine.py:79) so float32 accumulation order matches.
    */
  def mergeNeighbors(
      bi: BlockIndex,
      bs: Array[Int],
      grid: Array[Int],
      spacing: Array[Float],
      affines: AffineGrid,
      overlap: Array[Int],
      displacement: Boolean): Array[Float] =
    mergeNeighborsLookup(bi, bs, grid, spacing,
      (x, y, z) => (affines.m, affines.matOffset(x, y, z)), affines.cols,
      overlap, displacement)

  /** Kernel body parameterized over the affine source: `affAt` returns
    * (matrix buffer, offset) for an in-grid block index. The broadcast
    * path closes over the whole AffineGrid; the join path closes over the
    * ≤27 shuffled neighbor rows. Neighbor iteration order is identical in
    * both, so the float32 accumulation (and hence the output) is
    * bit-identical — pinned by AffineJoinPathSpec.
    */
  def mergeNeighborsLookup(
      bi: BlockIndex,
      bs: Array[Int],
      grid: Array[Int],
      spacing: Array[Float],
      affAt: (Int, Int, Int) => (Array[Double], Int),
      cols: Int,
      overlap: Array[Int],
      displacement: Boolean): Array[Float] = {
    val nx = bs(0); val ny = bs(1); val nz = bs(2)
    val out = new Array[Float](nx * ny * nz * 3)
    val prof = Array.tabulate(3) { ax =>
      Nd.affineProfile(bs(ax), overlap(ax), bi(ax) == 0, bi(ax) == grid(ax) - 1)
    }
    val start = Array(bi.bx * nx, bi.by * ny, bi.bz * nz)

    // Per-axis slice descriptor for neighbor offset `no`: block-local range
    // [b0, b0+len) plus the weight-profile index per position — mirrors
    // local_affine.py:85-94 exactly, including the slice REVERSAL that
    // causes the (4/3)^d seam quirk.
    def axisSlices(ax: Int, no: Int): (Int, Array[Int]) = {
      val o = overlap(ax); val b = bs(ax); val wlen = prof(ax).length
      no match {
        case -1 => (0, Array.tabulate(o)(i => o - i)) // ws = slice(o, 0, -1)
        case 1 => (b - o, Array.tabulate(o)(i => wlen - 1 - i)) // slice(-1,-o-1,-1)
        case _ => (0, Array.tabulate(b)(i => o + i)) // slice(o, -o)
      }
    }

    var nox = -1
    while (nox <= 1) {
      var noy = -1
      while (noy <= 1) {
        var noz = -1
        while (noz <= 1) {
          val ix = bi.bx + nox; val iy = bi.by + noy; val iz = bi.bz + noz
          if (ix >= 0 && iy >= 0 && iz >= 0 &&
              ix < grid(0) && iy < grid(1) && iz < grid(2)) {
            val (m, mOff) = affAt(ix, iy, iz)
            val (x0, wsx) = axisSlices(0, nox)
            val (y0, wsy) = axisSlices(1, noy)
            val (z0, wsz) = axisSlices(2, noz)
            val wxp = prof(0); val wyp = prof(1); val wzp = prof(2)
            var i = 0
            while (i < wsx.length) {
              val gxv = (start(0) + x0 + i).toFloat * spacing(0)
              val px = gxv.toDouble
              val wxv = wxp(wsx(i))
              var j = 0
              while (j < wsy.length) {
                val gyv = (start(1) + y0 + j).toFloat * spacing(1)
                val py = gyv.toDouble
                val wxy = wxv * wyp(wsy(j))
                var k = 0
                while (k < wsz.length) {
                  val gzv = (start(2) + z0 + k).toFloat * spacing(2)
                  val pz = gzv.toDouble
                  val w = wxy * wzp(wsz(k))
                  // affine_to_field (local_affine.py:16-30): rows [:3],
                  // translation = last column; double math like einsum
                  var rx = m(mOff) * px + m(mOff + 1) * py + m(mOff + 2) * pz + m(mOff + cols - 1)
                  var ry = m(mOff + cols) * px + m(mOff + cols + 1) * py + m(mOff + cols + 2) * pz + m(mOff + 2 * cols - 1)
                  var rz = m(mOff + 2 * cols) * px + m(mOff + 2 * cols + 1) * py + m(mOff + 2 * cols + 2) * pz + m(mOff + 3 * cols - 1)
                  if (displacement) { rx -= px; ry -= py; rz -= pz }
                  val di = ((((x0 + i) * ny) + (y0 + j)) * nz + (z0 + k)) * 3
                  out(di) += (rx * w).toFloat
                  out(di + 1) += (ry * w).toFloat
                  out(di + 2) += (rz * w).toFloat
                  k += 1
                }
                j += 1
              }
              i += 1
            }
          }
          noz += 1
        }
        noy += 1
      }
      nox += 1
    }
    out
  }

  /** Above this many blocks the in-memory AffineGrid is no longer
    * broadcast; the affines become a distributed Dataset and the field is
    * built by the one-shuffle join path (SURVEY.md §7.5). At 128 B/matrix
    * 2^20 blocks ≈ 134 MB — past the comfortable broadcast envelope.
    */
  val BroadcastMaxBlocks: Long = 1L << 20

  /** Top-level field synthesis (local_affine.py:110-139): generated grid ->
    * broadcast affines -> per-block kernel -> crop to `shape`. Zero
    * shuffles; one broadcast; blocks generated from `spark.range`. Beyond
    * `maxBroadcastBlocks` affines, dispatches to the join path
    * ([[localAffinesToFieldJoin]]) instead of broadcasting — both paths
    * produce bit-identical output (AffineJoinPathSpec).
    */
  def localAffinesToField(
      spark: SparkSession,
      shape: Array[Long],
      spacing: Array[Float],
      affines: AffineGrid,
      blocksize: Array[Int],
      overlap: Array[Int],
      displacement: Boolean = true,
      maxBroadcastBlocks: Long = BroadcastMaxBlocks): BlockGrid = {
    val grid = affines.gridDims
    val bs = blocksize.clone()
    requireValidOverlap(bs, overlap)
    val meta = GridMeta(shape.clone(), bs, Array(0, 0, 0), grid.clone(), components = 3)
    val nBlocks = meta.numBlocks
    if (nBlocks > maxBroadcastBlocks) {
      // too big to broadcast: ship the affines as a Dataset and join.
      // (An AffineGrid that exists in driver memory is by definition still
      // parallelizable; the true at-scale entry point is the Dataset
      // overload below, fed from storage.)
      implicit val affEnc: Encoder[BlockAffine] = org.apache.spark.sql.Encoders.product[BlockAffine]
      val rows4 = affines.rows; val cols4 = affines.cols
      val affDs = spark.createDataset(
        (for {
          x <- 0 until grid(0); y <- 0 until grid(1); z <- 0 until grid(2)
        } yield {
          val off = affines.matOffset(x, y, z)
          BlockAffine(x, y, z, rows4, cols4,
            java.util.Arrays.copyOfRange(affines.m, off, off + rows4 * cols4))
        }).toSeq)
      return localAffinesToFieldJoin(
        spark, shape, spacing, affDs, grid, blocksize, overlap, displacement)
    }
    val bAff = spark.sparkContext.broadcast(affines)
    val sp = spacing.clone()
    val ov = overlap.clone()
    val g = grid.clone()
    val sh = shape.clone()

    import spark.implicits._
    val ds = spark.range(0, nBlocks, 1, math.min(nBlocks, spark.sparkContext.defaultParallelism * 2).toInt)
      .as[Long]
      .map { i => BlockIndex.fromLinear(i, g) }(org.apache.spark.sql.Encoders.product[BlockIndex])
      // keep only blocks intersecting the requested shape (crop,
      // local_affine.py:136 — padded domain minus out-of-range blocks)
      .filter { bi: BlockIndex =>
        bi.bx.toLong * bs(0) < sh(0) && bi.by.toLong * bs(1) < sh(1) && bi.bz.toLong * bs(2) < sh(2)
      }
      .map { bi =>
        val full = mergeNeighbors(bi, bs, g, sp, bAff.value, ov, displacement)
        Block(bi, bs(0), bs(1), bs(2), 3, full)
      }(blockEnc)
      .map(cropBlock(_, bs, sh))(blockEnc)
    BlockGrid(meta, ds)
  }

  /** INCREMENTAL FIELD RECOMPUTE — a local affine was re-estimated:
    * [[mergeNeighbors]] reads only a block's ≤27 neighbor affines, so a
    * changed affine at grid coordinate (x,y,z) can only alter field
    * blocks in its 1-neighborhood. Recomputes exactly those blocks with
    * the identical kernel on the identical inputs — bit-identical to
    * re-running [[localAffinesToField]] (RefieldSpec) at work
    * proportional to the change, not the volume. Callers overwrite the
    * returned blocks in the stored field.
    */
  def refieldBlocks(
      spark: SparkSession,
      shape: Array[Long],
      spacing: Array[Float],
      affines: AffineGrid,
      blocksize: Array[Int],
      overlap: Array[Int],
      changed: Seq[BlockIndex],
      displacement: Boolean = true): BlockGrid = {
    require(changed.nonEmpty, "refield needs at least one changed affine")
    val grid = affines.gridDims
    val bs = blocksize.clone()
    requireValidOverlap(bs, overlap)
    val meta = GridMeta(shape.clone(), bs, Array(0, 0, 0), grid.clone(), components = 3)
    val sh = shape.clone(); val sp = spacing.clone(); val ov = overlap.clone()
    val g = grid.clone()
    val affected = changed.flatMap { bi =>
      for {
        dx <- -1 to 1; dy <- -1 to 1; dz <- -1 to 1
        x = bi.bx + dx; y = bi.by + dy; z = bi.bz + dz
        if x >= 0 && y >= 0 && z >= 0 && x < g(0) && y < g(1) && z < g(2)
        // the crop filter of the full path
        if x.toLong * bs(0) < sh(0) && y.toLong * bs(1) < sh(1) &&
          z.toLong * bs(2) < sh(2)
      } yield BlockIndex(x, y, z)
    }.distinct.sortBy(bi => (bi.bx, bi.by, bi.bz))
    val bAff = spark.sparkContext.broadcast(affines)
    import spark.implicits._
    implicit val biEnc: Encoder[BlockIndex] =
      org.apache.spark.sql.Encoders.product[BlockIndex]
    val ds = spark.createDataset(affected)
      .repartition(math.min(affected.size,
        spark.sparkContext.defaultParallelism).max(1))
      .map { bi =>
        val full = mergeNeighbors(bi, bs, g, sp, bAff.value, ov, displacement)
        Block(bi, bs(0), bs(1), bs(2), 3, full)
      }(blockEnc)
      .map(cropBlock(_, bs, sh))(blockEnc)
    BlockGrid(meta, ds)
  }

  /** Join-path field synthesis for affine grids too large to broadcast:
    * each affine row is flatMapped to its ≤27 neighbor target blocks,
    * grouped by target (ONE shuffle, hash-partitioned on the uniform
    * BlockIndex — the stitch plan's shape), and the same kernel runs over
    * the assembled neighborhood. Shuffle volume = 27×(affine rows) ≈
    * 3.5 KB/block — negligible next to the emitted field. Accumulation
    * order is identical to the broadcast path, so output is bit-identical.
    */
  def localAffinesToFieldJoin(
      spark: SparkSession,
      shape: Array[Long],
      spacing: Array[Float],
      affines: org.apache.spark.sql.Dataset[BlockAffine],
      grid: Array[Int],
      blocksize: Array[Int],
      overlap: Array[Int],
      displacement: Boolean = true): BlockGrid = {
    val bs = blocksize.clone()
    requireValidOverlap(bs, overlap)
    val meta = GridMeta(shape.clone(), bs, Array(0, 0, 0), grid.clone(), components = 3)
    val sp = spacing.clone()
    val ov = overlap.clone()
    val g = grid.clone()
    val sh = shape.clone()
    implicit val pieceEnc: Encoder[(Int, Int, Int, BlockAffine)] =
      org.apache.spark.sql.Encoders.product[(Int, Int, Int, BlockAffine)]
    implicit val keyEnc: Encoder[(Int, Int, Int)] =
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaInt,
        org.apache.spark.sql.Encoders.scalaInt,
        org.apache.spark.sql.Encoders.scalaInt)
    val pieces = affines.flatMap { a =>
      val src = BlockIndex(a.bx, a.by, a.bz)
      val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int, BlockAffine)]
      var dx = -1
      while (dx <= 1) {
        var dy = -1
        while (dy <= 1) {
          var dz = -1
          while (dz <= 1) {
            val t = src + ((dx, dy, dz))
            // target must be in-grid AND intersect the cropped shape
            if (t.inGrid(g) &&
                t.bx.toLong * bs(0) < sh(0) && t.by.toLong * bs(1) < sh(1) &&
                t.bz.toLong * bs(2) < sh(2))
              out += ((t.bx, t.by, t.bz, a))
            dz += 1
          }
          dy += 1
        }
        dx += 1
      }
      out.toSeq
    }
    val ds = pieces
      .groupByKey(p => (p._1, p._2, p._3))
      .mapGroups { (key, it) =>
        val bi = BlockIndex(key._1, key._2, key._3)
        val nbrs = it.map(p => ((p._4.bx, p._4.by, p._4.bz), p._4)).toMap
        var cols = 4
        nbrs.headOption.foreach(h => cols = h._2.cols)
        val affAt = (x: Int, y: Int, z: Int) => { val a = nbrs((x, y, z)); (a.m, 0) }
        val full = mergeNeighborsLookup(bi, bs, g, sp, affAt, cols, ov, displacement)
        cropBlock(Block(bi, bs(0), bs(1), bs(2), 3, full), bs, sh)
      }
    BlockGrid(meta, ds)
  }

  /** Voxel coordinate grid — reference parity with `position_grid`
    * (local_affine.py:7-13): block (bx,by,bz) holds each voxel's global
    * index per axis as a 3-component field, generated per executor (zero
    * shuffles, nothing materialized driver-side). Divergence from the
    * reference (documented, SURVEY.md §1.2): coordinates are float32,
    * not the reference's int16, which silently overflows beyond 32767
    * voxels per axis — a 100 TB array is far past that.
    */
  def positionGrid(
      spark: SparkSession,
      shape: Array[Long],
      blocksize: Array[Int]): BlockGrid = {
    val bs = blocksize.clone()
    val sh = shape.clone()
    val g = Array.tabulate(3)(ax => ((sh(ax) + bs(ax) - 1) / bs(ax)).toInt)
    val meta = GridMeta(sh, bs, Array(0, 0, 0), g, components = 3)
    val nBlocks = meta.numBlocks
    import spark.implicits._
    val ds = spark.range(0, nBlocks, 1, math.min(nBlocks, spark.sparkContext.defaultParallelism * 2).toInt)
      .as[Long]
      .map { i =>
        val bi = BlockIndex.fromLinear(i, g)
        val ex = math.min(bs(0).toLong, sh(0) - bi.bx.toLong * bs(0)).toInt
        val ey = math.min(bs(1).toLong, sh(1) - bi.by.toLong * bs(1)).toInt
        val ez = math.min(bs(2).toLong, sh(2) - bi.bz.toLong * bs(2)).toInt
        val data = new Array[Float](ex * ey * ez * 3)
        var di = 0
        var x = 0
        while (x < ex) {
          var y = 0
          while (y < ey) {
            var z = 0
            while (z < ez) {
              data(di) = (bi.bx.toLong * bs(0) + x).toFloat
              data(di + 1) = (bi.by.toLong * bs(1) + y).toFloat
              data(di + 2) = (bi.bz.toLong * bs(2) + z).toFloat
              di += 3
              z += 1
            }
            y += 1
          }
          x += 1
        }
        Block(bi, ex, ey, ez, 3, data)
      }(blockEnc)
    BlockGrid(meta, ds)
  }

  private def requireValidOverlap(bs: Array[Int], overlap: Array[Int]): Unit =
    (0 until 3).foreach { ax =>
      // ramp core bs - (2o-1) + 1 must be non-negative and neighbor slices
      // at most a full block wide (beyond that the reference errors)
      require(overlap(ax) >= 0 && overlap(ax) <= bs(ax) &&
          math.max(0, 2 * overlap(ax) - 1) <= bs(ax) + 1,
        s"invalid overlap ${overlap(ax)} for blocksize ${bs(ax)} on axis $ax")
    }

  /** Trim a full-size block to the cropped output shape. */
  private def cropBlock(b: Block, bs: Array[Int], sh: Array[Long]): Block = {
    val ex = math.min(bs(0).toLong, sh(0) - b.bi.bx.toLong * bs(0)).toInt
    val ey = math.min(bs(1).toLong, sh(1) - b.bi.by.toLong * bs(1)).toInt
    val ez = math.min(bs(2).toLong, sh(2) - b.bi.bz.toLong * bs(2)).toInt
    if (ex == bs(0) && ey == bs(1) && ez == bs(2)) b
    else Block(b.bi, ex, ey, ez, 3,
      Nd.sliceCopy(b.data, bs(0), bs(1), bs(2), 3, 0, 0, 0, ex, ey, ez))
  }
}
