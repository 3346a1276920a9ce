package graft.stitch

import org.apache.spark.sql.{Encoder, Encoders}
import graft.core.{Block, BlockGrid, BlockIndex, GridMeta}
import graft.ndarray.Nd

/** One halo fragment in flight: source tile data destined for target block
  * (tx,ty,tz), to be added at offset (x0,y0,z0) with extent (dx,dy,dz).
  * `srcKey` is the source block's linear index — groups sort on it before
  * summing so float32 accumulation order is deterministic run-to-run
  * (SURVEY.md §7.5).
  */
final case class HaloPiece(
    tx: Int, ty: Int, tz: Int,
    srcKey: Long,
    x0: Int, y0: Int, z0: Int,
    dx: Int, dy: Int, dz: Int,
    data: Array[Float])

/** Linear-blend stitching of overlapping tiles — the Spark-native
  * re-expression of /root/reference/dask_stitch/stitch.py.
  *
  * Semantics (verified against the reference, SURVEY.md §2a #1-4): each
  * input tile of extent blocksize+2*overlap is multiplied by a separable
  * ramp weight tensor, then every weighted tile is conceptually placed at
  * global offset (bi*blocksize - overlap) and overlapping contributions
  * are summed. The weights form an exact partition of unity, so constant
  * tiles stitch to the same constant. Output chunks are exactly
  * `blocksize` (stitch.py:120).
  *
  * Physical plan: one narrow `map` (weighting, codegen-fused) + ONE
  * shuffle: a 27-way `flatMap` keyed by target block, `groupByKey`,
  * `mapGroups` assemble-and-sum. Shuffle volume = output volume + the
  * halo fraction — never a second exchange. At 100 TB this is the only
  * all-to-all and it hash-partitions uniformly on BlockIndex (uniform
  * block sizes → no skew; AQE has nothing to fix).
  */
object Stitch {
  private implicit val blockEnc: Encoder[Block] = BlockGrid.blockEncoder
  private implicit val pieceEnc: Encoder[HaloPiece] = Encoders.product[HaloPiece]
  private implicit val keyEnc: Encoder[(Int, Int, Int)] =
    Encoders.tuple(Encoders.scalaInt, Encoders.scalaInt, Encoders.scalaInt)

  /** Apply the per-tile separable blend weights (stitch.py:7-46). Pure
    * per-row kernel; no data movement.
    */
  def weightBlock(b: Block, meta: GridMeta): Block = {
    val bs = meta.blocksize; val o = meta.overlap; val g = meta.blockGrid
    val wx = Nd.stitchProfile(bs(0), o(0), b.bi.bx == 0, b.bi.bx == g(0) - 1)
    val wy = Nd.stitchProfile(bs(1), o(1), b.bi.by == 0, b.bi.by == g(1) - 1)
    val wz = Nd.stitchProfile(bs(2), o(2), b.bi.bz == 0, b.bi.bz == g(2) - 1)
    val out = b.data.clone()
    Nd.mulSeparable(out, b.nx, b.ny, b.nz, b.c, wx, wy, wz)
    b.copy(data = out)
  }

  /** The narrow phase of the stitch: weight each tile and emit its ≤27
    * destination-keyed halo pieces (exposed separately so benchmarks can
    * time the map phase against the shuffle+merge phase).
    */
  def emitPieces(grid: BlockGrid): org.apache.spark.sql.Dataset[HaloPiece] = {
    val meta = grid.meta
    grid.ds.flatMap(b => piecesOf(b, meta))
  }

  /** per-tile piece emission (pure) — the kernel behind [[emitPieces]],
    * shared with the streaming stitch so both paths weight and slice
    * identically
    */
  private[graft] def piecesOf(b: Block, meta: GridMeta): Seq[HaloPiece] = {
    val bs = meta.blocksize; val o = meta.overlap; val g = meta.blockGrid
    val c = meta.components
    locally {
      // weights are applied DURING piece extraction (fused multiply —
      // no full-tile clone); profiles are per-axis, tile-absolute
      val src = b.bi
      val wx = Nd.stitchProfile(bs(0), o(0), src.bx == 0, src.bx == g(0) - 1)
      val wy = Nd.stitchProfile(bs(1), o(1), src.by == 0, src.by == g(1) - 1)
      val wz = Nd.stitchProfile(bs(2), o(2), src.bz == 0, src.bz == g(2) - 1)
      val out = scala.collection.mutable.ArrayBuffer.empty[HaloPiece]
      var dx = -1
      while (dx <= 1) {
        var dy = -1
        while (dy <= 1) {
          var dz = -1
          while (dz <= 1) {
            val tgt = src + ((dx, dy, dz))
            if (tgt.inGrid(g)) {
              // global intersection of tile support [src*bs - o, src*bs + bs + o)
              // with target output region [tgt*bs, tgt*bs + bs), per axis
              var ok = true
              val off = new Array[Int](3) // offset within target block
              val sOff = new Array[Int](3) // offset within source tile
              val ext = new Array[Int](3)
              var ax = 0
              while (ax < 3 && ok) {
                val sLo = src(ax).toLong * bs(ax) - o(ax)
                val sHi = sLo + bs(ax) + 2 * o(ax)
                val tLo = tgt(ax).toLong * bs(ax)
                val tHi = tLo + bs(ax)
                val lo = math.max(sLo, tLo); val hi = math.min(sHi, tHi)
                if (hi <= lo) ok = false
                else {
                  off(ax) = (lo - tLo).toInt
                  sOff(ax) = (lo - sLo).toInt
                  ext(ax) = (hi - lo).toInt
                }
                ax += 1
              }
              if (ok) {
                val patch = Nd.sliceCopyWeighted(
                  b.data, b.nx, b.ny, b.nz, c,
                  sOff(0), sOff(1), sOff(2), ext(0), ext(1), ext(2), wx, wy, wz)
                out += HaloPiece(
                  tgt.bx, tgt.by, tgt.bz, src.linear(g),
                  off(0), off(1), off(2), ext(0), ext(1), ext(2), patch)
              }
            }
            dz += 1
          }
          dy += 1
        }
        dx += 1
      }
      out.toSeq
    }
  }

  /** deterministic assembly of one output block from its halo pieces
    * (srcKey-sorted f32 accumulation) — shared by [[stitchBlocks]] and
    * the streaming stitch so both produce bit-identical blocks
    */
  private[graft] def assembleBlock(tx: Int, ty: Int, tz: Int,
      pieces: Iterable[HaloPiece], meta: GridMeta): Block = {
    val bs = meta.blocksize; val c = meta.components
    val acc = new Array[Float](bs(0) * bs(1) * bs(2) * c)
    pieces.toArray.sortBy(_.srcKey).foreach { p =>
      Nd.addInto(acc, bs(0), bs(1), bs(2), c, p.data, p.x0, p.y0, p.z0, p.dx, p.dy, p.dz)
    }
    Block(BlockIndex(tx, ty, tz), bs(0), bs(1), bs(2), c, acc)
  }

  /** Full stitch pipeline: weight -> halo exchange -> per-block sum.
    * Input chunks must be blocksize + 2*overlap per axis; output chunks
    * are exactly blocksize (the verified contract of stitch.py:94-121).
    */
  /** Bounds per axis: o >= 1 (ramps are 2o-1 long); 2o <= bs (the ramp
    * core bs-2o+2 must stay positive AND tile support [t*bs-o, t*bs+bs+o)
    * must only reach +-1 neighbors — beyond that the reference's np.pad
    * would raise, so we refuse rather than silently blend wrong).
    */
  private[graft] def requireStitchable(meta: GridMeta): Unit =
    (0 until 3).foreach { ax =>
      require(meta.overlap(ax) >= 1,
        s"stitch requires overlap >= 1 per axis (got ${meta.overlap(ax)} on axis $ax)")
      require(2 * meta.overlap(ax) <= meta.blocksize(ax),
        s"stitch requires 2*overlap <= blocksize per axis " +
          s"(got o=${meta.overlap(ax)}, bs=${meta.blocksize(ax)} on axis $ax)")
    }

  def stitchBlocks(grid: BlockGrid): BlockGrid = {
    val meta = grid.meta
    val bs = meta.blocksize; val c = meta.components
    requireStitchable(meta)
    val outMeta = meta.copy(overlap = Array(0, 0, 0))

    val merged = emitPieces(grid)
      .groupByKey(p => (p.tx, p.ty, p.tz))
      .mapGroups { (key, it) =>
        // deterministic float32 accumulation: srcKey-sorted (assembleBlock)
        assembleBlock(key._1, key._2, key._3, it.toSeq, meta)
      }

    BlockGrid(outMeta, merged)
  }

  /** INCREMENTAL RE-STITCH — a tile was re-acquired/replaced: only the
    * output blocks whose 26-neighborhood touches a changed tile can
    * differ, so recompute exactly those. `affected` = changed tiles +
    * their neighbors; the pieces feeding an affected target come from
    * affected + THEIR neighbors (2 hops from the change), so the input
    * is filtered to that set and the normal one-shuffle stitch runs on
    * it, restricted to affected targets. Accumulation per target sees
    * the identical piece set in the identical srcKey order, so every
    * returned block is BIT-IDENTICAL to a full re-stitch
    * (RestitchSpec) — at a fraction of the work: a k-tile change on an
    * N-tile acquisition touches ≤ 27k targets and reads ≤ 125k tiles,
    * independent of N. The update path a 100 TB microscope volume
    * needs when one stage position is re-imaged.
    *
    * Returns only the affected output blocks (overlap-0 meta); callers
    * overwrite those blocks in the stored full output (block IO is
    * per-block parquet/npy, so the overwrite is file-local).
    */
  def restitchBlocks(grid: BlockGrid, changed: Seq[BlockIndex]): BlockGrid = {
    val meta = grid.meta
    requireStitchable(meta)
    require(changed.nonEmpty, "restitch needs at least one changed tile")
    val g = meta.blockGrid
    def inBounds(x: Int, y: Int, z: Int): Boolean =
      x >= 0 && y >= 0 && z >= 0 && x < g(0) && y < g(1) && z < g(2)
    def neighborhood(s: Set[(Int, Int, Int)]): Set[(Int, Int, Int)] =
      s.flatMap { case (x, y, z) =>
        for {
          dx <- -1 to 1; dy <- -1 to 1; dz <- -1 to 1
          if inBounds(x + dx, y + dy, z + dz)
        } yield (x + dx, y + dy, z + dz)
      }
    val changed0 = changed.map(bi => (bi.bx, bi.by, bi.bz)).toSet
    val affected = neighborhood(changed0)
    val sources = neighborhood(affected)
    val spark = grid.ds.sparkSession
    val srcB = spark.sparkContext.broadcast(sources)
    val affB = spark.sparkContext.broadcast(affected)
    val sub = grid.ds.filter(b => srcB.value.contains((b.bi.bx, b.bi.by, b.bi.bz)))
    val outMeta = meta.copy(overlap = Array(0, 0, 0))
    val merged = emitPieces(BlockGrid(meta, sub))
      .filter(p => affB.value.contains((p.tx, p.ty, p.tz)))
      .groupByKey(p => (p.tx, p.ty, p.tz))
      .mapGroups { (key, it) =>
        assembleBlock(key._1, key._2, key._3, it.toSeq, meta)
      }
    BlockGrid(outMeta, merged)
  }

  /** The stitch as the reference literally writes it (stitch.py:104-121):
    * `map_blocks(weight_block)` then
    * `map_overlap(merge_overlaps, depth=overlap, boundary=0, trim=False,
    * chunks=blocksize)` — a thin composition over the generic
    * [[BlockGrid.mapOverlap]] primitive.
    *
    * [[stitchBlocks]] stays the production path: it fuses the weighting
    * into piece extraction and ships only each tile's overlap-region
    * contributions (shuffle volume = output + halo fraction), where this
    * composition ships the full weighted tiles (volume = input + halo
    * fraction, ~(1+2o/bs)^3 larger) and both run exactly ONE shuffle.
    * Equivalence of the two paths is pinned by MapOverlapSpec: golden
    * parity on all four stitch fixtures plus a seeded random-geometry
    * property test against [[stitchBlocks]].
    */
  def stitchBlocksViaMapOverlap(grid: BlockGrid): BlockGrid = {
    val meta = grid.meta
    requireStitchable(meta)
    val weighted = grid.mapBlocks(meta)(weightBlock(_, meta))
    val bs = meta.blocksize; val o = meta.overlap; val c = meta.components
    weighted.mapOverlap(o, meta.copy(overlap = Array(0, 0, 0))) { b =>
      val out = Nd.mergeOverlaps(b.data, b.nx, b.ny, b.nz, c, bs, o)
      Block(b.bi, bs(0), bs(1), bs(2), c, out)
    }
  }
}
