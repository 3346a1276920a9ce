package graft

import org.apache.spark.sql.{Encoder, SparkSession}
import graft.core.{Block, BlockGrid, BlockIndex, GridMeta}
import graft.affine.{AffineGrid, LocalAffine}
import graft.stitch.Stitch

/** Stitch-core throughput benchmark (fills the BASELINE.md TBD rows):
  * voxels/sec for stitchBlocks and localAffinesToField on grids of 128^3
  * float32 blocks with overlap 16 — the reference's intended operating
  * point (microscopy tiles). Tiles are generated ON the executors (no
  * driver materialization) and results drain through the noop sink.
  * Run: sbt "runMain graft.StitchBench [gridDim[:blocksize[:overlap]] ...]"
  *
  * The block-COUNT scale probe is `64:8:2` — 262,144 blocks (a 64^3
  * grid of 8^3 tiles): same task-graph size a 1000-executor job sees
  * stitching a full acquisition, with the per-block payload shrunk so a
  * single host can hold it. What it proves is that the plan stays ONE
  * wide exchange regardless of block count (StitchPlanShapeSpec pins
  * that shape) and that throughput is task-bounded, not driver-bounded.
  */
object StitchBench {
  private implicit val blockEnc: Encoder[Block] = BlockGrid.blockEncoder

  def main(args: Array[String]): Unit = {
    val grids: Seq[(Int, Int, Int)] =
      if (args.nonEmpty) args.toSeq.map { a =>
        a.split(':') match {
          case Array(g) => (g.toInt, 128, 16)
          case Array(g, b) => (g.toInt, b.toInt, 16)
          case Array(g, b, o) => (g.toInt, b.toInt, o.toInt)
          case _ => sys.error(s"bad grid spec '$a' (want gdim[:bs[:o]])")
        }
      }
      else Seq((3, 128, 16), (4, 128, 16))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "2g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val results = grids.map { case (gdim, bsDim, oDim) =>
      val bs = Array(bsDim, bsDim, bsDim); val o = Array(oDim, oDim, oDim)
      val cs = bs.map(_ + 2 * oDim)
      val g = Array(gdim, gdim, gdim)
      val meta = GridMeta(bs.map(_.toLong * gdim), bs, o, g, 1)
      val n = meta.numBlocks
      val tiles = spark.range(0, n, 1, math.min(n, 64).toInt).map { i =>
        val bi = BlockIndex.fromLinear(i, g)
        // deterministic per-block synthetic data (cheap LCG fill)
        val data = new Array[Float](cs(0) * cs(1) * cs(2))
        var s = i * 6364136223846793005L + 1442695040888963407L
        var j = 0
        while (j < data.length) {
          s = s * 6364136223846793005L + 1442695040888963407L
          data(j) = ((s >>> 40).toInt & 0xffff) / 65536.0f
          j += 1
        }
        Block(bi, cs(0), cs(1), cs(2), 1, data)
      }
      val grid = BlockGrid(meta, tiles)

      // best-of-N per phase: host CPU-starvation bursts last ~12-70 s and
      // can swallow a whole single-shot phase (observed 10-40x swings);
      // the min across spaced reps is the steady-state signal
      val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_STITCH_REPS", "2").toInt)
      def bestOf(f: => Unit): Double =
        (1 to reps).map { _ =>
          val t = System.nanoTime(); f; (System.nanoTime() - t) / 1e9
        }.min
      // phase breakdown: generation only, then gen+weight+slice (narrow), then full
      val genSec = bestOf(tiles.write.format("noop").mode("overwrite").save())
      val mapSec = bestOf(Stitch.emitPieces(grid).write.format("noop").mode("overwrite").save())
      val stitchSec = bestOf(Stitch.stitchBlocks(grid).ds.write.format("noop").mode("overwrite").save())
      // the generic-primitive composition ships full weighted tiles:
      // (1+2o/bs)^3 ≈ 1.95x the fused path's shuffle volume at o=16/bs=128
      // — this row puts a measured number behind that doc claim
      val moSec = bestOf(Stitch.stitchBlocksViaMapOverlap(grid).ds
        .write.format("noop").mode("overwrite").save())
      println(f"[stitchbench] g=$gdim breakdown: gen=${genSec}%.1fs gen+map=${mapSec}%.1fs " +
        f"full=${stitchSec}%.1fs viaMapOverlap=${moSec}%.1fs")
      val voxOut = n * bs(0).toLong * bs(1) * bs(2)

      // affine path: same block grid of identity+translation matrices
      val m = Array.tabulate(gdim * gdim * gdim)(_ =>
        Array(1.0, 0, 0, 0.5, 0, 1.0, 0, 0, 0, 0, 1.0, 0, 0, 0, 0, 1.0)).flatten
      val aff = AffineGrid(gdim, gdim, gdim, 4, 4, m)
      val affineSec = bestOf(
        LocalAffine.localAffinesToField(
            spark, bs.map(_.toLong * gdim), Array(1f, 1f, 1f), aff, bs, o)
          .ds.write.format("noop").mode("overwrite").save())
      val affVox = voxOut // 3 components over the same voxel count

      println(f"[stitchbench] grid=${gdim}x$gdim%dx$gdim blocks=$n " +
        f"stitch=${stitchSec}%.1fs (${voxOut / stitchSec / 1e6}%.1f Mvox/s) " +
        f"affine=${affineSec}%.1fs (${affVox / affineSec / 1e6}%.1f Mvox/s)")
      (gdim, stitchSec, voxOut / stitchSec, affineSec, affVox / affineSec)
    }
    val qjson = results.map { case (gd, ss, sv, as_, av) =>
      f""""g$gd":{"stitch_sec":$ss%.2f,"stitch_vox_per_sec":${sv.toLong},"affine_sec":$as_%.2f,"affine_vox_per_sec":${av.toLong}}"""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"stitch_throughput","unit":"vox/sec","grids":$qjson}""")
    spark.stop()
  }
}
