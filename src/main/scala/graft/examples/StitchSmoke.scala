package graft.examples

import org.apache.spark.sql.SparkSession
import graft.core.{Block, BlockGrid, BlockIndex}
import graft.affine.AffineGrid

/** End-to-end smoke of the public API, printed for eyeballing: stitches a
  * 3x3x3 grid of constant tiles (must return exactly 1.0 everywhere —
  * partition of unity) and synthesizes a translation deformation field
  * (must show the reference's (4/3)^3 = 2.370 corner-seam quirk).
  * Run: sbt "runMain graft.examples.StitchSmoke"
  */
object StitchSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .appName("StitchSmoke")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      // ICU case-mapping tables take ~60s of CPU to build on first
      // upper()/lower() call (CollationAwareUTF8String static init);
      // the JVM path is identical for this corpus (ASCII) and instant
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // --- stitch: 3x3x3 constant tiles, bs=8, o=2 ---
    val bs = Array(8, 8, 8); val o = Array(2, 2, 2); val g = Array(3, 3, 3)
    val cs = Array(12, 12, 12)
    val tiles = for {
      x <- 0 until 3; y <- 0 until 3; z <- 0 until 3
    } yield Block(BlockIndex(x, y, z), cs(0), cs(1), cs(2), 1,
      Array.fill(cs(0) * cs(1) * cs(2))(1.0f))
    val stitched = graft.Graft.stitchBlocks(graft.Graft.gridFromTiles(spark, tiles, bs, o, g, 1))
    val dense = stitched.collectDense()
    val mn = dense.min; val mx = dense.max
    println(f"stitch: ${dense.length} voxels, min=$mn%.7f max=$mx%.7f (want 1.0/1.0)")
    println("stitch plan:")
    stitched.ds.explain("simple")

    // --- affine field: uniform +1 x-translation, displacement ---
    val eye = Array.tabulate(2, 2, 2) { (_, _, _) =>
      Array(1.0, 0, 0, 1.0, 0, 1.0, 0, 0, 0, 0, 1.0, 0, 0, 0, 0, 1.0)
    }
    val m = eye.flatten.flatten.flatten
    val aff = AffineGrid(2, 2, 2, 4, 4, m)
    val field = graft.Graft.localAffinesToField(
      spark, Array(12L, 12L, 12L), Array(1f, 1f, 1f), aff, Array(6, 6, 6), Array(2, 2, 2))
    val f = field.collectDense()
    val xs = f.indices.collect { case i if i % 3 == 0 => f(i) }
    println(f"affine: dx min=${xs.min}%.4f max=${xs.max}%.4f (want 1.0 core, 2.3704 corner quirk)")
    // --- storage edge: stitched grid -> parquet -> read -> same bytes ---
    val ioDir = java.nio.file.Files.createTempDirectory("smoke_io").toString
    graft.Graft.writeGrid(stitched, s"$ioDir/grid")
    val back = graft.Graft.readGrid(spark, s"$ioDir/grid")
    val okIo = java.util.Arrays.equals(back.collectDense(), dense)
    println(s"io roundtrip: ${if (okIo) "identical" else "MISMATCH"}")

    val okStitch = math.abs(mn - 1f) < 1e-5 && math.abs(mx - 1f) < 1e-5
    val okAffine = math.abs(xs.max - 64f / 27f) < 1e-3 && math.abs(xs.min - 1f) < 1e-5
    println(if (okStitch && okAffine && okIo) "SMOKE PASS" else "SMOKE FAIL")
    spark.stop()
    if (!(okStitch && okAffine && okIo)) sys.exit(1)
  }
}
