package graft

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import graft.core.{Block, BlockGrid, BlockIndex}
import graft.io.BlockIO
import graft.sources.NpyDataSource

/** The DataSource V2 npy-blocks reader: round-trip vs BlockIO.exportNpy,
  * file-level partition pruning from pushed bx/by/bz predicates, and
  * column pruning that skips payload decode entirely for index-only
  * projections (both pinned via the plan and a same-JVM decode counter).
  */
class NpySourceSpec extends SparkSpec {

  private def grid(dir: String): Unit = {
    val s = spark
    val tiles = for {
      x <- 0 until 3; y <- 0 until 2; z <- 0 until 2
    } yield Block(BlockIndex(x, y, z), 4, 5, 6, 1,
      Array.tabulate(120)(i => (x * 1000 + y * 100 + z * 10 + i).toFloat))
    BlockIO.exportNpy(
      BlockGrid.fromTiles(s, tiles, Array(4, 5, 6), Array(0, 0, 0), Array(3, 2, 2), 1),
      dir)
  }

  private def scanPartitions(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.executedPlan.collectLeaves().collect {
      case b: BatchScanExec => b.partitions.size
    }.sum

  test("npy-blocks round-trips every block exportNpy wrote") {
    val dir = java.nio.file.Files.createTempDirectory("npysrc").toString
    grid(dir)
    val df = spark.read.format("npy-blocks").load(dir)
    assert(df.count() == 12)
    val r = df.filter(col("bx") === 2 && col("by") === 1 && col("bz") === 0)
      .select("nx", "ny", "nz", "c", "data").collect()
    assert(r.length == 1)
    assert((r(0).getInt(0), r(0).getInt(1), r(0).getInt(2), r(0).getInt(3)) == (4, 5, 6, 1))
    assert(r(0).getSeq[Float](4) == Seq.tabulate(120)(i => (2100 + i).toFloat))
  }

  test("bx/by/bz predicates prune FILES at planning time") {
    val dir = java.nio.file.Files.createTempDirectory("npysrc").toString
    grid(dir)
    val df = spark.read.format("npy-blocks").load(dir)
    assert(scanPartitions(df.filter(col("bx") === 1)) == 4)
    assert(scanPartitions(df.filter(col("bx") === 1 && col("bz") === 0)) == 2)
    assert(scanPartitions(df.filter(col("bx") >= 1 && col("by") < 1)) == 4)
    assert(scanPartitions(df.filter(col("bx").isin(0, 2))) == 8)
    // an out-of-Int-range literal must evaluate truthfully (bx < 5e9 is
    // always true), not prune every file
    assert(scanPartitions(df.filter(col("bx") < 5000000000L)) == 12)
    assert(df.filter(col("bx") < 5000000000L).count() == 12)
    // and the pruned scans still return the right rows
    assert(df.filter(col("bx") === 1).count() == 4)
    assert(df.filter(col("bx") >= 1 && col("by") < 1).count() == 4)
  }

  test("index-only projections never decode a payload; data projections do") {
    val dir = java.nio.file.Files.createTempDirectory("npysrc").toString
    grid(dir)
    val df = spark.read.format("npy-blocks").load(dir)
    NpyDataSource.decodes.set(0)
    val idx = df.select("bx", "by", "bz").collect()
    assert(idx.length == 12)
    assert(NpyDataSource.decodes.get() == 0,
      "index-only projection must not open files")
    val sums = df.select(col("bx"), aggregate(col("data"), lit(0.0d),
      (acc, x) => acc + x).as("s")).collect()
    assert(sums.length == 12)
    assert(NpyDataSource.decodes.get() == 12)
  }

  test("stitch through the DSv2 import path matches the binaryFile import path") {
    val dir = java.nio.file.Files.createTempDirectory("npysrc").toString
    val s = spark
    // an overlapped stitchable grid (bs 4, o 1 -> 6^3 tiles)
    val tiles = for {
      x <- 0 until 2; y <- 0 until 2; z <- 0 until 2
    } yield Block(BlockIndex(x, y, z), 6, 6, 6, 1,
      Array.tabulate(216)(i => (x * 31 + y * 17 + z * 7 + i % 5).toFloat))
    BlockIO.exportNpy(
      BlockGrid.fromTiles(s, tiles, Array(4, 4, 4), Array(1, 1, 1), Array(2, 2, 2), 1),
      dir)
    def stitched(g: BlockGrid) = graft.stitch.Stitch.stitchBlocks(g).ds.collect()
      .map(b => ((b.bi.bx, b.bi.by, b.bi.bz), b.data.toSeq)).toMap
    val viaV2 = stitched(BlockIO.importNpyViaSource(s, dir))
    val viaBinary = stitched(BlockIO.importNpy(s, dir))
    assert(viaV2.keySet == viaBinary.keySet && viaV2.keySet.size == 8)
    viaV2.keys.foreach(k => assert(viaV2(k) == viaBinary(k), s"block $k differs"))
  }

  test("non-index predicates stay with Spark and still filter correctly") {
    val dir = java.nio.file.Files.createTempDirectory("npysrc").toString
    grid(dir)
    val df = spark.read.format("npy-blocks").load(dir)
    // nx isn't a pushable column: all 12 files stay planned, Spark filters
    val q = df.filter(col("nx") === 4)
    assert(scanPartitions(q) == 12)
    assert(q.count() == 12)
    assert(df.filter(col("nx") === 99).count() == 0)
  }
}
