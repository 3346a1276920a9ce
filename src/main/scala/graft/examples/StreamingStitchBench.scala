package graft.examples

import org.apache.spark.sql.{Encoder, SparkSession}
import graft.core.{Block, BlockGrid, BlockIndex, GridMeta}
import graft.stitch.Stitch
import graft.streaming.StreamingStitch

/** Streaming-stitch throughput (fills the BASELINE.md row): voxels/sec
  * for [[StreamingStitch.stitchStream]] draining a full acquisition fed
  * in shuffled order across several micro-batches, next to the batch
  * [[Stitch.stitchBlocks]] number on the SAME tiles — the ratio is the
  * price of incremental emission (state-store churn for in-flight
  * blocks) at the reference's 128³/o=16 operating point.
  *
  * Tile payloads are synthesized ON the executors from streamed block
  * indices (the driver streams 8-byte longs, not tiles), so the
  * measurement is the stitch path, not driver serialization.
  *
  * Run: sbt "runMain graft.examples.StreamingStitchBench [gdim[:bs[:o[:batches]]] ...]"
  */
object StreamingStitchBench {
  private implicit val blockEnc: Encoder[Block] = BlockGrid.blockEncoder

  private def synth(i: Long, g: Array[Int], cs: Array[Int]): Block = {
    val bi = BlockIndex.fromLinear(i, g)
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

  def main(args: Array[String]): Unit = {
    val specs: Seq[(Int, Int, Int, Int)] =
      if (args.nonEmpty) args.toSeq.map { a =>
        a.split(':') match {
          case Array(g) => (g.toInt, 128, 16, 4)
          case Array(g, b) => (g.toInt, b.toInt, 16, 4)
          case Array(g, b, o) => (g.toInt, b.toInt, o.toInt, 4)
          case Array(g, b, o, k) => (g.toInt, b.toInt, o.toInt, k.toInt)
          case _ => sys.error(s"bad spec '$a' (want gdim[:bs[:o[:batches]]])")
        }
      }
      else Seq((3, 128, 16, 4), (4, 128, 16, 4))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "2g")
    // SPARK_GRAFT_STATESTORE=rocksdb swaps the in-flight piece store:
    // HDFS-backed keeps state in executor heap and snapshots per batch
    // (big float arrays churn the heap); RocksDB keeps it off-heap with
    // incremental changelogs — the knob that matters when arrival
    // disorder makes in-flight state large
    val spark = (sys.env.get("SPARK_GRAFT_STATESTORE") match {
      case Some("rocksdb") => builder.config(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      case _ => builder
    }).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val results = specs.map { case (gdim, bsDim, oDim, batches) =>
      val bs = Array(bsDim, bsDim, bsDim); val o = Array(oDim, oDim, oDim)
      val cs = bs.map(_ + 2 * oDim)
      val g = Array(gdim, gdim, gdim)
      val meta = GridMeta(bs.map(_.toLong * gdim), bs, o, g, 1)
      val n = meta.numBlocks

      // batch comparator on identical synthesized tiles
      val tiles = spark.range(0, n, 1, math.min(n, 64).toInt).map(synth(_, g, cs))
      val t0 = System.nanoTime()
      Stitch.stitchBlocks(BlockGrid(meta, tiles))
        .ds.write.format("noop").mode("overwrite").save()
      val batchSec = (System.nanoTime() - t0) / 1e9

      // streaming drain: shuffled indices, `batches` micro-batches
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      val mem = MemoryStream[Long]
      val ck = java.nio.file.Files.createTempDirectory("ssbench-ck").toString
      val q = StreamingStitch
        .stitchStream(mem.toDS().map(synth(_, g, cs)), meta)
        .writeStream.format("noop")
        .option("checkpointLocation", ck)
        .outputMode("append").start()
      val order = new scala.util.Random(42).shuffle((0L until n).toVector)
      val per = math.max(1, (n + batches - 1) / batches).toInt
      val t1 = System.nanoTime()
      val streamSec =
        try {
          order.grouped(per).foreach { slice =>
            mem.addData(slice: _*)
            q.processAllAvailable()
          }
          (System.nanoTime() - t1) / 1e9
        } finally q.stop()
      val emitted = q.recentProgress.map(p => Option(p.sink)
        .map(_.numOutputRows).getOrElse(0L)).sum
      require(emitted == n, s"streaming drain emitted $emitted of $n blocks")

      val voxOut = n * bs(0).toLong * bs(1) * bs(2)
      println(f"[streamstitch] grid=${gdim}x$gdim%dx$gdim blocks=$n batches=$batches " +
        f"stream=${streamSec}%.1fs (${voxOut / streamSec / 1e6}%.1f Mvox/s) " +
        f"batch=${batchSec}%.1fs (${voxOut / batchSec / 1e6}%.1f Mvox/s) " +
        f"overhead=${streamSec / batchSec}%.2fx")
      (gdim, streamSec, voxOut / streamSec, batchSec)
    }
    val qjson = results.map { case (gd, ss, sv, bsSec) =>
      f""""g$gd":{"stream_sec":$ss%.2f,"stream_vox_per_sec":${sv.toLong},"batch_sec":$bsSec%.2f}"""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"streaming_stitch_throughput","unit":"vox/sec","grids":$qjson}""")
    spark.stop()
  }
}
