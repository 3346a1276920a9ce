package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.llm.DedupIndex

/** Measured demo for [[graft.llm.DedupIndex.ingestStream]] — the
  * crawler dedup-on-ingest loop: batches of new docs arrive, each
  * batch drops intra-batch near-dups and near-dups of everything
  * ingested so far, survivors are emitted and indexed. The fixture
  * plants a controlled duplicate rate: per batch, 20% of docs are
  * mutated copies of docs from EARLIER batches (cross-batch dups the
  * index must catch) and 10% mutate docs of the SAME batch.
  *
  * Reported: end-to-end docs/second through the streaming loop, the
  * emitted-vs-dropped split (which must match the planted rate), and
  * the per-batch wall times (the index grows each batch; the probe
  * cost must stay batch-sized, not corpus-sized — flat batch times ARE
  * the scale claim).
  *
  * Run: sbt "runMain graft.examples.IngestBench [nBatches [batchDocs]]"
  */
object IngestBench {
  def main(args: Array[String]): Unit = {
    val nBatches = args.headOption.map(_.toInt).getOrElse(8)
    val batchDocs = args.lift(1).map(_.toInt).getOrElse(2000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

    // deterministic doc synth: 30 tokens from a 400-word vocab
    def freshDoc(i: Long): String = {
      var h = i * 0x9e3779b97f4a7c15L
      Array.fill(30) {
        h = h * 6364136223846793005L + 1442695040888963407L
        s"w${(h >>> 40) % 400}"
      }.mkString(" ")
    }
    def mutate(t: String, salt: Long): String = {
      val w = t.split(" "); w(w.length / 2) = s"mut$salt"; w.mkString(" ")
    }
    val dir = java.nio.file.Files.createTempDirectory("ingestbench-idx").toString
    val outDir = java.nio.file.Files.createTempDirectory("ingestbench-out").toString
    val ck = java.nio.file.Files.createTempDirectory("ingestbench-ck").toString
    // seed index with batch 0's docs
    val seed0 = (0 until batchDocs).map(i => (i.toLong, freshDoc(i.toLong)))
    DedupIndex.save(s, seed0.toDF("id", "text"), dir)

    val mem = MemoryStream[(Long, String)]
    val sq = DedupIndex.ingestStream(s, mem.toDF.toDF("id", "text"),
      dir, outDir, ck, minJaccard = 0.5)
    val times = new scala.collection.mutable.ArrayBuffer[Double]
    var planted = 0
    try {
      (1 to nBatches).foreach { b =>
        val base = b.toLong * batchDocs
        val rows = (0 until batchDocs).map { j =>
          val docId = base + j
          if (j % 5 == 0) { // 20%: near-dup of an earlier batch's doc —
            // slot j+1 of the prior batch, which was ingested FRESH
            // (j+1 is neither a %5 nor a %10==3 slot)
            planted += 1
            (docId, mutate(freshDoc((b - 1).toLong * batchDocs + j + 1), docId))
          } else if (j % 10 == 3) { // 10%: near-dup of a SAME-batch doc
            planted += 1
            (docId, mutate(freshDoc(base + j - 1), docId))
          } else (docId, freshDoc(docId))
        }
        mem.addData(rows: _*)
        val t0 = System.nanoTime()
        sq.processAllAvailable()
        times += (System.nanoTime() - t0) / 1e9
      }
    } finally sq.stop()
    val emitted = s.read.parquet(outDir).count()
    val total = nBatches.toLong * batchDocs
    val dropped = total - emitted
    println(f"[ingestbench] $total docs in ${times.sum}%.1f s -> ${total / times.sum}%.0f docs/s " +
      f"through the full dedup-ingest loop ($nBatches batches of $batchDocs)")
    println(s"[ingestbench] emitted $emitted, dropped $dropped (planted dups: $planted)")
    println("[ingestbench] per-batch seconds (index grows left to right): " +
      times.map(t => f"$t%.1f").mkString(", "))
    spark.stop()
  }
}
