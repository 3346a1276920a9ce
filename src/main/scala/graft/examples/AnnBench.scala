package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.llm.{Ann, AnnIndex}

/** Measured demo for the persisted-ANN serving path: cosine top-k over
  * a 1M-vector corpus, brute force (scan everything, exact) vs a saved
  * IVF index (`AnnIndex.saveIvf`/`probeIvf` — the probe reads only the
  * nProbe nearest cells' hive partitions, so the scan itself shrinks by
  * ~nProbe/cells BEFORE any compute). The point at 100 TB: index build
  * cost amortizes over every probe batch, and serving cost scales with
  * the probed fraction of the index, not the corpus.
  *
  * Recall of the probe batch vs the brute-force truth is printed next
  * to the timings — speed claims without the recall number are
  * meaningless for ANN.
  *
  * Results go to BASELINE.md. Run:
  *   sbt "runMain graft.examples.AnnBench [nVecs [dim]]"
  */
object AnnBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val dim = args.lift(1).map(_.toInt).getOrElse(16)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // deterministic pseudo-random corpus: splitmix64-mixed floats
    def mix(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    val dir = java.nio.file.Files.createTempDirectory("annbench").toString
    spark.range(0, n, 1, 32)
      .map { i =>
        val v = Array.tabulate(dim)(j =>
          ((mix(i * dim + j) >>> 11).toFloat / (1L << 53).toFloat) * 2f - 1f)
        (i, v)
      }
      .toDF("id", "vec")
      .write.mode("overwrite").parquet(s"$dir/emb")
    def emb: DataFrame = spark.read.parquet(s"$dir/emb")
    val queries = emb.filter(col("id") < 16)
      .select(col("id").as("qid"), col("vec").as("qvec"))
      .cache()
    queries.count()

    def time(tag: String, f: () => DataFrame): (Double, Array[(Long, Long)]) = {
      var rows: Array[(Long, Long)] = Array.empty
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        rows = f().select(col("qid"), col("id")).collect()
          .map(r => (r.getLong(0), r.getLong(1)))
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[annbench] $tag: best ${ts.min}%.2f s of ${ts.map(t => f"$t%.2f").mkString(", ")}")
      (ts.min, rows)
    }

    val (tBrute, truth) = time(s"brute-force exact top-10, 16-query batch ($n vecs)",
      () => Ann.cosineTopK(spark, emb, queries, 10))
    val t0 = System.nanoTime()
    val cells = 256
    AnnIndex.saveIvf(spark, emb, s"$dir/ivf", cells = cells, iters = 2)
    println(f"[annbench] index build ($cells cells, 2 iters): ${(System.nanoTime() - t0) / 1e9}%.2f s")
    val (tIdx, got) = time(s"saved-index probe, 16-query batch (nProbe 8/$cells)",
      () => AnnIndex.probeIvf(spark, s"$dir/ivf", queries, 10, nProbe = 8))
    val truthSet = truth.toSet
    val recall = got.count(truthSet.contains).toDouble / truth.length
    println(f"[annbench] recall@10 vs exact: $recall%.3f (batch probe ${tBrute / tIdx}%.2fx vs brute)")
    // the honest local metric (the LayoutBench lesson): ROWS DECODED by
    // the partition-pruned scan vs the full index — wall clock at this
    // corpus size is dominated by fixed per-job overhead, but the scan
    // fraction is what scales to a corpus that doesn't fit
    val q1 = queries.filter(col("qid") === 0)
    val (tOne, _) = time("saved-index probe, SINGLE query",
      () => AnnIndex.probeIvf(spark, s"$dir/ivf", q1, 10, nProbe = 8))
    val fullRows = spark.read.parquet(s"$dir/ivf/assignments").count()
    // replicate the probe's cell selection to count the decoded rows
    val cents = spark.read.parquet(s"$dir/ivf/centroids")
      .as[(Int, Array[Double])].collect().sortBy(_._1).map(_._2)
    val qv = q1.select(col("qvec")).as[Seq[Float]].collect()(0)
    var nrm = 0.0
    qv.foreach(v => nrm += v.toDouble * v)
    val qn = qv.map(v => (v / math.sqrt(nrm))).toArray
    val probed = graft.llm.IvfOps.nearestCells(cents, qn, 8)
    val prunedRows = spark.read.parquet(s"$dir/ivf/assignments")
      .filter(col("cell").isin(probed: _*)).count()
    println(f"[annbench] single-query scan: $prunedRows of $fullRows index rows decoded " +
      f"(${fullRows.toDouble / prunedRows}%.1fx cut), wall $tOne%.2f s (job-overhead-bound locally)")
    spark.stop()
  }
}
