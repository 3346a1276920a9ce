package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.llm.{AnnIndex, Lexical, Pipeline}

/** Measured demo for the SERVED retrieval pipeline (q342,
  * [[graft.llm.Pipeline]]): the scan path (re-chunk + re-tokenize the
  * corpus and broadcast-scan every embedding, per query batch) vs the
  * persisted-index serve (pruned posting buckets + pruned IVF cells).
  *
  * Numbers that transfer:
  *   - wall per query batch once the indexes exist (build amortizes),
  *   - the filesystem-level fraction of each store a batch touches:
  *     the lexical probe reads only the query terms' bucket
  *     partitions, the dense probe only the probed cell partitions —
  *     both bounded by the QUERY (terms, nProbe), not the corpus.
  *
  * Fused outputs are asserted identical before timing (full-probe
  * serve ≡ scan path, the PipelineProbeSpec contract).
  *
  * Run: sbt "runMain graft.examples.PipelineBench [sfDir] [nProbe]"
  */
object PipelineBench {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nProbe = args.lift(1).map(_.toInt).getOrElse(16)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$src/documents.parquet")
      .select(col("doc_id"), col("text"))
    val emb = spark.read.parquet(s"$src/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val queries = Seq(0 -> Seq("join", "hash"), 1 -> Seq("vector", "scan", "filter"),
      2 -> Seq("customer"))
    val qvecs = emb.filter(col("id") < 3)
      .select(col("id").as("qid"), col("vec").as("qvec"))

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-pipe-bench").toString
    val (_, buildWall) = time {
      Pipeline.saveChunkLexical(spark, docs, s"$dir/lex")
      AnnIndex.saveIvf(spark, emb, s"$dir/ann", cells = nProbe)
    }
    val (scanRows, scanWall) = time {
      Pipeline.hybridChunkRetrieve(spark, docs, queries, emb, qvecs,
        embId = "id", embVec = "vec")
        .collect().map(_.toSeq).toSeq
    }
    val (serveRows, serveWall) = time {
      Pipeline.hybridProbeRetrieve(spark, s"$dir/lex", s"$dir/ann",
        queries, qvecs, nProbe = nProbe)
        .collect().map(_.toSeq).toSeq
    }
    require(scanRows == serveRows,
      s"full-probe serve must equal the scan path: ${scanRows.length} vs ${serveRows.length}")
    // the DEPLOYMENT shape: partial probe (approximate dense rung) —
    // report the fused-id agreement with the exact path instead of
    // asserting equality
    val (partialRows, partialWall) = time {
      Pipeline.hybridProbeRetrieve(spark, s"$dir/lex", s"$dir/ann",
        queries, qvecs, nProbe = math.max(2, nProbe / 4))
        .collect().map(r => (r.getInt(0), r.getLong(2))).toSet
    }
    val exactIds = scanRows.map(r =>
      (r(0).asInstanceOf[Int], r(2).asInstanceOf[Long])).toSet
    val agree = partialRows.intersect(exactIds).size.toDouble /
      math.max(1, exactIds.size)

    def dirBytes(f: java.io.File): Long =
      if (f.isFile) f.length()
      else Option(f.listFiles()).map(_.map(dirBytes).sum).getOrElse(0L)
    // lexical pruning: the query terms' buckets of 64
    import spark.implicits._
    val qterms = queries.flatMap(_._2).distinct
    val qBuckets = qterms.toDF("term")
      .select(pmod(xxhash64(col("term")), lit(64L)).cast("int"))
      .distinct().collect().map(_.getInt(0)).toSet
    val lexStore = new java.io.File(s"$dir/lex/postings")
    val lexTotal = dirBytes(lexStore)
    val lexPruned = Option(lexStore.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith("bucket=") &&
        qBuckets.contains(f.getName.stripPrefix("bucket=").toInt))
      .map(dirBytes).sum
    val annTotal = dirBytes(new java.io.File(s"$dir/ann/assignments"))
    println(f"[pipe] one-time index build: $buildWall%.2f s " +
      f"(lex ${lexTotal / 1e6}%.2f MB, ann ${annTotal / 1e6}%.2f MB)")
    println(f"[pipe] per-batch SCAN PATH: $scanWall%.2f s (re-chunk + re-tokenize + full embedding broadcast scan)")
    println(f"[pipe] per-batch SERVED:    $serveWall%.2f s, lexical read bounded by " +
      f"${lexPruned / 1e6}%.2f MB (${100.0 * lexPruned / lexTotal}%.1f%% of postings; ${qBuckets.size}/64 buckets)")
    println(f"[pipe] per-batch SERVED (partial nProbe=${math.max(2, nProbe / 4)}): " +
      f"$partialWall%.2f s, fused-id agreement ${100 * agree}%.1f%% of the exact top-10s")
    println(f"[pipe] wall cut ${scanWall / serveWall}%.1fx exact / ${scanWall / partialWall}%.1fx partial")
    println(s"""PIPEBENCH {"build_s": $buildWall, "scan_s": $scanWall, "serve_s": $serveWall, "partial_s": $partialWall, "agree": $agree, "lex_frac": ${lexPruned.toDouble / lexTotal}}""")
    spark.stop()
  }
}
