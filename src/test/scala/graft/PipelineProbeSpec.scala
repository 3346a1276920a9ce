package graft

import org.apache.spark.sql.functions._
import graft.llm.{Ann, AnnIndex, Pipeline}

/** Pins the served retrieval pipeline (q342) against the scan-path
  * pipeline (q275): probe-pooled ≡ brute-pooled at equal pool
  * membership — the Mmr.mmrFromRanked contract applied to the whole
  * composed operator.
  */
class PipelineProbeSpec extends SparkSpec {

  private val rnd = new scala.util.Random(41)

  private def fixture = {
    val s = spark
    import s.implicits._
    val vocab = Array.tabulate(40)(i => s"w$i")
    // 120 docs long enough to chunk (window 40, stride 30 → 2-4 chunks)
    val docs = Seq.tabulate(120)(i =>
      (i.toLong, Array.fill(60 + rnd.nextInt(60))(
        vocab(rnd.nextInt(vocab.length))).mkString(" ")))
      .toDF("doc_id", "text")
    def v(): Seq[Float] = Seq.fill(8)(rnd.nextGaussian().toFloat)
    val emb = Seq.tabulate(120)(i => (i.toLong, v())).toDF("id", "vec")
    (docs, emb)
  }

  private val queries = Seq(0 -> Seq("w3", "w7"), 1 -> Seq("w11", "w23"))

  test("full-cell probe serve is bit-identical to the scan-path pipeline") {
    val s = spark
    val (docs, emb) = fixture
    val qvecs = emb.filter(col("id") < 2)
      .select(col("id").as("qid"), col("vec").as("qvec"))
    val work = java.nio.file.Files.createTempDirectory("pipeprobe").toString
    Pipeline.saveChunkLexical(s, docs, s"$work/lex", buckets = 16)
    AnnIndex.saveIvf(s, emb, s"$work/ann", cells = 4)
    val brute = Pipeline.hybridChunkRetrieve(s, docs, queries, emb, qvecs)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    val served = Pipeline.hybridProbeRetrieve(s, s"$work/lex", s"$work/ann",
        queries, qvecs, nProbe = 4, buckets = 16)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(brute.nonEmpty && brute == served,
      "served pipeline at nProbe = cells must replay the scan path bit-for-bit")
  }

  test("partial probe differs only in dense pool membership: fused ranks agree when the probed pool equals the brute pool") {
    val s = spark
    val (docs, emb) = fixture
    val qvecs = emb.filter(col("id") < 2)
      .select(col("id").as("qid"), col("vec").as("qvec"))
    val work = java.nio.file.Files.createTempDirectory("pipeprobe2").toString
    AnnIndex.saveIvf(s, emb, s"$work/ann", cells = 4)
    // equal-pool check: for each query, if the partial probe's top-10
    // id set equals the brute top-10 id set, their ranks (and hence any
    // downstream fusion) must be identical — membership is the ONLY
    // degree of freedom the probe introduces
    val brute = Ann.cosineTopK(s, emb, qvecs, 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    val probed = AnnIndex.probeIvf(s, s"$work/ann", qvecs, 10, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    for (q <- Seq(0L, 1L)) {
      val b = brute.filter(_._1 == q).sortBy(_._2)
      val p = probed.filter(_._1 == q).sortBy(_._2)
      if (b.map(_._3).toSet == p.map(_._3).toSet)
        assert(b == p, s"equal pools must rank identically for qid $q")
    }
    // and the probe plan prunes to the probed cell partitions
    val plan = AnnIndex.probeIvf(s, s"$work/ann", qvecs, 10, nProbe = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"),
      "partial probe must carry a cell partition filter")
  }

  test("binary-rung serve is bit-identical to the scan path at full rerank") {
    val s = spark
    val (docs, emb) = fixture
    val qvecs = emb.filter(col("id") < 2)
      .select(col("id").as("qid"), col("vec").as("qvec"))
    val work = java.nio.file.Files.createTempDirectory("pipeprobe4").toString
    Pipeline.saveChunkLexical(s, docs, s"$work/lex", buckets = 16)
    graft.llm.BinaryAnn.saveBinary(s, emb, s"$work/bin")
    val brute = Pipeline.hybridChunkRetrieve(s, docs, queries, emb, qvecs)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    // rerank = corpus size: the Hamming shortlist covers everything,
    // the exact re-rank recovers the brute pool exactly
    val served = Pipeline.hybridProbeRetrieveBinary(s, s"$work/lex",
        s"$work/bin", queries, qvecs, rerank = 120, buckets = 16)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(brute.nonEmpty && brute == served,
      "binary serve at full rerank must replay the scan path")
  }

  test("chunk-index streaming append: replayed batches collapse, post-compaction serve equals the full-corpus scan path") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val (docs, emb) = fixture
    val qvecs = emb.filter(col("id") < 2)
      .select(col("id").as("qid"), col("vec").as("qvec"))
    val work = java.nio.file.Files.createTempDirectory("pipeprobe5").toString
    val ck = java.nio.file.Files.createTempDirectory("pipeprobe5-ck").toString
    Pipeline.saveChunkLexical(s, docs.filter(col("doc_id") < 100),
      s"$work/lex", buckets = 16)
    AnnIndex.saveIvf(s, emb, s"$work/ann", cells = 4)
    val tail = docs.filter(col("doc_id") >= 100)
      .as[(Long, String)].collect()
    val mem = MemoryStream[(Long, String)]
    val q = Pipeline.appendChunkLexicalStream(s,
      mem.toDF.toDF("doc_id", "text"), s"$work/lex", ck, buckets = 16)
    try {
      mem.addData(tail.toSeq); q.processAllAvailable()
      mem.addData(tail.toSeq); q.processAllAvailable() // replay
    } finally q.stop()
    graft.llm.Lexical.compactLexical(s, s"$work/lex", id = "cid")
    val brute = Pipeline.hybridChunkRetrieve(s, docs, queries, emb, qvecs)
      .collect().map(_.toSeq).toSeq
    val served = Pipeline.hybridProbeRetrieve(s, s"$work/lex", s"$work/ann",
        queries, qvecs, nProbe = 4, buckets = 16)
      .collect().map(_.toSeq).toSeq
    assert(brute == served,
      "appended + compacted chunk index must serve the full corpus exactly")
  }

  test("served full chain (MMR + metrics) replays the scan-path chain at full probe") {
    val s = spark
    val (docs, emb) = fixture
    val qvecs = emb.filter(col("id") < 2)
      .select(col("id").as("qid"), col("vec").as("qvec"))
    val qrels = graft.llm.Eval.termMatchQrels(s, docs, queries)
    val work = java.nio.file.Files.createTempDirectory("pipeprobe3").toString
    Pipeline.saveChunkLexical(s, docs, s"$work/lex", buckets = 16)
    AnnIndex.saveIvf(s, emb, s"$work/ann", cells = 4)
    val scan = Pipeline.retrieveDiversifyEval(s, docs, queries, emb, qvecs,
        qrels, k = 5)
      .collect().map(_.toSeq).toSeq
    val served = Pipeline.retrieveDiversifyEvalProbe(s, s"$work/lex",
        s"$work/ann", queries, qvecs, qrels, k = 5, nProbe = 4, buckets = 16)
      .collect().map(_.toSeq).toSeq
    assert(scan.nonEmpty && scan == served)
  }
}
