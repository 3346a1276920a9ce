package graft

import org.apache.spark.sql.functions._

/** Round-15 facade methods delegate to (and agree with) their kernels. */
class FacadeRound15Spec extends SparkSpec {

  private def corpus = {
    val s = spark
    import s.implicits._
    (0L until 9L).map(i => (i, s"doc $i words here", s"src${i % 2}"))
      .toDF("doc_id", "text", "source")
  }

  test("writeTarShards + readWdsShards facades round-trip the corpus") {
    val s = spark
    val dir = java.nio.file.Files.createTempDirectory("facade15").toString
    val manifest = Graft.writeTarShards(s, corpus, dir, shards = 3).collect()
    assert(manifest.map(_.getLong(1)).sum == 9L)
    val back = Graft.readWdsShards(s, dir)
      .select(col("key").cast("long").as("doc_id"),
        col("payload").cast("string").as("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(back == (0L until 9L).map(i => i -> s"doc $i words here").toMap)
  }

  test("saveTokenizer/loadTokenizer/tokenIdStats facades equal the kernels") {
    val s = spark
    import s.implicits._
    val docs = Seq((0L, "low low lower lowest"), (1L, "slow lower"))
      .toDF("doc_id", "text")
    val merges = graft.llm.Bpe.train(s, docs, numMerges = 3)
    val dir = java.nio.file.Files.createTempDirectory("facade15tok").toString
    Graft.saveTokenizer(s, docs, merges, dir)
    val tok = Graft.loadTokenizer(s, dir)
    assert(tok == graft.llm.Bpe.loadTokenizer(s, dir))
    assert(Graft.tokenIdStats(s, docs, tok).collect().map(_.toSeq).toSeq ==
      graft.llm.Bpe.tokenIdStats(s, docs, tok).collect().map(_.toSeq).toSeq)
  }

  test("interleavedCurriculum facade equals the kernel") {
    val s = spark
    val a = Graft.interleavedCurriculum(s, corpus, docsPerShard = 2L)
      .collect().map(_.toSeq).toSeq
    val b = graft.llm.Pack.interleavedCurriculum(s, corpus, docsPerShard = 2L)
      .collect().map(_.toSeq).toSeq
    assert(a == b && a.length == 9, s"$a")
  }

  test("multimodalJpegShards facade equals the kernel") {
    val s = spark
    val a = Graft.multimodalJpegShards(s, corpus, shards = 2)
      .collect().map(_.toSeq).toSeq
    val b = graft.llm.Pack.multimodalJpegShards(s, corpus, shards = 2)
      .collect().map(_.toSeq).toSeq
    assert(a == b && a.nonEmpty, s"$a")
  }

  test("writeMultimodalTarShards + pairMultimodalSamples close the loop on disk") {
    val s = spark
    val dir = java.nio.file.Files.createTempDirectory("facade15mm").toString
    val manifest = Graft.writeMultimodalTarShards(s, corpus, dir, shards = 3)
      .collect()
    assert(manifest.map(_.getLong(2)).sum == 18L) // 9 docs x 2 members
    val pairs = Graft.pairMultimodalSamples(s, dir).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getBoolean(2))).toMap
    assert(pairs == (0L until 9L).map(i =>
      i -> ((s"doc $i words here", true))).toMap)
  }

  test("pairMultimodalSamples dies loud on a sample missing a modality") {
    val s = spark
    val dir = java.nio.file.Files.createTempDirectory("facade15bad").toString
    // one complete pair + one orphan caption
    val members = Seq(
      ("0.jpg", graft.io.Jpeg.buildGray(
        graft.io.Bmp.Gray(16, 16, Array.fill(256)(7)),
        graft.io.Jpeg.DcExactQuant)),
      ("0.txt", "cap".getBytes("UTF-8")),
      ("1.txt", "orphan".getBytes("UTF-8")))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, graft.io.Tar.shardFileNameOf(0)),
      graft.io.Tar.build(members))
    val e = intercept[org.apache.spark.SparkException] {
      Graft.pairMultimodalSamples(s, dir).collect()
    }
    def msg(t: Throwable): String =
      t.getMessage + Option(t.getCause).map(msg).getOrElse("")
    assert(msg(e).contains("must carry exactly jpg+txt"))
  }

  test("writeWdsShards facade: DSv2 sink round-trips through readWdsShards") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("facade15sink")
      .toString + "/out"
    val members = corpus.select(col("doc_id").cast("string").as("key"),
      lit("txt").as("ext"), col("text").cast("binary").as("payload"))
    Graft.writeWdsShards(s, members.repartition(3, col("key")), dir)
    // overwrite replaces the set
    Graft.writeWdsShards(s, members.repartition(2, col("key")), dir,
      overwrite = true)
    val back = Graft.readWdsShards(s, dir)
      .select(col("key").cast("long"), col("payload").cast("string"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(back == (0L until 9L).map(i => i -> s"doc $i words here").toMap)
    assert(new java.io.File(dir).listFiles().length <= 2)
  }

  test("extendMerges facade equals the kernel") {
    val s = spark
    import s.implicits._
    val docs = Seq((0L, "low low lower lowest low lower"))
      .toDF("doc_id", "text")
    val part = graft.llm.Bpe.train(s, docs, numMerges = 2)
    assert(Graft.extendMerges(s, docs, part, 2) ==
      graft.llm.Bpe.extendMerges(s, docs, part, 2))
  }
}
