package graft

import org.apache.spark.sql.functions._
import graft.llm.{DedupIndex, SketchOps}

/** The persisted near-dup index: probes must find planted near-dups of
  * indexed docs and report EXACT Jaccard values (verified brute-force),
  * replayed appends must not change probe results, and streamed docs
  * must become findable.
  */
class DedupIndexSpec extends SparkSpec {

  private def corpus(seed: Int, n: Int): Seq[(Long, String)] = {
    val r = new scala.util.Random(seed)
    val vocab = Array.tabulate(50)(i => s"tok$i")
    Seq.tabulate(n)(i =>
      (i.toLong, Array.fill(12 + r.nextInt(20))(vocab(r.nextInt(vocab.length))).mkString(" ")))
  }

  /** near-dup of a doc: replace one token in the middle */
  private def mutate(t: String): String = {
    val w = t.split(" ")
    w(w.length / 2) = "MUTATED"
    w.mkString(" ")
  }

  private def bruteJac(a: String, b: String): Double = {
    val sa = SketchOps.shingles64Of(SketchOps.tokensOf(a)).toSet
    val sb = SketchOps.shingles64Of(SketchOps.tokensOf(b)).toSet
    val i = (sa & sb).size
    i.toDouble / (sa.size + sb.size - i)
  }

  test("probes find planted near-dups with exact Jaccard; unrelated docs don't match") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("dedupidx").toString
    val docs = corpus(7, 60)
    DedupIndex.save(s, docs.toDF("id", "text"), dir)
    // probes: mutated copies of docs 3, 17, 41 + two fresh random docs
    val planted = Seq(3, 17, 41).map(i => (1000L + i, mutate(docs(i)._2)))
    val fresh = corpus(999, 2).map { case (i, t) => (2000L + i, t) }
    val got = DedupIndex.probe(s, dir, (planted ++ fresh).toDF("id", "text"), 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    Seq(3, 17, 41).foreach { i =>
      val key = (1000L + i, i.toLong)
      assert(got.contains(key), s"planted near-dup of doc $i not found: $got")
      val want = bruteJac(mutate(docs(i)._2), docs(i)._2)
      assert(math.abs(got(key) - want) < 1e-12, s"jac mismatch for $key")
    }
    assert(!got.keys.exists(_._1 >= 2000L), s"fresh docs matched something: $got")
  }

  test("replayed appends change nothing; streamed docs become findable") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = java.nio.file.Files.createTempDirectory("dedupidx").toString
    val ck1 = java.nio.file.Files.createTempDirectory("dedupidx-ck1").toString
    val ck2 = java.nio.file.Files.createTempDirectory("dedupidx-ck2").toString
    val docs = corpus(11, 40)
    DedupIndex.save(s, docs.take(30).toDF("id", "text"), dir)
    // doc 35 is NOT yet indexed: its mutated probe finds nothing
    val probe35 = Seq((5000L, mutate(docs(35)._2))).toDF("id", "text")
    assert(DedupIndex.probe(s, dir, probe35, 0.5).count() == 0)
    // stream the remaining docs in; now the probe finds doc 35
    val mem = MemoryStream[(Long, String)]
    mem.addData(docs.drop(30): _*)
    val q = DedupIndex.appendStream(s, mem.toDF.toDF("id", "text"), dir, ck1)
    try q.processAllAvailable() finally q.stop()
    val found = DedupIndex.probe(s, dir, probe35, 0.5).collect()
    assert(found.map(_.getLong(1)).toSet == Set(35L))
    // at-least-once: replay the same append; probe output is unchanged
    val mem2 = MemoryStream[(Long, String)]
    mem2.addData(docs.drop(30): _*)
    val q2 = DedupIndex.appendStream(s, mem2.toDF.toDF("id", "text"), dir, ck2)
    try q2.processAllAvailable() finally q2.stop()
    val after = DedupIndex.probe(s, dir, probe35, 0.5).collect()
    assert(after.map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).toSeq ==
      found.map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).toSeq)
  }

  test("dedup-on-ingest: intra-batch, vs-index and vs-earlier-batch dups all drop; replay emits nothing") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = java.nio.file.Files.createTempDirectory("ingest-idx").toString
    val outDir = java.nio.file.Files.createTempDirectory("ingest-out").toString
    val ck = java.nio.file.Files.createTempDirectory("ingest-ck").toString
    val docs = corpus(11, 30)
    DedupIndex.save(s, docs.take(20).toDF("id", "text"), dir)
    val mem = MemoryStream[(Long, String)]
    val sq = DedupIndex.ingestStream(s, mem.toDF.toDF("id", "text"),
      dir, outDir, ck, minJaccard = 0.5)
    try {
      // batch 1: two fresh docs, a near-dup of indexed doc 5, and an
      // intra-batch near-dup pair (101 mutates 100)
      val fresh1 = docs(20)._2; val fresh2 = docs(21)._2
      mem.addData(Seq(
        (100L, fresh1), (101L, mutate(fresh1)),
        (102L, mutate(docs(5)._2)), (103L, fresh2)): _*)
      sq.processAllAvailable()
      val out1 = s.read.parquet(outDir).select("id").collect().map(_.getLong(0)).toSet
      assert(out1 == Set(100L, 103L), s"batch 1 emitted $out1")
      // batch 2: a near-dup of batch 1's survivor 103 (now indexed) +
      // one fresh doc
      mem.addData(Seq((200L, mutate(fresh2)), (201L, docs(22)._2)): _*)
      sq.processAllAvailable()
      val out2 = s.read.parquet(outDir).select("id").collect().map(_.getLong(0)).toSet
      assert(out2 == Set(100L, 103L, 201L), s"batch 2 emitted $out2")
      // replay of batch 1's payload (new delivery, same content+ids):
      // every doc now matches ITSELF in the index at jac 1.0 -> nothing
      // re-emits, nothing re-appends
      mem.addData(Seq((100L, fresh1), (103L, fresh2)): _*)
      sq.processAllAvailable()
      val out3 = s.read.parquet(outDir).select("id").collect()
      assert(out3.length == 3, s"replay re-emitted: ${out3.mkString(",")}")
    } finally sq.stop()
  }

  test("compaction collapses replayed appended rows; probe results unchanged") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = java.nio.file.Files.createTempDirectory("dedupidx-compact").toString
    val docs = corpus(3, 40)
    DedupIndex.save(s, docs.take(30).toDF("id", "text"), dir)
    // append the last 10 docs TWICE (at-least-once redelivery)
    for (i <- 1 to 2) {
      val ck = java.nio.file.Files.createTempDirectory(s"dedupidx-cck$i").toString
      val mem = MemoryStream[(Long, String)]
      mem.addData(docs.drop(30): _*)
      val sq = DedupIndex.appendStream(s, mem.toDF.toDF("id", "text"), dir, ck)
      try sq.processAllAvailable() finally sq.stop()
    }
    val probes = Seq((5000L, mutate(docs(35)._2))).toDF("id", "text")
    val before = DedupIndex.probe(s, dir, probes, 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).toSeq
    val shBefore = s.read.parquet(s"$dir/shingles").count()
    DedupIndex.compact(s, dir)
    val shAfter = s.read.parquet(s"$dir/shingles").count()
    assert(shAfter == 40 && shBefore > shAfter,
      s"compaction: shingles $shBefore -> $shAfter")
    val after = DedupIndex.probe(s, dir, probes, 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).toSeq
    assert(after == before && before.nonEmpty, "compaction changed probe output")
  }

  test("a pathological probe colliding with everything is capped at maxCandidates, smallest ids kept") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("dedupidx-cap").toString
    // 40 IDENTICAL docs: every band of every doc collides with every probe band
    val same = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    DedupIndex.save(s, (0L until 40L).map(i => (i, same)).toDF("id", "text"), dir)
    val probeDoc = Seq((9000L, same)).toDF("id", "text")
    val capped = DedupIndex.probe(s, dir, probeDoc, 0.5, maxCandidates = 5)
      .collect().map(r => r.getLong(1)).sorted.toSeq
    // exactly maxCandidates pairs verified, deterministically the
    // smallest corpus ids (jac = 1.0 for all of them here)
    assert(capped == Seq(0L, 1L, 2L, 3L, 4L), s"capped set was $capped")
    // an uncapped probe still sees all 40
    assert(DedupIndex.probe(s, dir, probeDoc, 0.5).count() == 40)
  }
}
