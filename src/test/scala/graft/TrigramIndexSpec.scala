package graft

import org.apache.spark.sql.functions._
import graft.llm.Trigram

/** Pins the persisted trigram index lifecycle (q343): probe ≡ scan-path
  * likeSearch ≡ brute LIKE, bucket partition pruning, at-least-once
  * append safety, and compaction parity.
  */
class TrigramIndexSpec extends SparkSpec {

  private def corpus = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "the fast merge join wins"),
      (2L, "a FAST MERGE in caps"),
      (3L, "fast but no merge here"),
      (4L, "merge fast reversed order"),   // has all grams of "fast merge"? no: lacks "t m" etc.
      (5L, "unrelated text entirely"),
      (6L, "prefix fast mergers suffix")   // contains "fast merge" as infix of "fast mergers"
    ).toDF("id", "text")
  }

  test("probe is bit-identical to likeSearch and to the brute LIKE scan") {
    val s = spark
    val docs = corpus
    val dir = java.nio.file.Files.createTempDirectory("trgmidx").toString
    Trigram.saveTrigram(s, docs, dir, buckets = 8)
    val brute = docs.filter(lower(col("text")).contains("fast merge"))
      .select(col("id")).orderBy("id").collect().map(_.getLong(0)).toSeq
    val scan = Trigram.likeSearch(s, docs,
        Trigram.buildTrigramPostings(docs), "fast merge")
      .collect().map(_.getLong(0)).toSeq
    val probe = Trigram.probeTrigram(s, dir, "fast merge", buckets = 8)
      .collect().map(_.getLong(0)).toSeq
    assert(brute == Seq(1L, 2L, 6L))
    assert(scan == brute && probe == brute)
  }

  test("probe plan prunes to the pattern's gram buckets") {
    val s = spark
    val dir = java.nio.file.Files.createTempDirectory("trgmidx2").toString
    Trigram.saveTrigram(s, corpus, dir, buckets = 8)
    val plan = Trigram.probeTrigram(s, dir, "fast merge", buckets = 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"),
      "probe scan must carry a bucket partition filter")
  }

  test("duplicate appends are harmless; compaction restores fresh-build layout") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val base = corpus.filter(col("id") <= 4)
    val dir = java.nio.file.Files.createTempDirectory("trgmidx3").toString
    val ck = java.nio.file.Files.createTempDirectory("trgmidx3-ck").toString
    Trigram.saveTrigram(s, base, dir, buckets = 8)
    val mem = MemoryStream[(Long, String)]
    val q = Trigram.appendTrigramStream(s,
      mem.toDF.toDF("id", "text"), dir, ck, buckets = 8)
    // the same new docs arrive TWICE (at-least-once replay)
    val nw = Seq((5L, "unrelated text entirely"),
      (6L, "prefix fast mergers suffix"))
    mem.addData(nw: _*); q.processAllAvailable()
    mem.addData(nw: _*); q.processAllAvailable()
    q.stop()
    val probeDup = Trigram.probeTrigram(s, dir, "fast merge", buckets = 8)
      .collect().map(_.getLong(0)).toSeq
    assert(probeDup == Seq(1L, 2L, 6L),
      "replayed appends must not change the answer")
    Trigram.compactTrigram(s, dir)
    val post = s.read.parquet(s"$dir/postings")
    assert(post.count() == post.dropDuplicates("gram", "id").count(),
      "compaction must leave exactly one posting row per (gram, id)")
    val probeCompact = Trigram.probeTrigram(s, dir, "fast merge", buckets = 8)
      .collect().map(_.getLong(0)).toSeq
    assert(probeCompact == Seq(1L, 2L, 6L))
  }

  test("sub-3-char pattern raises instead of degrading to a scan; odd column names survive") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("trgmidx4").toString
    Trigram.saveTrigram(s, corpus, dir, buckets = 8)
    intercept[IllegalArgumentException] {
      Trigram.probeTrigram(s, dir, "ab", buckets = 8)
    }
    // the ADVICE fix: a text column name needing backtick quoting must
    // not break the spliced transform expression
    val odd = Seq((1L, "fast merge here")).toDF("id", "my text.col")
    val grams = Trigram.buildTrigramPostings(odd, text = "my text.col")
      .collect().map(_.getString(1)).toSet
    assert(grams.contains("fas") && grams.contains(" me"))
  }
}
