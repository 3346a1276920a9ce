package graft

import org.apache.spark.sql.functions._
import graft.llm.Curation

/** The composed end-to-end training-data plan (q430): Gopher gates ->
  * normalized dedup -> sqrt-temperature mixture -> epoch water-filling
  * -> shard manifest, plus the single-scan claim the scaladoc makes.
  */
class TrainingDataPlanSpec extends SparkSpec {

  // 60 words, >=2 stop words, mean word length in [3,10], all
  // alphabetic, no symbols: passes every Gopher structural gate
  private val passing: String =
    Iterator.continually("the cat runs fast and dogs jump over lazy rivers")
      .take(6).mkString(" ")

  test("plan: each stage's accounting lands on the planted fixture") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (0L, passing, "src0"),                        // kept winner
      (1L, "  " + passing.toUpperCase + "  ", "src0"), // normalized dup of 0
      (2L, "too short to pass the gates", "src1"),  // quality fail
      (3L, passing + " extra tail words here now", "src1") // kept unique
    ).toDF("doc_id", "text", "source")
    val rows = Curation.trainingDataPlan(s, docs).collect()
      .map(r => r.getString(0) -> r).toMap
    val s0 = rows("src0"); val s1 = rows("src1")
    // src0: 2 docs, none fail, one normalized dup dropped, 60 tokens kept
    assert(s0.getLong(1) == 2L && s0.getLong(2) == 0L &&
      s0.getLong(3) == 1L && s0.getLong(4) == 1L && s0.getLong(5) == 60L, s0)
    // src1: 2 docs, one quality fail, no dups, 65 tokens kept
    assert(s1.getLong(1) == 2L && s1.getLong(2) == 1L &&
      s1.getLong(3) == 0L && s1.getLong(4) == 1L && s1.getLong(5) == 65L, s1)
    // caps: src0 -> 1000 milli, src1 -> 2000 milli (the q428 rule);
    // budget 2x(125) = 250 tokens > capped max 60 + 130 = 190, so every
    // cap binds: epochs == cap, alloc = cap*tokens/1000
    assert(s0.getLong(7) == 1000L && s0.getLong(8) == 1000L &&
      s0.getLong(9) == 60L, s0)
    assert(s1.getLong(7) == 2000L && s1.getLong(8) == 2000L &&
      s1.getLong(9) == 130L, s1)
    // mixture: wm = round(sqrt(60)*1000) = 7746, round(sqrt(65)*1000)
    // = 8062; tot = 15808 -> 490 and 509 milli
    assert(s0.getLong(6) == 7746L * 1000L / 15808L, s0)
    assert(s1.getLong(6) == 8062L * 1000L / 15808L, s1)
    // shard manifest at 4096 tokens/shard: both fit one partial shard
    assert(s0.getLong(10) == 1L && s0.getLong(11) == 60L, s0)
    assert(s1.getLong(10) == 1L && s1.getLong(11) == 130L, s1)
  }

  test("plan: epochs level below caps when the budget binds") {
    val s = spark
    import s.implicits._
    // same fixture but a tiny budget: shrink via a custom-capped call
    // is not exposed; instead plant sources whose caps CANNOT bind
    // (cap 4000 milli on src3) so lambda cuts below it
    val docs = Seq(
      (0L, passing, "src3"), // cap 1000*(1+3%4) = 4000 milli
      (1L, passing + " unique second doc body text", "src7") // cap 4000
    ).toDF("doc_id", "text", "source")
    val rows = Curation.trainingDataPlan(s, docs).collect()
      .map(r => r.getString(0) -> r).toMap
    // budget = 2x(60+65) = 250 tokens; caps allow 4x each = 500 ->
    // budget binds: lambda = 250000/125 = 2000 milli for both
    assert(rows("src3").getLong(8) == 2000L, rows("src3"))
    assert(rows("src7").getLong(8) == 2000L, rows("src7"))
    assert(rows("src3").getLong(9) + rows("src7").getLong(9) == 250L)
  }

  test("curatedShards: only gate+dedup survivors land in the tars") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (0L, passing, "src0"),                           // kept -> shard 0
      (1L, "  " + passing.toUpperCase + "  ", "src0"), // dup of 0: dropped
      (2L, "too short to pass the gates", "src1"),     // gate fail
      (3L, passing + " extra tail words here now", "src1") // kept -> shard 3
    ).toDF("doc_id", "text", "source")
    val got = Curation.curatedShards(s, docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(4)))
      .toMap
    def tarLen(t: String) = t.getBytes("UTF-8").length.toLong
    assert(got == Map(
      0L -> ((1L, tarLen(passing), true)),
      3L -> ((1L, tarLen(passing + " extra tail words here now"), true))), got)
  }

  test("plan: the corpus parquet is scanned exactly once (shared pass)") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-q430-scan")
    val docs = Seq(
      (0L, passing, "src0"),
      (1L, passing + " more body", "src1")
    ).toDF("doc_id", "text", "source")
    docs.write.mode("overwrite").parquet(s"$dir/docs")
    val src = s.read.parquet(s"$dir/docs")
    // (a) the one text pass — signals + dedup hash + token count from
    // a single select chain — holds exactly ONE file scan
    val onePass = Curation.gopherSignals(src)
      .withColumn("nh", xxhash64(Curation.normalizeText(s, col("text"))))
      .select(col("doc_id"), col("source"), col("nw"), col("nh"),
        Curation.gopherFail().as("fail"))
    val passPlan = onePass.queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(passPlan).size == 1, passPlan)
    // (b) the composed plan's final stage never re-reads the corpus:
    // everything downstream runs on the checkpointed narrow table
    val plan = Curation.trainingDataPlan(s, src)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Scan parquet"), plan)
  }
}
