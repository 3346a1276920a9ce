package graft

import org.apache.spark.sql.functions._
import graft.llm.Pack

/** Streaming WebDataset shard sink (q431): exactly-once (batch, slot)
  * manifest under the planted mid-stream failure + checkpoint replay,
  * against a fixture corpus small enough to verify by hand.
  */
class StreamShardSinkSpec extends SparkSpec {

  test("streamShardSink: replayed batch overwrites, manifest matches batch math") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-q431-spec")
    val docs = (0L until 12L)
      .map(i => (i, s"doc $i body " + ("x" * (i * 37 % 600).toInt)))
      .toDF("doc_id", "text")
      .withColumn("source", concat(lit("src"), col("doc_id") % 2))
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // the sink itself REQUIREs: phase-1 planted failure fired, disk
    // file count == manifest rows, file sizes == tar_bytes — so just
    // reaching here already proves the exactly-once invariants
    val got = Pack.streamShardSink(s, dir.toString, slots = 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))
      .toMap
    // 12 dense doc ids over 3 batches x 4 slots: each (batch, slot)
    // holds exactly one doc (doc_id = 3a + ... solves to one id)
    assert(got.size == 12, got)
    (0L until 12L).foreach { i =>
      val key = (i % 3, i % 4)
      val textBytes = (s"doc $i body " + ("x" * (i * 37 % 600).toInt))
        .getBytes("UTF-8").length.toLong
      val expTar = 512L + (textBytes + 511L) / 512L * 512L + 1024L
      assert(got(key) == ((1L, textBytes, expTar, true)),
        s"doc $i at $key: ${got(key)} vs ($textBytes, $expTar)")
    }
  }

  test("streamCuratedShards: arrival-order dedup + gates across the replay") {
    val s = spark
    import s.implicits._
    val base = Iterator
      .continually("the cat runs fast and dogs jump over lazy rivers")
      .take(6).mkString(" ") // 60 words: passes every Gopher gate
    val dir = java.nio.file.Files.createTempDirectory("graft-q437-spec")
    val docs = Seq(
      (0L, base, "sA"),                    // b0: kept -> (0, slot 0)
      (1L, "  " + base.toUpperCase, "sA"), // b1: dup of 0 -> dropped
      (2L, "too short", "sB"),             // b2: gate fail
      (3L, base + " alpha beta", "sB"),    // b0: kept -> (0, slot 3)
      (4L, base + " gamma delta", "sA"),   // b1: kept -> (1, slot 0)
      (5L, base + " gamma  DELTA", "sB"),  // b2: dup of 4 -> dropped
      (6L, base + " same batch", "sA"),    // b0: kept -> (0, slot 2)
      (9L, base + "  same   BATCH", "sB")  // b0: same-batch dup, 6 wins
    ).toDF("doc_id", "text", "source")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Pack.streamCuratedShards(s, dir.toString, slots = 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    def b(t: String) = t.getBytes("UTF-8").length.toLong
    assert(got == Map(
      (0L, 0L) -> ((1L, b(base))),
      (0L, 2L) -> ((1L, b(base + " same batch"))),
      (0L, 3L) -> ((1L, b(base + " alpha beta"))),
      (1L, 0L) -> ((1L, b(base + " gamma delta")))), got)
  }
}
