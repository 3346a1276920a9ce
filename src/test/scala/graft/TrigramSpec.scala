package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.llm.Trigram

class TrigramSpec extends SparkSpec {

  private def docs(rows: Seq[(Long, String)]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("id", "text")
  }

  private def search(rows: Seq[(Long, String)], pattern: String): Seq[Long] = {
    val d = docs(rows)
    Trigram.likeSearch(spark, d, Trigram.buildTrigramPostings(d), pattern)
      .collect().map(_.getLong(0)).toSeq
  }

  test("index path returns exactly the brute LIKE answer") {
    val rows = Seq(
      (1L, "the quick brown fox"),
      (2L, "QUICKLY does it"),
      (3L, "slow and steady"),
      (4L, "quic")) // shares trigrams but not the full pattern
    assert(search(rows, "quick") == Seq(1L, 2L))
    val brute = docs(rows)
      .filter(lower(col("text")).contains("quick"))
      .collect().map(_.getLong(0)).toSeq.sorted
    assert(search(rows, "quick") == brute)
  }

  test("intersection prunes docs sharing only SOME pattern trigrams, verify kills false candidates") {
    // doc 5 contains every trigram of 'abcdef' but scattered, so the
    // posting intersection keeps it — the verify step must reject it
    val rows = Seq((1L, "xxabcdefyy"), (5L, "abcd zz cdef zz bcde"))
    assert(search(rows, "abcdef") == Seq(1L))
  }

  test("case-insensitive across pattern and corpus") {
    assert(search(Seq((1L, "Fast MERGE path")), "fast merge") == Seq(1L))
  }

  test("patterns under 3 chars are rejected, sub-3-char docs index empty") {
    intercept[IllegalArgumentException](search(Seq((1L, "ab")), "ab"))
    assert(search(Seq((1L, "ab"), (2L, "abc")), "abc") == Seq(2L))
  }
}
