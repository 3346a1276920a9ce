package graft

import org.apache.spark.sql.functions._
import graft.llm.{Curation, Dedup}

/** Source-priority dedup (q416) and URL canonicalization dedup (q417). */
class PriorityDedupUrlSpec extends SparkSpec {

  test("priorityDedup: the curated source survives, not the smallest id") {
    val s = spark
    import s.implicits._
    // docs 1 (crawl) and 2 (curated) are near-identical; min-id dedup
    // would keep 1 — priority must keep 2. Doc 3 is untouched.
    val shared = (0 until 12).map(j => s"tok$j").mkString(" ")
    val docs = Seq(
      (1L, shared, "crawl"),
      (2L, shared + " tail", "curated"),
      (3L, (0 until 12).map(j => s"other$j").mkString(" "), "crawl")
    ).toDF("doc_id", "text", "source")
    val prio = when(col("source") === "curated", 0L).otherwise(1L)
    val got = Dedup.priorityDedup(s, docs, prio, minJaccard = 0.5)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got("curated") == ((1L, 0L, 1L)), got)
    assert(got("crawl") == ((2L, 1L, 1L)), got) // doc 1 dropped, 3 kept
  }

  test("urlCanonicalDedup: decorations collapse onto one canonical form") {
    val s = spark
    import s.implicits._
    val urls = Seq(
      (1L, "https://www.Site1.com/p/3"),
      (2L, "http://site1.com/p/3/"),
      (3L, "https://site1.com/p/3?utm_source=feed#top"),
      (4L, "https://site2.org/a"),
      (5L, "https://site2.org/b")
    ).toDF("doc_id", "url")
    val got = Curation.urlCanonicalDedup(s, urls)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got("site1.com") == ((3L, 1L, 2L)), got)
    assert(got("site2.org") == ((2L, 2L, 0L)), got)
  }
}
