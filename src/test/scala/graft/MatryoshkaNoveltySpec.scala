package graft

import org.apache.spark.sql.functions._
import graft.llm.{Curation, Eval}

/** Dimension-truncation recall (q412) and the n-gram novelty curve
  * (q413).
  */
class MatryoshkaNoveltySpec extends SparkSpec {

  test("matryoshkaRecall: full-dim prefix recalls perfectly; recall is monotone") {
    val s = spark
    import s.implicits._
    // deterministic 8-dim vectors; query sample = ids % 5 == 0
    val vecs = (0L until 40L).map { i =>
      (i, Array.tabulate(8)(j =>
        (((i * 31 + j * 17) % 13).toFloat - 6f) / 3f))
    }.toDF("vec_id", "embedding")
    val got = Eval.matryoshkaRecall(s, vecs, dims = Seq(2, 4, 8), k = 5,
      querySkip = 5L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3), r.getLong(4))).toMap
    // the full-dim prefix IS the full vector: recall must be exactly 1
    assert(got(8L)._3 == 1000L, s"full-dim prefix must recall perfectly: $got")
    // truncation loses information: strict prefixes recall less than
    // perfect here, and hits stay within the q*k budget (recall is NOT
    // pointwise monotone in d — only the full-dim anchor is invariant)
    Seq(2L, 4L).foreach { dd =>
      val (nq, hits, rec) = got(dd)
      assert(hits <= nq * 5 && rec <= 1000L, s"$dd: $got")
    }
  }

  test("gramNovelty: verbatim re-crawl collapses the tail's novelty to 0") {
    val s = spark
    import s.implicits._
    // first half: unique 8-gram streams; second half verbatim copies
    def text(i: Long) = (0 until 10).map(j => s"w${i}_$j").mkString(" ")
    val docs = ((0L until 16L).map(i => (i, text(i)))
      ++ (16L until 32L).map(i => (i, text(i - 16L))))
      .toDF("doc_id", "text")
    val rows = Curation.gramNovelty(s, docs, k = 8, buckets = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == 4)
    // buckets 1-2 hold the originals: all new; 3-4 the copies: none new
    assert(rows(0)._2 > 0 && rows(0)._2 == rows(0)._3, rows.toSeq)
    assert(rows(1)._2 == rows(1)._3, rows.toSeq)
    assert(rows(2)._3 == 0L && rows(3)._3 == 0L, rows.toSeq)
  }
}
