package graft

import org.apache.spark.sql.functions._
import graft.llm.Chunk

class ChunkSpec extends SparkSpec {

  test("windows, stride, overlap, and the tail rule on a known doc") {
    val s = spark
    import s.implicits._
    val doc = (1 to 10).map(i => s"t$i").mkString(" ")
    val got = Chunk.chunkDocuments(Seq((1L, doc)).toDF("doc_id", "text"), 4, 3)
      .orderBy("chunk_idx")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    assert(got.toSeq == Seq(
      (0L, 0L, 4L, "t1 t2 t3 t4"),
      (1L, 3L, 4L, "t4 t5 t6 t7"),
      (2L, 6L, 4L, "t7 t8 t9 t10"),
      (3L, 9L, 1L, "t10")))  // tail covered exactly once, short chunk
  }

  test("every token lands in at least one chunk; adjacent chunks " +
      "overlap by window - stride (property)") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(9)
    val docs = (1L to 30L).map { i =>
      (i, (0 until (1 + rnd.nextInt(60))).map(j => s"w${i}_$j").mkString(" "))
    }.toDF("doc_id", "text")
    val w = 8; val st = 5
    val chunks = Chunk.chunkDocuments(docs, w, st)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getString(4)))
      .groupBy(_._1)
    docs.collect().foreach { r =>
      val id = r.getLong(0); val toks = r.getString(1).split("\\s+")
      val cs = chunks(id).sortBy(_._2)
      // coverage: concatenating each chunk's NEW tokens (those past the
      // previous chunk's window) reproduces the document
      val rebuilt = cs.flatMap { case (_, start, text) =>
        text.split(" ").drop(if (start == 0) 0 else (w - st) max 0)
      }
      // disjoint reconstruction only holds when stride covers the
      // window gap; with overlap w-st, chunk i starts at i*st and the
      // previous window ends at (i-1)*st + w, so new tokens begin at
      // index w-st within the chunk
      assert(rebuilt.toSeq == toks.toSeq, s"doc $id")
      // overlap: consecutive chunks share exactly w - st tokens when
      // both are full windows
      cs.sliding(2).foreach {
        case Array((_, s1, t1), (_, s2, t2)) =>
          val a = t1.split(" "); val b = t2.split(" ")
          if (a.length == w && b.length >= w - st)
            assert(a.takeRight(w - st).toSeq == b.take(w - st).toSeq)
        case _ =>
      }
    }
  }

  test("guards: stride >= 1, window >= stride") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "a b c")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] { Chunk.chunkDocuments(df, 4, 0) }
    intercept[IllegalArgumentException] { Chunk.chunkDocuments(df, 2, 3) }
  }
}
