package graft

import org.apache.spark.sql.functions._
import graft.llm.{Curation, Dedup}

/** Cross-source duplication matrix (q414) and the Gopher within-doc
  * repetition filter (q415).
  */
class DupMatrixRepetitionSpec extends SparkSpec {

  test("sourceDupMatrix: planted cross-source copies land in the right cell") {
    val s = spark
    import s.implicits._
    def base(i: Long) = (0 until 12).map(j => s"tok${i}_$j").mkString(" ")
    val docs = Seq(
      (1L, base(1), "mirror_a"), (2L, base(1) + " extra", "mirror_b"),
      (3L, base(3), "mirror_a"), (4L, base(3) + " extra", "mirror_b"),
      (5L, base(5), "solo"), (6L, base(6), "solo")
    ).toDF("doc_id", "text", "source")
    val got = Dedup.sourceDupMatrix(s, docs, minJaccard = 0.5)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(got == Map(("mirror_a", "mirror_b") -> 2L), got)
  }

  test("repetitionFilter: looping boilerplate flags, varied prose does not") {
    val s = spark
    import s.implicits._
    val looping = Seq.fill(30)("buy now").mkString(" ") // one 2-gram loops
    val varied = (0 until 60).map(j => s"w$j").mkString(" ")
    val docs = Seq(
      (1L, looping, "spam"), (2L, varied, "clean"), (3L, varied, "clean")
    ).toDF("doc_id", "text", "source")
    val got = Curation.repetitionFilter(s, docs)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    // "buy now buy now ...": "now buy"/"buy now" each ~half the 2-grams
    // (top2 ~508 > 200), every 3-gram and 6-gram repeats (dup6 = 1000)
    assert(got("spam") == ((1L, 1L, 1L, 1L, 1L)), got)
    assert(got("clean") == ((2L, 0L, 0L, 0L, 0L)), got)
  }
}
