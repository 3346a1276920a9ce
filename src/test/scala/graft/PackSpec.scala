package graft

import org.apache.spark.sql.functions._
import graft.llm.Pack

/** Sequence packing: the greedy fit rule, oversize handling, agreement
  * with a local reference over random sizes, and invariance to input
  * partitioning (determinism is a function of ids, not shuffle order).
  */
class PackSpec extends SparkSpec {

  test("packRange: greedy first-fit in id order, oversize docs get their own sequence") {
    // max 10: [4,5] fit (9), 3 starts seq 1, 12 (oversize) seq 2, 2 seq 3
    val got = Pack.packRange(
      Seq((3L, 3L), (1L, 4L), (2L, 5L), (4L, 12L), (5L, 2L)), maxTokens = 10)
    assert(got == Seq((1L, 0), (2L, 0), (3L, 1), (4L, 2), (5L, 3)))
    // an oversize FIRST doc still occupies seq 0
    assert(Pack.packRange(Seq((0L, 99L), (1L, 1L)), 10) == Seq((0L, 0), (1L, 1)))
    assert(Pack.packRange(Seq.empty, 10).isEmpty)
  }

  test("distributed packing matches the local reference and ignores input partitioning") {
    val s = spark
    import s.implicits._
    val r = new scala.util.Random(23)
    val docs = Seq.tabulate(300)(i =>
      (i.toLong, Array.fill(1 + r.nextInt(40))("w").mkString(" ")))
    def run(parts: Int) =
      Pack.packSequences(s, docs.toDF("doc_id", "text").repartition(parts),
          maxTokens = 64, docsPerRange = 50)
        .collect().map(x => (x.getLong(1), x.getLong(0))).sorted.toSeq
    val a = run(1); val b = run(7)
    assert(a == b, "packing depends on input partitioning")
    // local reference: pack each 50-id range greedily
    val want = docs.groupBy(_._1 / 50).toSeq.flatMap { case (part, ds) =>
      Pack.packRange(ds.map { case (i, t) => (i, t.split(" ").length.toLong) }, 64)
        .map { case (id, seq) => (id, part * 100000L + seq) }
    }.sorted
    assert(a == want)
  }
}
