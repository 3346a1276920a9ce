package graft

import org.apache.spark.sql.functions._
import graft.llm.Dedup

class ContainmentSpec extends SparkSpec {

  private def pairs(docs: Seq[(Long, String)], minMilli: Long):
      Map[(Long, Long), (Long, Long, Long)] = {
    val s = spark
    import s.implicits._
    Dedup.containmentPairs(s, docs.toDF("id", "text"), minMilli)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
  }

  test("an embedded excerpt scores containment 1000 where Jaccard is small") {
    val big = (1 to 60).map(i => s"w$i").mkString(" ")      // 58 shingles
    val excerpt = (10 to 16).map(i => s"w$i").mkString(" ") // 5 shingles, all in big
    val got = pairs(Seq((1L, big), (2L, excerpt)), minMilli = 500)
    val (inter, nSmall, cont) = got((1L, 2L))
    assert(inter == 5L && nSmall == 5L && cont == 1000L)
    // the same pair under Jaccard: 5 / (58 + 5 - 5) ≈ 0.086 — the
    // modality this operator exists to catch
    val s = spark
    import s.implicits._
    val jac = Dedup.jaccardPairs(s,
        Seq((1L, big), (2L, excerpt)).toDF("id", "text"), 0.0)
      .collect().map(r => r.getDouble(3)).head
    assert(jac < 0.1)
  }

  test("threshold filters; disjoint docs never pair") {
    val a = "one two three four five six"
    val b = "one two three four seven eight"   // shares 2 of 4 shingles
    val c = "p q r s t u"                       // disjoint
    val all = pairs(Seq((1L, a), (2L, b), (3L, c)), minMilli = 0)
    assert(all.contains((1L, 2L)))
    assert(!all.keySet.exists { case (x, y) => x == 3L || y == 3L })
    val (inter, nSmall, cont) = all((1L, 2L))
    assert(inter == 2L && nSmall == 4L && cont == 500L)
    assert(pairs(Seq((1L, a), (2L, b), (3L, c)), minMilli = 501).isEmpty)
  }

  test("df-cap drops hot shingles from intersections AND sizes") {
    // shingle "x x x" appears in many docs -> capped out; the remaining
    // overlap between docs 1 and 2 is their private tail
    val hot = "x x x"
    val docs = (3L to 25L).map(i => i -> s"$hot filler$i a$i b$i") ++
      Seq(1L -> s"$hot private tail one", 2L -> s"$hot private tail two")
    val got = pairs(docs, minMilli = 0)
    // docs 1,2 share shingles of "private tail one|two": "x private tail"
    // is NOT shared... their shared kept shingles: "private tail one" vs
    // "private tail two" differ; shared = {"x x private"? no}. Compute:
    // doc1 shingles: [x x x](capped), [x x private], [x private tail],
    // [private tail one]; doc2 likewise with "two". Shared kept =
    // {[x x private], [x private tail]} = 2; sizes = 3 kept each.
    val (inter, nSmall, cont) = got((1L, 2L))
    assert(inter == 2L && nSmall == 3L && cont == (2L * 1000) / 3L)
  }
}
