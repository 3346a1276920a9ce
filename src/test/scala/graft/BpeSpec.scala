package graft

import org.apache.spark.sql.functions._
import graft.llm.Bpe

/** The distributed BPE trainer against a slow single-machine reference
  * (same tie-break), the classic Sennrich corpus shape, the greedy
  * merge convention, unicode symbol splitting, and the lossless
  * token↔text property.
  */
class BpeSpec extends SparkSpec {

  /** slow reference: word-freq map, exact pair counts, same tie-break */
  private def refTrain(freq: Map[String, Long], n: Int): Seq[(String, String)] = {
    var words = freq.toSeq.map { case (w, f) => (Bpe.symbolsOf(w), f) }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var i = 0
    while (i < n) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (sym, f) =>
        (0 until sym.length - 1).foreach { j =>
          counts((sym(j), sym(j + 1))) = counts.getOrElse((sym(j), sym(j + 1)), 0L) + f
        }
      }
      val best = counts.toSeq
        .sortBy { case ((a, b), c) => (-c, a, b) }.headOption.filter(_._2 >= 2)
      best match {
        case None => i = n
        case Some(((a, b), _)) =>
          out += ((a, b))
          words = words.map { case (sym, f) => (Bpe.applyMerge(sym, a, b), f) }
          i += 1
      }
    }
    out.toSeq
  }

  test("symbolsOf splits code points, including beyond the BMP") {
    assert(Bpe.symbolsOf("abc").toSeq == Seq("a", "b", "c"))
    assert(Bpe.symbolsOf("a😀b").toSeq == Seq("a", "😀", "b"))
  }

  test("applyMerge is left-to-right greedy: aaa under (a,a) -> [aa, a]") {
    assert(Bpe.applyMerge(Array("a", "a", "a"), "a", "a").toSeq == Seq("aa", "a"))
    assert(Bpe.applyMerge(Array("a", "b", "a", "b"), "a", "b").toSeq == Seq("ab", "ab"))
  }

  test("distributed training matches the reference on a random corpus") {
    val s = spark
    import s.implicits._
    val r = new scala.util.Random(17)
    val vocabWords = Array("low", "lower", "lowest", "newer", "newest",
      "wide", "wider", "widest", "bright", "brighter")
    val docs = Seq.tabulate(50)(i =>
      (i.toLong, Array.fill(8 + r.nextInt(10))(vocabWords(r.nextInt(vocabWords.length)))
        .mkString(" "))).toDF("doc_id", "text")
    val got = Bpe.train(s, docs, numMerges = 12).map(m => (m.a, m.b))
    val freq = docs.as[(Long, String)].collect()
      .flatMap(_._2.split(" ")).groupBy(identity)
      .map { case (w, g) => w -> g.length.toLong }
    val want = refTrain(freq, 12)
    assert(got == want, s"got $got\nwant $want")
  }

  test("training stops when no pair repeats, instead of learning noise") {
    val s = spark
    import s.implicits._
    val docs = Seq((0L, "abc def")).toDF("doc_id", "text")
    // every adjacent pair occurs once: nothing reaches the count-2 bar
    assert(Bpe.train(s, docs, numMerges = 5).isEmpty)
  }

  test("tokens reassemble the word exactly (lossless)") {
    val merges = Seq(Bpe.Merge("l", "o"), Bpe.Merge("lo", "w"),
      Bpe.Merge("e", "r"), Bpe.Merge("low", "er"))
    Seq("low", "lower", "lowest", "slower", "xyz", "l").foreach { w =>
      assert(Bpe.tokenizeWord(w, merges).mkString == w, s"lossy for '$w'")
    }
  }

  test("tokenCounts equals per-word tokenization summed") {
    val s = spark
    import s.implicits._
    val docs = Seq((0L, "low lower low"), (1L, "  lowest  "), (2L, "")).toDF("doc_id", "text")
    val merges = Bpe.train(s, Seq((0L, "low low lower lowest")).toDF("doc_id", "text"), 4)
    val got = Bpe.tokenCounts(s, docs, merges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def cnt(t: String) = graft.llm.SketchOps.tokensOf(t)
      .filter(_.nonEmpty).map(w => Bpe.tokenizeWord(w, merges).length.toLong).sum
    assert(got == Map(0L -> cnt("low lower low"), 1L -> cnt("  lowest  "), 2L -> 0L))
  }
}
