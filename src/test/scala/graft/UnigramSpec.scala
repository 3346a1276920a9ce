package graft

import graft.llm.Unigram

/** Unigram-LM tokenizer trainer — analytic ground truth for the q231
  * regression pins. Pins: (1) Viterbi segmentation equals brute-force
  * enumeration of ALL segmentations under hand-set scores (incl. the
  * fewer-pieces / longer-last-piece tie order); (2) the local and
  * distributed trainers learn the bit-identical vocabulary on the same
  * corpus (the fast-path contract); (3) coverage — single chars always
  * survive EM + pruning, so any in-alphabet word segments, and unseen
  * chars at serving segment as OOV char pieces instead of crashing;
  * (4) determinism — training twice gives the same vocab; (5) the
  * trainer actually learns: a corpus dominated by a repeated word
  * yields that word as a piece and serving counts it as ONE token.
  */
class UnigramSpec extends SparkSpec {

  private def bruteSegment(word: String, score: Map[String, Double],
      maxLen: Int): Array[String] = {
    // enumerate every segmentation (word lengths here are tiny)
    def all(i: Int): Seq[List[String]] =
      if (i == word.length) Seq(Nil)
      else (1 to math.min(maxLen, word.length - i)).flatMap { l =>
        val p = word.substring(i, i + l)
        val sc = score.contains(p) || l == 1
        if (!sc) Nil else all(i + l).map(p :: _)
      }
    def scoreOf(seg: List[String]): Double =
      seg.map(p => score.getOrElse(p, Unigram.OovLogScore)).sum
    // max score; ties: fewer pieces, then the seg whose pieces are
    // longest-first (equivalently: smaller split points earlier from the
    // END — the DP's "longer last piece" rule applied backwards). The
    // lexicographic-on-lengths-from-the-right order reproduces the DP's
    // choice because the DP makes its tie decision per suffix.
    val cands = all(0)
    assert(cands.nonEmpty)
    cands.maxBy(seg => (scoreOf(seg), -seg.length,
      seg.reverse.map(_.length).toIndexedSeq: IndexedSeq[Int]))(
      Ordering.Tuple3(Ordering.Double.TotalOrdering, Ordering.Int,
        Ordering.Implicits.seqOrdering[IndexedSeq, Int])).toArray
  }

  test("Viterbi equals brute-force enumeration on random scores") {
    var s = 1234L
    def r(): Long = { s = s * 6364136223846793005L + 1442695040888963407L; math.abs(s) }
    val alphabet = "abc"
    for (trial <- 0 until 200) {
      val word = (0 until (2 + (r() % 6)).toInt)
        .map(_ => alphabet((r() % 3).toInt)).mkString
      // random piece set over substrings + all chars, random coarse scores
      val pieces = scala.collection.mutable.HashMap.empty[String, Double]
      alphabet.foreach(c => pieces(c.toString) = -((r() % 5) + 1).toDouble)
      for (i <- 0 until word.length; l <- 2 to math.min(4, word.length - i))
        if (r() % 3 == 0)
          pieces(word.substring(i, i + l)) = -((r() % 5) + 1).toDouble
      val got = Unigram.segmentWord(word, pieces.toMap, 4)
      val want = bruteSegment(word, pieces.toMap, 4)
      assert(got.toSeq == want.toSeq,
        s"trial=$trial word=$word got=${got.toSeq} want=${want.toSeq} pieces=$pieces")
      assert(got.mkString == word) // concatenation restores the word
    }
  }

  private def corpus = Seq(
    "the data table holds the data rows",
    "data rows join the data table",
    "join the rows join the table",
    "holds rows holds data join table the the"
  )

  test("local and distributed trainers learn the identical vocabulary") {
    val s = spark
    import s.implicits._
    val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val local = Unigram.train(s, docs, targetVocab = 40)
    val words = docs.select("text").as[String]
      .flatMap(t => t.trim.toLowerCase.split("\\s+")).filter(_.nonEmpty)
      .groupByKey(identity).count()
    val dist = Unigram.trainDistributed(s, words, targetVocab = 40,
      emIters = 3, maxPieceLen = 6, maxSeed = 4096)
    assert(local.pieces == dist.pieces)
  }

  test("single chars survive; the dominant word becomes one piece") {
    val s = spark
    import s.implicits._
    val docs = Seq((0L, ("data " * 50).trim + " x")).toDF("doc_id", "text")
    val v = Unigram.train(s, docs, targetVocab = 30)
    val pieceSet = v.pieces.map(_._1).toSet
    assert(pieceSet.contains("data"))
    "datx".foreach(c => assert(pieceSet.contains(c.toString), s"char $c"))
    // serving: the dominant word is ONE token; an unseen char is OOV
    // but still segments (one piece), no crash
    val served = Unigram.tokenCounts(s,
      Seq((0L, "data data"), (1L, "zq")).toDF("doc_id", "text"), v)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(served(0L) == 2L)
    assert(served(1L) == 2L) // two OOV char pieces
  }

  test("training is deterministic: two runs, same vocabulary") {
    val s = spark
    import s.implicits._
    val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val a = Unigram.train(s, docs, targetVocab = 40)
    val b = Unigram.train(s, docs, targetVocab = 40)
    assert(a.pieces == b.pieces)
  }

  test("pruning respects the target: |pieces| <= max(target, |chars|)") {
    val s = spark
    import s.implicits._
    val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val v = Unigram.train(s, docs, targetVocab = 12)
    val nChars = v.pieces.count(_._1.length == 1)
    assert(v.pieces.size <= math.max(12, nChars))
  }
}
