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
    // localVocabCap = 0 forces the DISTRIBUTED loop; the default-path
    // (local heap) equivalence is pinned separately below
    val got = Bpe.train(s, docs, numMerges = 12, localVocabCap = 0L).map(m => (m.a, m.b))
    val freq = docs.as[(Long, String)].collect()
      .flatMap(_._2.split(" ")).groupBy(identity)
      .map { case (w, g) => w -> g.length.toLong }
    val want = refTrain(freq, 12)
    assert(got == want, s"got $got\nwant $want")
  }

  test("local heap trainer learns the SAME merges as the distributed loop") {
    val s = spark
    import s.implicits._
    val r = new scala.util.Random(23)
    // richer corpus than the parity fixture: overlapping suffixes AND
    // random junk words exercise stale-heap entries and pair re-counts
    val base = Array("low", "lower", "lowest", "slow", "slower", "glow",
      "flow", "flows", "billow", "follow", "hollow", "yellow")
    val docs = Seq.tabulate(120) { i =>
      val junk = Seq.fill(3)(r.alphanumeric.take(2 + r.nextInt(5)).mkString.toLowerCase)
      (i.toLong, (Seq.fill(10)(base(r.nextInt(base.length))) ++ junk).mkString(" "))
    }.toDF("doc_id", "text")
    val local = Bpe.train(s, docs, numMerges = 40).map(m => (m.a, m.b))
    val dist = Bpe.train(s, docs, numMerges = 40, localVocabCap = 0L).map(m => (m.a, m.b))
    assert(local == dist, s"local $local\ndistributed $dist")
    // and both match the slow reference
    val freq = docs.as[(Long, String)].collect()
      .flatMap(_._2.split(" ")).filter(_.nonEmpty).groupBy(identity)
      .map { case (w, g) => w -> g.length.toLong }
    assert(local == refTrain(freq, 40))
  }

  test("local trainer handles a 1000+-merge vocabulary in one call") {
    // parameter scale, not data scale: many distinct words so the pair
    // space supports >1000 merges with count >= 2
    val r = new scala.util.Random(41)
    val vocab = Array.tabulate(6000) { i =>
      val w = Seq.fill(4 + r.nextInt(10))(('a' + r.nextInt(12)).toChar).mkString
      (w, 2L + r.nextInt(50))
    }.distinctBy(_._1)
    val t0 = System.nanoTime()
    val merges = Bpe.trainLocalMerges(vocab, numMerges = 1500)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(merges.length == 1500, s"only ${merges.length} merges learned")
    info(f"1500 merges over ${vocab.length} words in $secs%.2f s")
    // spot-check exactness against the slow reference on the same vocab
    assert(merges.take(50).map(m => (m.a, m.b)) == refTrain(vocab.toMap, 50))
  }

  test("fast tokenizeWord equals naive sequential merge application") {
    val r = new scala.util.Random(29)
    val vocab = Array.tabulate(400) { _ =>
      (Seq.fill(3 + r.nextInt(8))(('a' + r.nextInt(6)).toChar).mkString, 2L + r.nextInt(20))
    }.distinctBy(_._1)
    val merges = Bpe.trainLocalMerges(vocab, numMerges = 200)
    assert(merges.length > 50, s"fixture too small: ${merges.length} merges")
    def naive(word: String): Seq[String] = {
      var sym = Bpe.symbolsOf(word)
      merges.foreach { m => if (sym.length > 1) sym = Bpe.applyMerge(sym, m.a, m.b) }
      sym.toSeq
    }
    val words = vocab.map(_._1) ++ Array.tabulate(200)(_ =>
      Seq.fill(1 + r.nextInt(12))(('a' + r.nextInt(6)).toChar).mkString)
    words.foreach { w =>
      assert(Bpe.tokenizeWord(w, merges).toSeq == naive(w), s"diverged on '$w'")
    }
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

  test("extendMerges continuation ≡ from-scratch training, on both paths and through save/load") {
    val s = spark
    import s.implicits._
    val r = new scala.util.Random(31)
    val base = Array("low", "lower", "lowest", "slow", "slower", "glow",
      "flow", "flows", "billow", "follow", "hollow", "yellow")
    val docs = Seq.tabulate(80) { i =>
      val junk = Seq.fill(2)(r.alphanumeric.take(2 + r.nextInt(4)).mkString.toLowerCase)
      (i.toLong, (Seq.fill(9)(base(r.nextInt(base.length))) ++ junk).mkString(" "))
    }.toDF("doc_id", "text")
    val full = Bpe.train(s, docs, numMerges = 15)
    val part = Bpe.train(s, docs, numMerges = 6)
    assert(full.take(6) == part)
    // local heap continuation: extend-by-9 == train-15
    assert(Bpe.extendMerges(s, docs, part, 9) == full)
    // distributed continuation (cap 0 forces the loop)
    assert(Bpe.extendMerges(s, docs, part, 9, localVocabCap = 0L) == full)
    // and the continuation survives the save/load boundary
    val dir = java.nio.file.Files.createTempDirectory("bpeext").toString
    Bpe.saveTokenizer(s, docs, part, dir)
    assert(Bpe.extendMerges(s, docs, Bpe.loadTokenizer(s, dir).merges, 9) == full)
  }

  test("saveTokenizer -> loadTokenizer is the identity on merges and vocab") {
    val s = spark
    import s.implicits._
    val corpus = Seq((0L, "low low lower lowest"), (1L, "slow lower")).toDF("doc_id", "text")
    val merges = Bpe.train(s, corpus, numMerges = 4)
    assert(merges.nonEmpty)
    val dir = java.nio.file.Files.createTempDirectory("bpesave").toString
    Bpe.saveTokenizer(s, corpus, merges, dir)
    val tok = Bpe.loadTokenizer(s, dir)
    assert(tok.merges == merges, "merge order must survive the round trip")
    // vocab = distinct emission tokens over the corpus, sorted-rank ids
    val expected = corpus.as[(Long, String)].collect()
      .flatMap { case (_, t) => graft.llm.SketchOps.tokensOf(t) }
      .filter(_.nonEmpty)
      .flatMap(w => Bpe.tokenizeWord(w, merges))
      .distinct.sorted.zipWithIndex.toMap
    assert(tok.vocab == expected)
  }

  test("tokenIdStats from the loaded artifact: exact ids in-corpus, loud OOV out") {
    val s = spark
    import s.implicits._
    val corpus = Seq((0L, "low low lower lowest"), (1L, "slow lower")).toDF("doc_id", "text")
    val merges = Bpe.train(s, corpus, numMerges = 4)
    val dir = java.nio.file.Files.createTempDirectory("bpesave").toString
    Bpe.saveTokenizer(s, corpus, merges, dir)
    val tok = Bpe.loadTokenizer(s, dir)
    // serving the training corpus: zero OOV, stats match a hand fold
    val got = Bpe.tokenIdStats(s, corpus, tok).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    def stats(t: String) = {
      val ids = graft.llm.SketchOps.tokensOf(t).filter(_.nonEmpty)
        .flatMap(w => Bpe.tokenizeWord(w, merges).map(tok.vocab))
      (ids.length.toLong, ids.map(_.toLong).sum, 0L)
    }
    assert(got == Map(0L -> stats("low low lower lowest"), 1L -> stats("slow lower")))
    // a doc with characters the vocab never saw: counted as OOV (-1),
    // never silently summed
    val oov = Bpe.tokenIdStats(s, Seq((9L, "low zq")).toDF("doc_id", "text"), tok)
      .collect().map(r => (r.getLong(1), r.getLong(3))).head
    assert(oov._2 == 2L, s"'z' and 'q' are both OOV: $oov")
  }
}
