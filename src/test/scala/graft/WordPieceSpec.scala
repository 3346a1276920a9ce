package graft

import graft.llm.{Bpe, WordPiece}

/** WordPiece trainer + longest-match serving — analytic ground truth
  * for the q232 regression pins. Pins: (1) the likelihood argmax on a
  * hand-built corpus, INCLUDING a case where it disagrees with BPE's
  * frequency argmax (the objective is the operator's identity — if the
  * two ever agree everywhere the trainer is just BPE); (2) local ≡
  * distributed merge equality; (3) longest-match serving semantics —
  * `##` continuation, greediness (longest symbol wins even when a
  * shorter split would cover more), UNK on out-of-alphabet chars;
  * (4) determinism.
  */
class WordPieceSpec extends SparkSpec {

  test("likelihood argmax picks the exclusive pair over the frequent one") {
    // 'xy' occurs 6 times but x,y also occur apart (x:10, y:10);
    // 'qz' occurs only 3 times but q,z occur NOWHERE else (q:3, z:3).
    //   score(x,y) = 6/100 = 0.06;  score(q,z) = 3/9 = 0.333 -> qz wins
    // BPE's frequency argmax on the same corpus picks (x,y) first.
    val vocab = Array(
      ("xy", 6L),   // x-y adjacent 6×
      ("x", 4L), ("y", 4L), // x,y apart (totals 10 each)
      ("qz", 3L))   // q-z adjacent and exclusive
    val wp = WordPiece.trainLocalMerges(vocab, 1)
    assert(wp == Seq(WordPiece.Merge("q", "z")))
    val bpe = Bpe.trainLocalMerges(vocab, 1)
    assert(bpe == Seq(Bpe.Merge("x", "y"))) // the objectives disagree
  }

  test("ties: equal scores resolve by higher count, then (a, b) asc") {
    // equal rationals: (a,b) 4/(4·4) = 0.25 and (p,q) 2/(2·4) = 0.25
    // (the extra standalone 'q' word lifts c(q) to 4) — the exact
    // cross-multiplied compare sees the tie, count 4 > 2 -> (a,b) wins
    val vocab = Array(("ab", 4L), ("pq", 2L), ("q", 2L))
    assert(WordPiece.trainLocalMerges(vocab, 1).head == WordPiece.Merge("a", "b"))
  }

  test("local and distributed trainers learn identical merges") {
    val s = spark
    import s.implicits._
    val corpus = Seq(
      "the data table holds the data rows",
      "data rows join the data table",
      "join the rows join the table the")
    val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val (local, _) = WordPiece.train(s, docs, numMerges = 8)
    val words = docs.select("text").as[String]
      .flatMap(t => t.trim.toLowerCase.split("\\s+")).filter(_.nonEmpty)
      .groupByKey(identity).count()
    val dist = WordPiece.trainDistributedMerges(s, words, numMerges = 8)
    assert(local == dist)
  }

  test("longest-match serving: ## continuation, greediness, UNK") {
    val v = WordPiece.Vocab(
      chars = Set("u", "n", "a", "b", "l", "e"),
      merged = Set("un", "able", "unab"))
    // greedy takes 'unab' (longest at 0), then falls back to chars —
    // NOT the 'un'+'able' split a minimal-piece tokenizer would find
    assert(WordPiece.tokenizeWord("unable", v).toSeq
      == Seq("unab", "##l", "##e"))
    assert(WordPiece.tokenizeWord("able", v).toSeq == Seq("able"))
    assert(WordPiece.tokenizeWord("banana", v).toSeq
      == Seq("b", "##a", "##n", "##a", "##n", "##a"))
    // out-of-alphabet char -> whole-word UNK (the BERT convention)
    assert(WordPiece.tokenizeWord("uzble", v).toSeq == Seq("[UNK]"))
    assert(WordPiece.tokenizeWord("", v).isEmpty)
  }

  test("training is deterministic and serving counts are stable") {
    val s = spark
    import s.implicits._
    val docs = Seq((0L, "aa ab aa ab ba aa"), (1L, "ab aa ba ba"))
      .toDF("doc_id", "text")
    val (m1, v1) = WordPiece.train(s, docs, numMerges = 3)
    val (m2, v2) = WordPiece.train(s, docs, numMerges = 3)
    assert(m1 == m2 && v1 == v2)
    val c1 = WordPiece.tokenCounts(s, docs, v1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val c2 = WordPiece.tokenCounts(s, docs, v2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(c1 == c2)
    assert(c1.values.forall(_ > 0))
  }
}
