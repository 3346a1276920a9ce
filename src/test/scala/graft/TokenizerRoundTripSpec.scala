package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.llm.{Bpe, Unigram, WordPiece}

/** Round-trip property for all three tokenizer families, on random
  * words (incl. astral-plane code points) under randomly trained
  * models: BPE and unigram are LOSSLESS word-level codecs by
  * construction — concatenating the emitted tokens rebuilds the word
  * exactly, merges or vocabulary notwithstanding; WordPiece is
  * lossless exactly up to `[UNK]` (strip the `##` continuations,
  * or the whole word collapsed to the unknown token). These are the
  * invariants a detokenization stage depends on; pinning them here
  * means a trainer or serving change that silently breaks
  * reconstruction fails a spec, not a downstream pipeline.
  *
  * Driver-local: the word-level codecs are pure functions; the
  * corpus-scale paths that wrap them are pinned by q72/q231/q232.
  */
class TokenizerRoundTripSpec extends AnyFunSuite {

  // deterministic word generator over a small alphabet (so merges
  // actually fire) plus occasional multi-char code points
  private def words(seed: Long, n: Int): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    val alpha = "abcde"
    (1 to n).map { _ =>
      val len = 1 + rnd.nextInt(12)
      val sb = new StringBuilder
      (1 to len).foreach { _ =>
        if (rnd.nextInt(10) == 0)
          sb.appendAll(Character.toChars(0x1F600 + rnd.nextInt(16)))
        else sb.append(alpha.charAt(rnd.nextInt(alpha.length)))
      }
      sb.toString
    }
  }

  private def corpusVocab(ws: Seq[String]): Array[(String, Long)] =
    ws.groupBy(identity).map { case (w, g) => (w, g.size.toLong) }.toArray
      .sortBy(_._1)

  test("BPE: concat(tokens) == word for every word, any merge list") {
    for (seed <- 1L to 5L) {
      val ws = words(seed, 200)
      val merges = Bpe.trainLocalMerges(corpusVocab(ws), numMerges = 30)
      ws.foreach { w =>
        val toks = Bpe.tokenizeWord(w, merges)
        assert(toks.mkString == w, s"BPE round-trip broke on '$w'")
        assert(toks.forall(_.nonEmpty))
      }
      // words with symbols the trainer never saw still reconstruct
      Seq("zzyzx", "éé", new String(Character.toChars(0x1F984)))
        .foreach(w => assert(Bpe.tokenizeWord(w, merges).mkString == w))
    }
  }

  test("unigram: concat(pieces) == word, incl. out-of-alphabet chars") {
    for (seed <- 1L to 5L) {
      val ws = words(seed, 200)
      val vocab = Unigram.trainLocal(corpusVocab(ws), targetVocab = 60)
      val score = vocab.scoreOf
      (ws ++ Seq("zzyzx", "q", "aéb")).foreach { w =>
        val pieces = Unigram.segmentWord(w, score, vocab.maxPieceLen)
        assert(pieces.mkString == w, s"unigram round-trip broke on '$w'")
        assert(pieces.forall(_.nonEmpty))
      }
    }
  }

  test("WordPiece: strip-## concat == word, or exactly [UNK]") {
    for (seed <- 1L to 5L) {
      val ws = words(seed, 200)
      val vocab0 = corpusVocab(ws)
      val merges = WordPiece.trainLocalMerges(vocab0, numMerges = 30)
      val chars = vocab0.flatMap { case (w, _) => Bpe.symbolsOf(w) }.toSet
      val vocab = WordPiece.Vocab(chars, merges.map(m => m.a + m.b).toSet)
      (ws ++ Seq("zzyzx", "abcq")).foreach { w =>
        val toks = WordPiece.tokenizeWord(w, vocab)
        if (toks.sameElements(Array("[UNK]"))) {
          // UNK is only legal when some symbol really is out-of-vocab
          assert(Bpe.symbolsOf(w).exists(s => !chars.contains(s)),
            s"'$w' collapsed to [UNK] despite full char coverage")
        } else {
          val rebuilt = toks.map(_.stripPrefix("##")).mkString
          assert(rebuilt == w, s"WordPiece round-trip broke on '$w'")
        }
      }
    }
  }
}
