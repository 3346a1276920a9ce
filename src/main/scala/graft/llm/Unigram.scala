package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.rel.RelQueries.Q
import graft.rel.Tables

/** UNIGRAM-LM (SentencePiece-style) tokenizer trainer (Kudo, "Subword
  * Regularization: Improving Neural Network Translation Models with
  * Multiple Subword Candidates", ACL 2018 — the unigram language model
  * of §3): the OTHER mainstream subword tokenizer. Where BPE
  * ([[Bpe]]) greedily fuses the most frequent pair, the unigram model
  * keeps a vocabulary of candidate PIECES with probabilities and
  * segments each word by maximum likelihood (Viterbi over the
  * substring lattice); training alternates segmentation and count
  * re-estimation (EM) and then prunes to the target vocabulary.
  *
  * This implementation is the deterministic hard-EM (Viterbi-EM)
  * variant: the E-step assigns each word its single best segmentation
  * (ties broken by a pinned total order), so all piece counts stay
  * EXACT integers and the learned vocabulary is pinnable literally —
  * the same exactness discipline as the BPE trainer's (count desc, a
  * asc, b asc) argmax. Piece log-probabilities are ln(count)−ln(total):
  * doubles, but derived from identical integer counts on every path,
  * so the local and distributed loops segment identically
  * (UnigramSpec pins local ≡ distributed bit-equality).
  *
  * Scale shape (100 TB): the corpus is touched ONCE — the same
  * (word, freq) hash-agg as the BPE trainer; seeding and every EM
  * iteration run over that vocabulary table, which is
  * corpus-size-INDEPENDENT. Under `localVocabCap` the whole loop runs
  * on the driver (the standard regime — vocabularies are a few million
  * words); past the cap the distributed loop takes over: per iteration
  * one narrow map over the word table (Viterbi under the BROADCAST
  * piece table — pieces are vocabulary-bounded by construction) plus a
  * piece-keyed hash agg whose result (≤ |pieces| rows) comes back to
  * the driver. No shuffle ever carries more than the piece-count
  * table; serving is a pure executor function over broadcast pieces.
  */
object Unigram {

  /** trained model: pieces with final Viterbi-EM counts, in the pinned
    * (count desc, piece asc) order; single characters always survive
    * (coverage floor — count ≥ 1) so any in-alphabet word segments.
    */
  final case class Vocab(pieces: Seq[(String, Long)]) {
    lazy val scoreOf: Map[String, Double] = {
      val total = pieces.iterator.map(_._2).sum.toDouble
      pieces.iterator.map { case (p, c) =>
        p -> (math.log(c.toDouble) - math.log(total))
      }.toMap
    }
    lazy val maxPieceLen: Int =
      if (pieces.isEmpty) 1 else pieces.iterator.map(_._1.length).max
  }

  /** per-OOV-character penalty: far below any real piece score, so a
    * covered segmentation always beats one that invents an unknown
    * char, while unseen serving text still segments (one piece per
    * unknown char) instead of crashing
    */
  private[graft] val OovLogScore = -1e6

  /** max-likelihood segmentation of `word` under piece scores —
    * Viterbi over the substring lattice. Ties (score-equal paths) are
    * broken by FEWER pieces, then by the longer last piece (smaller
    * split point), a pinned total order, so the chosen segmentation is
    * deterministic on every engine path.
    */
  private[graft] def segmentWord(word: String, score: Map[String, Double],
      maxLen: Int): Array[String] = {
    val n = word.length
    if (n == 0) return Array.empty
    val best = new Array[Double](n + 1)
    val bestPieces = new Array[Int](n + 1)
    val back = new Array[Int](n + 1) // split point j for prefix i
    var i = 1
    while (i <= n) {
      var found = false
      var bScore = Double.NegativeInfinity
      var bPieces = Int.MaxValue
      var bJ = -1
      val j0 = math.max(0, i - maxLen)
      var j = j0
      while (j < i) {
        val piece = word.substring(j, i)
        val sc = score.get(piece) match {
          case Some(v) => Some(v)
          case None if i - j == 1 => Some(OovLogScore) // unknown char
          case None => None
        }
        sc.foreach { v =>
          val cand = best(j) + v
          val candPieces = bestPieces(j) + 1
          val better = !found || cand > bScore ||
            (cand == bScore && (candPieces < bPieces ||
              (candPieces == bPieces && j < bJ)))
          if (better) {
            found = true; bScore = cand; bPieces = candPieces; bJ = j
          }
        }
        j += 1
      }
      // a length-1 step always exists (real piece or OOV floor), so
      // every prefix is reachable
      best(i) = bScore; bestPieces(i) = bPieces; back(i) = bJ
      i += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var k = n
    while (k > 0) { out += word.substring(back(k), k); k = back(k) }
    out.reverseIterator.toArray
  }

  /** seed candidates from a (word, freq) vocabulary: every substring up
    * to `maxPieceLen` chars, counted freq-weighted over all (possibly
    * overlapping) occurrences; all single chars survive unconditionally,
    * multi-char pieces keep the top `maxSeed` by (count desc, piece asc)
    * among those seen ≥ 2 times. Vocabulary-bounded work:
    * Σ |w|·maxPieceLen per distinct word.
    */
  private[graft] def seedPieces(vocab0: Array[(String, Long)],
      maxPieceLen: Int, maxSeed: Int): Map[String, Long] = {
    val counts = scala.collection.mutable.HashMap.empty[String, Long]
    vocab0.foreach { case (w, f) =>
      var i = 0
      while (i < w.length) {
        var l = 1
        while (l <= maxPieceLen && i + l <= w.length) {
          val p = w.substring(i, i + l)
          counts.update(p, counts.getOrElse(p, 0L) + f)
          l += 1
        }
        i += 1
      }
    }
    val chars = counts.filter(_._1.length == 1)
    val multis = counts.iterator
      .filter { case (p, c) => p.length > 1 && c >= 2 }
      .toArray
      .sortBy { case (p, c) => (-c, p) }
      .take(maxSeed)
    (chars ++ multis).toMap
  }

  /** one hard-EM count re-estimation given current counts: Viterbi-
    * segment every vocab word, sum freq-weighted piece usage. Single
    * chars keep a count floor of 1 (coverage must survive pruning).
    */
  private def reestimate(vocab0: Array[(String, Long)],
      counts: Map[String, Long]): Map[String, Long] = {
    val v = Vocab(counts.toSeq.sortBy { case (p, c) => (-c, p) })
    val next = scala.collection.mutable.HashMap.empty[String, Long]
    vocab0.foreach { case (w, f) =>
      segmentWord(w, v.scoreOf, v.maxPieceLen).foreach { p =>
        next.update(p, next.getOrElse(p, 0L) + f)
      }
    }
    keepAlive(counts, next)
  }

  /** drop zero-count multis, floor chars at 1 (chars come from the
    * CURRENT piece set — coverage is never lost mid-EM)
    */
  private def keepAlive(current: Map[String, Long],
      next: scala.collection.mutable.HashMap[String, Long]): Map[String, Long] = {
    val out = scala.collection.mutable.HashMap.empty[String, Long]
    next.foreach { case (p, c) => if (c > 0) out.update(p, c) }
    current.keysIterator.filter(_.length == 1).foreach { ch =>
      if (!out.contains(ch)) out.update(ch, 1L)
    }
    out.toMap
  }

  /** driver-local trainer: seed → `emIters` hard-EM rounds → prune to
    * `targetVocab` (all chars + top multis by (count desc, piece asc))
    * → one final count pass so the reported counts describe the FINAL
    * piece set.
    */
  private[graft] def trainLocal(vocab0: Array[(String, Long)],
      targetVocab: Int, emIters: Int = 3, maxPieceLen: Int = 6,
      maxSeed: Int = 4096): Vocab = {
    var counts = seedPieces(vocab0, maxPieceLen, maxSeed)
    (0 until emIters).foreach { _ => counts = reestimate(vocab0, counts) }
    counts = prune(counts, targetVocab)
    counts = reestimate(vocab0, counts)
    Vocab(counts.toSeq.sortBy { case (p, c) => (-c, p) })
  }

  private def prune(counts: Map[String, Long], targetVocab: Int): Map[String, Long] = {
    val chars = counts.filter(_._1.length == 1)
    val room = math.max(0, targetVocab - chars.size)
    val multis = counts.iterator.filter(_._1.length > 1).toArray
      .sortBy { case (p, c) => (-c, p) }
      .take(room)
    (chars ++ multis).toMap
  }

  /** Train on a corpus: ONE corpus-wide (word, freq) hash-agg, then the
    * EM loop — driver-local under `localVocabCap` (identical results to
    * the distributed loop, UnigramSpec pins it), distributed above it:
    * per EM round one narrow Viterbi map over the word table with the
    * piece table BROADCAST, one piece-keyed agg (map-side partials),
    * ≤ |pieces| rows back to the driver.
    */
  def train(s: SparkSession, docs: DataFrame, targetVocab: Int,
      text: String = "text", emIters: Int = 3, maxPieceLen: Int = 6,
      maxSeed: Int = 4096, localVocabCap: Long = 1L << 21): Vocab = {
    import s.implicits._
    val v = docs.select(col(text)).as[String]
      .flatMap(t => SketchOps.tokensOf(t))
      .filter(_.nonEmpty)
      .groupByKey(identity).count()
      .persist()
    val n = v.count()
    val out = if (n <= localVocabCap) trainLocal(v.collect(), targetVocab,
      emIters, maxPieceLen, maxSeed)
    else trainDistributed(s, v, targetVocab, emIters, maxPieceLen, maxSeed)
    v.unpersist()
    out
  }

  /** the distributed EM loop — same seed, same re-estimation semantics,
    * exact integer counts (order-free long sums), so the result is
    * bit-identical to [[trainLocal]] on the same corpus
    */
  private[graft] def trainDistributed(s: SparkSession,
      words: org.apache.spark.sql.Dataset[(String, Long)], targetVocab: Int,
      emIters: Int, maxPieceLen: Int, maxSeed: Int): Vocab = {
    import s.implicits._
    // seed: substring counting is a flatMap + hash-agg (the candidate
    // table is vocabulary-bounded); chars and qualifying multis split
    // exactly like the local path
    val sub = words.flatMap { case (w, f) =>
      (for {
        i <- (0 until w.length).iterator
        l <- (1 to math.min(maxPieceLen, w.length - i)).iterator
      } yield (w.substring(i, i + l), f))
    }.groupByKey(_._1).mapValues(_._2).reduceGroups(_ + _)
      .map { case (p, c) => (p, c) }
      .persist() // two consumers (chars + multis) of the candidate table
    val chars = sub.filter(r => r._1.length == 1).collect()
    val multis = sub.filter(r => r._1.length > 1 && r._2 >= 2)
      .orderBy(col("_2").desc, col("_1").asc).limit(maxSeed).collect()
    sub.unpersist() // both consumers done
    var counts: Map[String, Long] = (chars ++ multis).toMap
    def distReestimate(cur: Map[String, Long]): Map[String, Long] = {
      val voc = Vocab(cur.toSeq.sortBy { case (p, c) => (-c, p) })
      val bc = s.sparkContext.broadcast((voc.scoreOf, voc.maxPieceLen))
      val next = words.flatMap { case (w, f) =>
        val (sc, ml) = bc.value
        segmentWord(w, sc, ml).iterator.map(p => (p, f))
      }.groupByKey(_._1).mapValues(_._2).reduceGroups(_ + _)
        .map { case (p, c) => (p, c) }
        .collect() // ≤ |pieces| rows: vocabulary-bounded by construction
      val hm = scala.collection.mutable.HashMap.empty[String, Long]
      next.foreach { case (p, c) => hm.update(p, c) }
      keepAlive(cur, hm)
    }
    (0 until emIters).foreach { _ => counts = distReestimate(counts) }
    counts = prune(counts, targetVocab)
    counts = distReestimate(counts)
    Vocab(counts.toSeq.sortBy { case (p, c) => (-c, p) })
  }

  /** per-doc token counts under a trained vocab — broadcast pieces,
    * narrow map, per-partition word memo (the serving-side pass, the
    * Bpe.tokenCounts shape)
    */
  def tokenCounts(s: SparkSession, docs: DataFrame, vocab: Vocab,
      id: String = "doc_id", text: String = "text"): DataFrame = {
    import s.implicits._
    val bm = s.sparkContext.broadcast((vocab.scoreOf, vocab.maxPieceLen))
    docs.select(col(id), col(text)).as[(Long, String)]
      .mapPartitions { it =>
        val (sc, ml) = bm.value
        val memo = scala.collection.mutable.HashMap.empty[String, Int]
        it.map { case (i, t) =>
          var n = 0L
          SketchOps.tokensOf(t).foreach { w =>
            if (w.nonEmpty)
              n += memo.getOrElseUpdate(w, segmentWord(w, sc, ml).length)
          }
          (i, n)
        }
      }
      .toDF(id, "n_unigram_tokens")
  }

  /** one trained vocab per dataset for the q231 entries */
  private val trained = scala.collection.concurrent.TrieMap[String, Vocab]()

  private[graft] def vocabFor(s: SparkSession, d: String): Vocab = {
    // both q231 entries pin VALUES learned from sf0.01's documents —
    // fail loud on any other fixture (the q72 pattern)
    Tables.requirePinnedFixture(s, d, "documents", Tables.Sf001DocumentsFp,
      "q231_unigram_pieces/q231b_unigram_token_counts")
    trained.getOrElseUpdate(d,
      train(s, Tables.documents(s, d), targetVocab = 120))
  }

  val all: ListMap[String, Q] = ListMap(
    // ---- the learned vocabulary itself: top 20 multi-char pieces in
    //      the pinned (final count desc, piece asc) order. Hard-EM
    //      counts are exact integers, every tie order is total, so the
    //      oracle pins the pieces learned at sf0.01 — a regression pin
    //      like q72; UnigramSpec carries the analytic ground truth. ----
    "q231_unigram_pieces" -> Q(
      (s, d) => {
        import s.implicits._
        vocabFor(s, d).pieces.filter(_._1.length > 1).take(20)
          .zipWithIndex
          .map { case ((p, c), i) => (i + 1, p, c) }
          .toDF("piece_rank", "piece", "n_uses")
          .orderBy("piece_rank")
      },
      Some("""SELECT piece_rank, piece, n_uses FROM (VALUES
             |  (1, 'join', 964), (2, 'hash', 947), (3, 'row', 943),
             |  (4, 'batch', 937), (5, 'scan', 936), (6, 'column', 934),
             |  (7, 'custom', 934), (8, 'er', 934), (9, 'filter', 933),
             |  (10, 'small', 928), (11, 'merge', 918), (12, 'slow', 918),
             |  (13, 'order', 912), (14, 'vector', 912), (15, 'line', 910),
             |  (16, 'data', 908), (17, 'table', 908), (18, 'agg', 901),
             |  (19, 'value', 897), (20, 'key', 896))
             |  AS t(piece_rank, piece, n_uses)
             |ORDER BY piece_rank""".stripMargin)),

    // ---- serving pass: per-doc Viterbi token counts under the trained
    //      vocabulary, pinned for the first 10 docs ----
    "q231b_unigram_token_counts" -> Q(
      (s, d) => tokenCounts(s,
          Tables.documents(s, d).filter(col("doc_id") < 10), vocabFor(s, d))
        .orderBy("doc_id"),
      Some("""SELECT doc_id, n_unigram_tokens FROM (VALUES
             |  (0, 32), (1, 76), (2, 46), (3, 28), (4, 46),
             |  (5, 57), (6, 15), (7, 76), (8, 87), (9, 76))
             |  AS t(doc_id, n_unigram_tokens) ORDER BY doc_id""".stripMargin))
  )
}
