package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.rel.RelQueries.Q
import graft.rel.Tables

/** WORDPIECE tokenizer trainer (Schuster & Nakajima, "Japanese and
  * Korean voice search", ICASSP 2012; the BERT tokenizer's training
  * objective) — the third mainstream subword family, completing the
  * triad with [[Bpe]] (frequency argmax) and [[Unigram]] (hard-EM):
  * WordPiece fuses the pair that most increases corpus LIKELIHOOD
  * under a unigram model, score(a,b) = c(ab) / (c(a)·c(b)) — which
  * deliberately differs from BPE: a rare-but-EXCLUSIVE pair (its
  * symbols never occur apart) outranks a frequent-but-promiscuous one.
  * WordPieceSpec pins a corpus where the two argmaxes disagree.
  *
  * Exactness: the argmax over rational scores is decided by EXACT
  * cross-multiplication in BigInt — c₁·(a₂·b₂) vs c₂·(a₁·b₁), never a
  * float division — with ties broken (higher pair count, a asc, b asc),
  * a total order, so the learned merges are pinnable literals (the q72
  * discipline). Symbol counts c(x) are freq-weighted occurrence counts
  * over the current segmentation; both sides of every comparison are
  * exact integers on every path.
  *
  * Scale shape (100 TB): the corpus is touched ONCE (the same
  * (word, freq) hash-agg as the other two trainers); the merge loop
  * runs over the vocabulary table. Driver fast path under the shared
  * `localVocabCap`; past it the distributed loop takes over — per step
  * one pair+symbol counting pass over the vocab table and a
  * tree-reduce (`Dataset.reduce`) whose comparator is the same exact
  * BigInt cross-multiplication, so only ONE row ever reaches the
  * driver and local ≡ distributed bit-for-bit (spec-pinned).
  *
  * Serving is the standard WordPiece GREEDY LONGEST-MATCH-FIRST scan
  * against the final symbol vocabulary (BERT's algorithm), with `##`
  * continuation marking and per-word UNK on dead ends — deliberately
  * NOT merge-replay: longest-match against the closed vocabulary is
  * what every WordPiece serving stack runs, and it can differ from the
  * trainer's segmentation (documented; the spec exercises both).
  */
object WordPiece {

  final case class Merge(a: String, b: String)

  /** the serving vocabulary a merge list induces: every initial
    * character of the training corpus plus each merge's fused symbol
    */
  final case class Vocab(chars: Set[String], merged: Set[String]) {
    lazy val all: Set[String] = chars ++ merged
    lazy val maxLen: Int = if (all.isEmpty) 1 else all.iterator.map(_.length).max
  }

  private type Counts = scala.collection.mutable.HashMap[(String, String), Long]

  /** exact rational comparison: score₁ = c1/(a1·b1) vs score₂ =
    * c2/(a2·b2) by BigInt cross-multiplication; ties by (pair count
    * desc, a asc, b asc). Returns true iff candidate 1 WINS.
    */
  private def beats(c1: Long, a1: Long, b1: Long, p1: (String, String),
      c2: Long, a2: Long, b2: Long, p2: (String, String)): Boolean = {
    val l = BigInt(c1) * (BigInt(a2) * BigInt(b2))
    val r = BigInt(c2) * (BigInt(a1) * BigInt(b1))
    if (l != r) l > r
    else if (c1 != c2) c1 > c2
    else {
      val ca = p1._1.compareTo(p2._1)
      if (ca != 0) ca < 0 else p1._2.compareTo(p2._2) < 0
    }
  }

  /** driver-local merge loop: per step re-count pair and symbol
    * frequencies over the current segmentation, take the exact
    * likelihood argmax, fuse it everywhere. O(steps · Σ|w|) — the
    * vocabulary is corpus-size-independent, and WordPiece vocabularies
    * are a few 10k merges.
    */
  private[graft] def trainLocalMerges(vocab0: Array[(String, Long)],
      numMerges: Int): Seq[Merge] = {
    val syms: Array[Array[String]] = vocab0.map { case (w, _) => Bpe.symbolsOf(w) }
    val freq = vocab0.map(_._2)
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var continue = true
    while (merges.length < numMerges && continue) {
      val pair = new Counts
      val sym = scala.collection.mutable.HashMap.empty[String, Long]
      var wi = 0
      while (wi < syms.length) {
        val sy = syms(wi); val f = freq(wi)
        var i = 0
        while (i < sy.length) {
          sym.update(sy(i), sym.getOrElse(sy(i), 0L) + f)
          if (i < sy.length - 1) {
            val p = (sy(i), sy(i + 1))
            pair.update(p, pair.getOrElse(p, 0L) + f)
          }
          i += 1
        }
        wi += 1
      }
      var best: Option[((String, String), Long)] = None
      pair.foreach { case (p, c) =>
        if (c >= 2) {
          val ok = best match {
            case None => true
            case Some((bp, bc)) =>
              beats(c, sym(p._1), sym(p._2), p, bc, sym(bp._1), sym(bp._2), bp)
          }
          if (ok) best = Some((p, c))
        }
      }
      best match {
        case None => continue = false
        case Some(((a, b), _)) =>
          merges += Merge(a, b)
          var w = 0
          while (w < syms.length) {
            val old = syms(w)
            var has = false; var i = 0
            while (!has && i < old.length - 1) {
              if (old(i) == a && old(i + 1) == b) has = true
              i += 1
            }
            if (has) syms(w) = Bpe.applyMerge(old, a, b)
            w += 1
          }
      }
    }
    merges.toSeq
  }

  /** Train `numMerges` WordPiece merges: one corpus pass to
    * (word, freq), then the likelihood merge loop — driver-local under
    * `localVocabCap`, distributed above it, identical results
    * (WordPieceSpec pins it). Also returns the induced serving [[Vocab]].
    */
  def train(s: SparkSession, docs: DataFrame, numMerges: Int,
      text: String = "text", localVocabCap: Long = 1L << 21): (Seq[Merge], Vocab) = {
    import s.implicits._
    val v = docs.select(col(text)).as[String]
      .flatMap(t => SketchOps.tokensOf(t))
      .filter(_.nonEmpty)
      .groupByKey(identity).count()
      .persist()
    val n = v.count()
    val merges =
      if (n <= localVocabCap) trainLocalMerges(v.collect(), numMerges)
      else trainDistributedMerges(s, v, numMerges)
    val chars = v.flatMap { case (w, _) => Bpe.symbolsOf(w).toSeq }
      .distinct().collect().toSet // alphabet-bounded
    v.unpersist()
    (merges, Vocab(chars, merges.map(m => m.a + m.b).toSet))
  }

  /** the distributed loop: per step one flatMap emitting each word's
    * pair and symbol counts, two hash-aggs (map-side partials), a
    * broadcast join of symbol counts onto the pair table, and a
    * tree-reduce with the exact BigInt comparator — one row to the
    * driver per step
    */
  private[graft] def trainDistributedMerges(s: SparkSession,
      v: org.apache.spark.sql.Dataset[(String, Long)],
      numMerges: Int): Seq[Merge] = {
    import s.implicits._
    var words = v.map { case (w, f) => (Bpe.symbolsOf(w), f) }.persist()
    words.count()
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var step = 0
    while (step < numMerges) {
      val symCounts = words.flatMap { case (sy, f) => sy.iterator.map((_, f)) }
        .groupByKey(_._1).mapValues(_._2).reduceGroups(_ + _)
        .map { case (x, c) => (x, c) }
      val pairCounts = words.flatMap { case (sy, f) =>
        (0 until sy.length - 1).iterator.map(i => ((sy(i), sy(i + 1)), f))
      }.groupByKey(_._1).mapValues(_._2).reduceGroups(_ + _)
        .map { case ((a, b), c) => (a, b, c) }
        .filter(col("_3") >= 2)
      val sc = broadcast(symCounts.toDF("x", "cx"))
      val cand = pairCounts.toDF("a", "b", "c")
        .join(sc.select(col("x").as("a"), col("cx").as("ca")), "a")
        .join(sc.select(col("x").as("b"), col("cx").as("cb")), "b")
        .select(col("a"), col("b"), col("c"), col("ca"), col("cb"))
        .as[(String, String, Long, Long, Long)]
      // Dataset.reduce on an empty dataset throws — probe with take(1)
      val top =
        if (cand.take(1).isEmpty) None
        else Some(cand.reduce((x, y) =>
          if (beats(x._3, x._4, x._5, (x._1, x._2),
            y._3, y._4, y._5, (y._1, y._2))) x else y))
      top match {
        case Some((a, b, _, _, _)) =>
          merges += Merge(a, b)
          val prev = words
          var next = prev.map { case (sy, f) => (Bpe.applyMerge(sy, a, b), f) }
            .persist()
          step += 1
          if (step % 4 == 0) {
            val ck = next.localCheckpoint(); next.unpersist(); next = ck
          }
          next.count()
          prev.unpersist()
          words = next
        case None => step = numMerges
      }
    }
    words.unpersist()
    merges.toSeq
  }

  /** GREEDY LONGEST-MATCH serving (the BERT WordPiece algorithm): scan
    * the word left to right, always taking the longest vocabulary
    * symbol matching at the cursor; pieces after the first render with
    * the `##` continuation prefix; a position with NO match makes the
    * whole word `[UNK]` (the standard convention — coverage comes from
    * the corpus alphabet being in the vocab).
    */
  private[graft] def tokenizeWord(word: String, vocab: Vocab): Array[String] = {
    if (word.isEmpty) return Array.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < word.length) {
      var l = math.min(vocab.maxLen, word.length - i)
      var found = -1
      while (found < 0 && l >= 1) {
        if (vocab.all.contains(word.substring(i, i + l))) found = l
        else l -= 1
      }
      if (found < 0) return Array("[UNK]")
      out += (if (i == 0) word.substring(i, i + found)
              else "##" + word.substring(i, i + found))
      i += found
    }
    out.toArray
  }

  /** per-doc token counts under the serving vocabulary — broadcast
    * vocab, narrow map, per-partition word memo
    */
  def tokenCounts(s: SparkSession, docs: DataFrame, vocab: Vocab,
      id: String = "doc_id", text: String = "text"): DataFrame = {
    import s.implicits._
    val bv = s.sparkContext.broadcast(vocab)
    docs.select(col(id), col(text)).as[(Long, String)]
      .mapPartitions { it =>
        val v = bv.value
        val memo = scala.collection.mutable.HashMap.empty[String, Int]
        it.map { case (i, t) =>
          var n = 0L
          SketchOps.tokensOf(t).foreach { w =>
            if (w.nonEmpty) n += memo.getOrElseUpdate(w, tokenizeWord(w, v).length)
          }
          (i, n)
        }
      }
      .toDF(id, "n_wordpiece_tokens")
  }

  /** one trained model per dataset for the q232 entries */
  private val trained = scala.collection.concurrent.TrieMap[String, (Seq[Merge], Vocab)]()

  private[graft] def modelFor(s: SparkSession, d: String): (Seq[Merge], Vocab) = {
    Tables.requirePinnedFixture(s, d, "documents", Tables.Sf001DocumentsFp,
      "q232_wordpiece_merges/q232b_wordpiece_token_counts")
    trained.getOrElseUpdate(d,
      train(s, Tables.documents(s, d), numMerges = 20))
  }

  val all: ListMap[String, Q] = ListMap(
    // ---- the learned merges in training order: the likelihood argmax
    //      is exact-rational, every tie order total, so the list is a
    //      regression pin (q72 pattern); WordPieceSpec carries the
    //      analytic ground truth incl. a corpus where this argmax
    //      DISAGREES with BPE's frequency argmax ----
    "q232_wordpiece_merges" -> Q(
      (s, d) => {
        import s.implicits._
        modelFor(s, d)._1.zipWithIndex
          .map { case (m, i) => (i + 1, m.a, m.b) }
          .toDF("merge_rank", "a", "b")
          .orderBy("merge_rank")
      },
      // (q,u) first — the canonical exclusive pair — then 'window' and
      // 'column' assembled bottom-up: the likelihood objective's
      // signature, visibly different from q72's frequency-ordered list
      Some("""SELECT merge_rank, a, b FROM (VALUES
             |  (1, 'q', 'u'), (2, 'i', 'n'), (3, 'f', 'i'), (4, 'b', 'i'),
             |  (5, 'bi', 'g'), (6, 'fi', 'l'), (7, 'in', 'd'), (8, 'w', 'ind'),
             |  (9, 'o', 'w'), (10, 'wind', 'ow'), (11, 'j', 'o'),
             |  (12, 'jo', 'in'), (13, 'l', 'in'), (14, 'm', 'n'),
             |  (15, 'u', 'mn'), (16, 'l', 'umn'), (17, 'o', 'lumn'),
             |  (18, 'c', 'olumn'), (19, 'u', 'p'), (20, 'o', 'up'))
             |  AS t(merge_rank, a, b) ORDER BY merge_rank""".stripMargin)),

    // ---- serving pass: greedy longest-match token counts, pinned for
    //      the first 10 docs ----
    "q232b_wordpiece_token_counts" -> Q(
      (s, d) => tokenCounts(s,
          Tables.documents(s, d).filter(col("doc_id") < 10), modelFor(s, d)._2)
        .orderBy("doc_id"),
      Some("""SELECT doc_id, n_wordpiece_tokens FROM (VALUES
             |  (0, 116), (1, 279), (2, 164), (3, 96), (4, 154),
             |  (5, 209), (6, 59), (7, 279), (8, 302), (9, 262))
             |  AS t(doc_id, n_wordpiece_tokens) ORDER BY doc_id""".stripMargin))
  )
}
