package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.rel.RelQueries.Q
import graft.rel.Tables

/** Distributed byte-pair-encoding TRAINER (Sennrich, Haddow, Birch,
  * "Neural machine translation of rare words with subword units", ACL
  * 2016 — the classic word-frequency formulation): the corpus collapses
  * to a (word, freq) table once, each word is a sequence of single-char
  * symbols, and each training step (1) counts adjacent symbol pairs
  * weighted by word frequency, (2) picks the most frequent pair, (3)
  * merges it everywhere. q42's "BPE-ish regex" counts tokens with a
  * FIXED rule; this learns the vocabulary from the corpus — the real
  * tokenizer-training op an LLM data pipeline runs.
  *
  * Scale shape (100 TB): the corpus is touched ONCE (word hash-agg —
  * the same shuffle as q45's vocab build); training then iterates over
  * the vocab table, which is corpus-size-independent. Each step is one
  * pair-keyed hash agg (map-side partials; only the argmax row reaches
  * the driver) plus a narrow merge map; lineage is cut with
  * localCheckpoint every few steps like connectedComponents. Tokenizing
  * at serving time is a pure executor function over the broadcast merge
  * list.
  *
  * Determinism: pair counts are exact integers; the argmax tie-breaks
  * (count desc, a asc, b asc) — a total order, so the learned merges
  * are pinnable literals.
  */
object Bpe {

  /** one learned merge: symbols `a`+`b` fuse into `a+b` */
  final case class Merge(a: String, b: String)

  /** word → initial symbol sequence (code-point split keeps any text
    * valid; no end-of-word marker — merges never cross words because
    * words are separate rows)
    */
  private[graft] def symbolsOf(word: String): Array[String] = {
    val out = new Array[String](word.codePointCount(0, word.length))
    var i = 0; var j = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      out(j) = new String(Character.toChars(cp))
      i += Character.charCount(cp); j += 1
    }
    out
  }

  /** left-to-right greedy application of ONE merge to a symbol sequence
    * (after a merge the scan continues past the fused symbol — the
    * standard BPE convention, so "aaa" under (a,a) → ["aa","a"])
    */
  private[graft] def applyMerge(sym: Array[String], a: String, b: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < sym.length) {
      if (i + 1 < sym.length && sym(i) == a && sym(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += sym(i); i += 1 }
    }
    out.toArray
  }

  /** tokenize one word under an ordered merge list (training order IS
    * application order — the BPE contract)
    */
  private[graft] def tokenizeWord(word: String, merges: Seq[Merge]): Array[String] = {
    var sym = symbolsOf(word)
    merges.foreach { m => if (sym.length > 1) sym = applyMerge(sym, m.a, m.b) }
    sym
  }

  /** (word, freq) vocab of `docs` — the ONE corpus-wide pass */
  private def vocab(s: SparkSession, docs: DataFrame, text: String) = {
    import s.implicits._
    docs.select(col(text)).as[String]
      .flatMap(t => SketchOps.tokensOf(t))
      .filter(_.nonEmpty)
      .groupByKey(identity).count()
  }

  /** Train `numMerges` merges on the corpus. Only the per-step argmax
    * row and the final merge list touch the driver.
    */
  def train(s: SparkSession, docs: DataFrame, numMerges: Int,
      text: String = "text"): Seq[Merge] = {
    import s.implicits._
    var words = vocab(s, docs, text)
      .map { case (w, f) => (symbolsOf(w), f) }
      .persist()
    words.count() // materialize before the loop
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var step = 0
    while (step < numMerges) {
      val top = words
        .flatMap { case (sym, f) =>
          (0 until sym.length - 1).iterator.map(i => ((sym(i), sym(i + 1)), f))
        }
        .groupByKey(_._1)
        .mapValues(_._2)
        .reduceGroups(_ + _)
        .map { case ((a, b), cnt) => (a, b, cnt) }
        .orderBy(col("_3").desc, col("_1").asc, col("_2").asc)
        .limit(1)
        .collect()
      if (top.isEmpty || top(0)._3 < 2) {
        step = numMerges // nothing left worth merging: every pair unique
      } else {
        val (a, b, _) = top(0)
        merges += Merge(a, b)
        val prev = words
        var next = prev.map { case (sym, f) => (applyMerge(sym, a, b), f) }
          .persist()
        // cut lineage every few steps (iterated-map growth, like
        // Dedup.connectedComponents); the eager localCheckpoint
        // materializes first, so the superseded cache can be released
        step += 1
        if (step % 4 == 0) {
          val ck = next.localCheckpoint()
          next.unpersist()
          next = ck
        }
        next.count()
        prev.unpersist()
        words = next
      }
    }
    words.unpersist()
    merges.toSeq
  }

  /** per-doc token count under the trained merges (broadcast; narrow
    * map — the serving-side pass)
    */
  def tokenCounts(s: SparkSession, docs: DataFrame, merges: Seq[Merge],
      id: String = "doc_id", text: String = "text"): DataFrame = {
    import s.implicits._
    val bm = s.sparkContext.broadcast(merges)
    docs.select(col(id), col(text)).as[(Long, String)]
      .mapPartitions { it =>
        val ms = bm.value
        // per-partition word memo: corpora repeat words heavily, and the
        // merge loop is the expensive part of serving
        val memo = scala.collection.mutable.HashMap.empty[String, Int]
        it.map { case (i, t) =>
          var n = 0L
          SketchOps.tokensOf(t).foreach { w =>
            if (w.nonEmpty) n += memo.getOrElseUpdate(w, tokenizeWord(w, ms).length)
          }
          (i, n)
        }
      }
      .toDF(id, "n_bpe_tokens")
  }

  /** one trained merge list per dataset for the q72 entries */
  private val trained = scala.collection.concurrent.TrieMap[String, Seq[Merge]]()

  private def mergesFor(s: SparkSession, d: String): Seq[Merge] =
    trained.getOrElseUpdate(d, train(s, Tables.documents(s, d), numMerges = 20))

  val all: ListMap[String, Q] = ListMap(
    // ---- the learned vocabulary itself: first 20 merges in training
    //      order. Deterministic (integer counts, total-order
    //      tie-break), so the oracle pins the exact merges learned at
    //      sf0.01 — a regression pin like the recall entries; BpeSpec
    //      carries the analytic ground truth on a hand-computed corpus.
    "q72_bpe_merges" -> Q(
      (s, d) => {
        import s.implicits._
        mergesFor(s, d).zipWithIndex
          .map { case (m, i) => (i + 1, m.a, m.b) }
          .toDF("merge_rank", "a", "b")
          .orderBy("merge_rank")
      },
      Some("""SELECT merge_rank, a, b FROM (VALUES
             |  (1, 'e', 'r'), (2, 'i', 'n'), (3, 'o', 'w'), (4, 'o', 'r'),
             |  (5, 's', 't'), (6, 'm', 'er'), (7, 'a', 't'), (8, 'l', 'u'),
             |  (9, 'a', 'r'), (10, 'p', 'ar'), (11, 'j', 'o'), (12, 'jo', 'in'),
             |  (13, 'a', 's'), (14, 'as', 'h'), (15, 'h', 'ash'), (16, 'r', 'ow'),
             |  (17, 'at', 'c'), (18, 'atc', 'h'), (19, 'b', 'atch'), (20, 'a', 'n'))
             |  AS t(merge_rank, a, b) ORDER BY merge_rank""".stripMargin)),

    // ---- serving pass: per-doc token counts under the trained
    //      vocabulary, pinned for the first 10 docs ----
    "q72b_bpe_token_counts" -> Q(
      (s, d) => tokenCounts(s,
          Tables.documents(s, d).filter(col("doc_id") < 10), mergesFor(s, d))
        .orderBy("doc_id"),
      Some("""SELECT doc_id, n_bpe_tokens FROM (VALUES
             |  (0, 93), (1, 250), (2, 158), (3, 87), (4, 149),
             |  (5, 193), (6, 48), (7, 231), (8, 287), (9, 219))
             |  AS t(doc_id, n_bpe_tokens) ORDER BY doc_id""".stripMargin)),
  )
}
