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
  * the vocab table, which is corpus-size-independent. In the standard
  * regime that vocabulary fits on the driver and the merge loop runs
  * locally with a lazy-deletion heap ([[trainLocalMerges]] — a 32k-merge
  * tokenizer trains in seconds, not 32k sequential Spark jobs); past
  * `localVocabCap` the distributed loop takes over: one pair-keyed hash
  * agg per step (map-side partials; only the argmax row reaches the
  * driver) plus a narrow merge map, lineage cut with localCheckpoint
  * every few steps like connectedComponents. Tokenizing at serving time
  * is a pure executor function over the broadcast merge list.
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
    * application order — the BPE contract).
    *
    * A present-pair set makes each merge whose pair is absent an O(1)
    * hash probe instead of an O(|word|) scan, so a real 32k-merge
    * vocabulary costs ~32k probes + one pass per APPLIED merge (≤
    * |word|−1 of them) per distinct word. Sequential application is
    * preserved EXACTLY — the min-rank-first tokenizer most serving
    * stacks use can diverge from the trainer's segmentation on
    * vocabularies where the same fused string is derivable two ways, so
    * it is deliberately not used here.
    */
  private[graft] def tokenizeWord(word: String, merges: Seq[Merge]): Array[String] = {
    var sym = symbolsOf(word)
    if (sym.length <= 1 || merges.isEmpty) return sym
    val present = scala.collection.mutable.HashSet.empty[(String, String)]
    def rebuild(): Unit = {
      present.clear()
      var i = 0
      while (i < sym.length - 1) { present.add((sym(i), sym(i + 1))); i += 1 }
    }
    rebuild()
    merges.foreach { m =>
      if (sym.length > 1 && present.contains((m.a, m.b))) {
        sym = applyMerge(sym, m.a, m.b)
        rebuild()
      }
    }
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

  /** Driver-local merge loop over a collected (word, freq) vocab —
    * exact integer counts, the same (count desc, a asc, b asc) argmax
    * and the same count≥2 stop rule as the distributed loop, so the
    * learned merges are IDENTICAL (BpeSpec pins local ≡ distributed).
    *
    * A lazy-deletion max-heap ordered by the argmax total order makes
    * each step O(touched pairs · log |heap|): dequeue entries until one
    * matches the pair's CURRENT count (stale entries from earlier
    * updates are discarded), re-count only the words that contain the
    * merged pair (an `occurs` superset index narrows the scan), and
    * re-enqueue every touched pair at its new count. A real 32k-merge
    * vocabulary trains in seconds — the distributed loop at that
    * parameter scale is 32k SEQUENTIAL Spark jobs, days of scheduler
    * latency even though each job is cheap.
    */
  private[graft] def trainLocalMerges(vocab0: Array[(String, Long)],
      numMerges: Int): Seq[Merge] =
    trainLocalCore(vocab0.map { case (w, _) => symbolsOf(w) },
      vocab0.map(_._2), numMerges)

  /** the heap loop over an ARBITRARY starting symbolization — shared
    * by from-scratch training (single-char symbols) and CONTINUATION
    * training ([[extendMerges]]: symbols = the existing tokenizer's
    * output), which is what makes extend-by-k ≡ train-(n+k) hold
    * exactly (the continuation state IS the state after n merges)
    */
  private def trainLocalCore(syms: Array[Array[String]],
      freq: Array[Long], numMerges: Int): Seq[Merge] = {
    val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
    val occurs = scala.collection.mutable.HashMap
      .empty[(String, String), scala.collection.mutable.BitSet]
    // max count first, then lexicographically SMALLEST (a, b) — the
    // distributed loop's (count desc, a asc, b asc)
    val ord: Ordering[(Long, String, String)] = new Ordering[(Long, String, String)] {
      def compare(x: (Long, String, String), y: (Long, String, String)): Int = {
        val c = java.lang.Long.compare(x._1, y._1)
        if (c != 0) c
        else {
          val a = y._2.compareTo(x._2)
          if (a != 0) a else y._3.compareTo(x._3)
        }
      }
    }
    val pq = scala.collection.mutable.PriorityQueue.empty[(Long, String, String)](ord)
    var wi = 0
    while (wi < syms.length) {
      val sy = syms(wi)
      var i = 0
      while (i < sy.length - 1) {
        val p = (sy(i), sy(i + 1))
        counts.update(p, counts.getOrElse(p, 0L) + freq(wi))
        occurs.getOrElseUpdate(p, scala.collection.mutable.BitSet.empty) += wi
        i += 1
      }
      wi += 1
    }
    counts.foreach { case ((a, b), c) => if (c >= 2) pq.enqueue((c, a, b)) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    while (merges.length < numMerges && pq.nonEmpty) {
      val (c, a, b) = pq.dequeue()
      // live iff the recorded count is the pair's current count (every
      // count change re-enqueues, so the current count is always present)
      if (counts.getOrElse((a, b), 0L) == c) {
        merges += Merge(a, b)
        val touched = scala.collection.mutable.HashSet.empty[(String, String)]
        // `occurs` is a SUPERSET index (membership is never retracted, so
        // earlier merges leave stale entries): verify per word
        occurs.getOrElse((a, b), scala.collection.mutable.BitSet.empty)
          .toArray.foreach { w =>
            val old = syms(w)
            var has = false
            var i = 0
            while (!has && i < old.length - 1) {
              if (old(i) == a && old(i + 1) == b) has = true
              i += 1
            }
            if (has) {
              i = 0
              while (i < old.length - 1) {
                val p = (old(i), old(i + 1))
                counts.update(p, counts(p) - freq(w))
                touched += p
                i += 1
              }
              val neu = applyMerge(old, a, b)
              syms(w) = neu
              i = 0
              while (i < neu.length - 1) {
                val p = (neu(i), neu(i + 1))
                counts.update(p, counts.getOrElse(p, 0L) + freq(w))
                occurs.getOrElseUpdate(p, scala.collection.mutable.BitSet.empty) += w
                touched += p
                i += 1
              }
            }
          }
        touched.foreach { p =>
          val n = counts.getOrElse(p, 0L)
          if (n >= 2) pq.enqueue((n, p._1, p._2))
        }
      }
    }
    merges.toSeq
  }

  /** Train `numMerges` merges on the corpus. The corpus is touched ONCE
    * (the word hash-agg); if the distinct-word vocabulary fits
    * `localVocabCap` — the standard regime: vocabularies are
    * corpus-size-INDEPENDENT and a few million words at most — the
    * merge loop runs driver-locally ([[trainLocalMerges]], seconds for
    * real vocabulary sizes). Above the cap the fully distributed loop
    * takes over: one pair-keyed hash agg per step over the vocab table,
    * only the argmax row reaching the driver. Both paths learn
    * identical merges (same exact counts, argmax order, and stop rule —
    * BpeSpec pins it).
    */
  def train(s: SparkSession, docs: DataFrame, numMerges: Int,
      text: String = "text", localVocabCap: Long = 1L << 21): Seq[Merge] = {
    import s.implicits._
    val v = vocab(s, docs, text).persist()
    val n = v.count()
    if (n <= localVocabCap) {
      val arr = v.collect() // vocab-sized collect, bounded by the cap
      v.unpersist()
      trainLocalMerges(arr, numMerges)
    } else {
      val out = trainDistributedMerges(s, v, numMerges)
      v.unpersist()
      out
    }
  }

  /** CONTINUATION TRAINING — extend an existing merge list by
    * `numExtra` merges on `docs`, the append half of the tokenizer
    * lifecycle ([[saveTokenizer]]/[[loadTokenizer]] persist/probe;
    * this is how a vocabulary grows when the corpus does, without
    * retraining from scratch). The corpus is touched ONCE (the same
    * word hash-agg as [[train]]); each word starts from the EXISTING
    * tokenizer's symbolization, which is exactly the trainer's state
    * after the existing merges — so extend-by-k ≡ train-(n+k) from
    * scratch, EXACTLY (BpeSpec pins the equivalence; the q446 oracle
    * leans on it). Local heap under the vocab cap, the distributed
    * loop seeded with the existing merges above it.
    */
  def extendMerges(s: SparkSession, docs: DataFrame, merges: Seq[Merge],
      numExtra: Int, text: String = "text",
      localVocabCap: Long = 1L << 21): Seq[Merge] = {
    import s.implicits._
    val v = vocab(s, docs, text).persist()
    val n = v.count()
    val out =
      if (n <= localVocabCap) {
        val arr = v.collect() // vocab-sized collect, bounded by the cap
        merges ++ trainLocalCore(
          arr.map { case (w, _) => tokenizeWord(w, merges) },
          arr.map(_._2), numExtra)
      } else merges ++ trainDistributedMerges(s, v, numExtra, merges)
    v.unpersist()
    out
  }

  /** the distributed merge loop, for vocabularies past the local cap;
    * `init` seeds continuation training (each word starts from the
    * existing tokenizer's symbolization)
    */
  private def trainDistributedMerges(s: SparkSession,
      v: org.apache.spark.sql.Dataset[(String, Long)], numMerges: Int,
      init: Seq[Merge] = Nil): Seq[Merge] = {
    import s.implicits._
    val bi = s.sparkContext.broadcast(init)
    var words = v
      .map { case (w, f) => (tokenizeWord(w, bi.value), f) }
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

  /** the persisted tokenizer artifact, loaded: ordered merges + the
    * emission vocabulary (token string → id)
    */
  final case class Tokenizer(merges: Seq[Merge], vocab: Map[String, Int])

  /** PERSIST the tokenizer — the save half of the lifecycle every
    * other serving component already has (AnnIndex q84, Lexical
    * q103/q104, DedupIndex q67, Trigram q343); the tokenizer is the
    * single most-mounted artifact in a real training stack, so
    * retraining per use ([[mergesFor]]) is not a lifecycle. Layout
    * under `dir`:
    *   - `merges/` — (rank, a, b) in training order (order IS the
    *     application contract)
    *   - `vocab/`  — (tid, tok): tid = 0-based sorted rank of the
    *     emission token, derived in ONE tokenize pass over `docs`.
    *     The universe is CLOSED (single chars + each merge's fusion),
    *     driver-small by construction — the same vocab rule as
    *     [[Pack.materializeSequences]], so artifacts agree.
    *
    * Scale shape: one narrow memoized tokenize map over the corpus
    * scan + a closed-universe distinct; the writes are vocab-sized.
    */
  def saveTokenizer(s: SparkSession, docs: DataFrame, merges: Seq[Merge],
      dir: String, text: String = "text"): Unit = {
    import s.implicits._
    require(merges.nonEmpty, "saveTokenizer: empty merge list")
    val bm = s.sparkContext.broadcast(merges)
    val vocabArr = docs.select(col(text)).as[String]
      .mapPartitions { it =>
        val ms = bm.value
        val memo = scala.collection.mutable.HashMap.empty[String, Array[String]]
        it.flatMap { t =>
          SketchOps.tokensOf(t).iterator.filter(_.nonEmpty)
            .flatMap(w => memo.getOrElseUpdate(w, tokenizeWord(w, ms)))
        }
      }
      .distinct().collect().sorted
    merges.zipWithIndex.map { case (m, i) => (i + 1, m.a, m.b) }
      .toDF("rank", "a", "b").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/merges")
    vocabArr.zipWithIndex.map { case (t, i) => (i, t) }.toSeq
      .toDF("tid", "tok").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/vocab")
  }

  /** LOAD the persisted tokenizer — both tables are artifact-sized
    * (merges: the training parameter; vocab: the closed universe), so
    * the collect is bounded by construction, and the loaded artifact
    * broadcasts to executors at serve time.
    */
  def loadTokenizer(s: SparkSession, dir: String): Tokenizer = {
    val m = s.read.parquet(s"$dir/merges").orderBy("rank").collect()
      .map(r => Merge(r.getAs[String]("a"), r.getAs[String]("b"))).toSeq
    require(m.nonEmpty, s"no merges found at $dir/merges")
    val v = s.read.parquet(s"$dir/vocab").collect()
      .map(r => r.getAs[String]("tok") -> r.getAs[Int]("tid")).toMap
    require(v.nonEmpty, s"no vocab found at $dir/vocab")
    Tokenizer(m, v)
  }

  /** SERVE from a loaded artifact: per-doc token count, token-id sum
    * and OOV count (an emission token absent from the persisted vocab
    * — id −1, counted instead of silently dropped; zero when serving
    * the training corpus, the q441 oracle anchor). One narrow
    * memoized map over the scan, broadcast artifact — the q72b shape
    * with ids.
    */
  def tokenIdStats(s: SparkSession, docs: DataFrame, tok: Tokenizer,
      id: String = "doc_id", text: String = "text"): DataFrame = {
    import s.implicits._
    val bt = s.sparkContext.broadcast(tok)
    docs.select(col(id), col(text)).as[(Long, String)]
      .mapPartitions { it =>
        val t = bt.value
        val memo = scala.collection.mutable.HashMap.empty[String, Array[Int]]
        it.map { case (i, txt) =>
          var n = 0L; var sum = 0L; var oov = 0L
          SketchOps.tokensOf(txt).foreach { w =>
            if (w.nonEmpty) {
              val ids = memo.getOrElseUpdate(w,
                tokenizeWord(w, t.merges).map(t.vocab.getOrElse(_, -1)))
              n += ids.length
              ids.foreach { tid => if (tid < 0) oov += 1 else sum += tid }
            }
          }
          (i, n, sum, oov)
        }
      }
      .toDF(id, "n_bpe_tokens", "tid_sum", "n_oov")
  }

  /** one persisted artifact per dataset for the q441 entry */
  private val savedDirs = scala.collection.concurrent.TrieMap[String, String]()

  private def savedTokenizerFor(s: SparkSession, d: String): String =
    savedDirs.getOrElseUpdate(d, {
      val work = Pack.newWorkDir("graft-q441") // shared cleanup hook
      saveTokenizer(s, Tables.documents(s, d), mergesFor(s, d), work.toString)
      work.toString
    })

  /** one trained merge list per dataset for the q72 entries */
  private val trained = scala.collection.concurrent.TrieMap[String, Seq[Merge]]()

  private[llm] def mergesFor(s: SparkSession, d: String): Seq[Merge] = {
    // both q72 entries pin VALUES (merges / token counts) learned from
    // sf0.01's documents — fail loud on any other fixture
    Tables.requirePinnedFixture(s, d, "documents", Tables.Sf001DocumentsFp,
      "q72_bpe_merges/q72b_bpe_token_counts/q82/q94/q100/q441/q446")
    trained.getOrElseUpdate(d, train(s, Tables.documents(s, d), numMerges = 20))
  }

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

    // ---- q441: PERSISTED TOKENIZER LIFECYCLE — train, SAVE to the
    //      on-disk artifact (merges in training order + the closed
    //      emission vocab), LOAD it back, and serve token-id stats
    //      for the first 10 docs from the LOADED artifact. The oracle
    //      replays serving from first principles (the q100 machinery:
    //      chained-replace BPE + the sorted vocab rank over the FULL
    //      corpus), so drift anywhere in save/load/apply — merge
    //      order, vocab ranking, id mapping — goes hash-red; n_oov=0
    //      is the training-corpus anchor (every emission token is in
    //      the persisted vocab by construction). ----
    "q441_tokenizer_lifecycle" -> Q(
      (s, d) => {
        val tok = loadTokenizer(s, savedTokenizerFor(s, d))
        tokenIdStats(s,
          Tables.documents(s, d).filter(col("doc_id") < 10), tok)
          .orderBy("doc_id")
      },
      Some(s"""WITH d AS (SELECT doc_id,
             |    list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
             |      w -> len(w) > 0) AS ws
             |  FROM documents),
             |tok AS (
             |  SELECT doc_id,
             |    flatten(list_transform(ws,
             |      w -> string_split(trim(${Pack.bpeSqlExpr("w")}, chr(1)),
             |        chr(1)))) AS toks
             |  FROM d),
             |vocab AS (
             |  SELECT tok, row_number() OVER (ORDER BY tok) - 1 AS tid
             |  FROM (SELECT DISTINCT unnest(toks) AS tok FROM tok)),
             |u AS (SELECT doc_id, unnest(toks) AS tok FROM tok
             |  WHERE doc_id < 10)
             |SELECT u.doc_id, count(*) AS n_bpe_tokens,
             |  CAST(sum(v.tid) AS BIGINT) AS tid_sum,
             |  CAST(0 AS BIGINT) AS n_oov
             |FROM u JOIN vocab v USING (tok)
             |GROUP BY u.doc_id ORDER BY u.doc_id""".stripMargin)),

    // ---- q446: TOKENIZER CONTINUATION (append) — the persisted q441
    //      artifact loaded and EXTENDED by 5 merges on the corpus
    //      (the grow-the-vocab path); by the continuation invariant
    //      (extend-by-k ≡ train-(n+k), spec-pinned on a random
    //      corpus) the oracle pins all 25 merges: ranks 1-20 are the
    //      q72 literals, 21-25 the continuation's — drift in the
    //      resumed heap state, the argmax order, or the save/load
    //      boundary goes hash-red. ----
    "q446_tokenizer_extend" -> Q(
      (s, d) => {
        import s.implicits._
        val tok = loadTokenizer(s, savedTokenizerFor(s, d))
        extendMerges(s, Tables.documents(s, d), tok.merges, numExtra = 5)
          .zipWithIndex
          .map { case (m, i) => (i + 1, m.a, m.b) }
          .toDF("merge_rank", "a", "b")
          .orderBy("merge_rank")
      },
      Some("""SELECT merge_rank, a, b FROM (VALUES
             |  (1, 'e', 'r'), (2, 'i', 'n'), (3, 'o', 'w'), (4, 'o', 'r'),
             |  (5, 's', 't'), (6, 'm', 'er'), (7, 'a', 't'), (8, 'l', 'u'),
             |  (9, 'a', 'r'), (10, 'p', 'ar'), (11, 'j', 'o'), (12, 'jo', 'in'),
             |  (13, 'a', 's'), (14, 'as', 'h'), (15, 'h', 'ash'), (16, 'r', 'ow'),
             |  (17, 'at', 'c'), (18, 'atc', 'h'), (19, 'b', 'atch'), (20, 'a', 'n'),
             |  (21, 'c', 'an'), (22, 's', 'can'), (23, 'c', 'o'),
             |  (24, 'c', 'u'), (25, 'co', 'lu'))
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
