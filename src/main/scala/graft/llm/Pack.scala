package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.rel.RelQueries.Q
import graft.rel.Tables

/** SEQUENCE PACKING — the op that turns a curated corpus into
  * pretraining batches: concatenate documents into sequences of at most
  * `maxTokens` tokens, greedy first-fit, so padding waste is bounded.
  *
  * Global greedy packing is inherently sequential, so the distributed
  * formulation trades a little fill quality for full parallelism and
  * DETERMINISM: documents are grouped into fixed doc-id RANGES of
  * `docsPerRange` (a pure function of the id — no shuffle-order
  * dependence, no hot keys by construction), and each range packs
  * independently in id order. A document longer than `maxTokens` gets a
  * sequence of its own (flagged by its token count; truncation is the
  * caller's policy decision, not silently applied here).
  *
  * Scale shape (100 TB): one narrow token-count map over the scan, one
  * shuffle keyed by range id whose groups are ≤ `docsPerRange` rows of
  * (id, count) — text never moves — then a per-group linear pass.
  */
object Pack {

  /** greedy first-fit in id order: returns (doc_id, seqInRange) */
  private[graft] def packRange(docs: Seq[(Long, Long)], maxTokens: Long)
      : Seq[(Long, Int)] = {
    var seq = 0
    var acc = 0L
    var first = true
    docs.sortBy(_._1).map { case (id, n) =>
      if (first) { acc = n; first = false }
      else if (acc + n <= maxTokens) acc += n
      else { seq += 1; acc = n }
      (id, seq)
    }
  }

  /** Per-sequence packing summary: (seq_id, n_docs, seq_tokens).
    * `seq_id = rangeId * 100000 + seqInRange` (a range of
    * `docsPerRange` docs yields at most `docsPerRange` sequences, far
    * under the stride).
    */
  def packSequences(s: SparkSession, docs: DataFrame, maxTokens: Long,
      docsPerRange: Long = 64, id: String = "doc_id", text: String = "text")
      : DataFrame = {
    import s.implicits._
    require(maxTokens > 0 && docsPerRange > 0)
    docs.select(col(id), col(text)).as[(Long, String)]
      .map { case (i, t) => (i / docsPerRange, i, SketchOps.tokensOf(t).length.toLong) }
      .groupByKey(_._1)
      .flatMapGroups { (part, it) =>
        packRange(it.map(r => (r._2, r._3)).toSeq, maxTokens).iterator
          .map { case (docId, seq) => (part * 100000L + seq, docId) }
      }
      .toDF("seq_id", id)
  }

  /** Overlapping-window CHUNKING — long documents become training
    * examples by slicing their token stream into `window`-token chunks
    * advancing by `stride` (stride < window ⇒ overlap, the standard
    * context-continuity trick). A doc of n tokens yields
    * `ceil((n−window)/stride)+1` chunks (one if n ≤ window); the tail
    * chunk keeps its natural length instead of padding silently. Pure
    * per-doc arithmetic: one narrow flatMap over the scan.
    */
  def chunkDocs(s: SparkSession, docs: DataFrame, window: Int, stride: Int,
      id: String = "doc_id", text: String = "text"): DataFrame = {
    import s.implicits._
    require(window > 0 && stride > 0 && stride <= window,
      s"need 0 < stride <= window, got window=$window stride=$stride")
    docs.select(col(id), col(text)).as[(Long, String)]
      .flatMap { case (i, t) =>
        val toks = SketchOps.tokensOf(t)
        val n = toks.length
        val chunks = if (n <= window) 1 else (n - window + stride - 1) / stride + 1
        (0 until chunks).iterator.map { c =>
          val start = c * stride
          val len = math.min(window, n - start)
          (i, c, len.toLong, toks(start), toks(start + len - 1))
        }
      }
      .toDF(id, "chunk_idx", "n_chunk_tokens", "first_token", "last_token")
  }

  val all: ListMap[String, Q] = ListMap(
    // ---- packing summary at maxTokens=256 over 64-doc ranges; the
    //      oracle replays the same greedy fold as a recursive CTE, so
    //      any drift in the fit rule (fit test, reset, oversize
    //      handling) goes hash-red ----
    "q75_sequence_pack" -> Q(
      (s, d) => {
        val docs = Tables.documents(s, d)
        val counts = docs.select(col("doc_id"),
          size(split(trim(lower(col("text"))), "\\s+")).cast("long").as("n"))
        packSequences(s, docs, maxTokens = 256)
          .join(counts, "doc_id")
          .groupBy("seq_id")
          .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("seq_tokens"))
          .orderBy("seq_id")
      },
      Some("""WITH RECURSIVE d AS (
             |  SELECT doc_id, doc_id // 64 AS part,
             |    len(regexp_split_to_array(trim(lower(text)), '\s+')) AS n
             |  FROM documents),
             |o AS (SELECT doc_id, part, n,
             |    row_number() OVER (PARTITION BY part ORDER BY doc_id) AS rn
             |  FROM d),
             |pack(part, rn, doc_id, n, seq, acc) AS (
             |  SELECT part, rn, doc_id, n, 0, n FROM o WHERE rn = 1
             |  UNION ALL
             |  SELECT o.part, o.rn, o.doc_id, o.n,
             |    CASE WHEN pack.acc + o.n <= 256 THEN pack.seq ELSE pack.seq + 1 END,
             |    CASE WHEN pack.acc + o.n <= 256 THEN pack.acc + o.n ELSE o.n END
             |  FROM pack JOIN o ON o.part = pack.part AND o.rn = pack.rn + 1)
             |SELECT part * 100000 + seq AS seq_id, count(*) AS n_docs,
             |  CAST(sum(n) AS BIGINT) AS seq_tokens
             |FROM pack GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- overlapping-window chunking at window=64 stride=48 (25%
    //      overlap); first/last tokens in the output make any slicing
    //      off-by-one visible to the hash compare ----
    "q81_chunk_windows" -> Q(
      (s, d) => chunkDocs(s, Tables.documents(s, d), window = 64, stride = 48)
        .orderBy("doc_id", "chunk_idx"),
      Some("""WITH t AS (SELECT doc_id,
             |    regexp_split_to_array(trim(lower(text)), '\s+') AS w FROM documents),
             |dims AS (SELECT doc_id, w, len(w) AS n,
             |    CASE WHEN len(w) <= 64 THEN 1
             |         ELSE (len(w) - 64 + 47) // 48 + 1 END AS chunks
             |  FROM t)
             |SELECT doc_id, CAST(c.c AS INT) AS chunk_idx,
             |  CAST(least(64, n - c.c * 48) AS BIGINT) AS n_chunk_tokens,
             |  w[c.c * 48 + 1] AS first_token,
             |  w[c.c * 48 + least(64, n - c.c * 48)] AS last_token
             |FROM dims CROSS JOIN range(100) c(c)
             |WHERE c.c < chunks
             |ORDER BY doc_id, chunk_idx""".stripMargin)),
  )
}
