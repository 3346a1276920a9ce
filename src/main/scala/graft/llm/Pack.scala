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
  )
}
