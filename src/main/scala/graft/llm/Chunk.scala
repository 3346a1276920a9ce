package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.rel.RelQueries.Q
import graft.rel.Tables

/** TOKEN-WINDOW CHUNKING — the document splitter every RAG ingest and
  * long-context training pipeline runs before embedding/packing: slide
  * a `window`-token frame over each document at `stride` tokens
  * (overlap = window − stride keeps boundary context in two chunks),
  * emitting one row per chunk with its token offsets and text.
  *
  * Deterministic rule set (both engines replay it exactly): tokens are
  * the whitespace split of the trimmed text (the house q30 tokenizer);
  * chunk starts are 0, stride, 2·stride, … while start < n_tokens, so
  * the tail is always covered exactly once and a short document yields
  * one (possibly short) chunk; chunk text re-joins its token slice with
  * single spaces (whitespace-normalized — the downstream embedding/
  * packing stages tokenize the same way, so nothing is lost).
  *
  * Scale shape (100 TB): one narrow pass — transform/sequence/slice
  * inside the scan, no shuffle at all until a consumer aggregates;
  * per-doc fan-out is n_tokens/stride rows, bounded by document
  * length, never by corpus size.
  */
object Chunk {

  /** Chunk `docs` (`id`, `text`) into (id, chunk_idx, start_tok,
    * n_toks, chunk_text) rows. `window` ≥ `stride` ≥ 1 (equal =
    * disjoint chunks).
    */
  def chunkDocuments(docs: DataFrame, window: Int, stride: Int,
      id: String = "doc_id", text: String = "text"): DataFrame = {
    require(stride >= 1, s"stride must be >= 1: $stride")
    require(window >= stride, s"window $window must be >= stride $stride")
    val toks = split(trim(col(text)), "\\s+")
    docs
      .select(col(id), toks.as("__toks"), size(toks).as("__n"))
      .select(col(id), col("__toks"), col("__n"),
        explode(sequence(lit(0), col("__n") - 1, lit(stride))).as("start_tok"))
      .select(col(id),
        (col("start_tok") / stride).cast("long").as("chunk_idx"),
        col("start_tok").cast("long").as("start_tok"),
        least(lit(window), col("__n") - col("start_tok")).cast("long")
          .as("n_toks"),
        concat_ws(" ", slice(col("__toks"), col("start_tok") + 1, lit(window)))
          .as("chunk_text"))
  }

  val all: ListMap[String, Q] = ListMap(
    // ---- q267: chunking over the documents corpus (window 40, stride
    //      30 → 10-token overlap) — full chunk table hash-compared:
    //      every offset, length, and reassembled chunk text. ----
    "q267_chunking" -> Q(
      (s, d) => chunkDocuments(
          Tables.documents(s, d).select(col("doc_id"), col("text")), 40, 30)
        .orderBy("doc_id", "chunk_idx"),
      Some("""WITH t AS (SELECT doc_id,
             |    regexp_split_to_array(trim(text), '\s+') AS toks
             |  FROM documents),
             |c AS (SELECT doc_id, toks, len(toks) AS n, u.s AS start_tok
             |  FROM t, UNNEST(range(0, len(toks), 30)) AS u(s))
             |SELECT doc_id,
             |  CAST(start_tok // 30 AS BIGINT) AS chunk_idx,
             |  CAST(start_tok AS BIGINT) AS start_tok,
             |  CAST(least(40, n - start_tok) AS BIGINT) AS n_toks,
             |  array_to_string(toks[start_tok + 1 : least(start_tok + 40, n)],
             |    ' ') AS chunk_text
             |FROM c ORDER BY doc_id, chunk_idx""".stripMargin)))
}
