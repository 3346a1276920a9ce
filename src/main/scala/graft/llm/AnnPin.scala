package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.rel.Tables

/** DRIVER-HASH-PINNABLE form of the raw ANN top-5 dumps (q38/q47/q55/
  * q56/q65/q69/q84). Through r8 these seven sat at `err: no_oracle` —
  * rows-only checks — because the dumped cosine was a raw double. The
  * dump is already DETERMINISTIC and totally ordered: the TopK
  * aggregator ranks by (score DESC, id), so (qid, rn) is a total order,
  * and the score is a fixed per-row IEEE chain over fixed data (no
  * accumulation-order freedom). Surfacing it as integer MILLI-units
  * makes the whole 40-row relation VALUES-pinnable under the driver's
  * typed hash — the q72 regression-pin pattern: the oracle asserts
  * "this engine computes exactly these neighbors at exactly these
  * scores on sf0.01", which is the strongest check an
  * approximate-neighbor dump admits (the analytic truth lives in the
  * hash-green `*_recall` twins and the Ann*Spec suites).
  *
  * `guard=true` adds the q72 fixture guard (fail LOUD if the driver
  * ever swaps the sf0.01 embeddings table, instead of a silent red
  * hash). The two bench-timed entries (q65/q84) skip the guard — Bench
  * runs them at sf0.1 where a hard guard would throw — and rely on
  * their recall twins to catch fixture drift.
  */
object AnnPin {
  def pinnable(s: SparkSession, d: String, dump: DataFrame, entry: String,
      guard: Boolean = true): DataFrame = {
    if (guard)
      Tables.requirePinnedFixture(s, d, "embeddings",
        Tables.Sf001EmbeddingsFp, entry)
    dump.select(col("qid").cast("long").as("qid"),
        col("rn").cast("long").as("rn"),
        col("nn_id").cast("long").as("nn_id"),
        round(col("cos") * 1000, 0).cast("long").as("cos_milli"),
        col("n_candidates").cast("long").as("n_candidates"))
      .orderBy("qid", "rn")
  }
}
