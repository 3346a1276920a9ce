package graft.rel

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Manual key-salting for skewed equi-joins — the fallback when AQE's
  * skew-join split cannot apply (it only splits sort-merge join
  * partitions; a hot key flowing into a hash aggregation or a
  * shuffled-hash join still lands on one task). The skewed side gets a
  * deterministic per-row salt in [0, salts); the other side is
  * replicated `salts`× so every (key, salt) pair still meets its match.
  * Replication multiplies the small side's shuffle volume by `salts` —
  * choose the smaller side to replicate and keep `salts` near the
  * observed skew factor (e.g. hottest-key rows / average-key rows).
  */
object SkewJoin {

  /** Inner equi-join on `key` with the LEFT side salted and the RIGHT
    * side replicated. Output equals `left.join(right, key)` exactly
    * (SkewJoinSpec pins parity); only the shuffle distribution changes —
    * the hot key spreads over `salts` reducers.
    *
    * Measured ([[graft.examples.SkewBench]], BASELINE.md r6 row): on a
    * 20M-row fact with 87.5% of rows on one key joined to a 100k-row
    * dim feeding a same-key aggregate — the shape where AQE's
    * OptimizeSkewedJoin declines to split — salting with salts=32 ran
    * 1.92 s vs 6.26 s plain (6.63 s with AQE skew-join ON): 3.3×.
    */
  def saltedEquiJoin(left: DataFrame, right: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    // salt from the full row hash: deterministic, and rows of one hot key
    // spread uniformly (a row-independent salt like rand() would break
    // retry determinism; a constant would not spread at all)
    val salted = left.withColumn("__salt",
      pmod(xxhash64(struct(left.columns.map(col): _*)), lit(salts)).cast("int"))
    val replicated = right.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
