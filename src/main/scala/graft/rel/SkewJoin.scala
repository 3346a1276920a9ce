package graft.rel

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.rel.RelQueries.Q

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

  /** KEY-SKEW DIAGNOSTIC — the report that tells you whether (and how
    * hard) to reach for [[saltedEquiJoin]]: the `topN` heaviest keys
    * with exact row counts, corpus share in ppm, and the integer salt
    * factor ⌈n·P/total⌉ — the number of `partitions`-cluster reducers
    * the key would need to spread evenly, i.e. the `salts` argument to
    * pass. All integer arithmetic (ppm and salt via floor division on
    * non-negative longs — truncation ≡ floor, identical both engines).
    *
    * Scale: one map-combinable keyed count, a broadcastable 1-row
    * total, and a per-partition top-N merge (TakeOrdered — never a
    * global sort materialization). Tie order pinned (count desc, key
    * asc) so top-N is deterministic.
    */
  def skewReport(df: DataFrame, key: String, partitions: Int, topN: Int)
      : DataFrame = {
    require(partitions >= 1 && topN >= 1, "partitions and topN must be >= 1")
    val counts = df.groupBy(col(key)).agg(count(lit(1)).as("n_rows"))
    val total = counts.agg(sum(col("n_rows")).as("total"))
    counts.crossJoin(broadcast(total))
      .withColumn("share_ppm", expr("(n_rows * 1000000) div total"))
      .withColumn("salt_factor",
        expr(s"(n_rows * $partitions + total - 1) div total"))
      .select(col(key), col("n_rows"), col("share_ppm"), col("salt_factor"))
      .orderBy(col("n_rows").desc, col(key))
      .limit(topN)
  }

  val all: ListMap[String, Q] = ListMap(
    // ---- q250: skew report for the events table keyed by user — the
    //      pre-flight a 1000-executor join on user_id runs first. Top
    //      10 keys, exact counts, ppm shares, and the salt factor to
    //      hand saltedEquiJoin at P=1024. Oracle replays counts +
    //      integer ppm/salt with the same pinned tie order. ----
    "q250_skew_report" -> Q(
      (s, d) => skewReport(Tables.events(s, d), "user_id",
          partitions = 1024, topN = 10)
        .select(col("user_id").cast("long"), col("n_rows").cast("long"),
          col("share_ppm"), col("salt_factor"))
        .orderBy(col("n_rows").desc, col("user_id")),
      Some("""WITH c AS (
             |  SELECT user_id, count(*) AS n_rows
             |  FROM events GROUP BY 1),
             |t AS (SELECT CAST(sum(n_rows) AS BIGINT) AS total FROM c)
             |SELECT CAST(user_id AS BIGINT) AS user_id,
             |  CAST(n_rows AS BIGINT) AS n_rows,
             |  (n_rows * 1000000) // total AS share_ppm,
             |  (n_rows * 1024 + total - 1) // total AS salt_factor
             |FROM c, t
             |ORDER BY n_rows DESC, user_id LIMIT 10""".stripMargin))
  )
}
