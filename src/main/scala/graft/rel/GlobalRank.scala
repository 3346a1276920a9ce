package graft.rel

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCALE-SAFE GLOBAL RANKING — the shared fix for Spark's classic
  * "No Partition Defined for Window" scale-killer: `row_number() OVER
  * (ORDER BY …)` plans as a range-exchange into ONE task that sorts the
  * whole input. Correct at any local SF, a single-reducer wall at 100×.
  *
  * The decomposition (the [[graft.llm.Curation.hashOrderPositions]]
  * bucket-offset trick generalized from hash order to ARBITRARY sort
  * order): range-partition the rows by the sort key, count rows per
  * range partition (a map-side-combinable agg of ≤ `spark.sql.shuffle
  * .partitions` rows), turn the counts into prefix OFFSETS with a
  * window over that tiny table (constant-keyed: never a range exchange),
  * and rank each partition independently in parallel — global rank =
  * offset(partition) + rank-within-partition. Every reducer sorts
  * ~1/P of the data; nothing single-task touches more than P rows.
  *
  * CONTRACT: `sortCols` must be a TOTAL order (append a unique
  * tie-break key — every call site in this repo orders by
  * (metric, entity_key)). Under a total order the result is pinned
  * bit-identical to `row_number() OVER (ORDER BY sortCols)`
  * ([[GlobalRankSpec]] proves it on tied data), and the derived
  * quantile transforms below reproduce `ntile` / `percent_rank` /
  * `cume_dist` exactly (with a total order, `rank` ≡ `row_number`, so
  * the SQL definitions collapse to closed forms over (rk, n)).
  *
  * Determinism note: range boundaries come from Spark's seeded
  * reservoir sampling — deterministic for a given input — and the two
  * consumers of the ranged child (histogram + ranking) reuse one
  * shuffle (ReuseExchange). Ties in the FULL sort tuple never split
  * across a boundary (the partitioner binary-searches on whole keys),
  * and a total order makes boundary placement irrelevant anyway.
  */
object GlobalRank {

  /** Adds `out` = global 1-based rank (long) of each row in `sortCols`
    * order, exactly `row_number() OVER (ORDER BY sortCols)`, plus
    * `outN` = total row count (long) — the pair every rank transform
    * (median-by-rank, Gini, ntile, percent_rank, cume_dist) needs.
    * Two data shuffles (range + pid-hash), both fully parallel.
    */
  def byOrder(df: DataFrame, sortCols: Seq[Column], out: String = "rk",
      outN: String = "n_total"): DataFrame = {
    require(sortCols.nonEmpty, "sortCols must be non-empty (and a total order)")
    // MATERIALIZE the ranged child (lazy local checkpoint) before fanning
    // out to the histogram and ranking branches: both must observe the
    // SAME range partitioning, and without this the two exchange subtrees
    // can be column-pruned into different shapes, ReuseExchange then does
    // not fire, and each exchange re-samples range boundaries with a
    // different rddId-seeded reservoir — per-partition ranks consistent
    // with one boundary set, offsets with another: silent rank corruption.
    // The checkpoint pins ONE rdd (one boundary sample); both branches
    // scan it. GlobalRankSpec pins the plan shape (no range exchange
    // downstream of the checkpoint, every Window partitioned).
    val ranged = df.repartitionByRange(sortCols: _*)
      .withColumn("__gr_pid", spark_partition_id())
      .localCheckpoint(false)
    val hist = ranged.groupBy("__gr_pid").agg(count(lit(1)).as("__gr_n"))
    // constant-but-NON-FOLDABLE partition key (pid mod 1 ≡ 0): keeps the
    // prefix-sum window a hash-grouped single reducer over ≤ P rows while
    // staying a real partitionSpec — a literal would be constant-folded
    // away, turning this into the very partition-less window the utility
    // exists to kill (harmless on ≤ P rows, but it would make "every
    // Window in the plan is partitioned" unpinnable in GlobalRankSpec)
    val k0 = pmod(col("__gr_pid"), lit(1))
    val off = hist
      .withColumn("__gr_off", coalesce(
        sum(col("__gr_n")).over(Window.partitionBy(k0)
          .orderBy("__gr_pid").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .withColumn(outN, sum(col("__gr_n")).over(Window.partitionBy(k0)))
      .drop("__gr_n")
    ranged
      .withColumn("__gr_rn", row_number().over(
        Window.partitionBy("__gr_pid").orderBy(sortCols: _*)).cast("long"))
      .join(broadcast(off), Seq("__gr_pid"))
      .withColumn(out, col("__gr_off") + col("__gr_rn"))
      .drop("__gr_pid", "__gr_rn", "__gr_off")
  }

  /** Global PREFIX SUM in `sortCols` order — the same offset
    * decomposition as [[byOrder]] extended to a running value sum:
    * adds `outRk` = global 1-based rank, `outCum` = Σ value over rows
    * with rank ≤ this row's (exactly `sum(value) OVER (ORDER BY
    * sortCols ROWS UNBOUNDED PRECEDING)` under the total-order
    * contract), `outN` = row count, `outTotal` = Σ value — the
    * quadruple a CUSUM / running-balance scan needs, with no
    * partition-less window anywhere: the histogram carries (count,
    * sum) per range partition, offsets come from the tiny
    * constant-keyed prefix window, and each partition scans its own
    * rows in parallel. `value` must be integral (exact long sums).
    */
  def prefixSumByOrder(df: DataFrame, sortCols: Seq[Column], value: Column,
      outCum: String = "cum", outRk: String = "rk",
      outN: String = "n_total", outTotal: String = "sum_total"): DataFrame = {
    require(sortCols.nonEmpty, "sortCols must be non-empty (and a total order)")
    val ranged = df.repartitionByRange(sortCols: _*)
      .withColumn("__gr_pid", spark_partition_id())
      .withColumn("__gr_x", value.cast("long"))
      .localCheckpoint(false)
    val hist = ranged.groupBy("__gr_pid")
      .agg(count(lit(1)).as("__gr_n"), sum("__gr_x").as("__gr_s"))
    val k0 = pmod(col("__gr_pid"), lit(1))
    val prior = Window.partitionBy(k0).orderBy("__gr_pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val off = hist
      .withColumn("__gr_off", coalesce(sum(col("__gr_n")).over(prior), lit(0L)))
      .withColumn("__gr_soff", coalesce(sum(col("__gr_s")).over(prior), lit(0L)))
      .withColumn(outN, sum(col("__gr_n")).over(Window.partitionBy(k0)))
      .withColumn(outTotal, sum(col("__gr_s")).over(Window.partitionBy(k0)))
      .drop("__gr_n", "__gr_s")
    val inPart = Window.partitionBy("__gr_pid").orderBy(sortCols: _*)
    ranged
      .withColumn("__gr_rn", row_number().over(inPart).cast("long"))
      .withColumn("__gr_cs", sum("__gr_x")
        .over(inPart.rowsBetween(Window.unboundedPreceding, 0)))
      .join(broadcast(off), Seq("__gr_pid"))
      .withColumn(outRk, col("__gr_off") + col("__gr_rn"))
      .withColumn(outCum, col("__gr_soff") + col("__gr_cs"))
      .drop("__gr_pid", "__gr_rn", "__gr_off", "__gr_cs", "__gr_soff",
        "__gr_x")
  }

  /** `ntile(k) OVER (ORDER BY <total order>)` as a closed form over
    * (rank, n): the first (n mod k) buckets take ⌈n/k⌉ rows, the rest
    * ⌊n/k⌋ — the remainder-to-early-buckets rule both Spark and ANSI
    * SQL implement. Long arithmetic throughout; the two divisions are
    * floor-of-exact-quotient (operands are row counts ≪ 2⁵⁰, quotients
    * land ≥ 1/k away from the next integer, so the IEEE division can
    * never cross it — exact).
    */
  def ntileOf(rk: Column, n: Column, k: Int): Column = {
    require(k > 0, s"ntile k must be > 0: $k")
    val q = floor(n / k).cast("long")   // small-bucket size
    val r = (n - q * k).cast("long")    // how many buckets get q+1
    val big = q + lit(1L)
    when(rk <= r * big, floor((rk - 1) / big).cast("long") + 1L)
      .otherwise(r + floor((rk - r * big - 1) / q).cast("long") + 1L)
  }

  /** `percent_rank() OVER (ORDER BY <total order>)` = (rk−1)/(n−1)
    * (0.0 when n = 1) — with a total order, rank ≡ row_number, so this
    * is the same IEEE double division Spark's window operator performs.
    */
  def percentRankOf(rk: Column, n: Column): Column =
    when(n === 1L, lit(0.0))
      .otherwise((rk - 1).cast("double") / (n - 1).cast("double"))

  /** `cume_dist() OVER (ORDER BY <total order>)` = rk/n — rows ≤
    * current collapse to the row's own rank under a total order.
    */
  def cumeDistOf(rk: Column, n: Column): Column =
    rk.cast("double") / n.cast("double")
}
