package graft.rel

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.IntegralDivide
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

/** Interval joins as EQUI-joins via range binning — the scale-correct
  * form of `points JOIN ranges ON t BETWEEN start AND end`.
  *
  * Spark plans a bare range predicate as a broadcast nested-loop join
  * (O(|points|·|ranges|) comparisons, and only if one side fits in a
  * broadcast); binning turns it into a standard hash/sort-merge
  * equi-join: each range replicates to the fixed-width bins it spans,
  * each point maps to exactly ONE bin, the join key is the bin, and the
  * original predicate remains as a residual filter. A matching pair
  * meets in exactly one bin (the point's), so no dedup pass is needed.
  *
  * `binWidth` trades replication against selectivity: ranges replicate
  * ~(span/binWidth + 1)×, while a too-wide bin makes the residual filter
  * discard more candidates. Near the typical range span is a good
  * default. RangeJoinSpec pins parity with the naive theta-join on
  * seeded random data and asserts the plan is an equi-join, not a
  * nested loop.
  */
object RangeJoin {

  /** Exact floor division for any sign: `c - pmod(c, w)` is an exact
    * multiple of `w`, divided with INTEGER semantics (SQL `div`). The
    * numerator is exact, so `div`'s truncate-toward-zero equals floor.
    * Column `/` would route through double and lose mantissa bits past
    * 2⁵³ — silently mis-binning nanosecond-epoch axes (RangeJoinSpec
    * pins a >2⁵³ case).
    */
  private def floorDiv(c: org.apache.spark.sql.Column, w: Long) =
    ColumnBridge.column(IntegralDivide(
      ColumnBridge.expression((c - pmod(c, lit(w))).cast("long")),
      ColumnBridge.expression(lit(w))))

  /** Inner join of `points` rows to `ranges` rows where
    * `start <= t <= end` (inclusive, integral axis), executed as an
    * equi-join on bins of `binWidth`. Output columns: all of `points`
    * then all of `ranges`; column names must not collide.
    */
  def binnedIntervalJoin(points: DataFrame, t: String,
      ranges: DataFrame, start: String, end: String, binWidth: Long): DataFrame = {
    require(binWidth >= 1, s"binWidth must be >= 1, got $binWidth")
    val rb = ranges.withColumn("__graft_bin",
      explode(sequence(floorDiv(col(start), binWidth), floorDiv(col(end), binWidth))))
    val pb = points.withColumn("__graft_bin", floorDiv(col(t), binWidth))
    pb.join(rb, Seq("__graft_bin"))
      .filter(col(t) >= col(start) && col(t) <= col(end))
      .drop("__graft_bin")
  }
}
