package graft.rel

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.rel.RelQueries.Q
import graft.rel.Tables

/** ISOTONIC REGRESSION by the MINIMAX formula (Ayer, Brunk, Ewing,
  * Reid & Silverman 1955; Barlow & Brunk 1972) — the optimal monotone
  * calibration map, computed DECLARATIVELY:
  *
  *   ŷᵢ = max_{j ≤ i} min_{l ≥ i} ( Σ_{j..l} y ) / ( Σ_{j..l} n )
  *
  * The textbook PAV pooling loop is inherently sequential; the minimax
  * identity is the same fit as ONE closed-form expression over
  * interval averages — O(k³) in the number of score bins, which is
  * the right trade here because k is DOMAIN-BOUNDED (a calibration
  * curve is read at 10–100 bins) while the corpus is not: the 100 TB
  * pass is the single hash aggregation to per-bin (n, Σy); everything
  * after runs on a k-row table (the Distribution.scala adjudication).
  *
  * Exactness: bin sums are exact integers; each interval average is
  * ONE IEEE division of exact integers (deterministic per engine
  * pair); min/max over those doubles picks from identical value sets
  * in both engines, so the fit replays bit-for-bit, rounded to 6 at
  * the edge. Empty bins simply don't exist as rows — the fit is over
  * observed bins only, identically on both sides.
  */
object Isotonic {

  /** Fit the monotone calibration curve over pre-binned unit rows:
    * `bin` an integral score bin (ordered), `y` an integral response.
    * Output per observed bin, ordered: (bin, n, sum_y, raw_r6,
    * iso_r6) — iso is nondecreasing in bin by construction.
    */
  def isotonicFit(df: DataFrame, bin: String = "bin",
      y: String = "y"): DataFrame = {
    val b = df.select(col(bin).cast("long").as("i"),
      col(y).cast("long").as("yv"))
      .groupBy("i").agg(count(lit(1)).as("n"), sum("yv").as("s"))
    val wCum = Window.orderBy("i").rowsBetween(Long.MinValue, 0)
    val cum = b
      .withColumn("cs", sum("s").over(wCum))
      .withColumn("cn", sum("n").over(wCum))
      .localCheckpoint(true) // k rows; three self-join consumers below
    val bi = cum.select(col("i"), col("n"), col("s"))
    val bj = cum.select(col("i").as("j"), (col("cs") - col("s")).as("csj"),
      (col("cn") - col("n")).as("cnj")) // prefix sums up to j-1
    val bl = cum.select(col("i").as("l"), col("cs").as("csl"),
      col("cn").as("cnl"))
    // interval average over [j, l] as one IEEE division of exact ints
    val pairs = bj.join(bl, col("j") <= col("l"))
      .select(col("j"), col("l"),
        ((col("csl") - col("csj")).cast("double")
          / (col("cnl") - col("cnj")).cast("double")).as("avg"))
    // per (i, j ≤ i): the inner min over l ≥ i
    val inner = bi.join(pairs, col("j") <= col("i") && col("l") >= col("i"))
      .groupBy(col("i"), col("n"), col("s"), col("j"))
      .agg(min("avg").as("mn"))
    inner.groupBy("i", "n", "s")
      .agg(max("mn").as("iso"))
      .select(col("i").as("bin"), col("n"), col("s").as("sum_y"),
        round(col("s").cast("double") / col("n").cast("double"), 6)
          .as("raw_r6"),
        round(col("iso"), 6).as("iso_r6"))
      .orderBy("bin")
  }

  val all: ListMap[String, Q] = ListMap(
    // ---- q326: ISOTONIC CALIBRATION of order price vs "large order"
    //      — 20 equal-width cents bins of o_totalprice against the
    //      indicator of ≥ 4 lineitems (a real monotone-with-noise
    //      relation: pooling has actual violations to repair). The
    //      bin formula is exact integer arithmetic off the global
    //      min/max. ----
    "q326_isotonic_calibration" -> Q(
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .groupBy(col("l_orderkey").as("ok"))
          .agg(count(lit(1)).as("items"))
        val o = Tables.orders(s, d)
          .select(col("o_orderkey").as("ok"),
            round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
          .join(li, "ok")
          .select(col("cents"),
            when(col("items") >= 4, 1L).otherwise(0L).as("y"))
        val mm = o.agg(min("cents").as("lo"), max("cents").as("hi"))
        val binned = o.crossJoin(broadcast(mm))
          .select(expr("((cents - lo) * 20) div (hi - lo + 1)").as("bin"),
            col("y"))
        isotonicFit(binned)
      },
      Some("""WITH li AS (SELECT l_orderkey AS ok, count(*) AS items
             |  FROM lineitem GROUP BY 1),
             |o AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             |    CASE WHEN li.items >= 4 THEN 1 ELSE 0 END AS y
             |  FROM orders JOIN li ON li.ok = o_orderkey),
             |mm AS (SELECT min(cents) AS lo, max(cents) AS hi FROM o),
             |u AS (SELECT ((cents - mm.lo) * 20) // (mm.hi - mm.lo + 1)
             |    AS i, y FROM o, mm),
             |b AS (SELECT i, count(*) AS n, sum(y) AS s FROM u GROUP BY 1),
             |c AS (SELECT i, n, s,
             |    sum(s) OVER (ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING
             |      AND CURRENT ROW) AS cs,
             |    sum(n) OVER (ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING
             |      AND CURRENT ROW) AS cn
             |  FROM b),
             |p AS (SELECT j.i AS j, l.i AS l,
             |    CAST(l.cs - (j.cs - j.s) AS DOUBLE)
             |      / CAST(l.cn - (j.cn - j.n) AS DOUBLE) AS avg
             |  FROM c j JOIN c l ON j.i <= l.i),
             |inner_min AS (SELECT c.i, c.n, c.s, p.j, min(p.avg) AS mn
             |  FROM c JOIN p ON p.j <= c.i AND p.l >= c.i
             |  GROUP BY c.i, c.n, c.s, p.j)
             |SELECT i AS bin, CAST(n AS BIGINT) AS n,
             |  CAST(s AS BIGINT) AS sum_y,
             |  round(CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 6) AS raw_r6,
             |  round(max(mn), 6) AS iso_r6
             |FROM inner_min GROUP BY i, n, s ORDER BY bin""".stripMargin)),
  )
}
