package graft.rel

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.rel.RelQueries.Q
import graft.rel.Tables

/** RAKING / ITERATIVE PROPORTIONAL FITTING (Deming & Stephan 1940) —
  * the survey-weighting workhorse: adjust cell weights of an (r, c)
  * contingency so the WEIGHTED marginals match target row and column
  * totals, alternating
  *
  *   w ← w · T_r / Σ_c n·w      (row step)
  *   w ← w · T_c / Σ_r n·w      (column step)
  *
  * for a FIXED number of rounds (the q316/q323 replayability
  * contract — IPF converges geometrically when the two target totals
  * agree, so a handful of rounds lands within micro resolution).
  *
  * Integer recipe: weights live in MICRO units, each step's factor is
  * one truncating division f = (T·10¹²) div Σn·w and the update is
  * (w·f) div 10⁶ — both engines replay every round bit-for-bit.
  * Loud guards (each a real failure mode, not bookkeeping): targets
  * past 9·10⁶ (T·10¹² must stay in a long), a step factor past 10³×
  * or a weight past 10⁹ micro (inconsistent/degenerate marginals —
  * IPF diverges instead of converging), and a data-zero margin with a
  * nonzero target (no weighting can manufacture mass; ANSI surfaces
  * it as the division error, the guard names it first).
  *
  * Scale shape: the unit table collapses ONCE to the (r, c, n) cell
  * table (domain-bounded: |r|·|c| rows); every round after is two
  * margin-keyed aggregations and two broadcast factor joins on that
  * tiny table — the corpus is never touched again.
  */
object Raking {

  private val TargetCap = 9000000L
  private val FactorCap = 1000000000L // 10³× in micro
  private val WeightCap = 1000000000L // 10³× in micro

  /** Rake `units`' (rowVar, colVar) cells to the target marginals.
    * Targets: (key, target) DataFrames. Output per cell, ordered:
    * (r, c, n, w_micro).
    */
  def rake(units: DataFrame, rowVar: String, colVar: String,
      rowTargets: DataFrame, colTargets: DataFrame,
      iters: Int = 6): DataFrame = {
    require(iters >= 1 && iters <= 16, s"1 <= iters <= 16: $iters")
    val cells = units
      .groupBy(col(rowVar).cast("string").as("r"),
        col(colVar).cast("string").as("c"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(true)
    def tgt(df: DataFrame, key: String): DataFrame =
      df.select(col(df.columns(0)).cast("string").as(key),
        when(col(df.columns(1)).cast("long") > TargetCap, raise_error(
          lit(s"rake: target exceeds $TargetCap — rescale the targets")))
          .otherwise(col(df.columns(1)).cast("long")).as(s"t_$key"))
    val rt = tgt(rowTargets, "r"); val ct = tgt(colTargets, "c")

    def step(w: DataFrame, key: String, t: DataFrame): DataFrame = {
      val cur = w.groupBy(key).agg(sum(expr("n * w")).as("cur"))
      val f = t.join(cur, key)
        .select(col(key),
          when(col("cur") <= 0L, raise_error(concat(
            lit(s"rake: margin $key = "), col(key),
            lit(" has zero weighted mass but a nonzero target"))))
            .when(expr(s"(t_$key * 1000000000000) div cur") > FactorCap,
              raise_error(lit(
                "rake: step factor exceeds 1000x — inconsistent marginals")))
            .otherwise(expr(s"(t_$key * 1000000000000) div cur")).as("f"))
      w.join(broadcast(f), Seq(key), "left")
        .select(col("r"), col("c"), col("n"),
          when(col("f").isNull, raise_error(concat(
            lit(s"rake: $key value "), col(key),
            lit(" appears in the data but not in the targets"))))
            .when(expr("(w * f) div 1000000") > WeightCap, raise_error(lit(
              "rake: weight exceeds 1000x — inconsistent marginals")))
            .otherwise(expr("(w * f) div 1000000")).as("w"))
    }

    var w = cells.withColumn("w", lit(1000000L))
    for (_ <- 1 to iters) {
      w = step(step(w, "r", rt), "c", ct).localCheckpoint(true)
    }
    w.select(col("r"), col("c"), col("n"), col("w").as("w_micro"))
      .orderBy("r", "c")
  }

  val all: ListMap[String, Q] = ListMap(
    // ---- q359: rake the customer (segment × region) table to uniform
    //      200-per-segment / 200-per-region targets, 4 rounds — the
    //      oracle unrolls each round's two margin steps with the
    //      identical truncating-division chain. ----
    "q359_raking" -> Q(
      (s, d) => {
        import s.implicits._
        val units = Tables.customer(s, d)
          .join(Tables.nation(s, d),
            col("c_nationkey") === col("n_nationkey"))
          .select(col("c_mktsegment").as("seg"),
            col("n_regionkey").cast("string").as("reg"))
        val segs = units.select("seg").distinct()
          .withColumn("t", lit(200L))
        val regs = units.select("reg").distinct()
          .withColumn("t", lit(200L))
        rake(units, "seg", "reg", segs, regs, iters = 4)
      },
      Some {
        def step(prev: String, cur: String, key: String, tcte: String): String =
          s"""${cur}_m AS (SELECT $key, sum(n * w) AS cur
             |  FROM $prev GROUP BY $key),
             |${cur}_f AS (SELECT t.$key,
             |    (t.t * 1000000000000) // m.cur AS f
             |  FROM $tcte t JOIN ${cur}_m m USING ($key)),
             |$cur AS MATERIALIZED (SELECT p.r, p.c, p.n,
             |    (p.w * f.f) // 1000000 AS w
             |  FROM $prev p JOIN ${cur}_f f USING ($key))""".stripMargin
        val rounds = (1 to 4).map { k =>
          val prev = if (k == 1) "w0" else s"w${k - 1}b"
          step(prev, s"w${k}a", "r", "rt") + ",\n" +
            step(s"w${k}a", s"w${k}b", "c", "ct")
        }.mkString(",\n")
        s"""WITH u AS (SELECT c.c_mktsegment AS r,
           |    CAST(n.n_regionkey AS VARCHAR) AS c
           |  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey),
           |cells AS (SELECT r, c, count(*) AS n FROM u GROUP BY r, c),
           |rt AS (SELECT DISTINCT r, CAST(200 AS BIGINT) AS t FROM cells),
           |ct AS (SELECT DISTINCT c, CAST(200 AS BIGINT) AS t FROM cells),
           |w0 AS (SELECT r, c, n, CAST(1000000 AS BIGINT) AS w FROM cells),
           |$rounds
           |SELECT r, c, CAST(n AS BIGINT) AS n, CAST(w AS BIGINT) AS w_micro
           |FROM w4b ORDER BY r, c""".stripMargin
      }),
  )
}
