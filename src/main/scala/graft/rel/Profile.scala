package graft.rel

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.rel.RelQueries.Q

/** Dataset PROFILING — the "what is in this table" pass every pipeline
  * runs before trusting a new drop: one row per profiled column with
  * (n_rows, n_nulls, n_distinct, min_value, max_value), computed in a
  * SINGLE aggregation over ONE scan (all columns' aggregates evaluate
  * together; the one result row explodes into per-column rows).
  *
  * Distinct counts come in two modes. `exact = true` uses
  * count(DISTINCT): Spark plans multi-column distinct via EXPAND — the
  * scan's rows replicate once per distinct aggregate before the
  * shuffle, so profiling c columns costs ~c× the shuffle rows. That is
  * the oracle-checkable mode. `exact = false` uses
  * approx_count_distinct (HyperLogLog++): partials are mergeable
  * sketches, no expand, no distinct shuffle — ONE narrow pass whatever
  * the column count, the mode to run at 100 TB (ProfileSpec pins the
  * plans: no Expand in approx mode, and cross-checks its estimates
  * against exact).
  *
  * min/max are cast to string so heterogeneous column types share one
  * schema — callers needing typed extrema profile per column.
  */
object Profile {

  def profile(s: SparkSession, df: DataFrame, cols: Seq[String],
      exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__cnt_$c"),
        (if (exact) count_distinct(col(c))
         else approx_count_distinct(col(c))).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val one = df.agg(count(lit(1)).as("__n_rows"), aggs: _*)
    one.select(explode(array(cols.map(c => struct(
        lit(c).as("col_name"),
        col("__n_rows").as("n_rows"),
        (col("__n_rows") - col(s"__cnt_$c")).as("n_nulls"),
        col(s"__nd_$c").cast("long").as("n_distinct"),
        col(s"__min_$c").as("min_value"),
        col(s"__max_$c").as("max_value"))): _*)).as("p"))
      .select("p.*")
  }

  /** q99 fixture: lineitem plus a null-injected flag column, so the
    * null accounting has real work (the base table is null-free)
    */
  private def fixture(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d).withColumn("rf_null",
      when(col("l_orderkey") % 7 === 0, lit(null: String))
        .otherwise(col("l_returnflag")))

  private val profCols =
    Seq("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag", "rf_null")

  private def colSql(c: String): String =
    s"""SELECT '$c' AS col_name, count(*) AS n_rows,
       |  count(*) - count($c) AS n_nulls,
       |  count(DISTINCT $c) AS n_distinct,
       |  CAST(min($c) AS VARCHAR) AS min_value,
       |  CAST(max($c) AS VARCHAR) AS max_value
       |FROM li""".stripMargin

  val all: ListMap[String, Q] = ListMap(
    // ---- one-pass table profile: per-column rows with null/distinct
    //      accounting and string-cast extrema; the oracle recomputes
    //      each column's stats independently and unions them ----
    "q99_profile" -> Q(
      (s, d) => profile(s, fixture(s, d), profCols).orderBy("col_name"),
      Some((s"""WITH li AS (SELECT *,
              |  CASE WHEN l_orderkey % 7 = 0 THEN NULL
              |       ELSE l_returnflag END AS rf_null FROM lineitem)
              |""".stripMargin +
        profCols.map(colSql).mkString("", "\nUNION ALL\n", "\nORDER BY col_name")))),
  )
}
