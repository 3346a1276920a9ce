package graft.rel

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.rel.RelQueries.Q
import graft.rel.Tables

/** CATEGORICAL SUMMARY OPERATORS — the exact MODE (most frequent value)
  * per group with a deterministic tie order, the categorical analogue
  * of the numeric summary tier (mean/median/percentile already live in
  * q01/q21/q24).
  */
object Categorical {

  /** Exact MODE of `value` per `group`: the most frequent value, ties
    * resolved by the pinned total order (count DESC, value ASC) so the
    * winner is deterministic on any engine. One count shuffle + a
    * group-keyed window. Output: (group, mode_<value>, mode_count).
    */
  def groupMode(df: org.apache.spark.sql.DataFrame, group: String,
      value: String): org.apache.spark.sql.DataFrame = {
    val w = Window.partitionBy(group).orderBy(col("n").desc, col(value))
    df.groupBy(col(group), col(value)).agg(count(lit(1)).as("n"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col(group), col(value).as(s"mode_$value"), col("n").as("mode_count"))
  }

  val all: ListMap[String, Q] = ListMap(
    // ---- q167: GROUP MODE — the modal return flag per part brand over
    //      the lineitem ⋈ part join, with the tie order pinned total
    //      (count DESC, then value ASC): both engines pick the same
    //      winner even when counts tie, which is what makes mode
    //      hash-checkable at all. Scale: one shuffle for the
    //      (brand, flag) count, then a 75-row window — the join is
    //      partkey-keyed and the part side prunes to two columns. ----
    "q167_group_mode" -> Q(
      (s, d) => {
        val joined = Tables.lineitem(s, d)
          .join(Tables.part(s, d).select(col("p_partkey"), col("p_brand")),
            col("l_partkey") === col("p_partkey"))
        groupMode(joined, "p_brand", "l_returnflag")
          .withColumnRenamed("mode_l_returnflag", "mode_returnflag")
          .orderBy("p_brand")
      },
      Some("""WITH c AS (
             |  SELECT p.p_brand, l.l_returnflag, count(*) AS n
             |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
             |  GROUP BY 1, 2),
             |r AS (SELECT *, row_number() OVER (PARTITION BY p_brand
             |    ORDER BY n DESC, l_returnflag) AS rk FROM c)
             |SELECT p_brand, l_returnflag AS mode_returnflag,
             |  CAST(n AS BIGINT) AS mode_count
             |FROM r WHERE rk = 1 ORDER BY p_brand""".stripMargin)),

    // ---- q201: LISTAGG / STRING_AGG — the ordered string-aggregation
    //      ANSI operator: per market segment, the distinct order
    //      priorities its customers used, concatenated in a PINNED
    //      (alphabetical) order — sort_array(collect_set) on the Spark
    //      side, string_agg(DISTINCT … ORDER BY) in DuckDB; without the
    //      pinned order string aggregation is engine-nondeterministic,
    //      which is exactly why the order is part of the operator. ----
    "q201_string_agg" -> Q(
      (s, d) => {
        Tables.orders(s, d)
          .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
          .groupBy("c_mktsegment")
          .agg(
            concat_ws(",", sort_array(collect_set(col("o_orderpriority"))))
              .as("priorities"),
            count(lit(1)).as("n_orders"))
          .orderBy("c_mktsegment")
      },
      Some("""SELECT c_mktsegment,
             |  string_agg(DISTINCT o_orderpriority, ','
             |    ORDER BY o_orderpriority) AS priorities,
             |  CAST(count(*) AS BIGINT) AS n_orders
             |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
             |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    // ---- q206: TOP-N WITH TIES — dense_rank keeps EVERY row achieving
    //      the top-2 distinct sizes per brand (row_number's arbitrary
    //      tie-cut is exactly what WITH TIES semantics exist to avoid;
    //      the output row count is data-dependent, not N·groups). ----
    "q206_top_with_ties" -> Q(
      (s, d) => {
        val w = Window.partitionBy("p_brand").orderBy(col("p_size").desc)
        Tables.part(s, d)
          .withColumn("rk", dense_rank().over(w))
          .filter(col("rk") <= 2)
          .select(col("p_brand"), col("rk"), col("p_size"), col("p_partkey"))
          .orderBy("p_brand", "rk", "p_partkey")
      },
      Some("""SELECT p_brand, CAST(rk AS INT) AS rk, p_size, p_partkey FROM (
             |  SELECT p_brand, p_size, p_partkey,
             |    dense_rank() OVER (PARTITION BY p_brand ORDER BY p_size DESC) AS rk
             |  FROM part) t
             |WHERE rk <= 2 ORDER BY p_brand, rk, p_partkey""".stripMargin)),
  )
}
