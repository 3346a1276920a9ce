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
        val counted = Tables.lineitem(s, d)
          .join(Tables.part(s, d).select(col("p_partkey"), col("p_brand")),
            col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand"), col("l_returnflag"))
          .agg(count(lit(1)).as("n"))
        val w = Window.partitionBy("p_brand")
          .orderBy(col("n").desc, col("l_returnflag"))
        counted
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") === 1)
          .select(col("p_brand"), col("l_returnflag").as("mode_returnflag"),
            col("n").as("mode_count"))
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
  )
}
