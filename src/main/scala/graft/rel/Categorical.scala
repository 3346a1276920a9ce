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

  /** CHI-SQUARE INDEPENDENCE + CRAMÉR'S V between two categorical
    * columns (Cramér 1946) — "are these two labelings related at
    * all, and how strongly":
    *
    *   χ² = Σ (o − e)² / e,  e = rowTot·colTot/n,
    *   V  = sqrt(χ² / (n · (min(r, c) − 1))).
    *
    * Exactness: the contingency table, margins, and n are exact
    * integers from two hash aggregations; each cell's χ² term is one
    * fixed IEEE chain folded over the LEVEL-BOUNDED (a, b)-ordered
    * window (the q328 rule); V is one chain at the edge. Degenerate
    * tables (a single level on either axis) raise loudly — V is
    * undefined.
    *
    * Output (1 row): (n, a_levels, b_levels, chi2_r6, cramers_v_r6).
    */
  def cramersV(df: org.apache.spark.sql.DataFrame, a: String,
      b: String): org.apache.spark.sql.DataFrame = {
    val base = df.select(col(a).cast("string").as("av"),
      col(b).cast("string").as("bv"))
    val cells = base.groupBy("av", "bv").agg(count(lit(1)).as("o"))
    val ra = cells.groupBy("av").agg(sum("o").as("rt"))
    val cb = cells.groupBy("bv").agg(sum("o").as("ct"))
    val nn = cells.agg(sum("o").as("n"),
      countDistinct("av").as("ra"), countDistinct("bv").as("rb"))
    val full = ra.crossJoin(cb)
      .join(cells, Seq("av", "bv"), "left")
      .withColumn("o", coalesce(col("o"), lit(0L)))
      .crossJoin(broadcast(nn))
    val e = col("rt").cast("double") * col("ct").cast("double") /
      col("n").cast("double")
    val term = (col("o").cast("double") - e) * (col("o").cast("double") - e) / e
    val wCum = Window.orderBy("av", "bv").rowsBetween(Long.MinValue, 0)
    full
      .withColumn("cum", sum(term).over(wCum))
      .agg(max(struct(col("av"), col("bv"), col("cum"), col("n"),
        col("ra"), col("rb"))).as("z"))
      .select(col("z.n").as("n"), col("z.ra").as("a_levels"),
        col("z.rb").as("b_levels"),
        round(col("z.cum"), 6).as("chi2_r6"),
        when(col("z.ra") < 2L || col("z.rb") < 2L, raise_error(lit(
          "cramersV: a single-level axis — the statistic is undefined")))
          .otherwise(round(sqrt(col("z.cum")
            / (col("z.n").cast("double")
              * (least(col("z.ra"), col("z.rb")) - 1L).cast("double"))),
            6)).as("cramers_v_r6"))
  }

  val all: ListMap[String, Q] = ListMap(
    // ---- q402: CRAMÉR'S V — is document language related to source?
    //      The full lang × source contingency with margins completed,
    //      the ordered χ² fold, and the V normalization; the oracle
    //      replays every cell term. ----
    "q402_cramers_v" -> Q(
      (s, d) => cramersV(Tables.documents(s, d), "lang", "source"),
      Some("""WITH cells AS (SELECT lang AS av, source AS bv,
             |    count(*) AS o
             |  FROM documents GROUP BY lang, source),
             |ra AS (SELECT av, sum(o) AS rt FROM cells GROUP BY av),
             |cb AS (SELECT bv, sum(o) AS ct FROM cells GROUP BY bv),
             |nn AS (SELECT sum(o) AS n, count(DISTINCT av) AS ra,
             |    count(DISTINCT bv) AS rb FROM cells),
             |fl AS (SELECT ra.av, cb.bv, ra.rt, cb.ct,
             |    coalesce(cells.o, 0) AS o
             |  FROM ra CROSS JOIN cb
             |  LEFT JOIN cells ON cells.av = ra.av AND cells.bv = cb.bv),
             |tm AS (SELECT av, bv,
             |    (CAST(o AS DOUBLE) - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)
             |      / CAST(nn.n AS DOUBLE))
             |    * (CAST(o AS DOUBLE) - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)
             |      / CAST(nn.n AS DOUBLE))
             |    / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)
             |      / CAST(nn.n AS DOUBLE)) AS term
             |  FROM fl, nn),
             |ag AS (SELECT sum(term ORDER BY av, bv) AS chi2 FROM tm)
             |SELECT CAST(nn.n AS BIGINT) AS n,
             |  CAST(nn.ra AS BIGINT) AS a_levels,
             |  CAST(nn.rb AS BIGINT) AS b_levels,
             |  round(ag.chi2, 6) AS chi2_r6,
             |  round(sqrt(ag.chi2 / (CAST(nn.n AS DOUBLE)
             |    * CAST(least(nn.ra, nn.rb) - 1 AS DOUBLE))), 6)
             |    AS cramers_v_r6
             |FROM ag, nn""".stripMargin)),

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
