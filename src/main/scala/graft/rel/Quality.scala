package graft.rel

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.rel.RelQueries.Q

/** DATA-QUALITY AUDIT — declarative constraint checking over a table
  * (the Deequ/Great-Expectations shape): each rule is a boolean
  * violation predicate; the audit reports exact violation counts per
  * rule. The quality gate a pipeline runs before promoting a batch.
  *
  * Scale shape (100 TB): every row-local rule is folded into ONE
  * narrow pass (a single aggregation of sum(CASE…) columns — adding a
  * rule adds zero passes); uniqueness is one keyed agg; referential
  * integrity is one anti-join (broadcast when the parent's keys fit,
  * shuffle otherwise — Catalyst picks). Violation counts, not
  * violating rows, cross the wire.
  */
object Quality {

  /** One-pass audit of row-local rules: (rule, violations) with one
    * row per rule, exact counts, single scan regardless of rule count.
    */
  def audit(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "audit needs at least one rule")
    val agg = df.agg(
      sum(when(rules.head._2, 1L).otherwise(0L)).as(rules.head._1),
      rules.tail.map { case (n, c) => sum(when(c, 1L).otherwise(0L)).as(n) }: _*)
    val stackArgs = rules.map { case (n, _) => s"'$n', `$n`" }.mkString(", ")
    agg.select(expr(s"stack(${rules.length}, $stackArgs) AS (rule, violations)"))
  }

  /** Duplicate-key violations: rows beyond the first per key. */
  def duplicateKeys(df: DataFrame, name: String, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("c"))
      .agg(coalesce(sum(col("c") - 1), lit(0L)).as("violations"))
      .select(lit(name).as("rule"), col("violations"))

  /** Referential-integrity violations: child rows whose key has no
    * parent (null-safe: a null child key is an orphan).
    */
  def orphans(child: DataFrame, name: String, childKey: String,
      parent: DataFrame, parentKey: String): DataFrame =
    child.join(parent.select(col(parentKey).as(childKey)).distinct(),
        Seq(childKey), "left_anti")
      .agg(count(lit(1)).as("violations"))
      .select(lit(name).as("rule"), col("violations"))

  /** q139: the lineitem/orders audit — three row-local rules in one
    * scan, key uniqueness, and referential integrity, all exact counts
    * the oracle recomputes directly. (The fixture is clean, so most
    * counts pin at zero — the checked claim is the counts, whatever
    * they are.)
    */
  /** FUNCTIONAL-DEPENDENCY AUDIT — does X → Y actually hold in the
    * data? Per claimed dependency: distinct X values, X values bound
    * to MORE than one Y (the violations), the worst fan-out, and the
    * verdict. One keyed count-distinct per dependency (two map-side
    * combinable aggs), one summary row out — the schema-inference /
    * normalization pre-check, and the FD sibling of the q257 key
    * audit.
    */
  def fdAudit(name: String, df: DataFrame, lhs: Seq[String], rhs: String)
      : DataFrame = {
    val per = df.groupBy(lhs.map(col): _*)
      .agg(countDistinct(col(rhs)).as("__nrhs"))
    per.agg(count(lit(1)).as("n_lhs"),
        sum(when(col("__nrhs") > 1, 1L).otherwise(0L)).as("n_violating_lhs"),
        max(col("__nrhs")).as("max_fanout"))
      .select(lit(name).as("dependency"), col("n_lhs"),
        col("n_violating_lhs"), col("max_fanout"),
        (col("n_violating_lhs") === 0).as("fd_holds"))
  }

  val all: ListMap[String, Q] = ListMap(
    // ---- q262: FD audit for two claimed dependencies — nation →
    //      region (holds by schema construction) and customer nation →
    //      market segment (massively violated: segments are assigned
    //      independently of geography, and the audit proves it with
    //      the fan-out). Oracle replays both audits. ----
    "q262_fd_audit" -> Q(
      (s, d) => {
        fdAudit("nation.n_nationkey->n_regionkey",
            Tables.nation(s, d), Seq("n_nationkey"), "n_regionkey")
          .unionByName(fdAudit("customer.c_nationkey->c_mktsegment",
            Tables.customer(s, d), Seq("c_nationkey"), "c_mktsegment"))
          .orderBy("dependency")
      },
      Some("""WITH f1 AS (SELECT n_nationkey,
             |    count(DISTINCT n_regionkey) AS nr
             |  FROM nation GROUP BY 1),
             |f2 AS (SELECT c_nationkey,
             |    count(DISTINCT c_mktsegment) AS nr
             |  FROM customer GROUP BY 1),
             |rel AS (
             |  SELECT 'customer.c_nationkey->c_mktsegment' AS dependency,
             |    count(*) AS n_lhs,
             |    sum(CASE WHEN nr > 1 THEN 1 ELSE 0 END) AS n_violating_lhs,
             |    max(nr) AS max_fanout
             |  FROM f2
             |  UNION ALL
             |  SELECT 'nation.n_nationkey->n_regionkey', count(*),
             |    sum(CASE WHEN nr > 1 THEN 1 ELSE 0 END), max(nr)
             |  FROM f1)
             |SELECT dependency, CAST(n_lhs AS BIGINT) AS n_lhs,
             |  CAST(n_violating_lhs AS BIGINT) AS n_violating_lhs,
             |  CAST(max_fanout AS BIGINT) AS max_fanout,
             |  n_violating_lhs = 0 AS fd_holds
             |FROM rel ORDER BY dependency""".stripMargin)),
    "q139_data_quality" -> Q(
      (s, d) => {
        val li = Tables.lineitem(s, d)
        audit(li, Seq(
            "null_or_nonpos_quantity" ->
              (col("l_quantity").isNull || col("l_quantity") <= 0),
            "negative_price" -> (col("l_extendedprice") < 0),
            "discount_out_of_range" ->
              (col("l_discount") < 0 || col("l_discount") > 1)))
          .unionByName(duplicateKeys(li, "dup_line_keys",
            Seq("l_orderkey", "l_linenumber")))
          .unionByName(orphans(li, "orphan_lineitems", "l_orderkey",
            Tables.orders(s, d), "o_orderkey"))
          .orderBy("rule")
      },
      Some("""SELECT rule, violations FROM (
             |  SELECT 'null_or_nonpos_quantity' AS rule,
             |    CAST(sum(CASE WHEN l_quantity IS NULL OR l_quantity <= 0
             |      THEN 1 ELSE 0 END) AS BIGINT) AS violations FROM lineitem
             |  UNION ALL SELECT 'negative_price',
             |    CAST(sum(CASE WHEN l_extendedprice < 0 THEN 1 ELSE 0 END) AS BIGINT)
             |    FROM lineitem
             |  UNION ALL SELECT 'discount_out_of_range',
             |    CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 1
             |      THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem
             |  UNION ALL SELECT 'dup_line_keys',
             |    CAST(coalesce(sum(c - 1), 0) AS BIGINT) FROM
             |    (SELECT count(*) AS c FROM lineitem
             |     GROUP BY l_orderkey, l_linenumber)
             |  UNION ALL SELECT 'orphan_lineitems', CAST(count(*) AS BIGINT)
             |    FROM lineitem WHERE l_orderkey NOT IN
             |      (SELECT o_orderkey FROM orders))
             |ORDER BY rule""".stripMargin)),
  )
}
