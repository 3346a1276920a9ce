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
  val all: ListMap[String, Q] = ListMap(
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
