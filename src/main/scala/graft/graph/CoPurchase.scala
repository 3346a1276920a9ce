package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.rel.Tables

/** The SHARED min-support-2 co-purchase graph — parts adjacent when
  * they co-occur in ≥ 2 orders (the q315 sparsification) — extracted
  * once so the five graph entries built on it (q315 link prediction,
  * q324/q325 neighborhood function, q331 k-truss, q333 modularity)
  * and their oracles cannot silently diverge on the definition
  * (previously copy-pasted in seven places — an ADVICE-class drift
  * hazard).
  */
object CoPurchase {

  /** Canonical (a < b) co-purchase edges. */
  def edges(s: SparkSession, d: String): DataFrame = {
    val lp = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct()
    lp.as("x").join(lp.as("y"),
        col("x.o") === col("y.o") && col("x.p") < col("y.p"))
      .groupBy(col("x.p").as("a"), col("y.p").as("b"))
      .agg(count(lit(1)).as("w"))
      .filter(col("w") >= 2)
      .select("a", "b")
  }

  /** The matching oracle CTE: defines `e0` with canonical (a, b)
    * columns. Compose as s"WITH $CoPurchase.Sql, ...".
    */
  val Sql: String =
    """lp AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
      |  FROM lineitem),
      |e0 AS (SELECT x.p AS a, y.p AS b
      |  FROM lp x JOIN lp y ON x.o = y.o AND x.p < y.p
      |  GROUP BY x.p, y.p HAVING count(*) >= 2)""".stripMargin
}
