package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** PK/FK-INFORMED JOIN ELIMINATION — the second optimizer rule on the
  * extension surface (next to [[MvRewriteRule]]): when a query inner-
  * joins a fact to a dimension on a DECLARED key constraint but reads
  * no dimension column, the join changes nothing — the dimension key
  * is unique (each fact row matches at most once) and referentially
  * complete (each fact row matches at least once) — so the rule
  * removes it. At warehouse scale this deletes an entire
  * build-and-probe (or worse, a shuffle) from star-schema queries
  * whose dimension columns got pruned away by views or tools.
  *
  * Soundness is explicit, not assumed: constraints are REGISTERED
  * facts about specific table files ([[FkRegistry]] — Spark itself
  * cannot know them for bare parquet), and the rewrite preserves the
  * inner join's null semantics by inserting `IsNotNull(fk)` when the
  * fact key is nullable (a null key never matches a primary key).
  * Matching scope: Project over an Inner equi-join of the two
  * registered relations (bare or attribute-pruned), single EqualTo on
  * exactly (fk, pk), and a projection that references no dimension
  * attribute except possibly the pk itself — which rewrites to the
  * fact's fk (equal by the join predicate on every surviving row).
  */
object FkRegistry {
  /** dim `pkCol` is unique AND every non-null fact `fkCol` exists in
    * dim — declared for the specific files, verified out of band. */
  final case class FkConstraint(name: String, factSuffix: String,
      fkCol: String, dimSuffix: String, pkCol: String)

  private val defs =
    new java.util.concurrent.ConcurrentHashMap[String, FkConstraint]()
  def register(c: FkConstraint): Unit = defs.put(c.name, c)
  def unregister(name: String): Unit = defs.remove(name)
  def registered: Seq[FkConstraint] = {
    import scala.jdk.CollectionConverters._
    defs.values.asScala.toSeq.sortBy(_.name)
  }
}

class FkJoinEliminationRule(spark: SparkSession) extends Rule[LogicalPlan] {
  import FkRegistry._

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (registered.isEmpty) return plan
    plan.transformUp {
      case p @ Project(_, j: Join) => tryEliminate(p, j).getOrElse(p)
    }
  }

  private def basePathOf(p: LogicalPlan): Option[String] = p match {
    case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
      fs.location.rootPaths.headOption.map(_.toString)
    case Project(exprs, child) if exprs.forall(_.isInstanceOf[AttributeReference]) =>
      basePathOf(child)
    case Filter(_, child) => basePathOf(child)
    case _ => None
  }

  private def tryEliminate(p: Project, j: Join): Option[LogicalPlan] = {
    if (j.joinType != Inner) return None
    val cond = j.condition match {
      case Some(EqualTo(a: AttributeReference, b: AttributeReference)) => (a, b)
      case _ => return None
    }
    val (lp, rp) = (basePathOf(j.left), basePathOf(j.right))
    if (lp.isEmpty || rp.isEmpty) return None
    registered.view.flatMap { c =>
      // orient: which side is the fact, which the dimension
      val orient: Option[(LogicalPlan, LogicalPlan)] =
        if (lp.get.endsWith(c.factSuffix) && rp.get.endsWith(c.dimSuffix))
          Some((j.left, j.right))
        else if (rp.get.endsWith(c.factSuffix) && lp.get.endsWith(c.dimSuffix))
          Some((j.right, j.left))
        else None
      orient.flatMap { case (fact, dim) =>
        val fk = fact.output.find(_.name.equalsIgnoreCase(c.fkCol))
        val pk = dim.output.find(_.name.equalsIgnoreCase(c.pkCol))
        (fk, pk) match {
          case (Some(fkA), Some(pkA))
              if Set(cond._1.exprId, cond._2.exprId) ==
                Set(fkA.exprId, pkA.exprId) =>
            val refs = p.projectList.flatMap(_.references)
            val dimOut = dim.outputSet
            if (refs.exists(r => dimOut.contains(r) && r.exprId != pkA.exprId))
              None
            else {
              // pk references rewrite to the fact's fk (equal on every
              // surviving row); preserve names and exprIds
              val newProj = p.projectList.map { ne =>
                ne.transform {
                  case a: AttributeReference if a.exprId == pkA.exprId => fkA
                } match {
                  case n: NamedExpression => n
                  case other => Alias(other, ne.name)(exprId = ne.exprId)
                }
              }
              val factSide =
                if (fkA.nullable) Filter(IsNotNull(fkA), fact) else fact
              Some(Project(newProj, factSide))
            }
          case _ => None
        }
      }
    }.headOption
  }
}

/** q256: join elimination under the driver's hash gate — the entry
  * declares orders.o_custkey → customer.c_custkey (verified: zero
  * dangling keys, unique pks at both tiers), runs a priority rollup
  * that JOINS customer but reads nothing from it, and REQUIRES the
  * optimized plan to scan only orders; the oracle executes the join
  * for real in DuckDB, so the hash gate proves the elimination is
  * semantics-preserving.
  */
object FkQueries {
  import scala.collection.immutable.ListMap
  import graft.rel.RelQueries.Q
  import org.apache.spark.sql.functions.{col, count, lit, round, sum}

  val all: ListMap[String, Q] = ListMap(
    "q256_join_elimination" -> Q(
      (s, d) => {
        FkRegistry.register(FkRegistry.FkConstraint("q256_orders_customer",
          s"$d/orders.parquet", "o_custkey",
          s"$d/customer.parquet", "c_custkey"))
        val q = graft.rel.Tables.orders(s, d)
          .join(graft.rel.Tables.customer(s, d),
            col("o_custkey") === col("c_custkey"))
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n_orders"),
            sum(round(col("o_totalprice") * 100).cast("long")).as("sum_cents"))
          .orderBy("o_orderpriority")
        val plan = q.queryExecution.executedPlan.toString
        require(!plan.contains("customer.parquet") && !plan.contains("Join"),
          s"join was not eliminated:\n$plan")
        q
      },
      Some("""SELECT o_orderpriority, count(*) AS n_orders,
             |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
             |    AS BIGINT) AS sum_cents
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |GROUP BY 1 ORDER BY o_orderpriority""".stripMargin))
  )
}
