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

  /** The dim subtree may be DROPPED only when dropping it provably
    * removes no fact rows: a bare/attribute-pruned relation, or one
    * under `IsNotNull(pk)`-only filters (the optimizer infers those
    * from the inner equi-join; a null pk never matches any fk, so they
    * never reduce the match set). ANY other dim-side predicate — e.g.
    * a user filter on the dimension — makes the join row-reducing and
    * the elimination unsound, so it blocks the rewrite. `basePathOf`
    * deliberately stays filter-transparent (it only ORIENTS the match);
    * this gate is where soundness lives.
    */
  private def dimDroppable(p: LogicalPlan, pkId: ExprId): Boolean = p match {
    case LogicalRelation(_: HadoopFsRelation, _, _, _, _) => true
    case Project(exprs, child) if exprs.forall(_.isInstanceOf[AttributeReference]) =>
      dimDroppable(child, pkId)
    case Filter(cond, child) =>
      def conjuncts(e: Expression): Seq[Expression] = e match {
        case And(l, r) => conjuncts(l) ++ conjuncts(r)
        case other => Seq(other)
      }
      conjuncts(cond).forall {
        case IsNotNull(a: AttributeReference) => a.exprId == pkId
        case _ => false
      } && dimDroppable(child, pkId)
    case _ => false
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
                Set(fkA.exprId, pkA.exprId) &&
                dimDroppable(dim, pkA.exprId) =>
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
  import org.apache.spark.sql.functions.{col, count, lit, round, sum, when}
  import org.apache.spark.sql.DataFrame

  /** REFERENTIAL-INTEGRITY AUDIT — the verification q256's declaration
    * contract demands, as an operator: for one claimed fact.fk →
    * dim.pk relationship, count dangling foreign keys (non-null fk
    * with no dim match — one broadcast-able anti-join), null fks
    * (excluded from the FK contract but worth surfacing), and
    * duplicate primary keys (one keyed agg), plus the verdict flag.
    * Run it, read `fk_valid`, then declare. One row out.
    */
  def fkAudit(name: String, fact: DataFrame, fkCol: String,
      dim: DataFrame, pkCol: String): DataFrame = {
    val pks = dim.select(col(pkCol).as("__pk"))
    val dangling = fact.select(col(fkCol).as("__fk"))
      .filter(col("__fk").isNotNull)
      // no broadcast hint: the dim key set can itself be fact-sized
      // (lineitem->orders); AQE broadcasts when it is actually small
      .join(pks, col("__fk") === col("__pk"), "left_anti")
      .agg(count(lit(1)).as("n_dangling"))
    val nulls = fact.agg(
      sum(when(col(fkCol).isNull, 1L).otherwise(0L)).as("n_null_fk"))
    val dups = pks.groupBy("__pk").agg(count(lit(1)).as("__n"))
      .agg(sum(when(col("__n") > 1, col("__n")).otherwise(0L))
        .as("n_dup_pk_rows"))
    dangling.crossJoin(nulls).crossJoin(dups)
      .select(lit(name).as("relationship"), col("n_dangling"),
        col("n_null_fk"), col("n_dup_pk_rows"),
        (col("n_dangling") === 0 && col("n_dup_pk_rows") === 0)
          .as("fk_valid"))
  }

  val all: ListMap[String, Q] = ListMap(
    // ---- q257: the audit for three claimed relationships of the
    //      TPC-H-ish schema in one relation — orders→customer and
    //      lineitem→{orders, part}. Whatever the synthetic generator
    //      did (including violations) is the point: the audit REPORTS
    //      it, and the oracle replays every count. ----
    "q257_fk_audit" -> Q(
      (s, d) => {
        import graft.rel.Tables
        fkAudit("orders.o_custkey->customer.c_custkey",
            Tables.orders(s, d), "o_custkey",
            Tables.customer(s, d), "c_custkey")
          .unionByName(fkAudit("lineitem.l_orderkey->orders.o_orderkey",
            Tables.lineitem(s, d), "l_orderkey",
            Tables.orders(s, d), "o_orderkey"))
          .unionByName(fkAudit("lineitem.l_partkey->part.p_partkey",
            Tables.lineitem(s, d), "l_partkey",
            Tables.part(s, d), "p_partkey"))
          .orderBy("relationship")
      },
      Some("""WITH rel AS (
             |  SELECT 'orders.o_custkey->customer.c_custkey' AS relationship,
             |    (SELECT count(*) FROM orders WHERE o_custkey IS NOT NULL
             |      AND o_custkey NOT IN (SELECT c_custkey FROM customer
             |                            WHERE c_custkey IS NOT NULL))
             |      AS n_dangling,
             |    (SELECT count(*) FROM orders WHERE o_custkey IS NULL)
             |      AS n_null_fk,
             |    (SELECT coalesce(sum(n), 0) FROM (
             |      SELECT count(*) AS n FROM customer GROUP BY c_custkey
             |      HAVING count(*) > 1)) AS n_dup_pk_rows
             |  UNION ALL
             |  SELECT 'lineitem.l_orderkey->orders.o_orderkey',
             |    (SELECT count(*) FROM lineitem WHERE l_orderkey IS NOT NULL
             |      AND l_orderkey NOT IN (SELECT o_orderkey FROM orders
             |                             WHERE o_orderkey IS NOT NULL)),
             |    (SELECT count(*) FROM lineitem WHERE l_orderkey IS NULL),
             |    (SELECT coalesce(sum(n), 0) FROM (
             |      SELECT count(*) AS n FROM orders GROUP BY o_orderkey
             |      HAVING count(*) > 1))
             |  UNION ALL
             |  SELECT 'lineitem.l_partkey->part.p_partkey',
             |    (SELECT count(*) FROM lineitem WHERE l_partkey IS NOT NULL
             |      AND l_partkey NOT IN (SELECT p_partkey FROM part
             |                            WHERE p_partkey IS NOT NULL)),
             |    (SELECT count(*) FROM lineitem WHERE l_partkey IS NULL),
             |    (SELECT coalesce(sum(n), 0) FROM (
             |      SELECT count(*) AS n FROM part GROUP BY p_partkey
             |      HAVING count(*) > 1)))
             |SELECT relationship, CAST(n_dangling AS BIGINT) AS n_dangling,
             |  CAST(n_null_fk AS BIGINT) AS n_null_fk,
             |  CAST(n_dup_pk_rows AS BIGINT) AS n_dup_pk_rows,
             |  n_dangling = 0 AND n_dup_pk_rows = 0 AS fk_valid
             |FROM rel ORDER BY relationship""".stripMargin)),
    "q256_join_elimination" -> Q(
      (s, d) => {
        FkRegistry.register(FkRegistry.FkConstraint("q256_orders_customer",
          s"$d/orders.parquet", "o_custkey",
          s"$d/customer.parquet", "c_custkey"))
        // forcing executedPlan here PINS the rewritten plan on the
        // returned DataFrame (queryExecution caches), so the constraint
        // can be unregistered before the entry returns — a later query
        // in the same session never sees q256's registration
        try {
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
        } finally FkRegistry.unregister("q256_orders_customer")
      },
      Some("""SELECT o_orderpriority, count(*) AS n_orders,
             |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
             |    AS BIGINT) AS sum_cents
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |GROUP BY 1 ORDER BY o_orderpriority""".stripMargin))
  )
}
