package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.rel.RelQueries.Q
import graft.rel.Tables

/** DEGREE ASSORTATIVITY — Pearson correlation of endpoint degrees over
  * the edges of an undirected graph (Newman 2002): do hubs attach to
  * hubs (assortative, r > 0, social graphs) or to leaves (dis-
  * assortative, r < 0, purchase/infra graphs)? A one-number structural
  * diagnostic the graph tier (q116/q118/q122/q123) reads before
  * choosing skew strategies — a strongly disassortative graph is
  * exactly the hub-and-spoke shape that needs the orientation trick.
  *
  * Exactness (the q142 Pearson discipline): all five moment sums
  * (Σx, Σy, Σxy, Σx², Σy², over DIRECTED edge endpoints so x and y
  * are symmetric) are exact integers carried as DECIMAL(38,0) — degree
  * products overflow nothing at 38 digits — and the floating tail is
  * one fixed parenthesized chain: num/ (sqrt(dx)·sqrt(dy)), each
  * operand converted from the exact integer to IEEE double, rounded to
  * 6. The DuckDB oracle replays the identical chain over HUGEINT sums.
  *
  * Scale shape (100 TB): one distinct + one degree agg + one
  * degree-keyed join per side (the degree table is |V|-sized, joined
  * on the edge's endpoint key) and a 1-row total agg. No driver state.
  */
object Assortativity {

  /** Degree assortativity coefficient of the undirected graph (`a`,
    * `b`). Returns one row: (m_directed, r6) where r6 is the Pearson
    * coefficient over directed endpoint pairs rounded to 6 places.
    */
  def degreeAssortativity(s: SparkSession, edges: DataFrame): DataFrame = {
    val und = edges
      .select(col("a").cast("long").as("a"), col("b").cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("a"), greatest(col("a"), col("b")).as("b"))
      .distinct()
    val ed = und.select(col("a").as("u"), col("b").as("v"))
      .unionAll(und.select(col("b").as("u"), col("a").as("v")))
    val deg = ed.groupBy(col("u").as("n")).agg(count(lit(1)).as("d"))
    val pairs = ed
      .join(deg.select(col("n").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("n").as("v"), col("d").as("dv")), "v")
    // exact integer moments in DECIMAL(38,0); m ≤ 2^63 edges and
    // degrees ≤ |V| keep every product far under 38 digits
    val dec = "decimal(38,0)"
    val agg = pairs.agg(
      count(lit(1)).cast(dec).as("m"),
      sum(col("du")).cast(dec).as("sx"),
      sum(col("dv")).cast(dec).as("sy"),
      sum(col("du") * col("dv")).cast(dec).as("sxy"),
      sum(col("du") * col("du")).cast(dec).as("sxx"),
      sum(col("dv") * col("dv")).cast(dec).as("syy"))
    agg.select(
      col("m").cast("long").as("m_directed"),
      round(
        (col("m") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (sqrt((col("m") * col("sxx") - col("sx") * col("sx")).cast("double")) *
            sqrt((col("m") * col("syy") - col("sy") * col("sy")).cast("double"))),
        6).as("r6"))
  }

  /** DEGREE-DISTRIBUTION POWER-LAW FIT — log-log OLS of (degree,
    * node count) over the undirected degree distribution: the scale-
    * free diagnostic (slope ≈ −γ; Barabási-Albert γ ≈ 3) and the
    * first number a capacity plan reads off a new graph (how heavy is
    * the hub tail the skew handling must survive). The OLS is the
    * q366 zipf chain over the DISTINCT-DEGREE table (bounded by the
    * degree domain, not the node count — the q151 contract), in the
    * [[graft.functions.IntOls]] discipline: per-point ln snapped to
    * integer micro, exact integer moments, exact rational
    * round-half-up — no cross-engine libm chain reaches the output.
    * Output (1 row): (n_nodes, n_edges, max_degree, n_points,
    * slope_micro, intercept_micro) — slope and ln-intercept in
    * integer micro-units.
    */
  def degreePowerlaw(s: SparkSession, edges: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val und = edges
      .select(col("a").cast("long").as("a"), col("b").cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"))
      .distinct()
      .localCheckpoint(true)
    val deg = und.select(col("a").as("u")).unionAll(und.select(col("b").as("u")))
      .groupBy("u").agg(count(lit(1)).as("d"))
    val dist = deg.groupBy("d").agg(count(lit(1)).as("n"))
    val tot = deg.agg(count(lit(1)).as("n_nodes"), max(col("d")).as("max_degree"))
      .crossJoin(broadcast(und.agg(count(lit(1)).as("n_edges"))))
    // integer moments are order-free — no order-pinned window needed
    val dec = "decimal(38,0)"
    dist
      .withColumn("x", graft.functions.IntOls.lnMicro(col("d")))
      .withColumn("y", graft.functions.IntOls.lnMicro(col("n")))
      .agg(count(lit(1)).as("k"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"))
      .crossJoin(broadcast(tot))
      .withColumn("num", col("k").cast(dec) * col("sxy").cast(dec)
        - col("sx").cast(dec) * col("sy").cast(dec))
      .withColumn("den", col("k").cast(dec) * col("sxx").cast(dec)
        - col("sx").cast(dec) * col("sx").cast(dec))
      .select(col("n_nodes"), col("n_edges"), col("max_degree"),
        col("k").as("n_points"),
        when(col("den") > 0, graft.functions.IntOls.rhu(
          col("num") * lit(1000000L), col("den"))).as("slope_micro"),
        when(col("den") > 0, graft.functions.IntOls.rhu(
          col("sy").cast(dec) * col("den") - col("num") * col("sx").cast(dec),
          col("k").cast(dec) * col("den"))).as("intercept_micro"))
  }

  /** q168: assortativity of the part co-purchase graph (q118's edge
    * build) — co-purchase graphs are classically near-neutral-to-
    * disassortative; the exact value is pinned by the oracle replaying
    * the same moment chain in HUGEINT.
    */
  val all: ListMap[String, Q] = ListMap(
    // ---- q419: DEGREE POWER-LAW — the scale-free fit over the trade
    //      graph's degree distribution; the oracle replays the degree
    //      histogram and the INTEGER-EXACT micro-snapped OLS (the
    //      IntOls discipline — hardened preemptively after q410's r13
    //      libm-chain mismatch; this entry had the identical shape). ----
    "q419_degree_powerlaw" -> Q(
      (s, d) => {
        val e0 = Tables.orders(s, d).join(Tables.lineitem(s, d),
            col("o_orderkey") === col("l_orderkey"))
          .select((col("o_custkey").cast("long") * 2).as("a"),
            (col("l_suppkey").cast("long") * 2 + 1).as("b"))
        degreePowerlaw(s, e0)
      },
      Some("""WITH e0 AS MATERIALIZED (
             |  SELECT DISTINCT least(o.o_custkey * 2, l.l_suppkey * 2 + 1) AS a,
             |    greatest(o.o_custkey * 2, l.l_suppkey * 2 + 1) AS b
             |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
             |deg AS (SELECT u, count(*) AS d FROM (
             |    SELECT a AS u FROM e0 UNION ALL SELECT b FROM e0) x
             |  GROUP BY u),
             |dist AS (SELECT d, count(*) AS n FROM deg GROUP BY d),
             |tot AS (SELECT (SELECT count(*) FROM deg) AS n_nodes,
             |    (SELECT max(d) FROM deg) AS max_degree,
             |    (SELECT count(*) FROM e0) AS n_edges),
             |p AS (SELECT
             |    CAST(round(ln(CAST(d AS DOUBLE)) * 1e6, 0) AS HUGEINT) AS x,
             |    CAST(round(ln(CAST(n AS DOUBLE)) * 1e6, 0) AS HUGEINT) AS y
             |  FROM dist),
             |m AS (SELECT count(*) AS k, sum(x) AS sx, sum(y) AS sy,
             |    sum(x * x) AS sxx, sum(x * y) AS sxy
             |  FROM p),
             |dd AS (SELECT k, sx, sy,
             |    CAST(k AS HUGEINT) * sxy - sx * sy AS num,
             |    CAST(k AS HUGEINT) * sxx - sx * sx AS den
             |  FROM m),
             |e AS (SELECT *,
             |    2 * num * 1000000 + den AS bp, 2 * den AS bq,
             |    2 * (sy * den - num * sx) + CAST(k AS HUGEINT) * den AS ip,
             |    2 * CAST(k AS HUGEINT) * den AS iq
             |  FROM dd)
             |SELECT CAST(tot.n_nodes AS BIGINT) AS n_nodes,
             |  CAST(tot.n_edges AS BIGINT) AS n_edges,
             |  CAST(tot.max_degree AS BIGINT) AS max_degree,
             |  CAST(e.k AS BIGINT) AS n_points,
             |  CASE WHEN den > 0 THEN
             |    CAST((bp - ((bp % bq + bq) % bq)) // bq AS BIGINT)
             |  END AS slope_micro,
             |  CASE WHEN den > 0 THEN
             |    CAST((ip - ((ip % iq + iq) % iq)) // iq AS BIGINT)
             |  END AS intercept_micro
             |FROM tot, e""".stripMargin)),

    "q168_assortativity" -> Q(
      (s, d) => {
        val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_partkey"))
        val edges = li.as("x").join(li.as("y"),
            col("x.l_orderkey") === col("y.l_orderkey") &&
              col("x.l_partkey") < col("y.l_partkey"))
          .select(col("x.l_partkey").as("a"), col("y.l_partkey").as("b"))
        degreeAssortativity(s, edges)
      },
      Some("""WITH pp AS MATERIALIZED (
             |  SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
             |  FROM lineitem a JOIN lineitem b
             |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
             |ed AS MATERIALIZED (SELECT pa AS u, pb AS v FROM pp
             |  UNION ALL SELECT pb, pa FROM pp),
             |deg AS MATERIALIZED (SELECT u AS n, count(*) AS d FROM ed GROUP BY u),
             |mo AS (SELECT count(*) AS m,
             |    sum(du.d) AS sx, sum(dv.d) AS sy,
             |    sum(du.d * dv.d) AS sxy,
             |    sum(du.d * du.d) AS sxx,
             |    sum(dv.d * dv.d) AS syy
             |  FROM ed JOIN deg du ON ed.u = du.n JOIN deg dv ON ed.v = dv.n)
             |SELECT CAST(m AS BIGINT) AS m_directed,
             |  round(CAST(m * sxy - sx * sy AS DOUBLE) /
             |    (sqrt(CAST(m * sxx - sx * sx AS DOUBLE)) *
             |      sqrt(CAST(m * syy - sy * sy AS DOUBLE))), 6) AS r6
             |FROM mo""".stripMargin)),

    // ---- q188: EDGE EMBEDDEDNESS — per existing edge, how much do the
    //      endpoints' FULL neighborhoods overlap? cn = |N(a) ∩ N(b)|,
    //      jac_milli = cn·1000 div (da + db − cn) (endpoints are in
    //      each other's neighborhood but never in the intersection, so
    //      the union term needs no ±2 fudge). The strong-tie/weak-tie
    //      diagnostic (Granovetter): high-embeddedness edges sit inside
    //      communities, zero-embeddedness edges are bridges.
    //      Scale: cn of an EXISTING edge ≡ that edge's triangle count,
    //      so this rides Triangles.edgeTriangleCountsOf — the oriented
    //      intersection whose adjacency rows the d⁺ ≤ √(2m) theorem
    //      bounds — instead of collecting FULL neighborhoods (O(d_max)
    //      rows with no theorem behind them: one power-law hub row was
    //      an executor OOM waiting to happen). One canonical edge
    //      build feeds degrees, the counter, and the final join. ----
    "q188_embeddedness" -> Q(
      (s, d) => {
        val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_partkey"))
        val edges = li.as("x").join(li.as("y"),
            col("x.l_orderkey") === col("y.l_orderkey") &&
              col("x.l_partkey") < col("y.l_partkey"))
          .select(col("x.l_partkey").as("a"), col("y.l_partkey").as("b"))
        val und = Triangles.canonicalEdges(edges).cache()
        val degX = und.select(explode(array(col("a"), col("b"))).as("x"))
          .groupBy("x").agg(count(lit(1)).as("d"))
          .localCheckpoint()
        val cn = Triangles.edgeTriangleCountsOf(s, und, degOpt = Some(degX))
        val top = und
          .join(degX.select(col("x").as("a"), col("d").as("da")), "a")
          .join(degX.select(col("x").as("b"), col("d").as("db")), "b")
          .join(cn, Seq("a", "b"), "left")
          .select(col("a"), col("b"), col("da"), col("db"),
            coalesce(col("cn"), lit(0L)).as("cn"))
          .withColumn("jac_milli", expr("cn * 1000 div (da + db - cn)"))
          .orderBy(col("jac_milli").desc, col("cn").desc, col("a"), col("b"))
          .limit(20)
          // 20 rows; eager so the cached edge set can be released now
          .localCheckpoint()
        und.unpersist()
        top.orderBy(col("jac_milli").desc, col("cn").desc, col("a"), col("b"))
      },
      Some("""WITH pp AS MATERIALIZED (
             |  SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
             |  FROM lineitem a JOIN lineitem b
             |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
             |ed AS MATERIALIZED (SELECT pa AS u, pb AS v FROM pp
             |  UNION ALL SELECT pb, pa FROM pp),
             |deg AS MATERIALIZED (SELECT u AS n, CAST(count(*) AS BIGINT) AS deg
             |  FROM ed GROUP BY u),
             |cn AS MATERIALIZED (
             |  SELECT e.pa AS a, e.pb AS b, CAST(count(*) AS BIGINT) AS cn
             |  FROM pp e JOIN ed x ON x.u = e.pa JOIN ed y ON y.u = e.pb
             |    AND x.v = y.v
             |  GROUP BY 1, 2)
             |SELECT p.pa AS a, p.pb AS b, da.deg AS da, db.deg AS db,
             |  coalesce(cn.cn, 0) AS cn,
             |  coalesce(cn.cn, 0) * 1000 // (da.deg + db.deg - coalesce(cn.cn, 0))
             |    AS jac_milli
             |FROM pp p JOIN deg da ON p.pa = da.n JOIN deg db ON p.pb = db.n
             |  LEFT JOIN cn ON cn.a = p.pa AND cn.b = p.pb
             |ORDER BY jac_milli DESC, cn DESC, a, b LIMIT 20""".stripMargin)),
  )
}
