package graft.rel

import org.apache.spark.sql.SparkSession
import scala.collection.immutable.ListMap
import graft.rel.RelQueries.Q

/** The plain-SQL dialect surface: queries written as `spark.sql` TEXT, not
  * DataFrame calls, over temp views of the standard tables — what a
  * SQL-only consumer of this engine sees. The graft-specific functions
  * (vec_dot / vec_cosine) resolve through `spark.sql.extensions =
  * graft.functions.GraftExtensions`, which every session builder in this
  * repo sets; [[graft.functions.VecFunctions.register]] is also called
  * defensively so the entry still passes under a foreign session that
  * didn't load the extension (the correctness gate should test SQL
  * semantics, not session wiring — SqlSurfaceSpec pins the config path
  * itself on a fresh extension-only session).
  */
object SqlSurface {

  val all: ListMap[String, Q] = ListMap(
    // ---- pure-SQL ANN: top-5 cosine neighbors for queries 3..5, the SQL
    //      twin of q37 (DataFrame). The BROADCAST hint pins the 3-row
    //      query side as the build side of the nested-loop join — the
    //      same plan shape the DataFrame path gets from broadcast(q). ----
    "q50_sql_ann" -> Q(
      (s, d) => {
        graft.functions.VecFunctions.register(s)
        Tables.embeddings(s, d).createOrReplaceTempView("embeddings")
        s.sql(
          """SELECT qid, rn, vec_id, cos FROM (
            |  SELECT /*+ BROADCAST(q) */ q.vec_id AS qid, e.vec_id AS vec_id,
            |    vec_cosine(q.embedding, e.embedding) AS cos,
            |    row_number() OVER (PARTITION BY q.vec_id
            |      ORDER BY vec_cosine(q.embedding, e.embedding) DESC, e.vec_id) AS rn
            |  FROM embeddings q JOIN embeddings e
            |    ON q.vec_id BETWEEN 3 AND 5 AND e.vec_id != q.vec_id) t
            |WHERE rn <= 5 ORDER BY qid, rn""".stripMargin)
      },
      Some("""SELECT qid, rn, vec_id, cos FROM (
             |  SELECT q.vec_id AS qid, e.vec_id AS vec_id,
             |    list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))
             |      / (sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])))
             |         * sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))) AS cos,
             |    row_number() OVER (PARTITION BY q.vec_id ORDER BY
             |      list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))
             |      / (sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])))
             |         * sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))) DESC,
             |      e.vec_id) AS rn
             |  FROM embeddings q JOIN embeddings e
             |    ON q.vec_id BETWEEN 3 AND 5 AND e.vec_id != q.vec_id) t
             |WHERE rn <= 5 ORDER BY qid, rn""".stripMargin)),

    // ---- explicit GROUPING SETS (the general form rollup/cube — q10,
    //      q21 — specialize): ONE portable SQL text is executed
    //      verbatim by BOTH engines, grouping() flags disambiguating
    //      the aggregated-away NULLs, coalesce in ORDER BY because the
    //      engines' NULL sort defaults differ ----
    "q66_grouping_sets" -> Q(
      (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("orders")
        s.sql(groupingSetsSql)
      },
      Some(groupingSetsSql)),

    // ---- q193: the typed-Aggregator surface exposed to SQL TEXT —
    //      `functions.udaf` wraps the KMV Aggregator and registers it
    //      as a plain SQL function, so a SQL-only consumer gets the
    //      mergeable sketch (map-side partials and all) without
    //      touching the Dataset API; the estimate arithmetic replays
    //      exactly in the q51 oracle form. ----
    "q193_sql_udaf" -> Q(
      (s, d) => {
        import org.apache.spark.sql.{functions => F, Encoders}
        s.udf.register("kmv_sketch",
          F.udaf(new graft.functions.KmvAgg(64), Encoders.scalaLong))
        Tables.documents(s, d).createOrReplaceTempView("documents")
        s.sql(
          """WITH tok AS (SELECT source,
            |    explode(filter(split(trim(lower(text)), '\\s+'),
            |      x -> length(x) > 0)) AS token
            |  FROM documents),
            |h AS (SELECT source,
            |    CAST(conv(substring(md5(CAST(token AS BINARY)), 1, 15), 16, 10)
            |      AS BIGINT) AS hv
            |  FROM tok),
            |sk AS (SELECT source, kmv_sketch(hv) AS s FROM h GROUP BY source)
            |SELECT source, s.estimate AS kmv_estimate,
            |  CAST(size(s.sketch) AS INT) AS sketch_size
            |FROM sk ORDER BY source""".stripMargin)
      },
      Some("""WITH tok AS (SELECT source,
             |    unnest(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
             |      x -> len(x) > 0)) AS token
             |  FROM documents),
             |h AS (SELECT DISTINCT source,
             |    ('0x' || substr(md5(token), 1, 15))::BIGINT AS hv FROM tok),
             |r AS (SELECT source, hv,
             |    row_number() OVER (PARTITION BY source ORDER BY hv) AS rn,
             |    count(*) OVER (PARTITION BY source) AS nh FROM h),
             |est AS (SELECT source, max(nh) AS nh,
             |    max(CASE WHEN rn = 64 THEN hv END) AS hk FROM r GROUP BY source)
             |SELECT source,
             |  CASE WHEN nh < 64 THEN CAST(nh AS DOUBLE)
             |       ELSE CAST(63 AS DOUBLE) * 1152921504606846976 / hk END
             |    AS kmv_estimate,
             |  CAST(least(nh, 64) AS INT) AS sketch_size
             |FROM est ORDER BY source""".stripMargin)),

    // ---- q202: NULL-SAFE EQUALITY JOIN — Spark's `<=>` vs ANSI
    //      `IS NOT DISTINCT FROM`: nulls match nulls, the semantics a
    //      plain equi-join silently drops. Null keys are synthesized
    //      with nullif on real columns so the match matrix includes a
    //      genuine null↔null cell. ----
    "q202_null_safe_join" -> Q(
      (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("orders")
        Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
        s.sql(
          """WITH a AS (SELECT nullif(o_orderstatus, 'O') AS k, count(*) AS na
            |  FROM orders GROUP BY 1),
            |b AS (SELECT nullif(l_linestatus, 'O') AS k, count(*) AS nb
            |  FROM lineitem GROUP BY 1)
            |SELECT coalesce(a.k, '_null_') AS k, a.na, b.nb
            |FROM a JOIN b ON a.k <=> b.k
            |ORDER BY k""".stripMargin)
      },
      Some("""WITH a AS (SELECT nullif(o_orderstatus, 'O') AS k,
             |    CAST(count(*) AS BIGINT) AS na
             |  FROM orders GROUP BY 1),
             |b AS (SELECT nullif(l_linestatus, 'O') AS k,
             |    CAST(count(*) AS BIGINT) AS nb
             |  FROM lineitem GROUP BY 1)
             |SELECT coalesce(a.k, '_null_') AS k, a.na, b.nb
             |FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
             |ORDER BY k""".stripMargin)),

    // ---- q203: the ANSI aggregate FILTER clause — ONE text executed
    //      verbatim by both engines (conditional aggregation without
    //      CASE scaffolding). ----
    "q203_filter_clause" -> Q(
      (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("orders")
        s.sql(filterClauseSql)
      },
      Some(filterClauseSql)),

    // ---- q204: LATERAL correlated subquery — per region, the top-2
    //      nations by customer count computed in a correlated LATERAL
    //      with its own ORDER BY / LIMIT: the "top-N per outer row"
    //      shape that decorrelates to a ranked window. One portable
    //      text, both engines. ----
    "q204_lateral" -> Q(
      (s, d) => {
        Tables.region(s, d).createOrReplaceTempView("region")
        Tables.nation(s, d).createOrReplaceTempView("nation")
        Tables.customer(s, d).createOrReplaceTempView("customer")
        s.sql(lateralSql)
      },
      Some(lateralSql)),
  )

  private def filterClauseSql: String =
    """SELECT o_orderstatus,
      |  count(*) AS n_orders,
      |  count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS n_urgent,
      |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
      |    FILTER (WHERE o_orderpriority = '1-URGENT') AS BIGINT)
      |    AS urgent_cents
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  private def lateralSql: String =
    """SELECT r.r_name, t.n_name, t.n_cust
      |FROM region r, LATERAL (
      |  SELECT n.n_name, CAST(count(*) AS BIGINT) AS n_cust
      |  FROM nation n JOIN customer c ON c.c_nationkey = n.n_nationkey
      |  WHERE n.n_regionkey = r.r_regionkey
      |  GROUP BY n.n_name
      |  ORDER BY n_cust DESC, n_name
      |  LIMIT 2) t
      |ORDER BY r.r_name, t.n_cust DESC, t.n_name""".stripMargin

  /** a `def`, not a `val`: `all` captures it eagerly during object
    * init, and a val declared after `all` would be null at that point
    */
  private def groupingSetsSql: String =
    """SELECT o_orderstatus, o_orderpriority,
      |  CAST(grouping(o_orderstatus) AS INT) AS g_status,
      |  CAST(grouping(o_orderpriority) AS INT) AS g_prio,
      |  count(*) AS n_orders,
      |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
      |ORDER BY g_status, g_prio, coalesce(o_orderstatus, ''),
      |  coalesce(o_orderpriority, '')""".stripMargin
}
