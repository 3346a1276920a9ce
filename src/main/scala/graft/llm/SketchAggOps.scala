package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.rel.RelQueries.Q
import graft.rel.Tables

/** Mergeable-sketch aggregation entries. The KMV hash is the first 15 hex
  * chars of md5 (60 bits) read as an integer — chosen because BOTH
  * engines can compute it exactly (Spark: conv(substr(md5,1,15),16,10);
  * DuckDB: ('0x' || substr(md5,1,15))::BIGINT), so the driver's hash
  * compare covers an *approximate* operator bit-for-bit.
  */
object SketchAggOps {

  /** sketch size shared by the batch (q51) and streaming (q61) KMV
    * entries — one definition, so the two "same sketch" claims stay true
    */
  private[graft] val K = 64

  /** HLL precision (q160): 2^9 = 512 registers */
  private[graft] val HllP = 9

  /** q160's raw-estimate numerator α·m²·2^(W+1), computed with the
    * exact operation order [[graft.functions.HllAgg.estimate]] uses, so
    * the SQL literal and the Scala runtime value are the same double
    */
  private[graft] val HllRawC: Double =
    (0.7213 / (1.0 + 1.079 / 512.0)) * 512 * 512 * (1L << 52).toDouble

  /** the 60-bit md5-prefix hash BOTH engines compute exactly — the one
    * definition of the KMV hash, used by q51 and q61
    */
  private[graft] def kmvHash(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")

  /** JOIN-SIZE ESTIMATION by Count-Min inner product (Cormode &
    * Muthukrishnan 2005 §4.2: |A ⋈ B| ≈ min_d Σ_w cA[d,w]·cB[d,w],
    * always an OVERestimate) — the sketch read an optimizer takes
    * BEFORE committing to a join strategy: two single-pass constant-
    * size sketches answer "how big would this join be" without
    * executing it. Reported beside the exact size so the guarantee
    * (est ≥ exact) is a hash-checked column, the q76 discipline.
    *
    * Scale shape: each side folds map-side into a depth×width counter
    * table (constant size); the estimate is a counter-table join —
    * corpus rows are touched exactly once per side.
    *
    * Output (1 row): (exact_size, cms_est, overestimate, ratio_r6).
    */
  def cmsJoinSize(left: DataFrame, lkey: String, right: DataFrame,
      rkey: String, depth: Int = 4, width: Int = 512): DataFrame = {
    require(depth >= 2 && depth <= 8, s"2 <= depth <= 8: $depth")
    require(width >= 16 && width <= 65536, s"16 <= width <= 65536: $width")
    def counters(df: DataFrame, key: String) = {
      val k = col(key).cast("string")
      df.select((0 until depth).map(i =>
          pmod(conv(substring(md5(concat(k, lit("#"), lit(i))
            .cast("binary")), 1, 7), 16, 10).cast("long"),
            lit(width.toLong)).as(s"i$i")): _*)
        .select(explode(array((0 until depth).map(i =>
          struct(lit(i).as("i"), col(s"i$i").as("idx"))): _*)).as("z"))
        .select(col("z.i").as("i"), col("z.idx").as("idx"))
        .groupBy("i", "idx").agg(count(lit(1)).as("c"))
    }
    val dec38 = org.apache.spark.sql.types.DataTypes
      .createDecimalType(38, 0)
    val ca = counters(left, lkey)
    val cb = counters(right, rkey)
      .select(col("i"), col("idx"), col("c").as("cb"))
    val est = ca.join(cb, Seq("i", "idx"))
      .groupBy("i").agg(sum((col("c") * col("cb")).cast(dec38)).as("ip"))
      .agg(min(col("ip")).as("cms_est"))
    val la = left.groupBy(col(lkey).cast("string").as("k"))
      .agg(count(lit(1)).as("na"))
    val lb = right.groupBy(col(rkey).cast("string").as("k"))
      .agg(count(lit(1)).as("nb"))
    val exact = la.join(lb, Seq("k"))
      .agg(sum((col("na") * col("nb")).cast(dec38)).as("exact_size"))
    exact.crossJoin(broadcast(est))
      .select(coalesce(col("exact_size").cast("long"), lit(0L))
        .as("exact_size"),
        coalesce(col("cms_est").cast("long"), lit(0L)).as("cms_est"))
      .select(col("exact_size"), col("cms_est"),
        (col("cms_est") >= col("exact_size")).as("overestimate"),
        when(col("exact_size") > 0L,
          round(col("cms_est").cast("double")
            / col("exact_size").cast("double"), 6)).as("ratio_r6"))
  }

  val all: ListMap[String, Q] = ListMap(
    // ---- q394: CMS JOIN-SIZE — how many (event, purchase) pairs
    //      would the user-keyed self-join produce? Sketch estimate vs
    //      exact, the overestimate guarantee hash-checked. ----
    "q394_cms_join_size" -> Q(
      (s, d) => cmsJoinSize(
        Tables.events(s, d), "user_id",
        Tables.events(s, d).filter(col("event_type") === "purchase"),
        "user_id"),
      Some("""WITH ka AS (SELECT CAST(user_id AS VARCHAR) AS k
             |  FROM events),
             |kb AS (SELECT CAST(user_id AS VARCHAR) AS k FROM events
             |  WHERE event_type = 'purchase'),
             |ia AS (SELECT i.i,
             |    ('0x' || substr(md5(k || '#' || i.i), 1, 7))::BIGINT
             |      % 512 AS idx
             |  FROM ka CROSS JOIN range(4) i(i)),
             |ib AS (SELECT i.i,
             |    ('0x' || substr(md5(k || '#' || i.i), 1, 7))::BIGINT
             |      % 512 AS idx
             |  FROM kb CROSS JOIN range(4) i(i)),
             |ca AS (SELECT i, idx, count(*) AS c FROM ia GROUP BY i, idx),
             |cb AS (SELECT i, idx, count(*) AS c FROM ib GROUP BY i, idx),
             |ip AS (SELECT ca.i, sum(ca.c * cb.c) AS ip FROM ca
             |  JOIN cb ON cb.i = ca.i AND cb.idx = ca.idx GROUP BY ca.i),
             |est AS (SELECT min(ip) AS cms_est FROM ip),
             |la AS (SELECT k, count(*) AS na FROM ka GROUP BY k),
             |lb AS (SELECT k, count(*) AS nb FROM kb GROUP BY k),
             |ex AS (SELECT sum(la.na * lb.nb) AS exact_size
             |  FROM la JOIN lb ON lb.k = la.k)
             |SELECT CAST(coalesce(exact_size, 0) AS BIGINT) AS exact_size,
             |  CAST(coalesce(cms_est, 0) AS BIGINT) AS cms_est,
             |  coalesce(cms_est, 0) >= coalesce(exact_size, 0)
             |    AS overestimate,
             |  CASE WHEN coalesce(exact_size, 0) > 0 THEN
             |    round(CAST(coalesce(cms_est, 0) AS DOUBLE)
             |      / CAST(exact_size AS DOUBLE), 6) ELSE NULL END
             |    AS ratio_r6
             |FROM ex, est""".stripMargin)),
    // ---- per-source distinct-token estimate via the KMV sketch next to
    //      the exact count. estimate arithmetic (k-1)*2^60/kthMin is
    //      exact-double-reproducible in DuckDB; sources with fewer than K
    //      distinct hashes estimate exactly. ----
    "q51_kmv_distinct" -> Q(
      (s, d) => {
        import s.implicits._
        val tok = Tables.documents(s, d)
          .select(col("source"), explode(split(trim(lower(col("text"))), "\\s+")).as("token"))
        val hashed = tok.withColumn("hv", kmvHash(col("token")))
        val agg = new graft.functions.KmvAgg(K)
        val sketches = hashed.select(col("source"), col("hv")).as[(String, Long)]
          .groupByKey(_._1)
          .mapValues(_._2)
          .agg(agg.toColumn)
          .toDF("source", "kmv")
        sketches
          .join(tok.groupBy("source").agg(countDistinct(col("token")).as("exact_distinct")), "source")
          .select(col("source"), col("exact_distinct"),
            col("kmv.estimate").as("kmv_estimate"),
            size(col("kmv.sketch")).as("sketch_size"))
          .orderBy("source")
      },
      Some(s"""WITH tok AS (SELECT source,
             |    unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS token
             |  FROM documents),
             |h AS (SELECT DISTINCT source,
             |    ('0x' || substr(md5(token), 1, 15))::BIGINT AS hv FROM tok),
             |r AS (SELECT source, hv,
             |    row_number() OVER (PARTITION BY source ORDER BY hv) AS rn,
             |    count(*) OVER (PARTITION BY source) AS nh FROM h),
             |est AS (SELECT source, max(nh) AS nh,
             |    max(CASE WHEN rn = $K THEN hv END) AS hk FROM r GROUP BY source),
             |ex AS (SELECT source, count(DISTINCT token) AS exact_distinct
             |  FROM tok GROUP BY source)
             |SELECT ex.source AS source, exact_distinct,
             |  CASE WHEN est.nh < $K THEN CAST(est.nh AS DOUBLE)
             |       ELSE CAST(${K - 1} AS DOUBLE) * 1152921504606846976 / hk END
             |    AS kmv_estimate,
             |  CAST(least(est.nh, $K) AS INT) AS sketch_size
             |FROM ex JOIN est ON ex.source = est.source ORDER BY ex.source""".stripMargin)),

    // ---- KMV SET ALGEBRA (Beyer et al., SIGMOD'07): pairwise
    //      union/intersection estimates computed purely from the
    //      per-source sketches — the "overlap between shards/days
    //      without touching raw data" operation sketch stores exist
    //      for. Union sketch = k smallest of the two sketches' union;
    //      ρ = fraction of union-sketch members present in BOTH input
    //      sketches; intersection ≈ ρ · unionEstimate. Every step is a
    //      pure function of the md5-prefix hashes, so the oracle
    //      rebuilds sketches AND estimates exactly; the exact
    //      intersection (one vocabulary join) rides along as the
    //      driver-checked ground truth. Scale shape: the corpus is
    //      touched only by the sketch build (map-side ≤ k-long
    //      buffers); the pairwise algebra runs on k-long arrays —
    //      #sources² rows of 512-byte work, nothing data-sized. ----
    "q134_kmv_setops" -> Q(
      (s, d) => {
        import s.implicits._
        val tok = Tables.documents(s, d)
          .select(col("source"), explode(split(trim(lower(col("text"))), "\\s+")).as("token"))
        val hashed = tok.withColumn("hv", kmvHash(col("token")))
        val agg = new graft.functions.KmvAgg(K)
        val sk = hashed.select(col("source"), col("hv")).as[(String, Long)]
          .groupByKey(_._1).mapValues(_._2).agg(agg.toColumn).toDF("source", "kmv")
          .select(col("source"), col("kmv.sketch").as("sk"))
        val est = sk.as("x").join(sk.as("y"),
            col("x.source") < col("y.source"))
          .select(col("x.source").as("sa"), col("y.source").as("sb"),
            col("x.sk").as("ska"), col("y.sk").as("skb"))
          .as[(String, String, Array[Long], Array[Long])]
          .map { case (sa, sb, ska, skb) =>
            val lu = (ska ++ skb).distinct.sorted.take(K)
            val ku = lu.length
            // same arithmetic (and zero-hash guard) as KmvAgg.finish
            val unionEst =
              if (ku < K || lu.last == 0L) ku.toDouble
              else (K - 1).toDouble * (1L << 60).toDouble / lu.last.toDouble
            val inA = ska.toSet; val inB = skb.toSet
            val rho = lu.count(h => inA(h) && inB(h)).toLong
            val interEst = rho.toDouble * unionEst / ku.toDouble
            (sa, sb, ku, unionEst, rho, interEst)
          }
          .toDF("sa", "sb", "ku", "union_est", "rho", "inter_est")
        val st = tok.select("source", "token").distinct()
        val exact = st.as("a").join(st.as("b"),
            col("a.token") === col("b.token") && col("a.source") < col("b.source"))
          .groupBy(col("a.source").as("sa"), col("b.source").as("sb"))
          .agg(count(lit(1)).as("exact_inter"))
        est.join(exact, Seq("sa", "sb"), "left")
          .select(col("sa"), col("sb"), col("ku").cast("int").as("ku"),
            round(col("union_est"), 6).as("union_est_r6"), col("rho"),
            round(col("inter_est"), 6).as("inter_est_r6"),
            coalesce(col("exact_inter"), lit(0L)).as("exact_inter"))
          .orderBy("sa", "sb")
      },
      Some(s"""WITH tok AS (SELECT source,
             |    unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS token
             |  FROM documents),
             |h AS (SELECT DISTINCT source,
             |    ('0x' || substr(md5(token), 1, 15))::BIGINT AS hv FROM tok),
             |r AS (SELECT source, hv,
             |    row_number() OVER (PARTITION BY source ORDER BY hv) AS rn FROM h),
             |sk AS (SELECT source, list(hv ORDER BY hv) AS l
             |  FROM r WHERE rn <= $K GROUP BY source),
             |pr AS (SELECT a.source AS sa, b.source AS sb, a.l AS la, b.l AS lb
             |  FROM sk a JOIN sk b ON a.source < b.source),
             |u AS (SELECT sa, sb, la, lb,
             |    list_sort(list_distinct(la || lb))[1:$K] AS lu FROM pr),
             |c AS (SELECT sa, sb, len(lu) AS ku,
             |    CASE WHEN len(lu) < $K OR lu[len(lu)] = 0
             |      THEN CAST(len(lu) AS DOUBLE)
             |      ELSE CAST(${K - 1} AS DOUBLE) * 1152921504606846976 / lu[len(lu)] END
             |      AS union_est,
             |    len(list_filter(lu, x -> list_contains(la, x) AND list_contains(lb, x)))
             |      AS rho
             |  FROM u),
             |st AS (SELECT DISTINCT source, token FROM tok),
             |ex AS (SELECT a.source AS sa, b.source AS sb, count(*) AS exact_inter
             |  FROM st a JOIN st b ON a.token = b.token AND a.source < b.source
             |  GROUP BY 1, 2)
             |SELECT c.sa, c.sb, CAST(ku AS INT) AS ku,
             |  round(union_est, 6) AS union_est_r6, CAST(rho AS BIGINT) AS rho,
             |  round((CAST(rho AS DOUBLE) * union_est) / CAST(ku AS DOUBLE), 6)
             |    AS inter_est_r6,
             |  CAST(coalesce(ex.exact_inter, 0) AS BIGINT) AS exact_inter
             |FROM c LEFT JOIN ex ON c.sa = ex.sa AND c.sb = ex.sb
             |ORDER BY c.sa, c.sb""".stripMargin)),

    // ---- per-source approximate token-count quantiles from a
    //      deterministic bottom-32-by-hash row sample
    //      ([[graft.functions.BottomKSampleAgg]]): the sample and the
    //      order-statistic estimates are pure functions of the data, so
    //      the oracle recomputes them EXACTLY (same md5-prefix hash,
    //      same integer quantile ranks) — an approximate-quantile
    //      operator under a bit-exact cross-engine check ----
    "q64_sample_quantiles" -> Q(
      (s, d) => {
        import s.implicits._
        val rows = Tables.documents(s, d).select(col("source"),
          col("doc_id"),
          size(split(trim(lower(col("text"))), "\\s+")).cast("double").as("n_tokens"),
          conv(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 15), 16, 10)
            .cast("long").as("hv"))
        val agg = new graft.functions.BottomKSampleAgg(32)
        rows.select(col("source"), col("hv"), col("doc_id"), col("n_tokens"))
          .as[(String, Long, Long, Double)]
          .groupByKey(_._1)
          .mapValues(t => (t._2, t._3, t._4))
          .agg(agg.toColumn)
          .map { case (src, sb) =>
            def q(num: Int) =
              graft.functions.BottomKSample.quantile(sb.v, sb.id, num, 10).toLong
            (src, sb.v.length, q(5), q(9))
          }
          .toDF("source", "sample_size", "p50_est", "p90_est")
          .orderBy("source")
      },
      Some("""WITH v AS (SELECT source, doc_id,
             |    len(regexp_split_to_array(trim(lower(text)), '\s+')) AS n_tokens,
             |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS hv
             |  FROM documents),
             |s AS (SELECT source, doc_id, n_tokens,
             |    row_number() OVER (PARTITION BY source ORDER BY hv, doc_id) AS rn
             |  FROM v),
             |samp AS (SELECT source, doc_id, n_tokens FROM s WHERE rn <= 32),
             |r AS (SELECT source, n_tokens,
             |    row_number() OVER (PARTITION BY source ORDER BY n_tokens, doc_id) - 1 AS vr,
             |    count(*) OVER (PARTITION BY source) AS m
             |  FROM samp)
             |SELECT source, CAST(max(m) AS INT) AS sample_size,
             |  CAST(max(CASE WHEN vr = (5*(m-1))//10 THEN n_tokens END) AS BIGINT) AS p50_est,
             |  CAST(max(CASE WHEN vr = (9*(m-1))//10 THEN n_tokens END) AS BIGINT) AS p90_est
             |FROM r GROUP BY source ORDER BY source""".stripMargin)),

    // ---- q147: SKETCH ROLLUP mergeability — per-(source, lang) KMV
    //      sketches merged UP to per-source, proven bit-identical to
    //      sketching the source directly (min-k(A∪B) is computable
    //      from min-k(A) ∪ min-k(B) — the algebraic property the whole
    //      "persist sketches per shard/day, roll up later without raw
    //      data" architecture rests on). `rollup_exact` is a
    //      hash-checked column, and the estimates equal q51-style
    //      replay. Scale: the rollup stage touches only partial
    //      sketches (k longs per (source, lang)); the corpus is
    //      touched once, by the partial build. ----
    "q147_sketch_rollup" -> Q(
      (s, d) => {
        import s.implicits._
        val tok = Tables.documents(s, d)
          .select(col("source"), col("lang"),
            explode(split(trim(lower(col("text"))), "\\s+")).as("token"))
        val hashed = tok.withColumn("hv", kmvHash(col("token")))
        val agg = new graft.functions.KmvAgg(K)
        val partial = hashed.select(col("source"), col("lang"), col("hv"))
          .as[(String, String, Long)]
          .groupByKey(t => (t._1, t._2)).mapValues(_._3).agg(agg.toColumn)
        val rolled = partial
          .flatMap { case ((src, _), out) => out.sketch.map(h => (src, h)) }
          .groupByKey(_._1).mapValues(_._2).agg(agg.toColumn)
          .map { case (src, out) => (src, out.estimate, out.sketch.length) }
          .toDF("source", "est_rollup", "size_rollup")
        val direct = hashed.select(col("source"), col("hv")).as[(String, Long)]
          .groupByKey(_._1).mapValues(_._2).agg(agg.toColumn)
          .map { case (src, out) => (src, out.estimate, out.sketch.length) }
          .toDF("source", "est_direct", "size_direct")
        rolled.join(direct, "source")
          .select(col("source"), col("est_rollup"), col("est_direct"),
            (col("est_rollup") === col("est_direct") &&
              col("size_rollup") === col("size_direct")).as("rollup_exact"),
            col("size_direct").cast("int").as("sketch_size"))
          .orderBy("source")
      },
      Some(s"""WITH tok AS (SELECT source,
             |    unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS token
             |  FROM documents),
             |h AS (SELECT DISTINCT source,
             |    ('0x' || substr(md5(token), 1, 15))::BIGINT AS hv FROM tok),
             |r AS (SELECT source, hv,
             |    row_number() OVER (PARTITION BY source ORDER BY hv) AS rn,
             |    count(*) OVER (PARTITION BY source) AS nh FROM h),
             |est AS (SELECT source, max(nh) AS nh,
             |    max(CASE WHEN rn = $K THEN hv END) AS hk FROM r GROUP BY source),
             |v AS (SELECT source,
             |    CASE WHEN nh < $K THEN CAST(nh AS DOUBLE)
             |         ELSE CAST(${K - 1} AS DOUBLE) * 1152921504606846976 / hk END AS est,
             |    CAST(least(nh, $K) AS INT) AS sketch_size
             |  FROM est)
             |SELECT source, est AS est_rollup, est AS est_direct,
             |  true AS rollup_exact, sketch_size
             |FROM v ORDER BY source""".stripMargin)),

    // ---- heavy hitters through a Count-Min sketch
    //      ([[graft.functions.CmsAgg]]): one 4×512 sketch over every
    //      corpus token, point-queried for the exact top-20 terms. The
    //      bucket indexes are md5-prefix arithmetic BOTH engines state
    //      exactly, so the oracle rebuilds the sketch in SQL and
    //      reproduces every estimate bit-for-bit — and the defining
    //      overestimate guarantee (est ≥ true count) is a column the
    //      driver hash-checks. ----
    "q76_cms_heavy_hitters" -> Q(
      (s, d) => {
        import s.implicits._
        val depth = 4; val width = 512
        def idxCol(tok: org.apache.spark.sql.Column, i: Int) =
          pmod(conv(substring(md5(concat(tok, lit("#"), lit(i)).cast("binary")), 1, 7), 16, 10)
            .cast("long"), lit(width.toLong))
        val tok = Tables.documents(s, d)
          .select(explode(split(trim(lower(col("text"))), "\\s+")).as("token"))
        val agg = new graft.functions.CmsAgg(depth, width)
        val sketch = tok
          .select(array((0 until depth).map(i => idxCol(col("token"), i)): _*).as("idx"))
          .as[Seq[Long]]
          .select(agg.toColumn)
          .head()
        val top = tok.groupBy("token").agg(count(lit(1)).as("tf"))
          .orderBy(col("tf").desc, col("token")).limit(20)
          .as[(String, Long)].collect()
        def idxOf(t: String, i: Int): Long = {
          val md5hex = java.security.MessageDigest.getInstance("MD5")
            .digest((t + "#" + i).getBytes("UTF-8"))
            .map("%02x".format(_)).mkString
          java.lang.Long.parseLong(md5hex.take(7), 16) % width
        }
        top.toSeq.map { case (t, tf) =>
          val est = graft.functions.CmsAgg.estimate(sketch,
            (0 until depth).map(i => idxOf(t, i)), depth, width)
          (t, tf, est, est >= tf)
        }.toDF("token", "tf", "cms_est", "overestimate")
          .orderBy(col("tf").desc, col("token"))
      },
      Some("""WITH tok AS (SELECT
             |    unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS token
             |  FROM documents),
             |idx AS (SELECT token, i.i,
             |    ('0x' || substr(md5(token || '#' || i.i), 1, 7))::BIGINT % 512 AS idx
             |  FROM tok CROSS JOIN range(4) i(i)),
             |counters AS (SELECT i, idx, count(*) AS c FROM idx GROUP BY i, idx),
             |top AS (SELECT token, count(*) AS tf FROM tok
             |  GROUP BY token ORDER BY tf DESC, token LIMIT 20),
             |q AS (SELECT t.token, t.tf, i.i,
             |    ('0x' || substr(md5(t.token || '#' || i.i), 1, 7))::BIGINT % 512 AS idx
             |  FROM top t CROSS JOIN range(4) i(i)),
             |est AS (SELECT q.token, min(c.c) AS cms_est FROM q
             |  JOIN counters c ON c.i = q.i AND c.idx = q.idx GROUP BY q.token)
             |SELECT t.token, t.tf, e.cms_est, e.cms_est >= t.tf AS overestimate
             |FROM top t JOIN est e USING (token)
             |ORDER BY t.tf DESC, t.token""".stripMargin)),

    // ---- q160: HYPERLOGLOG per-source distinct tokens
    //      ([[graft.functions.HllAgg]], p=9 → 512 one-byte registers) —
    //      the constant-size companion to q51's KMV, under the same
    //      discipline: bucket and rank are pure integer functions of
    //      the md5-prefix hash, the harmonic denominator is an EXACT
    //      long in 2^-52 units, and the estimate is one pinned
    //      division (or one ln on the linear-counting branch) both
    //      engines evaluate identically. rollup_exact pins the
    //      register-max merge: per-(source,lang) sketches folded up
    //      equal the directly-built per-source sketch byte-for-byte
    //      (the q147 mergeability property at O(1) register cost).
    //      Scale: map-side 512-byte buffers; nothing data-sized ever
    //      reaches the driver. ----
    "q160_hll_distinct" -> Q(
      (s, d) => {
        import s.implicits._
        val tok = Tables.documents(s, d)
          .select(col("source"), col("lang"),
            explode(split(trim(lower(col("text"))), "\\s+")).as("token"))
        val hashed = tok.withColumn("hv", kmvHash(col("token")))
        val agg = new graft.functions.HllAgg(HllP)
        val direct = hashed.select(col("source"), col("hv")).as[(String, Long)]
          .groupByKey(_._1).mapValues(_._2).agg(agg.toColumn).toDF("source", "regs")
        val rolled = hashed.select(col("source"), col("lang"), col("hv"))
          .as[(String, String, Long)]
          .groupByKey(t => (t._1, t._2)).mapValues(_._3).agg(agg.toColumn)
          .map { case ((src, _), regs) => (src, regs) }
          .groupByKey(_._1)
          .mapGroups { (src, it) =>
            val acc = new Array[Byte](1 << HllP)
            it.foreach { case (_, r) =>
              var i = 0
              while (i < acc.length) { if (r(i) > acc(i)) acc(i) = r(i); i += 1 }
            }
            (src, acc)
          }.toDF("source", "roll_regs")
        val stats = direct.join(rolled, "source")
          .as[(String, Array[Byte], Array[Byte])]
          .map { case (src, regs, roll) =>
            val est = graft.functions.HllAgg.estimate(regs, HllP)
            val estR6 = BigDecimal(est)
              .setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
            (src, regs.count(_ == 0).toLong, regs.map(_.toLong).sum,
              graft.functions.HllAgg.denomUnits(regs, HllP), estR6,
              java.util.Arrays.equals(regs, roll))
          }
          .toDF("source", "n_zero", "sum_rho", "denom_52", "hll_estimate_r6",
            "rollup_exact")
        val exact = tok.groupBy("source")
          .agg(countDistinct(col("token")).as("exact_distinct"))
        stats.join(exact, "source")
          .select(col("source"), col("n_zero"), col("sum_rho"), col("denom_52"),
            col("hll_estimate_r6"), col("exact_distinct"), col("rollup_exact"))
          .orderBy("source")
      },
      Some(s"""WITH tok AS (SELECT source,
             |    unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS token
             |  FROM documents),
             |h AS (SELECT DISTINCT source,
             |    ('0x' || substr(md5(token), 1, 15))::BIGINT AS hv FROM tok),
             |b AS (SELECT source, hv // 2251799813685248 AS bucket,
             |    hv % 2251799813685248 AS rem FROM h),
             |r AS (SELECT source, bucket,
             |    max(CASE WHEN rem = 0 THEN 52
             |        ELSE 52 - length(bin(rem)) END) AS reg
             |  FROM b GROUP BY 1, 2),
             |a AS (SELECT source, count(*) AS nb,
             |    CAST(sum(reg) AS BIGINT) AS sum_rho,
             |    CAST(sum(1::BIGINT << (52 - reg)) AS BIGINT) AS dpresent
             |  FROM r GROUP BY 1),
             |g AS (SELECT source, CAST(512 - nb AS BIGINT) AS n_zero, sum_rho,
             |    dpresent + (512 - nb) * 4503599627370496 AS denom_52 FROM a),
             |e AS (SELECT source, n_zero, sum_rho, denom_52,
             |    $HllRawC / CAST(denom_52 AS DOUBLE) AS raw FROM g),
             |ex AS (SELECT source, count(DISTINCT token) AS exact_distinct
             |  FROM tok GROUP BY source)
             |SELECT e.source, n_zero, sum_rho, denom_52,
             |  round(CASE WHEN raw <= 1280.0 AND n_zero > 0
             |    THEN 512.0 * ln(512.0 / CAST(n_zero AS DOUBLE))
             |    ELSE raw END, 6) AS hll_estimate_r6,
             |  exact_distinct, TRUE AS rollup_exact
             |FROM e JOIN ex ON e.source = ex.source ORDER BY e.source""".stripMargin)),
  )
}
