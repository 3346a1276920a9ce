package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.rel.RelQueries.Q
import graft.rel.Tables

/** NEIGHBORHOOD FUNCTION + EFFECTIVE DIAMETER — "how far apart is this
  * graph, really?": N(t) = #{(u,v) : dist(u,v) ≤ t}, the curve whose
  * 90% point is the effective diameter (Palmer, Gibbons & Faloutsos
  * KDD'02; Boldi, Rosa & Vigna WWW'11, HyperANF).
  *
  * TWO rungs, the house exact/approximate ladder (q269/q271):
  *
  * [[neighborhoodFunctionExact]] — per-source BFS with min-merge
  * rounds (the Bfs.boundedDistances shape, keyed by (src, node)).
  * State is the REACHABLE PAIR SET — Σ component² rows — which is the
  * honest cost of an exact answer and precisely why HyperANF exists;
  * at 100 TB this rung is for sampled sources or bounded components,
  * and the guard below makes the blowup loud rather than silent.
  *
  * [[neighborhoodFunctionHll]] — the HyperANF scale path: per node a
  * HyperLogLog register set of the ball B(v, t), round t+1 OR-merges
  * each node's registers with its neighbors' (set union ≡ elementwise
  * register max — associative, idempotent, the whole trick). State is
  * n·2^p REGISTERS regardless of ball sizes — linear in nodes, the
  * 100 TB plan. Registers are carried as (node, bucket, rho) ROWS over
  * the engine's 60-bit md5-prefix hash (`SketchAggOps.kmvHash`), so
  * the entire iterated sketch state — not just the final estimate — is
  * SQL-replayable and the driver hash-checks an APPROXIMATE operator
  * EXACTLY (the q51 property, extended to iterated graph state; a
  * packed production variant would use functions.HllAgg's byte-array
  * registers — same math, m× less state, no longer row-replayable).
  *
  * Estimates are INTEGER MICRO-UNITS end to end: the raw harmonic
  * estimate is one truncating division of the exact integer
  * alphaMicro·m²·2^(W+1) by the exact integer denominator
  * Σ 2^(W+1−ρ) (the HllAgg.denomUnits quantity), and the
  * linear-counting branch reads a LITERAL lookup table
  * lcMicro(z) = round(m·ln(m/z)·10⁶) — generated once in Scala and
  * embedded in BOTH the plan and the oracle, so no cross-engine libm
  * call ever runs. Per-node estimates are exact longs; their sum is
  * order-free.
  *
  * Both rungs run a FIXED horizon of `maxT` rounds (the q116/q321
  * contract): N is reported per observed t with frac_milli relative
  * to N(maxT) — the same fixed-budget curve HyperANF reports.
  */
object Anf {

  /** Symmetrized undirected edge build shared by the four rungs.
    * `canonicalInput` = the caller guarantees `edges` is a DISTINCT
    * canonical (u < v) pair table (the CoPurchase contract: a
    * groupBy(a, b) output) — the symmetrized union is then distinct
    * by construction (the two halves are disjoint orientations of
    * distinct pairs) and the dedup exchange is skipped (r15 opt,
    * guide §2.4: a distinct on data that is already unique).
    */
  private def symUnd(edges: DataFrame, canonicalInput: Boolean): DataFrame = {
    val ed = edges.select(col("u").cast("long"), col("v").cast("long"))
    val sym = ed.union(ed.select(col("v").as("u"), col("u").as("v")))
      .filter(col("u") =!= col("v"))
    (if (canonicalInput) sym else sym.distinct())
      .repartition(col("u")).cache()
  }

  /** Exact N(t): output per observed distance t ≤ maxT, ordered —
    * (t, delta, pairs, frac_milli, ge90), where pairs = N(t),
    * frac_milli = 1000·N(t) div N(maxT), and the first ge90 row is the
    * effective diameter under the horizon. Self-pairs count at t = 0.
    */
  def neighborhoodFunctionExact(s: SparkSession, edges: DataFrame,
      maxT: Int, canonicalInput: Boolean = false): DataFrame = {
    require(maxT >= 1 && maxT <= 32, s"1 <= maxT <= 32: $maxT")
    val und = symUnd(edges, canonicalInput)
    var dist = und.select(col("u").as("src")).distinct()
      .select(col("src"), col("src").as("node"), lit(0L).as("dist"))
      .localCheckpoint(true)
    for (r <- 1 to maxT) {
      val f = dist.filter(col("dist") === (r - 1).toLong)
        .select(col("src"), col("node"))
      dist = dist.unionAll(
          und.join(f, und("u") === f("node"))
            .select(f("src"), und("v").as("node"), lit(r.toLong).as("dist")))
        .groupBy("src", "node").agg(min("dist").as("dist"))
        .localCheckpoint(true) // eager: cut the per-round lineage
    }
    und.unpersist()
    val per = dist.groupBy("dist").agg(count(lit(1)).as("delta"))
    val wCum = Window.orderBy("dist").rowsBetween(Long.MinValue, 0)
    val tot = per.agg(sum("delta").as("tot"))
    per.withColumn("pairs", sum("delta").over(wCum))
      .crossJoin(broadcast(tot))
      .select(col("dist").as("t"), col("delta"), col("pairs"),
        expr("(pairs * 1000) div tot").as("frac_milli"))
      .withColumn("ge90", col("frac_milli") >= 900)
      .orderBy("t")
  }

  // ---- HLL rung constants (p = 6): m = 64 buckets, W = 54 remainder
  //      bits, alpha = 0.709 (the Flajolet small-m constant, matching
  //      functions.HllAgg.estimate) in micro units. ----
  private val P = 6
  private val M = 1 << P // 64
  private val W = 60 - P // 54
  private val BucketDiv = 1L << W // hv div 2^54 = top 6 bits
  private val AlphaMicro = 709000L
  /** alphaMicro·m²·2^(W+1) as exact integer digits (≈ 1.05e26). */
  private val RawNum: BigInt = BigInt(AlphaMicro) * M * M * (BigInt(1) << (W + 1))
  /** LC threshold 2.5·m in micro units. */
  private val LcCutMicro = 2500000L * M
  /** lcMicro(z) = round(m·ln(m/z)·10⁶) for z = 1..m — the literal
    * table both engines read (no runtime libm on either side).
    */
  private[graft] val LcMicro: IndexedSeq[Long] =
    (1 to M).map(z => math.round(M * math.log(M.toDouble / z) * 1e6))

  /** HyperANF N̂(t) in integer micro-units: output per t = 0..maxT,
    * ordered — (t, est_pairs_micro, frac_milli, ge90), frac relative
    * to N̂(maxT). Register state is (node, bucket, rho) rows; one
    * denominator below 7·10⁷ units (a ball estimated beyond ~1.5·10¹⁸)
    * raises loudly rather than overflowing the long division.
    */
  def neighborhoodFunctionHll(s: SparkSession, edges: DataFrame,
      maxT: Int, canonicalInput: Boolean = false): DataFrame = {
    require(maxT >= 1 && maxT <= 32, s"1 <= maxT <= 32: $maxT")
    import s.implicits._
    val und = symUnd(edges, canonicalInput)
    val hv = graft.llm.SketchAggOps.kmvHash(col("node").cast("string"))
    var regs = und.select(col("u").as("node")).distinct()
      .withColumn("hv", hv)
      .select(col("node"), expr(s"hv div $BucketDiv").as("bucket"),
        (col("hv") % BucketDiv).as("rem"))
      .select(col("node"), col("bucket"),
        when(col("rem") === 0, lit((W + 1).toLong))
          .otherwise(lit((W + 1).toLong) - length(bin(col("rem")))).as("rho"))
      .localCheckpoint(true)
    val lc = LcMicro.zipWithIndex
      .map { case (v, i) => ((i + 1).toLong, v) }.toDF("z", "lcmicro")
    def estOf(r: DataFrame, t: Int): DataFrame = {
      val perNode = r.groupBy("node")
        .agg(count(lit(1)).as("nb"),
          sum(expr(s"shiftleft(cast(1 as bigint), cast(${W + 1} - rho as int))"))
            .as("dpresent"))
        .select(col("node"), (lit(M.toLong) - col("nb")).as("zeros"),
          (col("dpresent") + (lit(M.toLong) - col("nb")) * (1L << (W + 1)))
            .as("denom"))
        .select(col("node"), col("zeros"),
          when(col("denom") < 70000000L, raise_error(
            lit("neighborhoodFunctionHll: ball estimate would overflow")))
            .otherwise(col("denom")).as("denom"))
        .withColumn("raw_micro",
          expr(s"cast('$RawNum' as decimal(38,0)) div denom"))
      perNode.join(broadcast(lc), perNode("zeros") === lc("z"), "left")
        .select(when(col("raw_micro") <= LcCutMicro && col("zeros") > 0,
          col("lcmicro")).otherwise(col("raw_micro")).as("est"))
        .agg(sum("est").as("est_pairs_micro"))
        .select(lit(t.toLong).as("t"), col("est_pairs_micro"))
    }
    var out = estOf(regs, 0)
    for (r <- 1 to maxT) {
      regs = regs.unionAll(
          und.join(regs, und("u") === regs("node"))
            .select(und("v").as("node"), regs("bucket"), regs("rho")))
        .groupBy("node", "bucket").agg(max("rho").as("rho"))
        .localCheckpoint(true)
      out = out.unionAll(estOf(regs, r))
    }
    und.unpersist()
    val tot = out.filter(col("t") === maxT.toLong)
      .select(col("est_pairs_micro").as("tot"))
    out.crossJoin(broadcast(tot))
      .select(col("t"), col("est_pairs_micro"),
        expr("(est_pairs_micro * 1000) div tot").as("frac_milli"))
      .withColumn("ge90", col("frac_milli") >= 900)
      .orderBy("t")
  }

  /** Symmetrized form of the shared co-purchase CTE. */
  private val EdgeSql =
    s"""${CoPurchase.Sql},
       |e AS MATERIALIZED (SELECT a AS u, b AS v FROM e0
       |  UNION ALL SELECT b AS u, a AS v FROM e0)""".stripMargin

  private def exactOracleSql(maxT: Int): String = {
    val rounds = (1 to maxT).map { r =>
      s"""d$r AS MATERIALIZED (SELECT src, node, min(dist) AS dist FROM (
         |    SELECT src, node, dist FROM d${r - 1}
         |    UNION ALL
         |    SELECT f.src, e.v AS node, CAST($r AS BIGINT) AS dist
         |    FROM d${r - 1} f JOIN e ON e.u = f.node
         |    WHERE f.dist = ${r - 1}
         |  ) GROUP BY src, node)""".stripMargin
    }.mkString(",\n")
    s"""WITH $EdgeSql,
       |d0 AS MATERIALIZED (SELECT DISTINCT u AS src, u AS node,
       |    CAST(0 AS BIGINT) AS dist FROM e),
       |$rounds,
       |per AS (SELECT dist, count(*) AS delta FROM d$maxT GROUP BY dist),
       |c AS (SELECT dist AS t, delta,
       |    sum(delta) OVER (ORDER BY dist ROWS BETWEEN UNBOUNDED
       |      PRECEDING AND CURRENT ROW) AS pairs,
       |    sum(delta) OVER () AS tot
       |  FROM per)
       |SELECT t, CAST(delta AS BIGINT) AS delta,
       |  CAST(pairs AS BIGINT) AS pairs,
       |  CAST((pairs * 1000) // tot AS BIGINT) AS frac_milli,
       |  (pairs * 1000) // tot >= 900 AS ge90
       |FROM c ORDER BY t""".stripMargin
  }

  private def hllOracleSql(maxT: Int): String = {
    val lcRows = LcMicro.zipWithIndex
      .map { case (v, i) => s"(${i + 1}, $v)" }.mkString(", ")
    def estSel(r: Int): String =
      s"""SELECT CAST($r AS BIGINT) AS t, sum(est) AS est_pairs_micro FROM (
         |  SELECT CASE WHEN raw_micro <= $LcCutMicro AND zeros > 0
         |      THEN lcv.lcmicro ELSE raw_micro END AS est
         |  FROM (
         |    SELECT node, $M - count(*) AS zeros,
         |      CAST('$RawNum' AS HUGEINT) // (sum(1::BIGINT << CAST(${W + 1} - rho AS INT))
         |        + ($M - count(*)) * ${1L << (W + 1)}) AS raw_micro
         |    FROM h$r GROUP BY node) pn
         |  LEFT JOIN lcv ON lcv.z = pn.zeros) q$r""".stripMargin
    val rounds = (1 to maxT).map { r =>
      s"""h$r AS MATERIALIZED (SELECT node, bucket, max(rho) AS rho FROM (
         |    SELECT node, bucket, rho FROM h${r - 1}
         |    UNION ALL
         |    SELECT e.v AS node, h.bucket, h.rho
         |    FROM e JOIN h${r - 1} h ON h.node = e.u
         |  ) GROUP BY node, bucket)""".stripMargin
    }.mkString(",\n")
    val ests = (0 to maxT).map(estSel).mkString("\nUNION ALL\n")
    s"""WITH $EdgeSql,
       |lcv AS (SELECT * FROM (VALUES $lcRows) AS t(z, lcmicro)),
       |hv AS (SELECT node,
       |    ('0x' || substr(md5(CAST(node AS VARCHAR)), 1, 15))::BIGINT AS hv
       |  FROM (SELECT DISTINCT u AS node FROM e)),
       |h0 AS MATERIALIZED (SELECT node, hv // $BucketDiv AS bucket,
       |    CASE WHEN hv % $BucketDiv = 0 THEN ${W + 1}
       |      ELSE ${W + 1} - length(bin(hv % $BucketDiv)) END AS rho
       |  FROM hv),
       |$rounds,
       |est AS ($ests),
       |tot AS (SELECT est_pairs_micro AS tot FROM est WHERE t = $maxT)
       |SELECT est.t, CAST(est.est_pairs_micro AS BIGINT) AS est_pairs_micro,
       |  CAST((est.est_pairs_micro * 1000) // tot.tot AS BIGINT) AS frac_milli,
       |  (est.est_pairs_micro * 1000) // tot.tot >= 900 AS ge90
       |FROM est, tot ORDER BY est.t""".stripMargin
  }

  /** HARMONIC CENTRALITY, exact rung: H(u) = Σ_{v≠u} 1/d(u,v) over
    * the bounded horizon — the centrality Boldi & Vigna ("Axioms for
    * centrality", 2014) recommend over closeness (it handles
    * disconnected reachability for free: unreachable pairs simply
    * contribute nothing). Rides the q324 per-pair distance state —
    * the documented Σcomp² oracle anchor; [[harmonicHyperball]] is
    * the linear-state rung. Integer micro: each pair contributes
    * 10⁶ div d, an exact order-free sum.
    * Output: top-k (node, h_micro), ties → node asc.
    */
  def harmonicExact(s: SparkSession, edges: DataFrame, maxT: Int,
      k: Int, canonicalInput: Boolean = false): DataFrame = {
    require(maxT >= 1 && maxT <= 32, s"1 <= maxT <= 32: $maxT")
    val und = symUnd(edges, canonicalInput)
    var dist = und.select(col("u").as("src")).distinct()
      .select(col("src"), col("src").as("node"), lit(0L).as("dist"))
      .localCheckpoint(true)
    for (r <- 1 to maxT) {
      val f = dist.filter(col("dist") === (r - 1).toLong)
        .select(col("src"), col("node"))
      dist = dist.unionAll(
          und.join(f, und("u") === f("node"))
            .select(f("src"), und("v").as("node"), lit(r.toLong).as("dist")))
        .groupBy("src", "node").agg(min("dist").as("dist"))
        .localCheckpoint(true)
    }
    und.unpersist()
    dist.filter(col("dist") >= 1L)
      .groupBy("src").agg(sum(expr("1000000 div dist")).as("h_micro"))
      .select(col("src").as("node"), col("h_micro"))
      .orderBy(desc("h_micro"), col("node"))
      .limit(k)
  }

  /** HARMONIC CENTRALITY, HyperBall rung (Boldi & Vigna WSDM'13,
    * "In-core computation of geometric centralities with HyperBall"):
    * per-node HLL ball sizes B̂(u, t) from the q325 register
    * evolution, then Ĥ(u) = Σ_t (B̂(u,t) − B̂(u,t−1))/t with
    * negative HLL wobbles clipped to zero (the estimator is not
    * strictly monotone at branch switches; clipping is deterministic
    * on both engines and documented). State is n·m register rows per
    * round — LINEAR in nodes, never pairs — which is the entire point
    * at 100 TB. All arithmetic is the q325 integer-micro chain; the
    * oracle replays every register and every per-node estimate.
    * Output: top-k (node, h_micro), ties → node asc.
    */
  def harmonicHyperball(s: SparkSession, edges: DataFrame, maxT: Int,
      k: Int, canonicalInput: Boolean = false): DataFrame = {
    require(maxT >= 1 && maxT <= 32, s"1 <= maxT <= 32: $maxT")
    import s.implicits._
    val und = symUnd(edges, canonicalInput)
    val hv = graft.llm.SketchAggOps.kmvHash(col("node").cast("string"))
    var regs = und.select(col("u").as("node")).distinct()
      .withColumn("hv", hv)
      .select(col("node"), expr(s"hv div $BucketDiv").as("bucket"),
        (col("hv") % BucketDiv).as("rem"))
      .select(col("node"), col("bucket"),
        when(col("rem") === 0, lit((W + 1).toLong))
          .otherwise(lit((W + 1).toLong) - length(bin(col("rem")))).as("rho"))
      .localCheckpoint(true)
    val lc = LcMicro.zipWithIndex
      .map { case (v, i) => ((i + 1).toLong, v) }.toDF("z", "lcmicro")
    def estOf(r: DataFrame, t: Int): DataFrame = {
      val perNode = r.groupBy("node")
        .agg(count(lit(1)).as("nb"),
          sum(expr(s"shiftleft(cast(1 as bigint), cast(${W + 1} - rho as int))"))
            .as("dpresent"))
        .select(col("node"), (lit(M.toLong) - col("nb")).as("zeros"),
          (col("dpresent") + (lit(M.toLong) - col("nb")) * (1L << (W + 1)))
            .as("denom"))
        .select(col("node"), col("zeros"),
          when(col("denom") < 70000000L, raise_error(
            lit("harmonicHyperball: ball estimate would overflow")))
            .otherwise(col("denom")).as("denom"))
        .withColumn("raw_micro",
          expr(s"cast('$RawNum' as decimal(38,0)) div denom"))
      perNode.join(broadcast(lc), perNode("zeros") === lc("z"), "left")
        .select(col("node"), lit(t.toLong).as("t"),
          when(col("raw_micro") <= LcCutMicro && col("zeros") > 0,
            col("lcmicro")).otherwise(col("raw_micro")).as("est"))
    }
    // the per-t estimates stay LAZY over the checkpointed register
    // snapshots (the q325 shape): each estOf is consumed exactly once
    // by the lag window below, so the old per-round localCheckpoint of
    // the accumulated union — one extra materialization job per round,
    // each re-copying every prior round's rows — was pure overhead
    // (r15 opt, guide §1.2)
    var ests = estOf(regs, 0)
    for (r <- 1 to maxT) {
      regs = regs.unionAll(
          und.join(regs, und("u") === regs("node"))
            .select(und("v").as("node"), regs("bucket"), regs("rho")))
        .groupBy("node", "bucket").agg(max("rho").as("rho"))
        .localCheckpoint(true)
      ests = ests.unionAll(estOf(regs, r))
    }
    und.unpersist()
    // B̂(u, t−1) via lag over (node, t) — ONE node-keyed exchange where
    // the former self-join on (node, t) shuffled the estimate table
    // twice (r15 opt, guide §2.4). Every estOf emits every node (regs
    // is a monotone node set seeded with ALL nodes), so lag ≡ the old
    // dense inner join; the t = 0 row gets a null prev, the condition
    // goes null, and the 0-branch contributes nothing — exactly the
    // rows the join dropped.
    val wLag = Window.partitionBy("node").orderBy("t")
    ests.withColumn("prev", lag(col("est"), 1).over(wLag))
      .select(col("node"),
        when(col("est") > col("prev"),
          expr("(est - prev) div t")).otherwise(0L).as("inc"))
      .groupBy("node").agg(sum("inc").as("h_micro"))
      .orderBy(desc("h_micro"), col("node"))
      .limit(k)
  }

  private def harmonicExactOracleSql(maxT: Int, k: Int): String = {
    val rounds = (1 to maxT).map { r =>
      s"""d$r AS MATERIALIZED (SELECT src, node, min(dist) AS dist FROM (
         |    SELECT src, node, dist FROM d${r - 1}
         |    UNION ALL
         |    SELECT f.src, e.v AS node, CAST($r AS BIGINT) AS dist
         |    FROM d${r - 1} f JOIN e ON e.u = f.node
         |    WHERE f.dist = ${r - 1}
         |  ) GROUP BY src, node)""".stripMargin
    }.mkString(",\n")
    s"""WITH $EdgeSql,
       |d0 AS MATERIALIZED (SELECT DISTINCT u AS src, u AS node,
       |    CAST(0 AS BIGINT) AS dist FROM e),
       |$rounds,
       |h AS (SELECT src AS node, sum(1000000 // dist) AS h_micro
       |  FROM d$maxT WHERE dist >= 1 GROUP BY src)
       |SELECT node, CAST(h_micro AS BIGINT) AS h_micro FROM h
       |ORDER BY h_micro DESC, node LIMIT $k""".stripMargin
  }

  private def harmonicHyperballOracleSql(maxT: Int, k: Int): String = {
    val lcRows = LcMicro.zipWithIndex
      .map { case (v, i) => s"(${i + 1}, $v)" }.mkString(", ")
    def estSel(r: Int): String =
      s"""SELECT node, CAST($r AS BIGINT) AS t,
         |  CASE WHEN raw_micro <= $LcCutMicro AND zeros > 0
         |    THEN lcv.lcmicro ELSE raw_micro END AS est
         |FROM (
         |  SELECT node, $M - count(*) AS zeros,
         |    CAST('$RawNum' AS HUGEINT) // (sum(1::BIGINT << CAST(${W + 1} - rho AS INT))
         |      + ($M - count(*)) * ${1L << (W + 1)}) AS raw_micro
         |  FROM h$r GROUP BY node) pn
         |LEFT JOIN lcv ON lcv.z = pn.zeros""".stripMargin
    val rounds = (1 to maxT).map { r =>
      s"""h$r AS MATERIALIZED (SELECT node, bucket, max(rho) AS rho FROM (
         |    SELECT node, bucket, rho FROM h${r - 1}
         |    UNION ALL
         |    SELECT e.v AS node, h.bucket, h.rho
         |    FROM e JOIN h${r - 1} h ON h.node = e.u
         |  ) GROUP BY node, bucket)""".stripMargin
    }.mkString(",\n")
    val ests = (0 to maxT).map(estSel).mkString("\nUNION ALL\n")
    s"""WITH $EdgeSql,
       |lcv AS (SELECT * FROM (VALUES $lcRows) AS t(z, lcmicro)),
       |hv AS (SELECT node,
       |    ('0x' || substr(md5(CAST(node AS VARCHAR)), 1, 15))::BIGINT AS hv
       |  FROM (SELECT DISTINCT u AS node FROM e)),
       |h0 AS MATERIALIZED (SELECT node, hv // $BucketDiv AS bucket,
       |    CASE WHEN hv % $BucketDiv = 0 THEN ${W + 1}
       |      ELSE ${W + 1} - length(bin(hv % $BucketDiv)) END AS rho
       |  FROM hv),
       |$rounds,
       |un AS ($ests),
       |pv AS (SELECT a.node, a.t, a.est, b.est AS prev
       |  FROM un a JOIN un b ON b.node = a.node AND b.t = a.t - 1
       |  WHERE a.t >= 1),
       |h AS (SELECT node, sum(CASE WHEN est > prev
       |    THEN (est - prev) // t ELSE 0 END) AS h_micro
       |  FROM pv GROUP BY node)
       |SELECT node, CAST(h_micro AS BIGINT) AS h_micro FROM h
       |ORDER BY h_micro DESC, node LIMIT $k""".stripMargin
  }

  /** The q324/q325 horizon: past the sf0.01 effective diameter (7);
    * the curve and its 90% landmark are reported relative to N(maxT),
    * the fixed-budget HyperANF contract.
    */
  private val MaxT = 8

  private def copurchaseEdges(s: SparkSession, d: String): DataFrame =
    CoPurchase.edges(s, d)
      .select(col("a").as("u"), col("b").as("v"))

  val all: ListMap[String, Q] = ListMap(
    // ---- q324: EXACT neighborhood function of the q315 co-purchase
    //      graph, 8 min-merge rounds; the oracle unrolls the same
    //      frontier expansion (MATERIALIZED rounds — each is read
    //      twice, the q316/q323 DuckDB lesson). ----
    "q324_neighborhood_exact" -> Q(
      (s, d) => neighborhoodFunctionExact(s, copurchaseEdges(s, d), MaxT,
        canonicalInput = true),
      Some(exactOracleSql(MaxT))),
    // ---- q325: HyperANF on the same graph — the 100 TB rung. The
    //      oracle replays the ENTIRE iterated register state row by
    //      row (md5-prefix hash, bit-length ranks, literal LC table),
    //      so the approximate operator is checked exactly. ----
    "q325_hyperanf_hll" -> Q(
      (s, d) => neighborhoodFunctionHll(s, copurchaseEdges(s, d), MaxT,
        canonicalInput = true),
      Some(hllOracleSql(MaxT))),
    // ---- q378: EXACT harmonic centrality of the co-purchase graph
    //      (top 15) — the oracle anchor on the q324 pair state; the
    //      100 TB rung is q379. ----
    "q378_harmonic_exact" -> Q(
      (s, d) => harmonicExact(s, copurchaseEdges(s, d), MaxT, k = 15,
        canonicalInput = true),
      Some(harmonicExactOracleSql(MaxT, 15))),
    // ---- q379: HYPERBALL harmonic centrality — per-node HLL ball
    //      estimates, clipped increments over 1/t; linear register
    //      state. The oracle replays every register and every
    //      per-node estimate at every t. ----
    "q379_harmonic_hyperball" -> Q(
      (s, d) => harmonicHyperball(s, copurchaseEdges(s, d), MaxT, k = 15,
        canonicalInput = true),
      Some(harmonicHyperballOracleSql(MaxT, 15))),
  )
}
