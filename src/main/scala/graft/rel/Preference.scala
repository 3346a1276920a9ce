package graft.rel

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.rel.RelQueries.Q
import graft.rel.Tables

/** BRADLEY–TERRY PREFERENCE RANKING (Bradley & Terry 1952; the MM
  * iteration of Hunter 2004, "MM algorithms for generalized
  * Bradley–Terry models") — THE estimator behind pairwise-preference
  * leaderboards (RLHF reward data, chatbot arenas, A/B duel tests):
  * item strengths p with P(i beats j) = pᵢ/(pᵢ+pⱼ), fit from
  * (winner, loser) rows.
  *
  * The MM update  pᵢ ← Wᵢ / Σ_j n_ij/(pᵢ+pⱼ)  runs a FIXED number of
  * synchronous rounds in integer micro-units (the q116/q316/q321
  * fixed-iteration contract):
  *
  *   t_ij = (n_ij·10¹²) div (pᵢ+pⱼ)      (0 when pᵢ+pⱼ = 0)
  *   pᵢ'  = (Wᵢ·10¹²) div Σ_j t_ij       (0 when the sum is 0)
  *   pᵢ  ← (pᵢ'·10⁶) div max_j pⱼ'       (max-norm, the q316 trick —
  *                                        BT strengths are scale-free)
  *
  * — every step truncating long division, so the oracle replays the
  * rounds bit-for-bit. The 10¹² inner scale keeps one-comparison pairs
  * above the truncation floor (10¹² div 2·10⁶ = 5·10⁵, never 0), and
  * the loud Wᵢ/n_ij ≤ 9·10⁶ guards keep ·10¹² inside a long. A
  * never-winning item fixes at 0 (the MLE boundary); the max item
  * pins at exactly 10⁶. Fixed-point of the iteration = the MLE; a
  * disconnected comparison graph is still deterministic here (fixed
  * rounds), though only ratios within a component are identified —
  * the caller owns connectivity, as in any BT fit.
  *
  * Scale shape: the corpus collapses to the (winner, loser) count
  * matrix in ONE hash aggregation; every round after is joins over
  * item²-bounded tables, localCheckpointed (the q316 lazy-branch
  * lesson). In the oracle, round CTEs are MATERIALIZED — each is
  * referenced twice (pᵢ and pⱼ joins), and DuckDB re-evaluates
  * non-materialized CTEs per reference (the q316 exponential-replay
  * lesson); the round max rides a window function, not a scalar
  * subquery.
  */
object Preference {

  private val Inner = 1000000000000L // 10^12
  private val Micro = 1000000L
  private val CountCap = 9000000L // cap·10^12 stays inside a long

  /** Fit BT strengths from (winner, loser) comparison rows. Output per
    * item: (item, score_micro, wins, n_comps), ordered score desc,
    * item asc. Self-comparisons raise loudly (corrupt input).
    */
  def bradleyTerry(comparisons: DataFrame, winner: String = "w",
      loser: String = "l", iters: Int = 10): DataFrame = {
    require(iters >= 1 && iters <= 16, s"1 <= iters <= 16: $iters")
    val c = comparisons.select(col(winner).as("w"), col(loser).as("l"))
    // The self-comparison guard rides the aggregated COUNT column, not
    // the w projection: a raise_error inside an expression that later
    // becomes a JOIN KEY gets an isnotnull constraint inferred and
    // pushed into upstream join conditions, where it is evaluated
    // BEFORE the caller's own guarding filter conjuncts — observed
    // firing on rows the filter rejects (InferFiltersFromConstraints;
    // the q323 lesson). Value columns never have key constraints
    // inferred, so the guard below is evaluated only on the
    // item²-bounded aggregate, post-filter and exactly once.
    val d = c.groupBy("w", "l").agg(count(lit(1)).as("c0"))
      .select(col("w"), col("l"),
        when(col("w") === col("l"), raise_error(concat(
          lit("bradleyTerry: self-comparison for item "),
          col("w").cast("string")))).otherwise(col("c0")).as("c"))
    val n = d.select(col("w").as("i"), col("l").as("j"), col("c"))
      .union(d.select(col("l").as("i"), col("w").as("j"), col("c")))
      .groupBy("i", "j").agg(sum("c").as("n0"))
    val wins = d.groupBy(col("w").as("i")).agg(sum("c").as("w0"))
    // the CountCap must bound the PER-ITEM TOTAL Σ_j n_ij, not just
    // each pair: Σ_j t_ij ≤ (Σ_j n_ij)·10¹² is the aggregation that
    // must stay inside a long (a per-pair cap alone lets two
    // floor-strength opponents overflow the sum — caught in review)
    val ntot = n.groupBy("i").agg(sum("n0").as("ncomp"))
    val base = n.join(wins, Seq("i"), "left").join(ntot, Seq("i"))
      .select(col("i"), col("j"),
        when(col("ncomp") > CountCap, raise_error(
          lit(s"bradleyTerry: per-item comparison total exceeds $CountCap")))
          .when(col("n0") > CountCap, raise_error(
            lit(s"bradleyTerry: pair count exceeds $CountCap")))
          .otherwise(col("n0")).as("n"),
        when(coalesce(col("w0"), lit(0L)) > CountCap, raise_error(
          lit(s"bradleyTerry: win count exceeds $CountCap")))
          .otherwise(coalesce(col("w0"), lit(0L))).as("wi"))
      .localCheckpoint(true) // corpus touched once; rounds are item^2-sized

    var p = base.select(col("i").as("item")).distinct()
      .withColumn("p", lit(Micro))
    for (_ <- 1 to iters) {
      val pi = p.select(col("item").as("i"), col("p").as("p_i"))
      val pj = p.select(col("item").as("j"), col("p").as("p_j"))
      val praw = base.join(pi, "i").join(pj, "j")
        .withColumn("t", when(col("p_i") + col("p_j") === 0, lit(0L))
          .otherwise(expr(s"(n * $Inner) div (p_i + p_j)")))
        .groupBy("i")
        .agg(max("wi").as("wi"), sum("t").as("s"))
        .select(col("i").as("item"),
          when(col("s") === 0, lit(0L))
            .otherwise(expr(s"(wi * $Inner) div s")).as("praw"))
      // praw is MATERIALIZED before fanning out to the max-normalizer
      // and the strength projection (the q316 renorm lesson, r15 opt):
      // checkpointing `p` instead evaluated the base-join + aggregation
      // once in the main stream and once more inside the broadcast max
      // subtree — 2× the MM pass per round. `p` stays a lazy projection
      // over the checkpointed round table (its consumers re-run only
      // the item-sized max), so the job count per round is unchanged.
      val prawM = praw.localCheckpoint(true)
      val mx = prawM.agg(max("praw").as("mx"))
      p = prawM.crossJoin(broadcast(mx))
        .select(col("item"),
          when(col("mx") === 0, raise_error(
            lit("bradleyTerry: all strengths collapsed to 0")))
            .otherwise(expr(s"(praw * $Micro) div mx")).as("p"))
    }

    val stats = base.groupBy("i")
      .agg(sum("n").as("n_comps"), max("wi").as("wins"))
    p.join(stats, col("item") === col("i"))
      .select(col("item"), col("p").as("score_micro"), col("wins"),
        col("n_comps"))
      .orderBy(col("score_micro").desc, col("item"))
  }

  /** The q323 oracle: comparison extraction + `iters` MM rounds
    * unrolled, round CTEs MATERIALIZED (each is read twice).
    */
  private def btOracleSql(iters: Int): String = {
    val rounds = (1 to iters).map { r =>
      val prev = s"p${r - 1}"
      s"""praw$r AS (SELECT b.i AS item, CASE WHEN sum(CASE
         |      WHEN pi.p + pj.p = 0 THEN 0
         |      ELSE (b.n * $Inner) // (pi.p + pj.p) END) = 0 THEN 0
         |    ELSE (max(b.wi) * $Inner) // sum(CASE
         |      WHEN pi.p + pj.p = 0 THEN 0
         |      ELSE (b.n * $Inner) // (pi.p + pj.p) END) END AS praw
         |  FROM base b JOIN $prev pi ON pi.item = b.i
         |    JOIN $prev pj ON pj.item = b.j
         |  GROUP BY b.i),
         |p$r AS MATERIALIZED (SELECT item,
         |    (praw * $Micro) // max(praw) OVER () AS p FROM praw$r)"""
        .stripMargin
    }.mkString(",\n")
    s"""cmp AS (SELECT w, l FROM duels),
       |d AS (SELECT w, l, count(*) AS c FROM cmp GROUP BY 1, 2),
       |n AS (SELECT i, j, sum(c) AS n FROM (
       |    SELECT w AS i, l AS j, c FROM d
       |    UNION ALL SELECT l AS i, w AS j, c FROM d) GROUP BY 1, 2),
       |wn AS (SELECT w AS i, sum(c) AS wi FROM d GROUP BY 1),
       |base AS MATERIALIZED (SELECT n.i, n.j, n.n,
       |    coalesce(wn.wi, 0) AS wi
       |  FROM n LEFT JOIN wn USING (i)),
       |p0 AS MATERIALIZED (SELECT DISTINCT i AS item,
       |    CAST($Micro AS BIGINT) AS p FROM base),
       |$rounds,
       |stats AS (SELECT i, sum(n) AS n_comps, max(wi) AS wins
       |  FROM base GROUP BY 1)
       |SELECT p.item AS item, CAST(p.p AS BIGINT) AS score_micro,
       |  CAST(stats.wins AS BIGINT) AS wins,
       |  CAST(stats.n_comps AS BIGINT) AS n_comps
       |FROM p$iters p JOIN stats ON stats.i = p.item
       |ORDER BY score_micro DESC, item""".stripMargin
  }

  val all: ListMap[String, Q] = ListMap(
    // ---- q323: BT ranking of the 25 NATIONS from per-order price
    //      duels — within each order, every cross-nation lineitem
    //      pair is a comparison won by the higher extended price
    //      (ties dropped). Synthetic preference data, but the full
    //      pipeline shape: corpus → one pair extraction + one count
    //      aggregation → 10 integer MM rounds on a 25-item matrix. ----
    "q323_bradley_terry" -> Q(
      (s, d) => {
        val li = Tables.lineitem(s, d).select(
          col("l_orderkey").as("ok"), col("l_linenumber").as("ln"),
          col("l_suppkey").as("sk"),
          round(col("l_extendedprice") * 100, 0).cast("long").as("cents"))
        val sup = Tables.supplier(s, d)
          .join(Tables.nation(s, d),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey").as("sk"), col("n_name").as("nat"))
        val a = li.join(broadcast(sup), "sk")
          .select(col("ok"), col("ln"), col("nat"), col("cents"))
        val x = a.select(col("ok"), col("ln").as("ln_x"),
          col("nat").as("nat_x"), col("cents").as("c_x"))
        val y = a.select(col("ok"), col("ln").as("ln_y"),
          col("nat").as("nat_y"), col("cents").as("c_y"))
        val duels = x.join(y, Seq("ok"))
          .filter(col("ln_x") < col("ln_y")
            && col("nat_x") =!= col("nat_y") && col("c_x") =!= col("c_y"))
          .select(
            when(col("c_x") > col("c_y"), col("nat_x"))
              .otherwise(col("nat_y")).as("w"),
            when(col("c_x") > col("c_y"), col("nat_y"))
              .otherwise(col("nat_x")).as("l"))
        bradleyTerry(duels, "w", "l", iters = 10)
      },
      Some(s"""WITH li AS (SELECT l_orderkey AS ok, l_linenumber AS ln,
             |    l_suppkey AS sk,
             |    CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
             |  FROM lineitem),
             |sup AS (SELECT s_suppkey AS sk, n_name AS nat
             |  FROM supplier JOIN nation ON s_nationkey = n_nationkey),
             |a AS (SELECT li.ok, li.ln, sup.nat, li.cents
             |  FROM li JOIN sup USING (sk)),
             |duels AS MATERIALIZED (SELECT
             |    CASE WHEN x.cents > y.cents THEN x.nat ELSE y.nat END AS w,
             |    CASE WHEN x.cents > y.cents THEN y.nat ELSE x.nat END AS l
             |  FROM a x JOIN a y ON x.ok = y.ok AND x.ln < y.ln
             |  WHERE x.nat <> y.nat AND x.cents <> y.cents),
             |${btOracleSql(10)}""".stripMargin)),
  )
}
