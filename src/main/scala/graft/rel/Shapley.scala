package graft.rel

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.rel.RelQueries.Q
import graft.rel.Tables

/** SHAPLEY-VALUE CHANNEL ATTRIBUTION (Shapley 1953; applied to
  * marketing touchpoints by Dalessandro, Perlich, Stitelman & Provost
  * 2012 "Causally motivated attribution for online advertising" and
  * Zhao, Mahboobi & Bagheri 2018 "Shapley value methods for
  * attribution modeling") — the game-theoretic split of conversion
  * credit across channels that last-touch (q154) and time-decay (q190)
  * heuristics cannot justify: channel i's credit is its average
  * marginal contribution over all orderings,
  *
  *   φᵢ = Σ_{S ⊆ C∖{i}} |S|!·(k−|S|−1)!/k! · (v(S∪{i}) − v(S)),
  *
  * with the coalition value v(S) = observed conversion rate of users
  * whose exposure set is EXACTLY S (the Zhao et al. simplified game;
  * unobserved coalitions contribute v = 0).
  *
  * Exactness: exposure sets fold to an integer BITMASK per user (one
  * hash aggregation); v is the truncating integer micro-rate
  * 10⁶·conv div n; the permutation weights are the integers
  * |S|!·(k−|S|−1)! (Shapley scaled by k!), so φ_num = k!·10⁶·φ is an
  * EXACT integer and the efficiency law Σφᵢ = v(C)−v(∅) holds exactly
  * in scaled units for ANY v — spec-pinned. The only float is the
  * final readout division (one IEEE op, rounded). phi_num is
  * deliberately NOT integer-divided by k!: Spark's `div` truncates
  * toward zero while SQL `//` floors, and marginal contributions can
  * be negative — the exact numerator ships instead.
  *
  * Scale shape: one user-level hash aggregation (conditional max per
  * channel — vocabulary-bounded width), collapsing to ≤ 2^k mask rows;
  * the game itself is arithmetic over k·2^(k−1) LITERAL (channel,
  * coalition) rows broadcast-joined to the mask table. k is capped at
  * 8 loudly (the subset table is the operator's own 2^k wall — past
  * that, sampled-permutation Shapley is the right tool, not this
  * exact form).
  */
object Shapley {

  private def fact(n: Int): Long = (1 to n).map(_.toLong).product

  /** Exact Shapley attribution over per-user channel exposures.
    * `events` needs (userCol, typeCol) rows; `channels` defines the
    * player set (order fixes bit positions); a user converts when they
    * have ≥ 1 `convType` event. Output per channel, ordered:
    * (channel, phi_num, phi_r6) with phi_num = k!·10⁶·φ exact and
    * phi_r6 = φ in conversion-rate units, rounded to 6.
    */
  def shapleyAttribution(events: DataFrame, channels: Seq[String],
      convType: String, userCol: String = "user_id",
      typeCol: String = "event_type"): DataFrame = {
    val k = channels.size
    require(k >= 1 && k <= 8, s"shapleyAttribution: 1 <= k <= 8, got $k")
    require(channels.distinct.size == k, "duplicate channels")
    require(!channels.contains(convType), "convType cannot be a channel")
    val s = events.sparkSession
    import s.implicits._
    val kFact = fact(k)
    // per-user exposure bitmask + conversion flag, one hash agg
    val maskExpr = channels.zipWithIndex.map { case (ch, i) =>
      max(when(col(typeCol) === ch, 1L).otherwise(0L)) * (1L << i)
    }.reduce(_ + _)
    val users = events
      .groupBy(col(userCol))
      .agg(maskExpr.as("mask"),
        max(when(col(typeCol) === convType, 1L).otherwise(0L)).as("conv"))
    val v = users.groupBy("mask")
      .agg(count(lit(1)).as("n"), sum("conv").as("c"))
      .select(col("mask"), expr("(1000000 * c) div n").as("v"))
    // the (channel, S, S∪{i}, |S|!(k-|S|-1)!) game table — literal,
    // k·2^(k-1) rows
    val pairs = (for {
      (ch, i) <- channels.zipWithIndex
      sMask <- 0 until (1 << k) if (sMask & (1 << i)) == 0
    } yield {
      val bits = Integer.bitCount(sMask)
      (ch, sMask.toLong, (sMask | (1 << i)).toLong,
        fact(bits) * fact(k - bits - 1))
    }).toDF("channel", "s0", "s1", "w")
    pairs
      .join(broadcast(v.select(col("mask").as("s1"), col("v").as("v1"))),
        Seq("s1"), "left")
      .join(broadcast(v.select(col("mask").as("s0"), col("v").as("v0"))),
        Seq("s0"), "left")
      .groupBy("channel")
      .agg(sum(col("w") * (coalesce(col("v1"), lit(0L))
        - coalesce(col("v0"), lit(0L)))).as("phi_num"))
      .select(col("channel"), col("phi_num"),
        round(col("phi_num").cast("double")
          / lit(kFact.toDouble * 1000000.0), 6).as("phi_r6"))
      .orderBy("channel")
  }

  val all: ListMap[String, Q] = ListMap(
    // ---- q318: SHAPLEY ATTRIBUTION of purchase conversion across the
    //      four touch channels at USER-DAY granularity (per-user
    //      lifetime exposure is saturated in this corpus — every mask
    //      would collapse to the full coalition; user-days realize all
    //      16 coalitions) — the game-theoretic companion to last-touch
    //      (q154) and time-decay (q190); the oracle replays the
    //      bitmask fold, the truncating micro-rates, and the full
    //      64-row coalition game. Note the honest conditioning quirk:
    //      a unit exists only on days WITH events, so the empty
    //      coalition is the purchase-only days (v(∅) = 10⁶) and every
    //      touch channel draws negative credit relative to it — the
    //      exactly-S game reports the data as it is. ----
    "q318_shapley_attribution" -> Q(
      (s, d) => shapleyAttribution(
        Tables.events(s, d).withColumn("unit",
          concat_ws("|", col("user_id"), to_date(col("ts")))),
        Seq("click", "view", "signup", "error"), "purchase",
        userCol = "unit"),
      Some {
        val channels = Seq("click", "view", "signup", "error")
        val k = channels.size
        val pairRows = (for {
          (ch, i) <- channels.zipWithIndex
          sMask <- 0 until (1 << k) if (sMask & (1 << i)) == 0
        } yield {
          val bits = Integer.bitCount(sMask)
          s"('$ch', $sMask, ${sMask | (1 << i)}, " +
            s"${fact(bits) * fact(k - bits - 1)})"
        }).mkString(",\n             |    ")
        s"""WITH u AS (SELECT user_id, CAST(ts AS DATE) AS day,
           |    max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) * 1
           |    + max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) * 2
           |    + max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) * 4
           |    + max(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) * 8
           |      AS mask,
           |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           |      AS conv
           |  FROM events GROUP BY user_id, CAST(ts AS DATE)),
           |v AS (SELECT mask, (1000000 * sum(conv)) // count(*) AS v
           |  FROM u GROUP BY mask),
           |pairs(channel, s0, s1, w) AS (VALUES
           |    $pairRows),
           |phi AS (SELECT channel,
           |    CAST(sum(w * (coalesce(v1.v, 0) - coalesce(v0.v, 0)))
           |      AS BIGINT) AS phi_num
           |  FROM pairs
           |  LEFT JOIN v v1 ON pairs.s1 = v1.mask
           |  LEFT JOIN v v0 ON pairs.s0 = v0.mask
           |  GROUP BY channel)
           |SELECT channel, phi_num,
           |  round(CAST(phi_num AS DOUBLE) / ${fact(k)}e6, 6) AS phi_r6
           |FROM phi ORDER BY channel""".stripMargin
      }))
}
