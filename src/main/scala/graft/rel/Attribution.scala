package graft.rel

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.rel.RelQueries.Q
import graft.rel.Tables

/** MARKOV-CHAIN ATTRIBUTION with REMOVAL EFFECTS (Anderl, Becker,
  * v. Wangenheim & Schumann 2014, "Mapping the customer journey") —
  * the data-driven complement to q318's Shapley split. Where Shapley
  * values a channel by its marginal lift across exposure COALITIONS
  * (order-free), the Markov model values it by its position in the
  * observed JOURNEY GRAPH: build the first-order transition chain
  * START → touches → CONV/NULL, compute the baseline absorption
  * probability of CONV, then for each channel REMOVE it (every
  * transition into it is redirected to NULL — the journey dies where
  * the channel used to carry it) and re-absorb; the attribution weight
  * is the normalized drop.
  *
  * Exactness: transition counts are exact integers from one hash
  * aggregation over journey pairs. Absorption runs a FIXED number of
  * synchronous rounds (the q116/q316 fixed-iteration contract) in
  * integer micro-units with truncating division —
  *   p⁰(s) = 0;  pʳ⁺¹(s) = (Σ_t c(s,t)·pʳ(t)) div n(s),
  * p(CONV) ≡ 10⁶, p(NULL) ≡ 0 — so every round replays bit-for-bit in
  * SQL (the oracle unrolls the rounds; each round CTE is referenced
  * exactly once — the q316 DuckDB lesson — and the shared transition
  * tables are MATERIALIZED so they are not re-derived per round).
  * Removal monotonicity is structural: the removed chain substitutes
  * p(NULL) = 0 for a nonnegative state, so pʳ_removed ≤ pʳ_full at
  * every round even under truncation, and removal effects are never
  * negative. A horizon of `iters` rounds counts conversion paths of
  * at most `iters` hops — the deliberate, replayable truncation of the
  * infinite-series absorption (same contract as fixed-iteration
  * PageRank; journeys in a curation pipeline are short).
  *
  * Scale shape: the journey extraction is ONE user-keyed window
  * shuffle (the q128 funnel shape); everything after the transition
  * count aggregation operates on a (channels+3)² matrix × (k+1)
  * variants — driver-size, localCheckpointed per round so the k+1
  * absorption chains cost k+1 tiny joins per round, never a rescan of
  * the corpus. At 100 TB only the first aggregation touches the data.
  */
object Attribution {

  private val Micro = 1000000L

  /** Removal-effect attribution over per-user ordered channel touches.
    * A user's journey is their `channels` events strictly before their
    * first `convType` event (all of them if they never convert),
    * ordered by (ts, event id); it ends in CONV if they converted,
    * NULL otherwise (converters with zero prior touches contribute
    * START → CONV). Output per channel, ordered:
    * (channel, p_full_micro, p_removed_micro, removal_micro,
    * share_micro) — share is null when every removal effect is 0.
    * Raises loudly when the baseline conversion probability is 0
    * (removal effects are undefined).
    */
  def markovRemovalEffects(events: DataFrame, channels: Seq[String],
      convType: String, userCol: String = "user_id", tsCol: String = "ts",
      idCol: String = "event_id", typeCol: String = "event_type",
      iters: Int = 8): DataFrame = {
    require(channels.nonEmpty && channels.distinct.size == channels.size,
      "channels must be non-empty and distinct")
    require(!channels.contains(convType), "convType cannot be a channel")
    val reserved = Seq("START", "CONV", "NULL", "FULL")
    require(channels.forall(c => !reserved.contains(c)),
      s"channel names collide with reserved states $reserved")
    require(iters >= 1 && iters <= 16, s"1 <= iters <= 16: $iters")
    val s = events.sparkSession
    import s.implicits._

    val fpC = events.groupBy(col(userCol).as("uid"))
      .agg(min(when(col(typeCol) === convType, col(tsCol))).as("fpts"))
      .withColumn("conv", col("fpts").isNotNull)
      .localCheckpoint(true) // unit-sized; the touch join + zero-touch
                             // branch both read it
    val touches = events.select(col(userCol).as("uid"),
        col(typeCol).as("ch"), col(tsCol).as("ts0"), col(idCol).as("eid"))
      .filter(col("ch").isin(channels: _*))
      .join(fpC, "uid")
      .filter(col("fpts").isNull || col("ts0") < col("fpts"))
    val w = Window.partitionBy("uid").orderBy("ts0", "eid")
    val wAll = Window.partitionBy("uid")
    // materialize the windowed journey ONCE: steps, lasts, and the
    // zero-touch anti-join all read it — without this the events
    // corpus + the fp aggregation re-evaluate once per union branch,
    // which is exactly the "corpus touched once" claim breaking
    val t1 = touches
      .withColumn("f", coalesce(lag(col("ch"), 1).over(w), lit("START")))
      .withColumn("rn", row_number().over(w))
      .withColumn("nt", count(lit(1)).over(wAll))
      .localCheckpoint(true)
    val steps = t1.select(col("f"), col("ch").as("t"))
    val lasts = t1.filter(col("rn") === col("nt"))
      .select(col("ch").as("f"),
        when(col("conv"), lit("CONV")).otherwise(lit("NULL")).as("t"))
    val zeroTouchConv = fpC.filter(col("conv"))
      .join(t1.select("uid").distinct(), Seq("uid"), "left_anti")
      .select(lit("START").as("f"), lit("CONV").as("t"))
    val cnt = steps.union(lasts).union(zeroTouchConv)
      .groupBy("f", "t").agg(count(lit(1)).as("c"))
      .localCheckpoint(true) // everything below is (k+3)^2-sized

    val variants = ("FULL" +: channels).toDF("v")
    val vcnt = cnt.crossJoin(broadcast(variants))
      .filter(col("f") =!= col("v"))
      .select(col("v"), col("f"),
        when(col("t") === col("v"), lit("NULL")).otherwise(col("t")).as("t"),
        col("c"))
      .groupBy("v", "f", "t").agg(sum("c").as("c"))
    val nsum = vcnt.groupBy("v", "f").agg(sum("c").as("n"))
    val base = vcnt.join(nsum, Seq("v", "f")).localCheckpoint(true)

    var p = base.select(col("v"), col("f").as("s")).distinct()
      .withColumn("p", lit(0L))
    for (_ <- 1 to iters) {
      val pT = p.select(col("v").as("pv"), col("s").as("ps"), col("p").as("pp"))
      p = base
        .join(pT, col("pv") === col("v") && col("ps") === col("t"), "left")
        .groupBy(col("v"), col("f"))
        .agg(sum(col("c") * when(col("t") === "CONV", lit(Micro))
            .when(col("t") === "NULL", lit(0L))
            .otherwise(coalesce(col("pp"), lit(0L)))).as("num"),
          max(col("n")).as("den"))
        .select(col("v"), col("f").as("s"), expr("num div den").as("p"))
        .localCheckpoint(true) // eager: a lazy chain re-runs all rounds
    }

    val pStart = p.filter(col("s") === "START").select(col("v"), col("p"))
    val pFull = pStart.filter(col("v") === "FULL")
      .select(when(col("p") > 0, col("p")).otherwise(raise_error(
        lit("markovRemovalEffects: baseline conversion probability is 0")))
        .as("p_full"))
    val out0 = pStart.filter(col("v") =!= "FULL").crossJoin(broadcast(pFull))
      .withColumn("removal_micro",
        expr(s"((p_full - p) * $Micro) div p_full"))
    val totRem = out0.agg(sum("removal_micro").as("rtot"))
    out0.crossJoin(broadcast(totRem))
      .select(col("v").as("channel"), col("p_full").as("p_full_micro"),
        col("p").as("p_removed_micro"), col("removal_micro"),
        when(col("rtot") === 0, lit(null).cast("long"))
          .otherwise(expr(s"(removal_micro * $Micro) div rtot"))
          .as("share_micro"))
      .orderBy("channel")
  }

  /** RULE-BASED ATTRIBUTION — the three standard heuristic credit
    * rules next to the model-based q318/q321 (side-by-side disagreement
    * between rules is itself the diagnostic marketers read):
    * LINEAR (equal split), POSITION (the 40/20/40 U-shape: first and
    * last touch 400‰ each, middles share 200‰), and TIME-DECAY
    * (credit ∝ 2^(−age/halfLife), ages in whole days before the
    * conversion). Journeys are the q321 extraction (touches strictly
    * before first conversion, (ts, id) order); only converters
    * credit. All shares are integer milli with TRUNCATING division —
    * per-journey totals may fall a few milli short of 1000 (floors
    * are NOT redistributed; determinism beats cosmetics, documented),
    * and the decay weights are exact powers of two via shifts, so
    * both engines replay every credit bit-for-bit. One user-keyed
    * window shuffle, then a channel-keyed aggregation.
    *
    * TIMEZONE: decay ages come from `datediff(to_date(ts))`, which
    * follows the Spark SESSION timezone — this repo pins UTC
    * (`spark.sql.session.timeZone`), and the q332 oracle's
    * `CAST(ts AS DATE)` matches only under that setting. A caller in
    * a non-UTC session gets day boundaries at local midnight; pass
    * timestamps already truncated to the day they should credit to
    * (or run with the UTC session) for timezone-independent credits.
    */
  def ruleAttribution(events: DataFrame, channels: Seq[String],
      convType: String, halfLifeDays: Int = 1, userCol: String = "user_id",
      tsCol: String = "ts", idCol: String = "event_id",
      typeCol: String = "event_type"): DataFrame = {
    require(channels.nonEmpty && channels.distinct.size == channels.size,
      "channels must be non-empty and distinct")
    require(!channels.contains(convType), "convType cannot be a channel")
    require(halfLifeDays >= 1, s"halfLifeDays >= 1: $halfLifeDays")
    val fp = events.groupBy(col(userCol).as("uid"))
      .agg(min(when(col(typeCol) === convType, col(tsCol))).as("fpts"))
      .filter(col("fpts").isNotNull)
    val touches = events.select(col(userCol).as("uid"),
        col(typeCol).as("ch"), col(tsCol).as("ts0"), col(idCol).as("eid"))
      .filter(col("ch").isin(channels: _*))
      .join(fp, "uid")
      .filter(col("ts0") < col("fpts"))
    val w = Window.partitionBy("uid").orderBy("ts0", "eid")
    val wAll = Window.partitionBy("uid")
    val t1 = touches
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("ageh",
        least(expr(s"datediff(to_date(fpts), to_date(ts0)) div $halfLifeDays"),
          lit(40L)))
      // floor at 1 micro: a journey whose every touch is >= 20
      // half-lives old would otherwise truncate all weights to 0 and
      // the share division below would divide by zero (ANSI: a crash;
      // non-ANSI: nulls) — ancient touches keep a minimal equal weight
      .withColumn("dw", greatest(expr(
        "1000000 div shiftleft(cast(1 as bigint), cast(ageh as int))"),
        lit(1L)))
      .withColumn("dwsum", sum(col("dw")).over(wAll))
    val credited = t1.select(col("ch"), col("uid"),
      expr("1000 div n").as("lin"),
      when(col("n") === 1L, lit(1000L))
        // no middle touch at n = 2: the U-shape's 200-milli middle
        // share folds into the endpoints (500/500), not into thin air
        .when(col("n") === 2L, lit(500L))
        .when(col("rn") === 1L || col("rn") === col("n"), lit(400L))
        .otherwise(expr("200 div (n - 2)")).as("pos"),
      expr("(dw * 1000) div dwsum").as("dec"))
    credited.groupBy(col("ch").as("channel"))
      .agg(sum("lin").as("linear_milli"), sum("pos").as("position_milli"),
        sum("dec").as("decay_milli"),
        countDistinct(col("uid")).as("conversions_touched"))
      .orderBy("channel")
  }

  /** The q321 oracle: journey extraction + per-variant transition
    * matrices as MATERIALIZED CTEs, then `iters` absorption rounds
    * unrolled — each round CTE referenced exactly once (the q316
    * DuckDB re-evaluation lesson).
    */
  private def markovOracleSql(channels: Seq[String], convType: String,
      iters: Int): String = {
    val chList = channels.map(c => s"'$c'").mkString(", ")
    val rounds = (1 to iters).map { i =>
      val prev = s"p${i - 1}"
      s"""p$i AS (SELECT b.v, b.f AS s,
         |    sum(b.c * CASE WHEN b.t = 'CONV' THEN 1000000
         |      WHEN b.t = 'NULL' THEN 0
         |      ELSE coalesce($prev.p, 0) END) // max(b.n) AS p
         |  FROM base b LEFT JOIN $prev ON $prev.v = b.v AND $prev.s = b.t
         |  GROUP BY b.v, b.f)""".stripMargin
    }.mkString(",\n")
    s"""WITH fp AS MATERIALIZED (SELECT user_id AS uid,
       |    min(CASE WHEN event_type = '$convType' THEN ts END) AS fpts
       |  FROM events GROUP BY user_id),
       |tch AS MATERIALIZED (SELECT e.user_id AS uid, e.event_type AS ch,
       |    row_number() OVER (PARTITION BY e.user_id
       |      ORDER BY e.ts, e.event_id) AS rn,
       |    count(*) OVER (PARTITION BY e.user_id) AS nt
       |  FROM events e JOIN fp ON fp.uid = e.user_id
       |  WHERE e.event_type IN ($chList)
       |    AND (fp.fpts IS NULL OR e.ts < fp.fpts)),
       |tr AS (
       |  SELECT coalesce(lag(ch) OVER (PARTITION BY uid ORDER BY rn),
       |      'START') AS f, ch AS t
       |    FROM tch
       |  UNION ALL
       |  SELECT tch.ch, CASE WHEN fp.fpts IS NOT NULL THEN 'CONV'
       |      ELSE 'NULL' END
       |    FROM tch JOIN fp USING (uid) WHERE tch.rn = tch.nt
       |  UNION ALL
       |  SELECT 'START', 'CONV' FROM fp
       |    WHERE fp.fpts IS NOT NULL AND NOT EXISTS (
       |      SELECT 1 FROM tch WHERE tch.uid = fp.uid)),
       |cnt AS (SELECT f, t, count(*) AS c FROM tr GROUP BY 1, 2),
       |vr AS (SELECT unnest(['FULL', $chList]) AS v),
       |vcnt AS (SELECT vr.v, cnt.f,
       |    CASE WHEN cnt.t = vr.v THEN 'NULL' ELSE cnt.t END AS t,
       |    sum(cnt.c) AS c
       |  FROM cnt, vr WHERE cnt.f <> vr.v GROUP BY 1, 2, 3),
       |nsum AS (SELECT v, f, sum(c) AS n FROM vcnt GROUP BY 1, 2),
       |base AS MATERIALIZED (SELECT vcnt.v, vcnt.f, vcnt.t, vcnt.c, nsum.n
       |  FROM vcnt JOIN nsum USING (v, f)),
       |p0 AS (SELECT v, f AS s, CAST(0 AS BIGINT) AS p
       |  FROM (SELECT DISTINCT v, f FROM base)),
       |$rounds,
       |ps AS (SELECT v, p FROM p$iters WHERE s = 'START'),
       |pf AS (SELECT p AS p_full FROM ps WHERE v = 'FULL'),
       |o AS (SELECT ps.v AS channel, pf.p_full, ps.p AS p_removed,
       |    ((pf.p_full - ps.p) * 1000000) // pf.p_full AS removal_micro
       |  FROM ps, pf WHERE ps.v <> 'FULL'),
       |tot AS (SELECT sum(removal_micro) AS rtot FROM o)
       |SELECT channel, CAST(p_full AS BIGINT) AS p_full_micro,
       |  CAST(p_removed AS BIGINT) AS p_removed_micro,
       |  CAST(removal_micro AS BIGINT) AS removal_micro,
       |  CAST(CASE WHEN tot.rtot = 0 THEN NULL
       |    ELSE (removal_micro * 1000000) // tot.rtot END AS BIGINT)
       |    AS share_micro
       |FROM o, tot ORDER BY channel""".stripMargin
  }

  private val Channels = Seq("view", "click", "signup", "error")

  val all: ListMap[String, Q] = ListMap(
    // ---- q321: MARKOV REMOVAL-EFFECT attribution over the same
    //      4-channel/purchase journey universe as q318's Shapley —
    //      the order-aware counterpart (Shapley sees exposure sets;
    //      the chain sees the path). 8 absorption rounds unrolled in
    //      the oracle. ----
    "q321_markov_attribution" -> Q(
      (s, d) => markovRemovalEffects(Tables.events(s, d), Channels,
        convType = "purchase", iters = 8),
      Some(markovOracleSql(Channels, "purchase", iters = 8))),

    // ---- q332: the HEURISTIC attribution family (linear, 40/20/40
    //      position, 1-day-half-life time decay) over the same
    //      journey universe as q318/q321 — the full attribution
    //      spectrum: last-touch (q154), rules (here), Shapley (q318),
    //      Markov (q321). ----
    "q332_rule_attribution" -> Q(
      (s, d) => ruleAttribution(Tables.events(s, d), Channels,
        convType = "purchase", halfLifeDays = 1),
      Some(s"""WITH fp AS (SELECT user_id AS uid,
             |    min(CASE WHEN event_type = 'purchase' THEN ts END) AS fpts
             |  FROM events GROUP BY user_id
             |  HAVING min(CASE WHEN event_type = 'purchase' THEN ts END)
             |    IS NOT NULL),
             |t AS (SELECT e.user_id AS uid, e.event_type AS ch,
             |    row_number() OVER (PARTITION BY e.user_id
             |      ORDER BY e.ts, e.event_id) AS rn,
             |    count(*) OVER (PARTITION BY e.user_id) AS n,
             |    least(date_diff('day', CAST(e.ts AS DATE),
             |      CAST(fp.fpts AS DATE)) // 1, 40) AS ageh
             |  FROM events e JOIN fp ON fp.uid = e.user_id
             |  WHERE e.event_type IN (${Channels.map(c => s"'$c'")
               .mkString(", ")})
             |    AND e.ts < fp.fpts),
             |t2 AS (SELECT uid, ch, rn, n, ageh,
             |    greatest(1000000 // (1::BIGINT << CAST(ageh AS INT)), 1)
             |      AS dw,
             |    sum(greatest(1000000 // (1::BIGINT << CAST(ageh AS INT)), 1))
             |      OVER (PARTITION BY uid) AS dwsum
             |  FROM t),
             |cr AS (SELECT ch, uid,
             |    1000 // n AS lin,
             |    CASE WHEN n = 1 THEN 1000
             |      WHEN n = 2 THEN 500
             |      WHEN rn = 1 OR rn = n THEN 400
             |      ELSE 200 // (n - 2) END AS pos,
             |    (dw * 1000) // dwsum AS dec
             |  FROM t2)
             |SELECT ch AS channel,
             |  CAST(sum(lin) AS BIGINT) AS linear_milli,
             |  CAST(sum(pos) AS BIGINT) AS position_milli,
             |  CAST(sum(dec) AS BIGINT) AS decay_milli,
             |  CAST(count(DISTINCT uid) AS BIGINT) AS conversions_touched
             |FROM cr GROUP BY ch ORDER BY ch""".stripMargin)),
  )
}
