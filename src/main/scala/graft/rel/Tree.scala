package graft.rel

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.rel.RelQueries.Q
import graft.rel.Tables

/** DECISION-STUMP SPLIT FINDING (the CART building block, Breiman et
  * al. 1984): per feature, the binary threshold x ≤ v maximizing the
  * Gini impurity reduction against a 0/1 label —
  *
  *   gain(v) = G(parent) − (n_L/N)·G(left) − (n_R/N)·G(right),
  *   G = 1 − p² − (1−p)²,
  *
  * the standard feature-importance / leakage audit: a feature whose
  * best stump gain is near the parent impurity predicts the label
  * almost alone (target leakage); near zero, it is noise.
  *
  * Exactness: per-(feature, value) counts are exact integers from one
  * hash aggregation; left-cumulative counts ride the ORDER-PINNED
  * per-feature window; every candidate's gain is one fixed IEEE chain
  * on those integers, rounded to 6 BEFORE the argmax (the q44
  * float-noise rule) with ties to the SMALLEST threshold. The window
  * frame is the feature's distinct-value set — the operator requires
  * quantized/binned features (loud raise past 65536 distinct values:
  * bin first, the KM calendar-granularity adjudication).
  *
  * Output per feature (constant features drop — nothing to split):
  * (feature, split_value, n_left, pos_left, n_total, pos_total,
  * gain_r6).
  */
object Tree {

  private val DistinctCap = 65536L

  def splitGains(df: DataFrame, features: Seq[String],
      label: String = "y"): DataFrame = {
    require(features.nonEmpty, "splitGains: no features")
    val y0 = col(label).cast("long")
    val yv = when(y0 === 1L, 1L).when(y0 === 0L, 0L)
      .otherwise(raise_error(concat(
        lit("splitGains: label must be 0 or 1: "), y0.cast("string"))))
    val long = features.map(f =>
      df.select(lit(f).as("feat"), col(f).cast("long").as("x"), yv.as("y")))
      .reduce(_ unionAll _)
    val per = long.groupBy("feat", "x")
      .agg(count(lit(1)).as("n"), sum(col("y")).as("p"))
    val wCum = Window.partitionBy("feat").orderBy("x")
      .rowsBetween(Long.MinValue, 0)
    val wAll = Window.partitionBy("feat")
    def g(pp: org.apache.spark.sql.Column, nn: org.apache.spark.sql.Column) = {
      val r = pp.cast("double") / nn.cast("double")
      lit(1.0) - r * r - (lit(1.0) - r) * (lit(1.0) - r)
    }
    val cand = per
      .withColumn("nl", sum(col("n")).over(wCum))
      .withColumn("pl", sum(col("p")).over(wCum))
      .withColumn("nt", sum(col("n")).over(wAll))
      .withColumn("pt", sum(col("p")).over(wAll))
      .withColumn("nv", count(lit(1)).over(wAll))
      .select(col("feat"),
        when(col("nv") > DistinctCap, raise_error(concat(
          lit("splitGains: feature "), col("feat"),
          lit(s" has > $DistinctCap distinct values — bin it first"))))
          .otherwise(col("x")).as("x"),
        col("nl"), col("pl"), col("nt"), col("pt"))
      .filter(col("nl") < col("nt")) // right side must be non-empty
      .withColumn("gain_r6", round(
        g(col("pt"), col("nt"))
          - (col("nl").cast("double") / col("nt").cast("double"))
            * g(col("pl"), col("nl"))
          - ((col("nt") - col("nl")).cast("double") / col("nt").cast("double"))
            * g(col("pt") - col("pl"), col("nt") - col("nl")), 6))
    cand
      .groupBy("feat")
      .agg(max(struct(col("gain_r6"), (-col("x")).as("negx"), col("x"),
        col("nl"), col("pl"), col("nt"), col("pt"))).as("z"))
      .select(col("feat").as("feature"), col("z.x").as("split_value"),
        col("z.nl").as("n_left"), col("z.pl").as("pos_left"),
        col("z.nt").as("n_total"), col("z.pt").as("pos_total"),
        col("z.gain_r6").as("gain_r6"))
      .orderBy("feature")
  }

  /** GRADIENT-BOOSTED REGRESSION STUMPS (Friedman 2001, "Greedy
    * function approximation", squared loss, depth-1 learners, unit
    * shrinkage): F₀ = round(ȳ); each round fits the best stump to the
    * INTEGER residuals — the (feature, threshold) maximizing the SSE
    * reduction (Σ_L r)²/n_L + (Σ_R r)²/n_R − (Σr)²/n — and adds its
    * rounded-mean leaf values to every unit's score. The output is
    * the MODEL TRACE, one row per round: the chosen split, its leaf
    * deltas, its gain, and the post-round training RMSE — the whole
    * boosting path, verifiable step by step.
    *
    * Exactness: residuals stay exact integers (the label's own units)
    * because leaf values are rounded to integers before applying —
    * gradient boosting tolerates quantized steps by construction
    * (the next round's residuals absorb the rounding). Candidate
    * sums are exact longs over the order-pinned per-feature window
    * (the q361 machinery); each gain is one fixed IEEE chain rounded
    * to 6 BEFORE the global argmax (ties → feature asc, value asc);
    * the same distinct-value cap applies (bin first past 65536).
    *
    * Scale shape per round: one hash aggregation over the
    * features-long view, a window over the BOUNDED candidate table
    * (features × distinct values), a 1-row broadcast argmax, one
    * map-side score update, one fold for the RMSE — `rounds` fixed
    * passes total, no shuffle keyed by anything unbounded, state one
    * long per unit (localCheckpointed per round).
    */
  def boostedStumps(df: DataFrame, features: Seq[String],
      label: String = "ym", rounds: Int = 4): DataFrame = {
    require(features.nonEmpty, "boostedStumps: no features")
    require(rounds >= 1 && rounds <= 8, s"1 <= rounds <= 8: $rounds")
    val dec38 = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
    val base = df.select(
      features.map(f => col(f).cast("long").as(f))
        :+ col(label).cast("long").as("ym"): _*)
    val f0 = base.agg(round(avg(col("ym")), 0).cast("long").as("f0"))
    var cur = base.crossJoin(broadcast(f0))
      .withColumn("f", col("f0")).drop("f0")
      .localCheckpoint(true)
    var trace: DataFrame = null
    for (m <- 1 to rounds) {
      val long = features.map(f => cur.select(lit(f).as("feat"),
        col(f).as("x"), (col("ym") - col("f")).as("r")))
        .reduce(_ unionAll _)
      val per = long.groupBy("feat", "x")
        .agg(count(lit(1)).as("n"), sum(col("r")).as("sr"))
      val wCum = Window.partitionBy("feat").orderBy("x")
        .rowsBetween(Long.MinValue, 0)
      val wAll = Window.partitionBy("feat")
      val cand = per
        .withColumn("nl", sum(col("n")).over(wCum))
        .withColumn("sl", sum(col("sr")).over(wCum))
        .withColumn("nt", sum(col("n")).over(wAll))
        .withColumn("st", sum(col("sr")).over(wAll))
        .withColumn("nv", count(lit(1)).over(wAll))
        .select(col("feat"),
          when(col("nv") > DistinctCap, raise_error(concat(
            lit("boostedStumps: feature "), col("feat"),
            lit(s" has > $DistinctCap distinct values — bin it first"))))
            .otherwise(col("x")).as("x"),
          col("nl"), col("sl"), (col("nt") - col("nl")).as("nr"),
          (col("st") - col("sl")).as("sr2"), col("nt"), col("st"))
        .filter(col("nl") < col("nt"))
        .withColumn("gain_r6", round(
          (col("sl").cast("double") * col("sl").cast("double"))
            / col("nl").cast("double")
            + (col("sr2").cast("double") * col("sr2").cast("double"))
              / col("nr").cast("double")
            - (col("st").cast("double") * col("st").cast("double"))
              / col("nt").cast("double"), 6))
      val best = cand
        .agg(min(struct((-col("gain_r6")).as("ng"), col("feat"), col("x"),
          col("nl"), col("sl"), col("nr"), col("sr2"))).as("z"))
        .select(col("z.feat").as("bfeat"), col("z.x").as("bx"),
          col("z.nl").as("n_left"), (-col("z.ng")).as("gain_r6"),
          round(col("z.sl").cast("double") / col("z.nl").cast("double"), 0)
            .cast("long").as("wl"),
          round(col("z.sr2").cast("double") / col("z.nr").cast("double"), 0)
            .cast("long").as("wr"))
        .localCheckpoint(true)
      val applied = features.foldLeft(lit(null).cast("long")) { (acc, f) =>
        coalesce(acc, when(col("bfeat") === lit(f),
          when(col(f) <= col("bx"), col("wl")).otherwise(col("wr"))))
      }
      cur = cur.crossJoin(broadcast(best))
        .withColumn("f", col("f") + applied)
        .drop("bfeat", "bx", "n_left", "gain_r6", "wl", "wr")
        .localCheckpoint(true)
      val rmse = cur.agg(round(sqrt(
        sum(((col("ym") - col("f")) * (col("ym") - col("f"))).cast(dec38))
          .cast("double") / count(lit(1)).cast("double")), 6)
        .as("rmse_after_r6"))
      val row = best.crossJoin(broadcast(rmse))
        .select(lit(m).as("round"), col("bfeat").as("feature"),
          col("bx").as("split_value"), col("n_left"), col("wl"), col("wr"),
          col("gain_r6"), col("rmse_after_r6"))
      trace = if (trace == null) row else trace.unionAll(row)
    }
    trace.orderBy("round")
  }

  val all: ListMap[String, Q] = ListMap(
    // ---- q361: stump split gains — which of quantity / discount /
    //      tax best separates returned lineitems (returnflag = 'R')?
    //      Features pre-quantized to integer units; the oracle replays
    //      counts, the per-feature cumulative window, every
    //      candidate's Gini chain, and the (gain desc, value asc)
    //      argmax. ----
    "q361_split_gain" -> Q(
      (s, d) => splitGains(
        Tables.lineitem(s, d).select(
          col("l_quantity").cast("long").as("quantity"),
          round(col("l_discount") * 100, 0).cast("long").as("discount_c"),
          round(col("l_tax") * 100, 0).cast("long").as("tax_c"),
          when(col("l_returnflag") === "R", 1L).otherwise(0L).as("y")),
        Seq("quantity", "discount_c", "tax_c")),
      Some("""WITH u AS (SELECT CAST(l_quantity AS BIGINT) AS quantity,
             |    CAST(round(l_discount * 100) AS BIGINT) AS discount_c,
             |    CAST(round(l_tax * 100) AS BIGINT) AS tax_c,
             |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
             |  FROM lineitem),
             |lg AS (SELECT 'quantity' AS feat, quantity AS x, y FROM u
             |  UNION ALL SELECT 'discount_c', discount_c, y FROM u
             |  UNION ALL SELECT 'tax_c', tax_c, y FROM u),
             |per AS (SELECT feat, x, count(*) AS n, sum(y) AS p
             |  FROM lg GROUP BY feat, x),
             |cw AS (SELECT feat, x,
             |    sum(n) OVER (PARTITION BY feat ORDER BY x
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS nl,
             |    sum(p) OVER (PARTITION BY feat ORDER BY x
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pl,
             |    sum(n) OVER (PARTITION BY feat) AS nt,
             |    sum(p) OVER (PARTITION BY feat) AS pt
             |  FROM per),
             |cand AS (SELECT feat, x, nl, pl, nt, pt,
             |    round(
             |      (1.0 - (CAST(pt AS DOUBLE) / CAST(nt AS DOUBLE))
             |        * (CAST(pt AS DOUBLE) / CAST(nt AS DOUBLE))
             |       - (1.0 - CAST(pt AS DOUBLE) / CAST(nt AS DOUBLE))
             |        * (1.0 - CAST(pt AS DOUBLE) / CAST(nt AS DOUBLE)))
             |      - (CAST(nl AS DOUBLE) / CAST(nt AS DOUBLE))
             |        * (1.0 - (CAST(pl AS DOUBLE) / CAST(nl AS DOUBLE))
             |          * (CAST(pl AS DOUBLE) / CAST(nl AS DOUBLE))
             |         - (1.0 - CAST(pl AS DOUBLE) / CAST(nl AS DOUBLE))
             |          * (1.0 - CAST(pl AS DOUBLE) / CAST(nl AS DOUBLE)))
             |      - (CAST(nt - nl AS DOUBLE) / CAST(nt AS DOUBLE))
             |        * (1.0 - (CAST(pt - pl AS DOUBLE) / CAST(nt - nl AS DOUBLE))
             |          * (CAST(pt - pl AS DOUBLE) / CAST(nt - nl AS DOUBLE))
             |         - (1.0 - CAST(pt - pl AS DOUBLE) / CAST(nt - nl AS DOUBLE))
             |          * (1.0 - CAST(pt - pl AS DOUBLE) / CAST(nt - nl AS DOUBLE))),
             |      6) AS gain_r6
             |  FROM cw WHERE nl < nt),
             |r AS (SELECT *, row_number() OVER (PARTITION BY feat
             |    ORDER BY gain_r6 DESC, x) AS rn FROM cand)
             |SELECT feat AS feature, x AS split_value,
             |  CAST(nl AS BIGINT) AS n_left, CAST(pl AS BIGINT) AS pos_left,
             |  CAST(nt AS BIGINT) AS n_total, CAST(pt AS BIGINT) AS pos_total,
             |  gain_r6
             |FROM r WHERE rn = 1 ORDER BY feature""".stripMargin)),

    // ---- q377: BOOSTED REGRESSION STUMPS — four rounds fitting
    //      lineitem price (cents) from quantity/discount/tax; the
    //      model trace (split, leaves, gain, post-round RMSE) per
    //      round. The oracle unrolls all four rounds: candidate
    //      windows, the rounded-6 global argmax, integer leaf
    //      rounding, and the score update. ----
    "q377_boosted_stumps" -> Q(
      (s, d) => boostedStumps(
        Tables.lineitem(s, d).select(
          col("l_quantity").cast("long").as("quantity"),
          round(col("l_discount") * 100, 0).cast("long").as("discount_c"),
          round(col("l_tax") * 100, 0).cast("long").as("tax_c"),
          round(col("l_extendedprice") * 100, 0).cast("long").as("ym")),
        Seq("quantity", "discount_c", "tax_c"), "ym", rounds = 4),
      Some {
        def round(m: Int): String = {
          val p = s"s${m - 1}"
          s"""lg$m AS (SELECT 'quantity' AS feat, quantity AS x, ym - f AS r FROM $p
             |  UNION ALL SELECT 'discount_c', discount_c, ym - f FROM $p
             |  UNION ALL SELECT 'tax_c', tax_c, ym - f FROM $p),
             |pc$m AS (SELECT feat, x, count(*) AS n, sum(r) AS sr
             |  FROM lg$m GROUP BY feat, x),
             |cd$m AS (SELECT feat, x,
             |    sum(n) OVER (PARTITION BY feat ORDER BY x
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS nl,
             |    sum(sr) OVER (PARTITION BY feat ORDER BY x
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sl,
             |    sum(n) OVER (PARTITION BY feat) AS nt,
             |    sum(sr) OVER (PARTITION BY feat) AS st
             |  FROM pc$m),
             |gn$m AS (SELECT feat, x, nl, sl, nt - nl AS nr, st - sl AS sr2,
             |    round((CAST(sl AS DOUBLE) * CAST(sl AS DOUBLE))
             |        / CAST(nl AS DOUBLE)
             |      + (CAST(st - sl AS DOUBLE) * CAST(st - sl AS DOUBLE))
             |        / CAST(nt - nl AS DOUBLE)
             |      - (CAST(st AS DOUBLE) * CAST(st AS DOUBLE))
             |        / CAST(nt AS DOUBLE), 6) AS gain_r6
             |  FROM cd$m WHERE nl < nt),
             |b$m AS MATERIALIZED (SELECT feat, x, nl, gain_r6,
             |    CAST(round(CAST(sl AS DOUBLE) / CAST(nl AS DOUBLE), 0)
             |      AS BIGINT) AS wl,
             |    CAST(round(CAST(sr2 AS DOUBLE) / CAST(nr AS DOUBLE), 0)
             |      AS BIGINT) AS wr
             |  FROM (SELECT *, row_number() OVER (
             |      ORDER BY gain_r6 DESC, feat, x) AS rn FROM gn$m)
             |  WHERE rn = 1),
             |s$m AS MATERIALIZED (SELECT quantity, discount_c, tax_c, ym,
             |    f + CASE
             |      WHEN (SELECT feat FROM b$m) = 'quantity' THEN
             |        CASE WHEN quantity <= (SELECT x FROM b$m)
             |          THEN (SELECT wl FROM b$m) ELSE (SELECT wr FROM b$m) END
             |      WHEN (SELECT feat FROM b$m) = 'discount_c' THEN
             |        CASE WHEN discount_c <= (SELECT x FROM b$m)
             |          THEN (SELECT wl FROM b$m) ELSE (SELECT wr FROM b$m) END
             |      ELSE
             |        CASE WHEN tax_c <= (SELECT x FROM b$m)
             |          THEN (SELECT wl FROM b$m) ELSE (SELECT wr FROM b$m) END
             |      END AS f FROM $p),
             |e$m AS (SELECT round(sqrt(CAST(sum(CAST(ym - f AS HUGEINT)
             |    * (ym - f)) AS DOUBLE) / CAST(count(*) AS DOUBLE)), 6)
             |  AS rmse FROM s$m)""".stripMargin
        }
        s"""WITH t0 AS MATERIALIZED (SELECT
           |    CAST(l_quantity AS BIGINT) AS quantity,
           |    CAST(round(l_discount * 100) AS BIGINT) AS discount_c,
           |    CAST(round(l_tax * 100) AS BIGINT) AS tax_c,
           |    CAST(round(l_extendedprice * 100) AS BIGINT) AS ym
           |  FROM lineitem),
           |s0 AS MATERIALIZED (SELECT t.*,
           |    (SELECT CAST(round(avg(ym), 0) AS BIGINT) FROM t0) AS f
           |  FROM t0 t),
           |${(1 to 4).map(round).mkString(",\n")}
           |SELECT * FROM (
           |  SELECT 1 AS round, feat AS feature, x AS split_value,
           |    CAST(nl AS BIGINT) AS n_left, wl, wr, gain_r6,
           |    (SELECT rmse FROM e1) AS rmse_after_r6 FROM b1
           |  UNION ALL SELECT 2, feat, x, CAST(nl AS BIGINT), wl, wr,
           |    gain_r6, (SELECT rmse FROM e2) FROM b2
           |  UNION ALL SELECT 3, feat, x, CAST(nl AS BIGINT), wl, wr,
           |    gain_r6, (SELECT rmse FROM e3) FROM b3
           |  UNION ALL SELECT 4, feat, x, CAST(nl AS BIGINT), wl, wr,
           |    gain_r6, (SELECT rmse FROM e4) FROM b4)
           |ORDER BY round""".stripMargin
      }),
  )
}
