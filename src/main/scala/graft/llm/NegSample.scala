package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.rel.RelQueries.Q
import graft.rel.Tables

/** NEGATIVE-SAMPLING DRAWS from the smoothed unigram distribution
  * (Mikolov et al. NeurIPS'13: negatives ∝ count^0.75 — the word2vec
  * noise distribution every contrastive text objective trains
  * against), made REPLAYABLE: each (doc, slot) draw is a salt-keyed
  * md5 integer mapped through the distribution's cumulative-weight
  * table — u ∈ [0, W) lands in the token whose [lo, hi) interval
  * covers it. Changing the salt redraws the noise; keeping it
  * reproduces the sample bit-for-bit on both engines (the q254/q383
  * portable-draw idiom — `rand()` can never give a distributed plan
  * this property).
  *
  * Determinism: smoothed weights quantize to integer milli
  * (round(c^0.75·1000) — one pow per vocab row, quantized like every
  * house transcendental); the cumulative table rides the
  * ORDER-PINNED window over the minCount-floored vocabulary; draws
  * are exact integer hash arithmetic; the interval lookup is an
  * exact integer containment.
  *
  * Scale shape: the cumulative table is VOCABULARY-bounded (the df
  * floor is the lever) and broadcasts; each draw is one map-side
  * hash + one broadcast interval probe — corpus-sized draw streams
  * never shuffle on anything but the final count key.
  */
object NegSample {

  /** `k` draws per document; output (term, n_drawn) for the top
    * `top` drawn terms (ties → term asc).
    */
  def negativeSamples(s: SparkSession, docs: DataFrame, k: Int,
      minCount: Long, salt: String, top: Int = 25,
      id: String = "doc_id", text: String = "text"): DataFrame = {
    import s.implicits._
    require(k >= 1 && k <= 64, s"1 <= k <= 64: $k")
    require(top >= 1, s"top must be >= 1: $top")
    val toks = docs.select(col(text)).as[String]
      .flatMap(t => SketchOps.tokensOf(t).filter(_.nonEmpty)).toDF("tok")
    val uc = toks.groupBy("tok").agg(count(lit(1)).as("c1"))
      .filter(col("c1") >= minCount)
    val wv = uc.select(col("tok"),
      round(pow(col("c1").cast("double"), 0.75) * 1000, 0).cast("long")
        .as("w"))
    val wCum = Window.orderBy("tok").rowsBetween(Long.MinValue, 0)
    val cum = wv
      .withColumn("hi", sum(col("w")).over(wCum))
      .withColumn("lo", col("hi") - col("w"))
      .select(col("tok"), col("lo"), col("hi"))
      .localCheckpoint(true)
    val tot = cum.agg(max(col("hi")).as("wt"))
    val draws = docs.select(col(id).cast("long").as("did"))
      .select(col("did"), explode(sequence(lit(1), lit(k))).as("slot"))
      .crossJoin(broadcast(tot))
      // column API, not an expr() splice: salt is caller-supplied — a
      // quote/backslash would break the generated expression at plan time
      .select(conv(substring(md5(concat(lit(s"$salt-"),
          col("did").cast("string"), lit("-"),
          col("slot").cast("string"))), 1, 12), 16, 10)
        .cast("long").mod(col("wt")).as("u"))
    draws.join(broadcast(cum),
        col("u") >= col("lo") && col("u") < col("hi"))
      .groupBy("tok").agg(count(lit(1)).as("n_drawn"))
      .select(col("tok").as("term"), col("n_drawn"))
      .orderBy(desc("n_drawn"), col("term"))
      .limit(top)
  }

  val all: ListMap[String, Q] = ListMap(
    // ---- q386: NEGATIVE SAMPLES — 8 smoothed-unigram draws per
    //      document over the df≥10 vocabulary, top-25 drawn terms.
    //      The oracle replays the milli-quantized pow(0.75) weights,
    //      the order-pinned cumulative table, and every md5 draw. ----
    "q386_negative_samples" -> Q(
      (s, d) => negativeSamples(s, Tables.documents(s, d), k = 8,
        minCount = 10L, salt = "ns386"),
      Some("""WITH toks AS (SELECT unnest(list_filter(
             |    regexp_split_to_array(trim(lower(text)), '\s+'),
             |    x -> len(x) > 0)) AS tok FROM documents),
             |uc AS (SELECT tok, count(*) AS c1 FROM toks GROUP BY tok
             |  HAVING count(*) >= 10),
             |wv AS (SELECT tok,
             |    CAST(round(pow(CAST(c1 AS DOUBLE), 0.75) * 1000, 0)
             |      AS BIGINT) AS w
             |  FROM uc),
             |cum AS (SELECT tok,
             |    sum(w) OVER (ORDER BY tok ROWS BETWEEN UNBOUNDED
             |      PRECEDING AND CURRENT ROW) AS hi,
             |    sum(w) OVER (ORDER BY tok ROWS BETWEEN UNBOUNDED
             |      PRECEDING AND CURRENT ROW) - w AS lo
             |  FROM wv),
             |tot AS (SELECT max(hi) AS wt FROM cum),
             |draws AS (SELECT ('0x' || substr(md5('ns386-' ||
             |      CAST(doc_id AS VARCHAR) || '-' ||
             |      CAST(slot AS VARCHAR)), 1, 12))::BIGINT
             |      % (SELECT wt FROM tot) AS u
             |  FROM documents
             |  CROSS JOIN (SELECT unnest(range(1, 9)) AS slot))
             |SELECT c.tok AS term, count(*) AS n_drawn
             |FROM draws d JOIN cum c ON d.u >= c.lo AND d.u < c.hi
             |GROUP BY c.tok
             |ORDER BY n_drawn DESC, term LIMIT 25""".stripMargin)))
}
