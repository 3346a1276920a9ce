package graft.rel

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.rel.RelQueries.Q

/** FELLEGI–SUNTER probabilistic record linkage (Fellegi & Sunter
  * 1969) — the principled scoring layer on top of the repo's blocking
  * stack (LSH q35, prefix-filter q182, sorted-neighborhood q240):
  * each comparison field contributes log₂(m/u) when it agrees and
  * log₂((1−m)/(1−u)) when it disagrees (m = P(agree | same entity),
  * u = P(agree | different entities)); the summed weight classifies
  * the pair match / possible / non-match against two thresholds.
  * m/u are inputs here — estimate them offline (EM over the candidate
  * set is the classical route) and pass them in.
  *
  * Exactness discipline: the per-field weights are pre-rounded to
  * integer MILLI-bits on the driver, so the pair score is an exact
  * long sum — no float accumulation order to disagree on, and the
  * oracle embeds the identical literals. Scale: scoring is a narrow
  * map over the (already blocked, linear-volume) candidate pairs; no
  * shuffle beyond the blocking join that produced them.
  */
object Linkage {

  /** One comparison field: `agree` is a boolean column over the pair
    * relation; m/u as above, 0 < u < m < 1 (a field whose agreement
    * is likelier among NON-matches carries no linkage signal — flip
    * or drop it).
    */
  final case class FieldCompare(name: String, agree: Column, m: Double, u: Double) {
    require(m > u && u > 0 && m < 1,
      s"need 0 < u < m < 1 for field $name: m=$m u=$u")
    /** agreement weight, milli-bits */
    val agreeMilli: Long = math.round(math.log(m / u) / math.log(2) * 1000)
    /** disagreement weight, milli-bits */
    val disagreeMilli: Long =
      math.round(math.log((1 - m) / (1 - u)) / math.log(2) * 1000)
  }

  /** Adds `weight_milli` (exact long sum of the per-field milli-bit
    * weights) and `link_class` ('match' ≥ upperMilli, 'nonmatch' ≤
    * lowerMilli, 'possible' between) to the candidate-pair relation.
    */
  def fellegiSunterScore(pairs: DataFrame, fields: Seq[FieldCompare],
      upperMilli: Long, lowerMilli: Long): DataFrame = {
    require(fields.nonEmpty, "need at least one comparison field")
    require(upperMilli > lowerMilli, "upper threshold must exceed lower")
    val w = fields.map(f =>
        when(f.agree, lit(f.agreeMilli)).otherwise(lit(f.disagreeMilli)))
      .reduce(_ + _)
    pairs.withColumn("weight_milli", w)
      .withColumn("link_class",
        when(col("weight_milli") >= upperMilli, "match")
          .when(col("weight_milli") <= lowerMilli, "nonmatch")
          .otherwise("possible"))
  }

  /** q243: block documents with sorted-neighborhood (the q240 pipeline,
    * window 10 on the 32-char prefix) and score each candidate pair on
    * three fields — language, source, and the 100-char length band —
    * with fixed m/u. The oracle replays blocking, field agreement, and
    * the milli-bit literals (interpolated from the SAME Scala
    * constants, so the two sides cannot drift) end to end in SQL.
    */
  val all: ListMap[String, Q] = {
    // the three comparison fields' m/u — shared by entry AND oracle
    val fLang = FieldCompare("lang", col("lang_a") === col("lang_b"), 0.95, 0.20)
    val fSrc = FieldCompare("source", col("source_a") === col("source_b"), 0.90, 0.25)
    val fLen = FieldCompare("len_band", col("band_a") === col("band_b"), 0.80, 0.05)
    val upperM = 4000L; val lowerM = 0L
    ListMap(
      "q243_fellegi_sunter" -> Q(
        (s, d) => {
          val docs = Tables.documents(s, d).select(col("doc_id"),
            lower(substring(col("text"), 1, 32)).as("key"),
            col("lang"), col("source"),
            floor(col("n_chars") / 100).cast("long").as("band"))
          val pairs = graft.llm.SortedNeighborhood.neighborhoodPairs(
            docs, Seq(col("key"), col("doc_id")), "doc_id", w = 10)
          val sides = pairs
            .join(docs.select(col("doc_id").as("id_a"), col("lang").as("lang_a"),
              col("source").as("source_a"), col("band").as("band_a")), "id_a")
            .join(docs.select(col("doc_id").as("id_b"), col("lang").as("lang_b"),
              col("source").as("source_b"), col("band").as("band_b")), "id_b")
          fellegiSunterScore(sides, Seq(fLang, fSrc, fLen), upperM, lowerM)
            .select(col("id_a").cast("long"), col("id_b").cast("long"),
              col("weight_milli"), col("link_class"))
            .orderBy("id_a", "id_b")
        },
        Some(s"""WITH k AS (
               |  SELECT doc_id, lower(substr(text, 1, 32)) AS key,
               |    lang, source,
               |    CAST(floor(n_chars / 100) AS BIGINT) AS band
               |  FROM documents),
               |r AS (SELECT doc_id, lang, source, band,
               |    row_number() OVER (ORDER BY key, doc_id) AS rk
               |  FROM k),
               |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               |    (CASE WHEN a.lang = b.lang
               |      THEN ${fLang.agreeMilli} ELSE ${fLang.disagreeMilli} END)
               |    + (CASE WHEN a.source = b.source
               |      THEN ${fSrc.agreeMilli} ELSE ${fSrc.disagreeMilli} END)
               |    + (CASE WHEN a.band = b.band
               |      THEN ${fLen.agreeMilli} ELSE ${fLen.disagreeMilli} END)
               |      AS weight_milli
               |  FROM r a JOIN r b
               |    ON b.rk > a.rk AND b.rk - a.rk < 10)
               |SELECT CAST(id_a AS BIGINT) AS id_a,
               |  CAST(id_b AS BIGINT) AS id_b,
               |  CAST(weight_milli AS BIGINT) AS weight_milli,
               |  CASE WHEN weight_milli >= $upperM THEN 'match'
               |    WHEN weight_milli <= $lowerM THEN 'nonmatch'
               |    ELSE 'possible' END AS link_class
               |FROM p ORDER BY id_a, id_b""".stripMargin))
    )
  }
}
