package graft.rel

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.rel.RelQueries.Q

/** FIXED-n STRATIFIED SAMPLING, deterministic and ENGINE-PORTABLE:
  * every stratum contributes exactly min(n, |stratum|) rows, chosen
  * by ranking on md5(salt ‖ id) — a keyed pseudo-random order both
  * Spark and DuckDB compute identically (hex-rendered MD5 of the same
  * string), so the *sample itself* sits under the hash gate, not just
  * its size. Changing the salt redraws the sample; keeping it
  * reproduces it bit-for-bit on any engine — the property training
  * pipelines need for eval carve-outs and debugging slices.
  *
  * Scale: ONE per-stratum window (partitioned — strata are
  * entity-bounded; never a global sort). Contrast q107's A-ES
  * weighted sampling (weighted, rate-based) and q87's corpus shuffle
  * (total order): this is the exact-quota per-group primitive.
  */
object Sampling {

  /** min(n, |stratum|) rows per stratum; adds `rn` (1-based rank in
    * the stratum's draw order). `id` must be unique (the tie-break
    * that makes the order total).
    */
  def stratifiedFixedN(df: DataFrame, stratum: Column, id: Column, n: Int,
      salt: String): DataFrame = {
    require(n >= 1, s"sample size must be >= 1: $n")
    val key = md5(concat_ws("-", lit(salt), id.cast("string")))
    val w = Window.partitionBy(stratum).orderBy(key, id)
    df.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= n)
  }

  val all: ListMap[String, Q] = ListMap(
    // ---- q254: 5 docs per language, salt-keyed draw — the exact
    //      sampled ids hash-compare (portable md5 order), not merely
    //      the per-stratum counts. ----
    "q254_stratified_sample" -> Q(
      (s, d) => stratifiedFixedN(
          Tables.documents(s, d).select(col("doc_id"), col("lang")),
          col("lang"), col("doc_id"), n = 5, salt = "s254")
        .select(col("lang"), col("rn"), col("doc_id").cast("long"))
        .orderBy("lang", "rn"),
      Some("""WITH r AS (
             |  SELECT lang, doc_id,
             |    row_number() OVER (PARTITION BY lang
             |      ORDER BY md5('s254-' || CAST(doc_id AS VARCHAR)),
             |        doc_id) AS rn
             |  FROM documents)
             |SELECT lang, CAST(rn AS BIGINT) AS rn,
             |  CAST(doc_id AS BIGINT) AS doc_id
             |FROM r WHERE rn <= 5
             |ORDER BY lang, rn""".stripMargin))
  )
}
