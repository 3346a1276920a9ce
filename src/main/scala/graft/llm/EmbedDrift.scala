package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.rel.RelQueries.Q
import graft.rel.Tables

/** EMBEDDING-DISTRIBUTION DRIFT between two corpus snapshots — the
  * q392 monitoring idea lifted to vector columns: per-dimension
  * centroid shift between a reference and a current window,
  * summarized as the centroid L2 displacement plus the single most
  * drifted dimension. The retraining tripwire for any pipeline whose
  * upstream embedding model can silently change under it.
  *
  * Determinism (floats never accumulate): every component quantizes
  * to integer MILLI at read time, per-dimension sums are exact
  * integers from ONE conditional hash aggregation (both windows in
  * one pass, keyed by the DIMENSION — a bounded key space, so the
  * shuffle is dim-sized regardless of corpus size); each centroid
  * mean quantizes to integer micro via one fixed IEEE chain; the L2
  * fold and the argmax are exact integer arithmetic.
  *
  * Output (1 row): (n_ref, n_cur, dim, centroid_l2_r6, top_dim,
  * top_shift_micro).
  */
object EmbedDrift {

  private val dec38 =
    org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)

  def embeddingDrift(df: DataFrame, isRef: org.apache.spark.sql.Column,
      vec: String = "embedding"): DataFrame = {
    val rows = df.select(when(isRef, 1L).otherwise(0L).as("r"),
        posexplode(col(vec)).as(Seq("pos", "v")))
      .select(col("r"), col("pos").cast("long").as("pos"),
        round(col("v").cast("double") * 1000, 0).cast("long").as("vm"))
    val nref = df.filter(isRef).count()
    val ncur = df.count() - nref
    require(nref > 0 && ncur > 0,
      "embeddingDrift: both windows must be non-empty")
    val per = rows.groupBy("pos")
      .agg(sum(when(col("r") === 1L, col("vm")).otherwise(0L)).as("sa"),
        sum(when(col("r") === 0L, col("vm")).otherwise(0L)).as("sb"))
      .select(col("pos"),
        (round(col("sa").cast("double") * 1000
          / lit(nref.toDouble), 0).cast("long")
          - round(col("sb").cast("double") * 1000
            / lit(ncur.toDouble), 0).cast("long")).as("d"))
    per
      .agg(count(lit(1)).as("dim"),
        sum((col("d") * col("d")).cast(dec38)).as("l2sq"),
        min(struct((-abs(col("d"))).as("nad"), col("pos"),
          col("d"))).as("m"))
      .select(lit(nref).as("n_ref"), lit(ncur).as("n_cur"), col("dim"),
        round(sqrt(col("l2sq").cast("double")) / lit(1e6), 6)
          .as("centroid_l2_r6"),
        col("m.pos").as("top_dim"), col("m.d").as("top_shift_micro"))
  }

  val all: ListMap[String, Q] = ListMap(
    // ---- q395: EMBEDDING DRIFT — does the even-id half of the
    //      embedding table sit where the odd-id half does? The oracle
    //      replays the milli quantization, the one-pass dimension
    //      sums, the micro centroid means, and the L2/argmax folds. ----
    "q395_embedding_drift" -> Q(
      (s, d) => embeddingDrift(Tables.embeddings(s, d),
        col("vec_id") % 2 === 0),
      Some("""WITH rows_ AS (SELECT
             |    CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END AS r,
             |    unnest(range(len(embedding))) AS pos,
             |    unnest(list_transform(embedding,
             |      x -> CAST(round(CAST(x AS DOUBLE) * 1000, 0)
             |        AS BIGINT))) AS vm
             |  FROM embeddings),
             |nn AS (SELECT
             |    sum(CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END) AS nref,
             |    sum(CASE WHEN vec_id % 2 = 0 THEN 0 ELSE 1 END) AS ncur
             |  FROM embeddings),
             |per AS (SELECT pos,
             |    CAST(round(CAST(sum(CASE WHEN r = 1 THEN vm ELSE 0 END)
             |        AS DOUBLE) * 1000 / CAST(nn.nref AS DOUBLE), 0)
             |      AS BIGINT)
             |    - CAST(round(CAST(sum(CASE WHEN r = 0 THEN vm ELSE 0 END)
             |        AS DOUBLE) * 1000 / CAST(nn.ncur AS DOUBLE), 0)
             |      AS BIGINT) AS d
             |  FROM rows_, nn GROUP BY pos, nn.nref, nn.ncur),
             |ag AS (SELECT count(*) AS dim,
             |    sum(CAST(d AS HUGEINT) * d) AS l2sq FROM per),
             |tp AS (SELECT pos, d FROM per
             |  ORDER BY abs(d) DESC, pos LIMIT 1)
             |SELECT CAST(nn.nref AS BIGINT) AS n_ref,
             |  CAST(nn.ncur AS BIGINT) AS n_cur,
             |  CAST(ag.dim AS BIGINT) AS dim,
             |  round(sqrt(CAST(ag.l2sq AS DOUBLE)) / 1e6, 6)
             |    AS centroid_l2_r6,
             |  tp.pos AS top_dim, tp.d AS top_shift_micro
             |FROM ag, tp, nn""".stripMargin)))
}
