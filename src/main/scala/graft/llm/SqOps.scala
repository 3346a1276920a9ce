package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.rel.RelQueries.Q
import graft.rel.Tables

/** SQ8 SCALAR QUANTIZATION ANN — the fourth compression point on the
  * repo's quantization ladder (flat float32 q37 → SQ8 → PQ q55 → OPQ
  * q69 → IVFADC q56/q78): each dimension is independently mapped to
  * one byte on a per-dimension [min, max] ladder learned from the
  * corpus (256 levels), for an exact 4× memory cut with NO codebook
  * training, no rotation, and near-lossless recall — the
  * production-standard first step before PQ when memory, not compute,
  * is the binding constraint. Scoring is ASYMMETRIC (full-precision
  * query against dequantized candidates), like ADC: quantization
  * error enters once, not twice.
  *
  * Everything is declarative and codegen-friendly: encode and
  * dequantize are `transform` lambdas over the vector with the
  * per-dimension ladders inlined as array literals (dimension-sized,
  * driver-broadcast by the literal itself); scoring reuses the
  * codegen'd vec_cosine kernel; top-k is the bounded-heap aggregator.
  * The only driver state is the 2·d ladder — at a billion vectors the
  * scan is embarrassingly parallel over byte codes.
  *
  * Determinism: min/max are exact float aggregates, the ladder
  * arithmetic is a fixed IEEE chain, and the TopK order is
  * (score desc, id) — so the dump VALUES-pins like its q55 siblings.
  */
object SqOps {

  /** per-dimension (min, step) ladder; step = (max−min)/255, 0 for
    * constant dimensions (they encode as code 0 → dequantize to min)
    */
  private[graft] def ladder(emb: DataFrame, vec: String)
      : (Array[Double], Array[Double]) = {
    val rows = emb.select(posexplode(col(vec)).as(Seq("pos", "x")))
      .groupBy("pos").agg(min("x").as("mn"), max("x").as("mx"))
      .orderBy("pos").collect()
    val mn = rows.map(_.getAs[Float]("mn").toDouble)
    val mx = rows.map(_.getAs[Float]("mx").toDouble)
    (mn, mn.indices.map(i => (mx(i) - mn(i)) / 255.0).toArray)
  }

  private def litArr(a: Array[Double]): Column = array(a.map(lit): _*)

  /** encode to byte codes 0..255 on the ladder */
  private[graft] def encode(vec: Column, mn: Array[Double], step: Array[Double])
      : Column =
    transform(vec, (x, i) => {
      val s = element_at(litArr(step), i + 1)
      val m = element_at(litArr(mn), i + 1)
      when(s === 0.0, lit(0))
        .otherwise(least(greatest(
          round((x - m) / s, 0), lit(0.0)), lit(255.0)).cast("int"))
    })

  /** dequantize codes back to float vectors */
  private[graft] def dequantize(codes: Column, mn: Array[Double],
      step: Array[Double]): Column =
    transform(codes, (c, i) =>
      (element_at(litArr(mn), i + 1) +
        c.cast("double") * element_at(litArr(step), i + 1)).cast("float"))

  /** Full-scan SQ8 top-k: encode the corpus once, score every query
    * against dequantized candidates, keep the per-query top k.
    */
  def sqTopK(s: SparkSession, emb: DataFrame, queries: DataFrame, k: Int)
      : DataFrame = {
    val (mn, step) = ladder(emb, "vec")
    // the ladders are inlined as array LITERALS inside the transform
    // lambdas — ideal at embedding dims (2 constants/dim), but the
    // expression tree grows linearly with d; past ~1k dims switch to a
    // broadcast-variable kernel instead of letting codegen degrade
    require(mn.length <= 1024,
      s"SQ8 literal-ladder path caps at 1024 dims (got ${mn.length}); " +
        "use a broadcast-ladder kernel beyond that")
    val codes = emb.select(col("id"), encode(col("vec"), mn, step).as("codes"))
    val dq = codes.select(col("id"),
      dequantize(col("codes"), mn, step).as("dqvec"))
    val scored = broadcast(queries).join(dq, col("id") =!= col("qid"))
      .withColumn("cos",
        graft.functions.VecFunctions.vecCosine(s, col("qvec"), col("dqvec")))
    graft.functions.TopK.perKeyTopK(scored, k, "qid", "id", "cos")
  }

  private def sqTop5(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val n = e.count()
    val q = e.filter(col("id") < 8)
      .select(col("id").as("qid"), col("vec").as("qvec"))
    sqTopK(s, e, q, k = 5)
      .select(col("qid"), col("rn"), col("id").as("nn_id"), col("cos"),
        lit(n - 1).as("n_candidates"))
  }

  val all: ListMap[String, Q] = ListMap(
    // ---- SQ8 ANN: byte codes on per-dim ladders, full asymmetric scan ----
    "q252_sq8_ann" -> Q(
      (s, d) => AnnPin.pinnable(s, d, sqTop5(s, d), "q252_sq8_ann"),
      Some("""SELECT qid, rn, nn_id, cos_milli, n_candidates FROM (VALUES
             |  (0, 1, 365, 370, 499), (0, 2, 334, 363, 499),
             |  (0, 3, 387, 331, 499), (0, 4, 423, 298, 499),
             |  (0, 5, 73, 295, 499), (1, 1, 386, 371, 499),
             |  (1, 2, 27, 347, 499), (1, 3, 407, 327, 499),
             |  (1, 4, 195, 321, 499), (1, 5, 64, 316, 499),
             |  (2, 1, 117, 318, 499), (2, 2, 450, 266, 499),
             |  (2, 3, 188, 264, 499), (2, 4, 145, 264, 499),
             |  (2, 5, 320, 254, 499), (3, 1, 130, 399, 499),
             |  (3, 2, 149, 329, 499), (3, 3, 343, 308, 499),
             |  (3, 4, 174, 304, 499), (3, 5, 231, 297, 499),
             |  (4, 1, 114, 398, 499), (4, 2, 496, 342, 499),
             |  (4, 3, 408, 321, 499), (4, 4, 482, 314, 499),
             |  (4, 5, 280, 281, 499), (5, 1, 404, 329, 499),
             |  (5, 2, 419, 317, 499), (5, 3, 33, 311, 499),
             |  (5, 4, 157, 310, 499), (5, 5, 359, 305, 499),
             |  (6, 1, 350, 323, 499), (6, 2, 430, 323, 499),
             |  (6, 3, 145, 298, 499), (6, 4, 437, 282, 499),
             |  (6, 5, 386, 275, 499), (7, 1, 340, 492, 499),
             |  (7, 2, 425, 408, 499), (7, 3, 209, 394, 499),
             |  (7, 4, 334, 356, 499), (7, 5, 381, 344, 499))
             |  AS t(qid, rn, nn_id, cos_milli, n_candidates)
             |ORDER BY qid, rn""".stripMargin)),

    // ---- recall vs the exact top-5 (same ground truth as q38/q55) ----
    "q252_sq8_recall" -> Q(
      (s, d) => {
        val approx = sqTop5(s, d).select(col("qid"), col("nn_id").as("vec_id"))
        SketchOps.exactTop5(s, d)
          .join(approx.withColumn("hit", lit(1)), Seq("qid", "vec_id"), "left")
          .groupBy("qid")
          .agg(sum(coalesce(col("hit"), lit(0))).as("n_hits"))
          .select(col("qid"), col("n_hits"),
            (col("n_hits").cast("double") / 5).as("recall_at_5"))
          .orderBy("qid")
      },
      Some("""SELECT qid, n_hits, CAST(recall AS DOUBLE) AS recall_at_5
             |FROM (VALUES (0, 5, 1.0), (1, 5, 1.0), (2, 5, 1.0),
             |  (3, 5, 1.0), (4, 5, 1.0), (5, 5, 1.0), (6, 5, 1.0),
             |  (7, 5, 1.0)) AS t(qid, n_hits, recall)
             |ORDER BY qid""".stripMargin))
  )
}
