package graft

import org.apache.spark.sql.functions._
import graft.llm.Curation

/** A-ES weighted sampling ([[graft.llm.Curation.weightedSample]]).
  * Pins: (1) exact parity with a local replay of the key arithmetic
  * (md5-prefix uniform, u^(1/w), round-6, ties to lower id), (2) w ≤ 0
  * rows are excluded, (3) the weighting works — across many strata a
  * heavily-weighted doc wins far more often than a light one.
  */
class WeightedSampleSpec extends SparkSpec {
  import spark.implicits._

  /** the operator's key, replayed with no Spark: 60-bit md5-prefix
    * uniform in (0,1], then round6(u^(1/w))
    */
  private def localKey(id: Long, w: Double): Double = {
    val d = java.security.MessageDigest.getInstance("MD5")
    val hex = d.digest(id.toString.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.substring(0, 15)
    val hv = java.lang.Long.parseLong(hex, 16)
    val u = (hv + 1).toDouble / (1L << 60).toDouble
    math.rint(math.pow(u, 1.0 / w) * 1e6) / 1e6
  }

  test("parity with the local key replay, per-stratum top-k") {
    val rows = (0L until 120L).map { i =>
      (i, s"s${i % 3}", 1.0 + (i % 7).toDouble)
    }
    val df = rows.toDF("doc_id", "source", "w")
    val got = Curation.weightedSample(spark, df, k = 5,
        weight = col("w"), stratum = Some("source"))
      .orderBy("source", "rn")
      .as[(String, Int, Long, Double)].collect().toSeq
    val exp = rows.groupBy(_._2).toSeq.flatMap { case (src, rs) =>
      rs.map { case (i, _, w) => (i, localKey(i, w)) }
        .sortBy { case (i, k) => (-k, i) }.take(5).zipWithIndex
        .map { case ((i, k), r) => (src, r + 1, i, k) }
    }.sortBy { case (src, rn, _, _) => (src, rn) }
    assert(got == exp)
  }

  test("non-positive weights are excluded") {
    val df = Seq((1L, 0.0), (2L, -3.0), (3L, 2.0)).toDF("doc_id", "w")
    val got = Curation.weightedSample(spark, df, k = 10, weight = col("w"))
      .select("doc_id").as[Long].collect().toSeq
    assert(got == Seq(3L))
  }

  test("heavy weights win more often than light ones") {
    // 200 strata of 10 docs each; doc j in a stratum has weight 100 for
    // j=0, 1 otherwise. P(heavy wins a stratum) ~ 100/109; a uniform
    // sampler would give 1/10.
    val rows = for (st <- 0 until 200; j <- 0 until 10)
      yield (st * 100L + j, s"g$st", if (j == 0) 100.0 else 1.0)
    val df = rows.toDF("doc_id", "source", "w")
    val winners = Curation.weightedSample(spark, df, k = 1,
        weight = col("w"), stratum = Some("source"))
      .filter(col("rn") === 1).select("doc_id").as[Long].collect()
    val heavyWins = winners.count(_ % 100 == 0)
    assert(heavyWins > 150, s"heavy doc won only $heavyWins/200 strata")
  }
}
