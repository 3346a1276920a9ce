package graft

import org.apache.spark.sql.functions._
import graft.llm.NaiveBayes
import graft.rel.Logistic

/** Source valuation (llm/NaiveBayes.sourceValuation) and uncertainty
  * batch (rel/Logistic.uncertaintyBatch): composition pins against
  * hand-assembled leave-out training / brute top-k, accounting, and
  * determinism.
  */
class ValuationSpec extends SparkSpec {

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def bucketOf(source: String, salt: String, n: Int): Long =
    java.lang.Long.parseLong(md5Hex(s"$salt-$source").take(8), 16) % n

  private def docs = {
    val s = spark
    import s.implicits._
    // lang balanced WITHIN each source — otherwise a leave-out bucket
    // can exclude a whole class from training (which the operator
    // correctly reports as zero generalization)
    (1 to 24).map { k =>
      val src = s"s${k % 6}"
      val lang = if ((k / 6) % 2 == 0) "x" else "y"
      val text = if (lang == "x") "aa aa bb aa" else "cc cc bb cc"
      (k.toLong, text, lang, src)
    }.toDF("doc_id", "text", "lang", "source")
  }

  test("valuation accounting: buckets partition, sizes add up") {
    val rows = NaiveBayes.sourceValuation(spark, docs, minDf = 2,
      buckets = 2, salt = "t").collect()
    assert(rows.map(_.getLong(2)).sum == 24L,
      "test buckets must cover the corpus")
    rows.foreach(r => assert(r.getLong(1) + r.getLong(2) == 24L, s"$r"))
  }

  test("composition pin: one bucket equals leave-out train + score") {
    val rows = NaiveBayes.sourceValuation(spark, docs, minDf = 2,
      buckets = 2, salt = "t").collect()
      .map(r => r.getLong(0) -> r).toMap
    val b0sources = (0 to 5).map(i => s"s$i")
      .filter(bucketOf(_, "t", 2) == 0L).toSet
    val train = docs.filter(!col("source").isin(b0sources.toSeq: _*))
    val test = docs.filter(col("source").isin(b0sources.toSeq: _*))
    val model = NaiveBayes.naiveBayesModel(spark, train, minDf = 2)
    val correct = NaiveBayes.naiveBayesScore(test, model)
      .filter(col("pred") === col("truth")).count()
    assert(rows(0L).getLong(3) == correct, s"${rows(0L)} vs $correct")
  }

  test("the separable corpus generalizes across buckets") {
    val rows = NaiveBayes.sourceValuation(spark, docs, minDf = 2,
      buckets = 2, salt = "t").collect()
    rows.filter(_.getLong(2) > 0)
      .foreach(r => assert(r.getDouble(4) == 1.0, s"$r"))
  }

  test("uncertainty batch equals the brute (distance, id) top-k") {
    val s = spark
    import s.implicits._
    val units = (1L to 50L).map(k =>
      (k, if (k > 25) 1L else 0L, 0.002 * k)).toDF("user_id", "y", "x")
    val got = Logistic.uncertaintyBatch(units, iters = 4, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val model = Logistic.logisticModel(units, iters = 4)
    val brute = Logistic.scoreLogistic(
      units.select(col("user_id"), col("x")), model)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2),
        math.abs(r.getLong(2) - 500000L)))
      .sortBy(t => (t._3, t._1)).take(10)
    assert(got.toSeq == brute.toSeq, s"${got.toSeq} vs ${brute.toSeq}")
  }
}
