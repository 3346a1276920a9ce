package graft

import graft.llm.NegSample

/** Negative-sampling draws (llm/NegSample.scala): the whole pipeline
  * replayed by hand in plain Scala (weights, intervals, md5 draws),
  * the count^0.75 tilt, and salt-keyed reproducibility.
  */
class NegSampleSpec extends SparkSpec {

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def docs(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  test("draws replay the hand-computed interval lookup") {
    // counts: aa=4, bb=2 (cc below the floor)
    val d = Seq(1L -> "aa aa bb cc", 2L -> "aa aa bb")
    val got = NegSample.negativeSamples(spark, docs(d: _*), k = 4,
      minCount = 2L, salt = "t", top = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // hand replay
    val w = Map("aa" -> math.round(math.pow(4, 0.75) * 1000),
      "bb" -> math.round(math.pow(2, 0.75) * 1000))
    val loHi = Map("aa" -> (0L, w("aa")),
      "bb" -> (w("aa"), w("aa") + w("bb")))
    val wt = w("aa") + w("bb")
    val want = (for (did <- Seq(1L, 2L); slot <- 1 to 4) yield {
      val u = java.lang.Long.parseLong(
        md5Hex(s"t-$did-$slot").take(12), 16) % wt
      loHi.find { case (_, (lo, hi)) => u >= lo && u < hi }.get._1
    }).groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
    assert(got == want.filter(_._2 > 0), s"got $got want $want")
  }

  test("the smoothed distribution tilts draws toward frequent terms") {
    val d = (1L to 50L).map(i => i -> "hot hot hot hot hot hot rare")
    val got = NegSample.negativeSamples(spark, docs(d: _*), k = 8,
      minCount = 2L, salt = "s", top = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("hot") > got.getOrElse("rare", 0L), s"got $got")
    assert(got.values.sum == 400L, "every draw lands in an interval")
  }

  test("the same salt reproduces the sample bit-for-bit") {
    val d = (1L to 20L).map(i => i -> "x y z x y x")
    val a = NegSample.negativeSamples(spark, docs(d: _*), k = 8,
      minCount = 2L, salt = "r").collect().map(_.toSeq).toSeq
    val b = NegSample.negativeSamples(spark, docs(d: _*), k = 8,
      minCount = 2L, salt = "r").collect().map(_.toSeq).toSeq
    assert(a == b)
  }
}
