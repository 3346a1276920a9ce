package graft

import graft.rel.Profile

/** Corpus training-readiness report (rel/Profile.corpusReport):
  * hand-checked counts, dup exposure, entropy of a known mix, PII
  * detection, and determinism.
  */
class CorpusReportSpec extends SparkSpec {

  private def docs = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "one two three", "en"),
      (2L, "one two three", "en"), // exact duplicate of 1
      (3L, "vier funf", "de"),
      (4L, "contact me a.b@mail.com now", "en")
    ).toDF("doc_id", "text", "lang")
  }

  test("hand-checked report row") {
    val r = Profile.corpusReport(spark, docs).collect()(0)
    assert(r.getLong(0) == 4L, s"n_docs: $r")
    assert(r.getLong(1) == 3 + 3 + 2 + 4, s"n_tokens: $r")
    assert(r.getLong(2) == 2L, s"dup docs (both copies count): $r")
    assert(r.getLong(3) == 2L && r.getString(4) == "en", s"langs: $r")
    assert(r.getDouble(5) == 0.75, s"top share: $r")
    // entropy of (3/4, 1/4)
    val want = BigDecimal(-(0.75 * math.log(0.75))
      - (0.25 * math.log(0.25)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(6) == want, s"entropy: $r")
    assert(r.getLong(8) == 1L, s"pii: $r")
  }

  test("re-running is bit-deterministic") {
    val a = Profile.corpusReport(spark, docs).collect().map(_.toSeq)
    val b = Profile.corpusReport(spark, docs).collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }
}
