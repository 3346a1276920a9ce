package graft

import org.apache.spark.sql.functions._

/** q143's α=0.5 temperature rebalance on a constructed two-source
  * corpus with analytic budgets.
  */
class TemperatureMixSpec extends SparkSpec {

  test("sqrt weighting upweights the small source vs proportional sampling") {
    val s = spark
    import s.implicits._
    val work = java.nio.file.Files.createTempDirectory("tempmix").toString
    // big: 400 docs x 100 tokens = 40000; small: 100 docs x 4 = 400 —
    // the corpus must exceed the entry's fixed 20000-token budget for
    // the prefix cut to bite
    val doc100 = (1 to 100).map(i => s"w$i").mkString(" ")
    val doc4 = "a b c d"
    val docs = (1L to 400L).map(i => (i, doc100, "big")) ++
      (401L to 500L).map(i => (i, doc4, "small"))
    docs.toDF("doc_id", "text", "source")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        col("source"), length(col("text")).cast("long").as("n_chars"))
      .write.mode("overwrite").parquet(s"$work/documents.parquet")
    val got = graft.SparkEntry.queries("q143_temperature_mix")(s, work)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(4)))
      .toMap
    // weights: sqrt(40000)*1000 = 200000, sqrt(400)*1000 = 20000
    // budgets of 20000: big = 20000*200000/220000 = 18181, small = 1818
    val (bBig, _, tokBig) = got("big")
    val (bSmall, _, tokSmall) = got("small")
    assert(bBig == 18181L && bSmall == 1818L, s"got $got")
    // the small source's budget exceeds its 400 tokens -> kept WHOLE
    // (100% keep rate), while big keeps only its ~45% prefix; under
    // proportional (alpha=1) sampling both rates would be ~49.5%
    assert(tokSmall == 400L, s"small source should be kept whole: $got")
    // prefix rule: a doc is kept while cum-BEFORE-it < budget, so the
    // boundary doc overshoots by < 1 doc: 181*100 = 18100 < 18181 ->
    // the 182nd doc is in -> exactly 18200 tokens
    assert(tokBig == 18200L, s"big prefix off: $got")
  }
}
