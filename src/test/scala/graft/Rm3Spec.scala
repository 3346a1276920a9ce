package graft

import graft.llm.Rm3

class Rm3Spec extends SparkSpec {

  /** query "hash" hits docs 1/2; both also say "probe", so "probe"
    * becomes the strongest expansion term; doc 3 contains ONLY "probe"
    * — retrievable after expansion though it shares no query term. */
  private def docs = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "hash join probe build"),
      (2L, "hash probe partition"),
      (3L, "probe probe cache"),
      (4L, "scan filter predicate"),
      (5L, "sort merge spill")
    ).toDF("doc_id", "text")
  }

  private val q = Seq(0 -> Seq("hash"))

  test("expansion carries feedback co-occurrence terms and the original query floor") {
    val exp = Rm3.rm3Expansion(spark, docs, q, nFb = 2, mExp = 10,
      alphaMilli = 600).collect()
      .map(r => r.getString(2) -> r.getDouble(3)).toMap
    // original term present, boosted by both channels
    assert(exp.contains("hash"))
    // "probe" appears in both feedback docs -> strongest pure-feedback term
    val fbOnly = exp.view.filterKeys(_ != "hash").toMap
    assert(fbOnly.nonEmpty && fbOnly.maxBy(t => (t._2, t._1))._1 == "probe")
    // terms outside the feedback docs never enter
    assert(!exp.contains("scan") && !exp.contains("sort"))
  }

  test("alpha=0 degenerates to the original query; alpha=1000 to the pure relevance model") {
    val pureQ = Rm3.rm3Expansion(spark, docs, q, 2, 10, alphaMilli = 0)
      .collect().filter(_.getDouble(3) > 0)
    assert(pureQ.map(_.getString(2)).toSeq == Seq("hash"))
    assert(pureQ.head.getDouble(3) == 1.0)
    val pureFb = Rm3.rm3Expansion(spark, docs, q, 2, 10, alphaMilli = 1000)
      .collect().map(r => r.getString(2) -> r.getDouble(3)).toMap
    // relevance-model weights are a (sub)distribution over fb-doc terms
    assert(math.abs(pureFb.values.sum - 1.0) < 1e-4)
  }

  test("second pass retrieves a doc sharing no original query term") {
    val r = Rm3.rm3Rerank(spark, docs, q, nFb = 2, mExp = 10,
      alphaMilli = 600, k = 5).collect()
    val ranked = r.map(_.getLong(2)).toSeq
    assert(ranked.contains(3L)) // "probe probe cache": expansion-only hit
    assert(!ranked.contains(5L)) // shares nothing with the expanded query
    // ranks are 1..n and scores non-increasing
    assert(r.map(_.getInt(1)).toSeq == (1 to r.length).toSeq)
    val scores = r.map(_.getDouble(3)).toSeq
    assert(scores == scores.sorted.reverse)
  }

  test("no-match query falls back to the scaled original terms") {
    val exp = Rm3.rm3Expansion(spark, docs, Seq(7 -> Seq("zzz")), 2, 5, 600)
      .collect()
    assert(exp.length == 1)
    assert(exp.head.getString(2) == "zzz")
    assert(exp.head.getDouble(3) == 0.4) // (1-alpha) * 1/1
  }
}
