package graft

import org.apache.spark.sql.functions._
import graft.llm.{Eval, LangId}

class LangIdSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("trained trigram classifier: every class's held-out recall " +
      "clears the 0.9 bar (r9 verdict item 5)") {
    val s = spark
    val pred = LangId.predictions(s, sf)
      .select(col("doc_id"), col("lang_pred").as("pred"))
    val truth = LangId.syntheticCorpus(s, sf).filter(col("is_test"))
      .select(col("doc_id"), col("lang_true").as("label"))
    val report = Eval.classificationReport(s, pred, truth)
      .collect().map(r => r.getString(0) -> r.getDouble(5)).toMap
    assert(report.keySet == LangId.langs.toSet, s"classes: $report")
    LangId.langs.foreach { l =>
      assert(report(l) > 0.9, s"recall($l) = ${report(l)} <= 0.9")
    }
  }

  test("kappa clears 0.8 where the q32 heuristic pinned 0.0") {
    val s = spark
    val pred = LangId.predictions(s, sf)
      .select(col("doc_id"), col("lang_pred").as("pred"))
    val truth = LangId.syntheticCorpus(s, sf).filter(col("is_test"))
      .select(col("doc_id"), col("lang_true").as("label"))
    val k = Eval.cohenKappa(s, pred, truth).head.getDouble(4)
    assert(k > 0.8, s"kappa = $k")
  }

  test("fixture: balanced classes, honest split, mixed docs held out") {
    val s = spark
    val corp = LangId.syntheticCorpus(s, sf).cache()
    val byLang = corp.groupBy("lang_true").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang.keySet == LangId.langs.toSet)
    assert(byLang.values.max - byLang.values.min <= 1)
    // the 20% test group contains every class
    val testLangs = corp.filter(col("is_test"))
      .select("lang_true").distinct().collect().map(_.getString(0)).toSet
    assert(testLangs == LangId.langs.toSet)
    // mixed docs live in the test split only (training stays pure)
    val mixedTrain = corp.filter(col("doc_id") % 25 === 24 && !col("is_test"))
    assert(mixedTrain.isEmpty)
    corp.unpersist()
  }

  test("profiles: integer micro-weights in range, vocab-bounded rows") {
    val s = spark
    val corp = LangId.syntheticCorpus(s, sf)
    val prof = LangId.trainProfiles(corp.filter(!col("is_test"))
      .select(col("lang_true").as("lang"), col("text"))).cache()
    val mm = prof.agg(min("w"), max("w"), countDistinct("lang")).head
    assert(mm.getLong(0) >= 0L && mm.getLong(1) <= 1000000L)
    assert(mm.getLong(2) == LangId.langs.size)
    // trigram space is bounded by the vocabulary, not the corpus: the
    // profile must not grow with documents
    val nTri = prof.select("tri").distinct().count()
    assert(nTri < 500, s"profile trigram space unexpectedly large: $nTri")
    prof.unpersist()
  }

  test("deterministic: two runs produce identical predictions") {
    val s = spark
    val a = LangId.predictions(s, sf).collect().map(_.toSeq).toSet
    val b = LangId.predictions(s, sf).collect().map(_.toSeq).toSet
    assert(a == b && a.nonEmpty)
  }

  test("predict ties break on (score desc, lang asc) — a total order") {
    val s = spark
    import s.implicits._
    // two one-trigram profiles with EQUAL weight: 'aaa' scores the same
    // for both langs, so the ascending-lang side must win
    val prof = Seq(("zz", "aaa", 10L), ("aa", "aaa", 10L))
      .toDF("lang", "tri", "w")
    val docs = Seq((1L, "aaa")).toDF("doc_id", "text")
    val got = LangId.predict(docs, prof).collect()
    assert(got.length == 1 && got(0).getString(1) == "aa")
  }
}
