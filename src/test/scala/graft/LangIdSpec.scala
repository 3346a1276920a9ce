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

  test("90/5/5 class imbalance: minority-class recall survives (the " +
      "q32 majority-collapse failure mode) and kappa stays > 0.8") {
    val s = spark
    import s.implicits._
    // 200 docs, ~90% en / 5% de / 5% fr, honest 80/20 split that keeps
    // minority classes in BOTH splits — a skewed prior is exactly where
    // a degenerate argmax would collapse to the majority class
    def langOf(i: Int): String = {
      val r = i % 100
      if (r < 90) "en" else if (r < 95) "de" else "fr"
    }
    def textOf(lang: String, i: Int): String =
      (0 until 30).map(j => LangId.vocab(lang)((i * 7 + j) % 10)).mkString(" ")
    val corp = (0 until 200).map { i =>
      (i.toLong, langOf(i), i % 5 == 4, textOf(langOf(i), i))
    }.toDF("doc_id", "lang_true", "is_test", "text")
    val prof = LangId.trainProfiles(corp.filter(!col("is_test"))
      .select(col("lang_true").as("lang"), col("text")))
    val test = corp.filter(col("is_test"))
    val pred = LangId.predict(test.select("doc_id", "text"), prof)
      .select(col("doc_id"), col("lang_pred").as("pred"))
    val truth = test.select(col("doc_id"), col("lang_true").as("label"))
    val report = Eval.classificationReport(s, pred, truth)
      .collect().map(r => r.getString(0) -> r.getDouble(5)).toMap
    assert(report.keySet == Set("en", "de", "fr"), s"classes: $report")
    Seq("en", "de", "fr").foreach { l =>
      assert(report(l) > 0.9, s"recall($l) = ${report(l)} <= 0.9 under skew")
    }
    val k = Eval.cohenKappa(s, pred, truth).head.getDouble(4)
    assert(k > 0.8, s"kappa under 90/5/5 skew = $k")
  }

  test("degenerate documents (< 3 chars) yield EMPTY trigrams — no " +
      "negative-step sequence positions (r10 advice)") {
    val s = spark
    import s.implicits._
    val docs = Seq((0L, ""), (1L, "a"), (2L, "ab"), (3L, "abc"))
      .toDF("doc_id", "text")
    val tris = docs.select(col("doc_id"),
        LangId.charTrigrams(col("text")).as("t"))
      .collect().map(r => (r.getLong(0), r.getSeq[String](1))).toMap
    assert(tris(0L).isEmpty && tris(1L).isEmpty && tris(2L).isEmpty)
    assert(tris(3L) == Seq("abc"))
    // the public operators digest them without error: short docs simply
    // produce no trigram rows (train) / no score rows (predict) — the
    // oracle's empty range(1, len-1) behavior
    val prof = LangId.trainProfiles(
      Seq(("en", "ab"), ("en", "the the the")).toDF("lang", "text"))
    assert(prof.filter(col("tri").isin("ab", "b")).count() == 0)
    val preds = LangId.predict(docs, prof)
    assert(preds.filter(col("doc_id") < 3).count() == 0)
  }
}
