package graft

import graft.llm.Curation

/** Lexical IDF drift (q421) and the per-doc gopherFlags contract the
  * q420 streaming gate rides.
  */
class IdfDriftSpec extends SparkSpec {

  test("idfDrift: a term vanishing from the late half tops the ranking") {
    val s = spark
    import s.implicits._
    // 20 docs; 'stable' in all, 'fading' only in the early half,
    // 'rising' only in the late half; df floor 10 keeps only 'stable'
    // unless lowered — use minDfTotal=5 so all three qualify
    val docs = (0L until 20L).map { i =>
      val extra = if (i <= 9) "fading" else "rising"
      (i, s"stable base words $extra")
    }.toDF("doc_id", "text")
    val got = Curation.idfDrift(s, docs, k = 3, minDfTotal = 5L)
      .collect().map(r => (r.getString(0),
        r.getLong(1), r.getLong(2), r.getLong(5)))
    // fading: df 10 -> 0 (idf rises), rising: df 0 -> 10 (idf falls):
    // both move by ln(11)-ln(1) = ln 11 in micro; stable moves 0
    val byTerm = got.map(r => r._1 -> r).toMap
    val ln11 = math.round(math.log(11.0 / 1.0) * 1e6)
    assert(byTerm("fading")._4 == ln11, got.toSeq)
    assert(byTerm("rising")._4 == -ln11, got.toSeq)
    assert(got.take(2).map(_._1).toSet == Set("fading", "rising"), got.toSeq)
  }

  test("normalizedDedup: unicode-variant duplicates collapse; distinct docs survive") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "Hello   World", "a"),
      (2L, "hello world", "b"), // same after casefold+collapse -> dup of 1
      (3L, "ﬁne text", "a"),
      (4L, "fine  text", "b"), // NFKC ligature fold -> dup of 3
      (5L, "unrelated words", "a")
    ).toDF("doc_id", "text", "source")
    val got = Curation.normalizedDedup(s, docs)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got("a") == ((3L, 0L, 3L)), got) // 1, 3 win their groups; 5 solo
    assert(got("b") == ((2L, 2L, 0L)), got) // 2, 4 drop
  }

  test("vocabCoverageCurve: hand-checked rungs on a skewed vocabulary") {
    val s = spark
    import s.implicits._
    // freqs: a=8, b=4, c=2, d=1 (total 15)
    val docs = Seq((1L, (Seq.fill(8)("a") ++ Seq.fill(4)("b")
      ++ Seq.fill(2)("c") ++ Seq("d")).mkString(" "))).toDF("doc_id", "text")
    val got = graft.llm.TextStats.vocabCoverageCurve(s, docs, maxLogK = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got(1L) == ((1L, 8L, 533L)), got)  // 8/15
    assert(got(2L) == ((2L, 12L, 800L)), got) // 12/15
    assert(got(4L) == ((4L, 15L, 1000L)), got)
  }

  test("semanticDecontam: a paraphrase-close vector flags; orthogonal content doesn't") {
    val s = spark
    import s.implicits._
    def v(xs: Double*): Seq[Float] = xs.map(_.toFloat)
    val eval = Seq((0L, v(1.0, 0.0, 0.0)), (1L, v(0.0, 1.0, 0.0)))
      .toDF("vec_id", "embedding")
    val train = Seq(
      (10L, v(0.99, 0.1, 0.0)), // near eval 0 -> flags
      (11L, v(0.0, 0.0, 1.0)), // orthogonal -> clean
      (12L, v(0.1, 0.99, 0.0)) // near eval 1 -> flags
    ).toDF("vec_id", "embedding")
    val got = graft.llm.Decontam.semanticDecontam(s, train, eval,
        tauMilli = 900L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet == Set(10L, 12L), got)
    assert(got(10L)._1 == 0L && got(10L)._2 >= 990L, got)
    assert(got(12L)._1 == 1L, got)
  }

  test("gopherFlags is streaming-legal per-doc (no aggregation in the plan)") {
    val s = spark
    import s.implicits._
    val d = Seq((1L, "the cat is on a mat and it sits by the door of it",
      "a")).toDF("doc_id", "text", "source")
    val flags = Curation.gopherFlags(d).collect()(0)
    // 14 words < 50: only the word-count rule fires on this doc
    assert(flags.getBoolean(2) && !flags.getBoolean(4), flags)
    // plan carries no Aggregate — the gate can run inside a streaming
    // micro-batch without a state store
    val plan = Curation.gopherFlags(d).queryExecution.analyzed.toString
    assert(!plan.contains("Aggregate"), plan)
  }
}
