package graft

import org.apache.spark.sql.functions._
import graft.llm.{Curation, TextStats}

/** Heaps'-law growth fit (q410) and the perplexity filter (q411). */
class HeapsPerplexitySpec extends SparkSpec {

  test("heapsLaw: linear vocabulary growth fits beta near 1") {
    val s = spark
    import s.implicits._
    // every doc introduces exactly one new token next to three common
    // ones: V(N) grows linearly in N, so the log-log slope sits near 1
    val docs = (0L until 64L)
      .map(i => (i, s"t$i a b c"))
      .toDF("doc_id", "text")
    val r = TextStats.heapsLaw(s, docs).collect()(0)
    assert(r.getLong(0) == 256L, s"n_tokens: $r")
    assert(r.getLong(1) == 67L, s"vocab: $r")
    val betaMicro = r.getLong(3)
    assert(betaMicro > 700000L && betaMicro <= 1050000L, s"beta_micro: $betaMicro")
  }

  test("heapsLaw: saturated vocabulary fits beta 0 exactly") {
    val s = spark
    import s.implicits._
    // the whole vocabulary appears in every doc: V is flat after the
    // first checkpoint, the OLS numerator cancels to exactly 0
    val docs = (0L until 32L).map(i => (i, "x y z")).toDF("doc_id", "text")
    val r = TextStats.heapsLaw(s, docs).collect()(0)
    assert(r.getLong(1) == 3L, s"vocab: $r")
    // num = k·Σxy − Σx·Σy cancels to exactly 0 in the integer moments
    assert(r.getLong(3) == 0L, s"beta_micro: $r")
    // ln K = ln 3 snapped to micro: round(1.0986122886…·1e6) — the
    // pinned snapped literal of the IntOls discipline
    assert(r.getLong(4) == 1098612L, s"lnk_micro: $r")
  }

  test("perplexityFilter: off-model junk and zero-bigram docs drop, reference keeps") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "the cat sat on the mat", "clean", "en"),
      (2L, "the cat sat on the mat", "clean", "en"),
      (3L, "the cat sat on the mat", "clean", "en"),
      (4L, "zz qq pp rr ss tt uu vv", "junk", "xx"), // every bigram unseen
      (5L, "word", "junk", "xx") // zero bigrams: unscorable, drops
    ).toDF("doc_id", "text", "source", "lang")
    // model bigrams average ~ln(4/11) = -0.88; the junk doc sits at the
    // unseen floor ln(1/5) = -1.609 — the gate at -1.5 separates them
    val got = Curation.perplexityFilter(s, docs, tau = -1.5)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got("clean") == ((3L, 3L, 15L, 0L)), got)
    assert(got("junk") == ((2L, 0L, 0L, 1000L)), got)
  }
}
