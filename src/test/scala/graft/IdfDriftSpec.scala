package graft

import org.apache.spark.sql.functions._
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

  test("epochWaterfill: hand-solved water level; caps bind below it") {
    val s = spark
    import s.implicits._
    def doc(i: Long, src: String, n: Int) =
      (i, Seq.fill(n)("w").mkString(" "), src)
    // token masses 100/100/100; caps 1000/3000/3000 milli; budget 2x:
    // capped set = {sA}; lambda = (600000 - 100000) / 200 = 2500
    val docs = Seq(doc(1, "sA", 100), doc(2, "sB", 100), doc(3, "sC", 100))
      .toDF("doc_id", "text", "source")
    val cap = when(col("source") === "sA", 1000L).otherwise(3000L)
    val got = Curation.epochWaterfill(s, docs, cap,
        tt => tt.cast("decimal(38,0)") * 2000)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got("sA") == ((100L, 1000L, 1000L, 100L)), got)
    assert(got("sB") == ((100L, 3000L, 2500L, 250L)), got)
    assert(got("sC") == ((100L, 3000L, 2500L, 250L)), got)
    // budget beyond every cap: all sources train their full cap
    val rich = Curation.epochWaterfill(s, docs, cap,
        tt => tt.cast("decimal(38,0)") * 100000)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(rich == Map("sA" -> 1000L, "sB" -> 3000L, "sC" -> 3000L), rich)
    // budget below the smallest cap: nobody capped, uniform lambda
    val lean = Curation.epochWaterfill(s, docs, cap,
        tt => tt.cast("decimal(38,0)") * 500)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(lean == Map("sA" -> 500L, "sB" -> 500L, "sC" -> 500L), lean)
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
