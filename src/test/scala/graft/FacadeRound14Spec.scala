package graft

/** Round-14 facade methods delegate to (and agree with) their kernels.
  * (streamShardSink's facade is exercised end-to-end by
  * StreamShardSinkSpec via the q431 entry — running the two-phase
  * restart harness twice here would buy nothing.)
  */
class FacadeRound14Spec extends SparkSpec {

  test("dupClassHistogram: power-of-two buckets land on the planted classes") {
    val s = spark
    import s.implicits._
    // classes of sizes 1, 2, 4, 5 (normalized equality: case and
    // whitespace runs collapse) -> buckets 0:{1}, 1:{2}, 2:{4,5}
    val docs = (Seq((0L, "solo")) ++
      (1L to 2L).map(i => (i, if (i % 2 == 0) "PAIR  text" else "pair text")) ++
      (3L to 6L).map(i => (i, "quad body")) ++
      (7L to 11L).map(i => (i, "five member family"))
    ).toDF("doc_id", "text")
    val got = graft.llm.Curation.dupClassHistogram(s, docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((0L, 1L, 1L), (1L, 1L, 2L), (2L, 2L, 9L)), got)
    assert(Graft.dupClassHistogram(s, docs).collect().map(_.toSeq).toSeq ==
      graft.llm.Curation.dupClassHistogram(s, docs).collect().map(_.toSeq).toSeq)
  }

  test("trainingDataPlan facade equals the kernel") {
    val s = spark
    import s.implicits._
    val base = "the cat runs fast and dogs jump over lazy rivers "
    val docs = Seq(
      (0L, base * 6, "src0"),
      (1L, (base * 6).toUpperCase, "src0"),
      (2L, "too short", "src1"),
      (3L, base * 6 + "tail words", "src1")
    ).toDF("doc_id", "text", "source")
    val a = Graft.trainingDataPlan(s, docs).collect().map(_.toSeq).toSeq
    val b = graft.llm.Curation.trainingDataPlan(s, docs)
      .collect().map(_.toSeq).toSeq
    assert(a == b && a.nonEmpty, s"$a vs $b")
  }
}
