package graft

/** Round-14 facade methods delegate to (and agree with) their kernels.
  * (streamShardSink's facade is exercised end-to-end by
  * StreamShardSinkSpec via the q431 entry — running the two-phase
  * restart harness twice here would buy nothing.)
  */
class FacadeRound14Spec extends SparkSpec {

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
