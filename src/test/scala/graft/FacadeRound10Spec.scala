package graft

import org.apache.spark.sql.functions._
import graft.rel.Tables

/** Facade parity for the round-10 operators: each public Graft method
  * must agree with the oracle-checked kernel it delegates to.
  */
class FacadeRound10Spec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  test("langid facade reproduces the q264 pipeline") {
    val s = spark
    val corp = graft.llm.LangId.syntheticCorpus(s, d)
    val prof = Graft.langidTrain(corp.filter(!col("is_test"))
      .select(col("lang_true").as("lang"), col("text")))
    val test = corp.filter(col("is_test"))
    val viaFacade = Graft.langidPredict(test.select("doc_id", "text"), prof)
      .select("doc_id", "lang_pred").collect().map(_.toSeq).toSet
    val viaEntry = graft.llm.LangId.predictions(s, d)
      .select("doc_id", "lang_pred").collect().map(_.toSeq).toSet
    assert(viaFacade == viaEntry && viaFacade.nonEmpty)
  }

  test("binaryAnnTopK facade matches the kernel's deterministic result") {
    val s = spark
    val e = Tables.embeddings(s, d)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val q = e.filter(col("id") < 4)
      .select(col("id").as("qid"), col("vec").as("qvec"))
    val got = Graft.binaryAnnTopK(s, e, q, 5, 50)
      .select("qid", "rn", "id").collect().map(_.toSeq).toSet
    val want = graft.llm.BinaryAnn.binaryTopK(s, e, q, 5, 50)
      .select("qid", "rn", "id").collect().map(_.toSeq).toSet
    assert(got == want && got.size == 20)
  }

  test("evolving CDC facades delegate (add-column upsert lands)") {
    val s = spark
    import s.implicits._
    val base = Seq((1L, 10L)).toDF("k", "v")
    val b = Seq((1L, 11L, "x", "U", 1L)).toDF("k", "v", "c", "op", "seq")
    val snap = Graft.cdcApplyEvolving(base, b, Seq("k"))
      .collect().map(_.toSeq)
    assert(snap.toSeq == Seq(Seq(1L, 11L, "x")))
    val st = Graft.cdcApplyVersionedEvolving(
      graft.rel.Cdc.bootstrapState(base), b, Seq("k"))
    assert(st.columns.contains("c"))
  }

  test("prefixSumByOrder facade equals the kernel") {
    val s = spark
    import s.implicits._
    val df = (1L to 100L).map(i => (i, i % 7)).toDF("id", "x")
    val got = Graft.prefixSumByOrder(df, Seq(col("id")), col("x"))
      .select("id", "cum", "rk").collect().map(_.toSeq).toSet
    val want = graft.rel.GlobalRank.prefixSumByOrder(df, Seq(col("id")), col("x"))
      .select("id", "cum", "rk").collect().map(_.toSeq).toSet
    assert(got == want && got.size == 100)
  }

  test("edgeTriangleCounts facade equals the kernel") {
    val s = spark
    import s.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("a", "b")
    val got = Graft.edgeTriangleCounts(s, edges)
      .collect().map(_.toSeq).toSet
    assert(got == Set(Seq(1L, 2L, 1L), Seq(1L, 3L, 1L), Seq(2L, 3L, 1L)))
  }
}
