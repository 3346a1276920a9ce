package graft

import org.apache.spark.sql.functions._

/** Round-11 facade methods delegate to (and agree with) their kernels. */
class FacadeRound11Spec extends SparkSpec {

  private def embFixture = {
    val s = spark
    import s.implicits._
    def v(xs: Double*): Seq[Float] = xs.map(_.toFloat)
    Seq(
      (0L, v(1.0, 0.00, 0.0)), (1L, v(1.0, 0.02, 0.0)), (2L, v(1.0, 0.04, 0.0)),
      (3L, v(0.00, 1.0, 0.0)), (4L, v(0.02, 1.0, 0.0)), (5L, v(0.04, 1.0, 0.0)),
      (6L, v(0.0, 0.0, 1.0))
    ).toDF("id", "vec")
  }

  test("semanticClustersIvf / semanticClustersFromEdges facades equal the kernels") {
    val s = spark
    import s.implicits._
    val e = embFixture
    val viaFacade = Graft.semanticClustersIvf(s, e, 2, cells = 4)
      .collect().map(_.toSeq).toSet
    val viaKernel = graft.llm.Mining.semanticClustersIvf(s, e, 2, cells = 4)
      .collect().map(_.toSeq).toSet
    assert(viaFacade == viaKernel && viaFacade.nonEmpty)
    val edges = Seq((0L, 1L), (3L, 4L)).toDF("u", "v")
    assert(Graft.semanticClustersFromEdges(s, e, edges)
      .collect().map(_.toSeq).toSet ==
      graft.llm.Mining.semanticClustersFromEdges(s, e, edges)
        .collect().map(_.toSeq).toSet)
  }

  test("attachEdges / clustersDelta(+Ivf) facades equal the kernels") {
    val s = spark
    import s.implicits._
    def v(xs: Double*): Seq[Float] = xs.map(_.toFloat)
    val corpus = embFixture.filter(col("id") =!= 5L)
    val batch = Seq((5L, v(0.04, 1.0, 0.0)), (7L, v(0.0, 0.0, -1.0)))
      .toDF("id", "vec")
    assert(Graft.attachEdges(s, corpus, batch, 900)
      .collect().map(_.toSeq).toSet ==
      graft.llm.Mining.attachEdges(s, corpus, batch, 900)
        .collect().map(_.toSeq).toSet)
    val boot = graft.llm.Mining.semanticClusters(s, corpus, 2)
      .select("node", "comp_id")
    val viaFacade = Graft.clustersDelta(s, boot, corpus, batch, 900)
      .collect().map(_.toSeq).toSet
    assert(viaFacade ==
      graft.llm.Mining.clustersDelta(s, boot, corpus, batch, 900)
        .collect().map(_.toSeq).toSet)
    assert(viaFacade.nonEmpty)
    assert(Graft.clustersDeltaIvf(s, boot, corpus, batch, 900, cells = 4)
      .collect().map(_.toSeq).toSet ==
      graft.llm.Mining.clustersDeltaIvf(s, boot, corpus, batch, 900,
        cells = 4).collect().map(_.toSeq).toSet)
  }

  test("clusteringAgreement facade equals the kernel") {
    val s = spark
    import s.implicits._
    val a = Seq((1L, 10L), (2L, 10L), (3L, 30L)).toDF("node", "comp_id")
    val b = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("node", "comp_id")
    assert(Graft.clusteringAgreement(s, a, b).collect().map(_.toSeq).toSeq ==
      graft.llm.Eval.clusteringAgreement(s, a, b).collect().map(_.toSeq).toSeq)
  }

  test("MMR serving facades + binary compaction delegate end-to-end") {
    val s = spark
    val e = embFixture
    val q = e.filter(col("id") < 2)
      .select(col("id").as("qid"), col("vec").as("qvec"))
    val work = java.nio.file.Files.createTempDirectory("facade-r11")
    Graft.saveBinaryIndex(s, e, s"$work/bin")
    val got = Graft.mmrProbeBinary(s, s"$work/bin", q,
        k = 3, poolSize = 5, rerank = 7)
      .collect().map(_.toSeq).toSeq
    assert(got == graft.llm.Mmr.mmrProbeBinary(s, s"$work/bin", q, 3, 5, 7)
      .collect().map(_.toSeq).toSeq)
    Graft.compactBinaryIndex(s, s"$work/bin") // no-dup log: must be a no-op
    assert(Graft.mmrProbeBinary(s, s"$work/bin", q, 3, 5, 7)
      .collect().map(_.toSeq).toSeq == got)
    graft.llm.AnnIndex.saveIvf(s, e, s"$work/ivf", cells = 4)
    assert(Graft.mmrProbeIvf(s, s"$work/ivf", q, 3, 5, nProbe = 4)
      .collect().map(_.toSeq).toSeq ==
      graft.llm.Mmr.mmrProbeIvf(s, s"$work/ivf", q, 3, 5, 4)
        .collect().map(_.toSeq).toSeq)
  }

  test("retrieval-pipeline facades reproduce the kernel chain") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (0L, "alpha beta gamma"), (1L, "beta delta"), (2L, "needle haystack")
    ).toDF("doc_id", "text")
    val e = embFixture.filter(col("id") < 3)
    val queries = Seq(0 -> Seq("beta"), 1 -> Seq("needle"))
    val qv = e.filter(col("id") < 2)
      .select(col("id").as("qid"), col("vec").as("qvec"))
    val fused = Graft.hybridChunkRetrieve(s, docs, queries, e, qv,
      window = 10, stride = 10, kPerSystem = 3, kFused = 3)
    assert(fused.collect().map(_.toSeq).toSet ==
      graft.llm.Pipeline.hybridChunkRetrieve(s, docs, queries, e, qv,
        10, 10, 3, 3).collect().map(_.toSeq).toSet)
    val qrels = graft.llm.Eval.termMatchQrels(s, docs, queries)
    assert(Graft.retrieveDiversifyEval(s, docs, queries, e, qv, qrels, k = 2)
      .count() == 2)
  }

  test("DSIR facades equal the kernels") {
    val s = spark
    import s.implicits._
    val target = Seq((100L, "cat sat mat")).toDF("doc_id", "text")
    val raw = Seq((1L, "cat sat mat"), (2L, "dog ran far")).toDF("doc_id", "text")
    assert(Graft.dsirWeights(s, target, raw).collect().map(_.toSeq).toSet ==
      graft.llm.Dsir.dsirWeights(s, target, raw).collect().map(_.toSeq).toSet)
    assert(Graft.dsirSample(s, target, raw, 2, 500).collect().map(_.toSeq).toSeq ==
      graft.llm.Dsir.dsirGumbelTopK(s, target, raw, 2, 500)
        .collect().map(_.toSeq).toSeq)
    assert(Graft.dsirWeightsHashed(s, target, raw, 1 << 16)
      .collect().map(_.toSeq).toSet ==
      graft.llm.Dsir.dsirWeightsHashed(s, target, raw, 1 << 16)
        .collect().map(_.toSeq).toSet)
  }

  test("query-likelihood facades equal the kernels") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "a a b"), (2L, "a c"), (3L, "b b b c"))
      .toDF("doc_id", "text")
    val q = Seq(0 -> Seq("a", "b"))
    assert(Graft.qlDirichletTopK(s, docs, q, k = 3, mu = 1.0)
      .collect().map(_.toSeq).toSeq ==
      graft.llm.Ql.qlDirichletTopK(s, docs, q, 3, 1.0)
        .collect().map(_.toSeq).toSeq)
    assert(Graft.qlJmTopK(s, docs, q, k = 3, lambdaMilli = 400)
      .collect().map(_.toSeq).toSeq ==
      graft.llm.Ql.qlJmTopK(s, docs, q, 3, 400)
        .collect().map(_.toSeq).toSeq)
  }

  test("experiment / robust / calibration facades equal the kernels") {
    val s = spark
    import s.implicits._
    val units = Seq((0L, 10L, 25L), (0L, 20L, 41L), (1L, 30L, 65L))
      .toDF("variant", "x", "y")
    assert(Graft.cuped(units).collect().map(_.toSeq).toSeq ==
      graft.rel.Experiment.cuped(units).collect().map(_.toSeq).toSeq)
    val ev = (1L to 50L).map(i => ("g", i, i * 10L)).toDF("grp", "id", "v")
    assert(Graft.bootstrapCi(ev, "grp", "id", "v", reps = 10)
      .collect().map(_.toSeq).toSeq ==
      graft.rel.Experiment.bootstrapCi(ev, "grp", "id", "v", 10)
        .collect().map(_.toSeq).toSeq)
    val vals = Seq(1L, 2L, 3L, 4L, 100L).toDF("c")
    assert(Graft.exactMedianNonNeg(vals, "c") ==
      graft.rel.Robust.exactMedianNonNeg(vals, "c"))
    assert(Graft.madOutlierSummary(s, vals, "c").collect().map(_.toSeq).toSeq ==
      graft.rel.Robust.madOutlierSummary(s, vals, "c")
        .collect().map(_.toSeq).toSeq)
    val scored = Seq((100L, 0L), (900L, 1L), (450L, 1L)).toDF("p_milli", "y")
    assert(Graft.calibrationBins(scored).collect().map(_.toSeq).toSeq ==
      graft.llm.Eval.calibrationBins(scored).collect().map(_.toSeq).toSeq)
    assert(Graft.calibrationSummary(scored).collect().map(_.toSeq).toSeq ==
      graft.llm.Eval.calibrationSummary(scored).collect().map(_.toSeq).toSeq)
    val ratings = Seq((1L, "a", "x"), (1L, "b", "x"), (2L, "a", "x"),
      (2L, "b", "y")).toDF("unit", "rater", "value")
    assert(Graft.krippendorffAlpha(s, ratings).collect().map(_.toSeq).toSeq ==
      graft.llm.Eval.krippendorffAlpha(s, ratings).collect().map(_.toSeq).toSeq)
    val asg = Seq("A", "A", "B").toDF("variant")
    val w = Map("A" -> 500L, "B" -> 500L)
    assert(Graft.srmCheck(asg, "variant", w).collect().map(_.toSeq).toSeq ==
      graft.rel.Experiment.srmCheck(asg, "variant", w)
        .collect().map(_.toSeq).toSeq)
    val ru = Seq((0L, 2L, 600L), (0L, 4L, 1100L)).toDF("variant", "x", "y")
    assert(Graft.deltaRatioCi(ru).collect().map(_.toSeq).toSeq ==
      graft.rel.Experiment.deltaRatioCi(ru).collect().map(_.toSeq).toSeq)
    val mom = Graft.cupedMoments(units)
    assert(Graft.cupedFromMoments(Graft.cupedFold(mom, mom))
      .collect().map(_.toSeq).toSeq ==
      graft.rel.Experiment.cupedFromMoments(
        graft.rel.Experiment.cupedFold(mom, mom))
        .collect().map(_.toSeq).toSeq)
    val priv = Seq(("a", 1L), ("a", 2L), ("b", 1L)).toDF("g", "v")
    assert(Graft.tClosenessAudit(priv, Seq("g"),
      org.apache.spark.sql.functions.col("v"), 100L)
      .collect().map(_.toSeq).toSet ==
      graft.rel.Privacy.tClosenessAudit(priv, Seq("g"),
        org.apache.spark.sql.functions.col("v"), 100L)
        .collect().map(_.toSeq).toSet)
    val km = Seq((1L, 1L), (2L, 0L), (3L, 1L)).toDF("t", "e")
    assert(Graft.kaplanMeier(km).collect().map(_.toSeq).toSeq ==
      graft.rel.Survival.kaplanMeier(km).collect().map(_.toSeq).toSeq)
    val gm = Seq((1L, 2L, 5L), (3L, 4L, 11L)).toDF("x0", "x1", "y")
    assert(Graft.gramMatrix(gm, Seq("x0", "x1", "y"))
      .collect().map(_.toSeq).toSeq ==
      graft.rel.Gram.gramMatrix(gm, Seq("x0", "x1", "y"))
        .collect().map(_.toSeq).toSeq)
    assert(Graft.ridgeSolveFromGram(
      Graft.gramMatrix(gm, Seq("x0", "x1", "y")), 0).toSeq ==
      graft.rel.Gram.ridgeSolveFromGram(
        graft.rel.Gram.gramMatrix(gm, Seq("x0", "x1", "y")), 0).toSeq)
    val fd = Seq((1L, "aa bb", "x"), (2L, "bb", "y")).toDF("doc_id", "text", "lang")
    assert(Graft.chiSquareTerms(s, fd, 2, 1L).collect().map(_.toSeq).toSeq ==
      graft.llm.Features.chiSquareTerms(s, fd, 2, 1L)
        .collect().map(_.toSeq).toSeq)
    val lr = Seq((1L, 1L, 0L), (2L, 1L, 1L), (3L, 0L, 0L))
      .toDF("t", "e", "g")
    assert(Graft.logRank(lr).collect().map(_.toSeq).toSeq ==
      graft.rel.Survival.logRank(lr).collect().map(_.toSeq).toSeq)
    val gk = Seq(("a", 5L), ("a", 1L), ("a", 9L), ("b", 2L), ("b", 4L))
      .toDF("g", "c")
    assert(Graft.groupedExactKth(gk, "g", "c", n => (n + 1) / 2)
      .collect().map(_.toSeq).toSeq ==
      graft.rel.Robust.groupedExactKth(gk, "g", "c", n => (n + 1) / 2)
        .collect().map(_.toSeq).toSeq)
    assert(Graft.conformalThresholds(gk, "g", "c", 100L)
      .collect().map(_.toSeq).toSeq ==
      graft.rel.Robust.conformalThresholds(gk, "g", "c", 100L)
        .collect().map(_.toSeq).toSeq)
    val mk = Seq(("g", 1L, 10L), ("g", 2L, 20L), ("g", 3L, 15L))
      .toDF("grp", "x", "y")
    assert(Graft.mannKendall(mk).collect().map(_.toSeq).toSeq ==
      graft.rel.Distribution.mannKendall(mk).collect().map(_.toSeq).toSeq)
    val cg = Graft.gramMatrix(gm, Seq("x0", "x1", "y"))
    assert(Graft.corrFromGram(cg).collect().map(_.toSeq).toSeq ==
      graft.rel.Gram.corrFromGram(cg).collect().map(_.toSeq).toSeq)
  }
}
