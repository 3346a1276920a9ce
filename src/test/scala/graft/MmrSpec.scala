package graft

import org.apache.spark.sql.functions._
import graft.llm.Mmr

class MmrSpec extends SparkSpec {

  /** query on +x; two near-duplicate highly-relevant docs on +x, one
    * moderately relevant doc on a different axis — the canonical MMR
    * situation: pure relevance ranks the duplicate second, MMR swaps in
    * the diverse doc. */
  private def fixture = {
    val s = spark
    import s.implicits._
    def v(xs: Double*): Seq[Float] = xs.map(_.toFloat)
    Seq(
      (10L, v(1.0, 0.0, 0.0), 1000L),   // exact hit
      (11L, v(0.999, 0.045, 0.0), 999L), // near-duplicate of 10
      (12L, v(0.7, 0.0, 0.72), 697L)     // diverse, moderately relevant
    ).toDF("id", "vec", "rel_milli").withColumn("qid", lit(1L))
  }

  test("MMR demotes the near-duplicate in favor of the diverse doc") {
    val got = Mmr.mmrSelect(spark, fixture, k = 3, lambdaMilli = 700)
      .orderBy("pick_rank")
      .collect().map(r => (r.getInt(1), r.getLong(2))).toSeq
    // at λ=0.7 the duplicate's relevance edge still wins (700·999 −
    // 300·sim(11,10) > 700·697 − 300·sim(12,10) for this geometry)
    assert(got.map(_._2) == Seq(10L, 11L, 12L))
    // the defining property: with a tighter duplicate penalty (λ=0.3,
    // diversity-heavy), the diverse doc MUST overtake the duplicate
    val div = Mmr.mmrSelect(spark, fixture, k = 3, lambdaMilli = 300)
      .orderBy("pick_rank")
      .collect().map(r => r.getLong(2)).toSeq
    assert(div == Seq(10L, 12L, 11L))
  }

  test("lambda = 1000 reduces MMR to plain relevance order") {
    val got = Mmr.mmrSelect(spark, fixture, k = 3, lambdaMilli = 1000)
      .orderBy("pick_rank")
      .collect().map(r => (r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq((10L, 1000000L), (11L, 999000L), (12L, 697000L)))
  }

  test("k larger than the pool selects the whole pool; ties break to smaller id") {
    val s = spark
    import s.implicits._
    def v(xs: Double*): Seq[Float] = xs.map(_.toFloat)
    // two orthogonal candidates with IDENTICAL relevance: rank-1 must
    // be the smaller id by the tie rule, rank-2 the other
    val tied = Seq(
      (21L, v(1.0, 0.0), 500L),
      (20L, v(0.0, 1.0), 500L)
    ).toDF("id", "vec", "rel_milli").withColumn("qid", lit(7L))
    val got = Mmr.mmrSelect(spark, tied, k = 5, lambdaMilli = 700)
      .orderBy("pick_rank")
      .collect().map(r => (r.getInt(1), r.getLong(2))).toSeq
    assert(got == Seq((1, 20L), (2, 21L)))
  }

  test("probe-pooled MMR ≡ brute-pooled MMR at equal pool membership " +
      "(r10 verdict item 6: binary and IVF serving forms)") {
    val s = spark
    import s.implicits._
    def v(xs: Double*): Seq[Float] = xs.map(_.toFloat)
    val rnd = new scala.util.Random(43)
    val emb = (0L until 40L).map { i =>
      (i, Seq.fill(8)((rnd.nextDouble() * 2 - 1).toFloat))
    }.toDF("id", "vec")
    val q = emb.filter(col("id") < 3)
      .select(col("id").as("qid"), col("vec").as("qvec"))
    val brute = Mmr.mmrTopK(spark, emb, q, k = 5, poolSize = 10)
      .collect().map(_.toSeq).toSeq
    val work = java.nio.file.Files.createTempDirectory("mmr-serving")
    // binary: rerank = full corpus → the exact-cosine re-rank recovers
    // the exact top-10 pool, so selection must be bit-identical
    graft.llm.BinaryAnn.saveBinary(s, emb, s"$work/bin")
    val viaBin = Mmr.mmrProbeBinary(s, s"$work/bin", q,
        k = 5, poolSize = 10, rerank = 40)
      .collect().map(_.toSeq).toSeq
    assert(viaBin == brute && brute.nonEmpty)
    // IVF: probing every cell → exact pool again
    graft.llm.AnnIndex.saveIvf(s, emb, s"$work/ivf", cells = 4)
    val viaIvf = Mmr.mmrProbeIvf(s, s"$work/ivf", q,
        k = 5, poolSize = 10, nProbe = 4)
      .collect().map(_.toSeq).toSeq
    assert(viaIvf == brute)
  }

  test("a ranked candidate missing from the vector store stays in the " +
      "pool as diversity-neutral instead of silently vanishing") {
    val s = spark
    import s.implicits._
    def v(xs: Double*): Seq[Float] = xs.map(_.toFloat)
    // ranked pool has doc 99 (highest relevance) with NO vector row
    val ranked = Seq(
      (1L, 99L, 0.99), (1L, 10L, 0.9), (1L, 11L, 0.89)
    ).toDF("qid", "id", "cos")
    val vectors = Seq(
      (10L, v(1.0, 0.0, 0.0)), (11L, v(0.999, 0.045, 0.0))
    ).toDF("id", "vec")
    val got = Mmr.mmrFromRanked(spark, ranked, vectors, k = 3)
      .collect().map(r => (r.getInt(1), r.getLong(2))).toSeq
    // 99 is selected first on relevance (sim probes against it read 0 —
    // the zero-norm rule), and the full pool survives
    assert(got == Seq((1, 99L), (2, 10L), (3, 11L)))
  }

  test("mmrTopK rank-1 equals exact top-1 relevance for every query") {
    val s = spark
    import s.implicits._
    def v(xs: Double*): Seq[Float] = xs.map(_.toFloat)
    val rnd = new scala.util.Random(41)
    val emb = (0L until 40L).map { i =>
      (i, Seq.fill(8)((rnd.nextDouble() * 2 - 1).toFloat))
    }.toDF("id", "vec")
    val q = emb.filter(col("id") < 4)
      .select(col("id").as("qid"), col("vec").as("qvec"))
    val mmr1 = Mmr.mmrTopK(spark, emb, q, k = 5, poolSize = 10)
      .filter(col("pick_rank") === 1)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    val top1 = graft.llm.Ann.cosineTopK(spark, emb, q, 1)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(mmr1 == top1)
  }
}
