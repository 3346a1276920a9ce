package graft

import org.apache.spark.sql.functions._
import graft.llm.Mining

class MiningSpec extends SparkSpec {

  /** 3 tight same-label pods on distinct axes + a lone outlier: every
    * neighbor structure is known by construction. */
  private def fixture = {
    val s = spark
    import s.implicits._
    def v(xs: Double*): Seq[Float] = xs.map(_.toFloat)
    Seq(
      // pod A (label 0) around +x
      (0L, v(1.0, 0.00, 0.0), 0),
      (1L, v(1.0, 0.02, 0.0), 0),
      (2L, v(1.0, 0.04, 0.0), 0),
      // pod B (label 1) around +y
      (3L, v(0.00, 1.0, 0.0), 1),
      (4L, v(0.02, 1.0, 0.0), 1),
      (5L, v(0.04, 1.0, 0.0), 1),
      // lone outlier (label 2) on +z
      (6L, v(0.0, 0.0, 1.0), 2)
    ).toDF("id", "vec", "label")
  }

  test("hardNegatives excludes self and same-label; nearest other-class wins") {
    val e = fixture
    val q = e.filter(col("id") === 2)
      .select(col("id").as("qid"), col("vec").as("qvec"),
        col("label").as("qlabel"))
    val got = Mining.hardNegatives(spark, e, q, 3)
      .collect().map(r => (r.getInt(1), r.getLong(2)))
    // all of pod A (labels equal) excluded; nearest other-label is pod
    // B's closest-to-x member (id 5, x component 0.04), then 4, then 3
    assert(got.toSeq == Seq((1, 5L), (2, 4L), (3, 3L)))
  }

  test("mutualKnn: edges inside pods only; ranks are both directions' positions") {
    val e = fixture.select("id", "vec")
    val got = Mining.mutualKnn(spark, e, 2)
      .orderBy("u", "v")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // k=2 inside a 3-pod: every within-pod pair is mutual; the outlier
    // and cross-pod pairs never are
    assert(got == Seq((0L, 1L), (0L, 2L), (1L, 2L), (3L, 4L), (3L, 5L), (4L, 5L)))
    // symmetry of the rank pair: (u,v) ranks are each ≤ k
    Mining.mutualKnn(spark, e, 2).collect().foreach { r =>
      assert(r.getInt(2) <= 2 && r.getInt(3) <= 2)
    }
  }

  test("semanticClusters: pods become components, the outlier a singleton") {
    val e = fixture.select("id", "vec")
    val got = Mining.semanticClusters(spark, e, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(got.toSeq == Seq(
      (0L, 0L, 3L), (1L, 0L, 3L), (2L, 0L, 3L),
      (3L, 3L, 3L), (4L, 3L, 3L), (5L, 3L, 3L),
      (6L, 6L, 1L)))  // singleton keeps its own id, size 1
  }

  test("semanticClustersIvf ≡ semanticClusters on the planted pods " +
      "(r10 verdict item 1: the 100 TB path clusters the same groups)") {
    val e = fixture.select("id", "vec")
    val exact = Mining.semanticClusters(spark, e, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val ivf = Mining.semanticClustersIvf(spark, e, 2, cells = 4, multiAssign = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(ivf == exact)
    assert(ivf == Seq(
      (0L, 0L, 3L), (1L, 0L, 3L), (2L, 0L, 3L),
      (3L, 3L, 3L), (4L, 3L, 3L), (5L, 3L, 3L),
      (6L, 6L, 1L)))
  }

  test("semanticClustersFromEdges: a caller edge set drives the same " +
      "CC machinery, singletons preserved") {
    val s = spark
    import s.implicits._
    val e = fixture.select("id", "vec")
    // hand edges: merge the two pods through one bridge edge 2-3
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
      .toDF("u", "v")
    val got = Mining.semanticClustersFromEdges(spark, e, edges)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(got == Seq(
      (0L, 0L, 6L), (1L, 0L, 6L), (2L, 0L, 6L),
      (3L, 0L, 6L), (4L, 0L, 6L), (5L, 0L, 6L),
      (6L, 6L, 1L)))
  }

  test("knnEdgesIvf: pair space is cell-bounded and recall is total " +
      "when pods fit in cells") {
    val e = fixture.select("id", "vec")
    // 4 cells over 7 clustered points: every within-pod pair shares a
    // cell, so the IVF graph reproduces the exact mutual graph
    val a = Mining.knnEdgesIvf(spark, e, 2, cells = 4, multiAssign = 2)
    val approxMutual = a.as("l").join(a.as("r"),
        col("l.src") === col("r.dst") && col("l.dst") === col("r.src") &&
          col("l.src") < col("l.dst"))
      .select(col("l.src"), col("l.dst"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(approxMutual == Seq((0L, 1L), (0L, 2L), (1L, 2L),
      (3L, 4L), (3L, 5L), (4L, 5L)))
    // no self edges, ranks bounded by k
    a.collect().foreach { r =>
      assert(r.getLong(0) != r.getLong(1) && r.getInt(2) <= 2)
    }
  }

  /** corpus-growth fixture: pods A/B and the outlier are the standing
    * corpus; the batch brings one vector per pod plus a fresh loner. */
  private def growth = {
    val s = spark
    import s.implicits._
    def v(xs: Double*): Seq[Float] = xs.map(_.toFloat)
    val corpus = Seq(
      (0L, v(1.0, 0.00, 0.0)), (1L, v(1.0, 0.02, 0.0)),
      (2L, v(1.0, 0.04, 0.0)),                             // pod A
      (3L, v(0.00, 1.0, 0.0)), (4L, v(0.02, 1.0, 0.0)),    // pod B
      (6L, v(0.0, 0.0, 1.0))                               // outlier
    ).toDF("id", "vec")
    val batch = Seq(
      (5L, v(0.04, 1.0, 0.0)),   // joins pod B
      (8L, v(1.0, 0.01, 0.0)),   // joins pod A
      (7L, v(0.0, 0.0, -1.0))    // attaches nowhere -> new singleton
    ).toDF("id", "vec")
    (corpus, batch)
  }

  test("attachEdges: threshold pairs touch the batch only; " +
      "cross-pod and loner pairs stay out") {
    val (corpus, batch) = growth
    val got = Mining.attachEdges(spark, corpus, batch, 900)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(got == Seq((0L, 8L), (1L, 8L), (2L, 8L), (3L, 5L), (4L, 5L)))
    assertThrows[IllegalArgumentException] {
      Mining.attachEdges(spark, corpus, batch, 1001)
    }
  }

  test("attachEdgesIvf ≡ attachEdges on the planted pods " +
      "(the large-batch cell-bounded form loses nothing when pods fit cells)") {
    val (corpus, batch) = growth
    val brute = Mining.attachEdges(spark, corpus, batch, 900)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    val ivf = Mining.attachEdgesIvf(spark, corpus, batch, 900,
        cells = 4, multiAssign = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(ivf == brute)
  }

  test("clustersDelta ≡ full recompute on the union graph; " +
      "edge-free batch nodes become singletons (the q244 contract)") {
    val (corpus, batch) = growth
    val boot = Mining.semanticClusters(spark, corpus, 2)
    val fold = Mining.clustersDelta(spark,
        boot.select("node", "comp_id"), corpus, batch, 900)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(fold == Seq(
      (0L, 0L, 4L), (1L, 0L, 4L), (2L, 0L, 4L),
      (3L, 3L, 3L), (4L, 3L, 3L), (5L, 3L, 3L),
      (6L, 6L, 1L), (7L, 7L, 1L), (8L, 0L, 4L)))
    // the pin behind the q277 oracle: the fold is indistinguishable
    // from star-contraction CC over (bootstrap edges UNION attach edges)
    val allEmb = corpus.unionAll(batch)
    val unionEdges = Mining.mutualKnn(spark, corpus, 2).select("u", "v")
      .unionAll(Mining.attachEdges(spark, corpus, batch, 900))
    val full = Mining.semanticClustersFromEdges(spark, allEmb, unionEdges)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(fold == full)
  }

  test("sub-batch folds compose: two clustersDelta steps (each attaching " +
      "against everything absorbed so far) ≡ the one-shot fold — the " +
      "q278 streaming contract, incl. idempotent replay") {
    val (corpus, batch) = growth
    val boot = Mining.semanticClusters(spark, corpus, 2)
      .select("node", "comp_id")
    val oneShot = Mining.clustersDelta(spark, boot, corpus, batch, 900)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val b1 = batch.filter(col("id") <= 5L)   // {5}
    val b2 = batch.filter(col("id") > 5L)    // {7, 8}
    val step1 = Mining.clustersDelta(spark, boot, corpus, b1, 900)
      .select("node", "comp_id")
    val corpus2 = corpus.unionAll(b1)
    val step2 = Mining.clustersDelta(spark, step1, corpus2, b2, 900)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(step2 == oneShot)
    // at-least-once replay of the last sub-batch is a label-level no-op
    val replay = Mining.clustersDelta(spark,
        Mining.clustersDelta(spark, step1, corpus2, b2, 900)
          .select("node", "comp_id"),
        corpus2.unionAll(b2), b2, 900)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(replay == oneShot)
  }

  test("thresholdClusters: pods cluster at high tau with min-id keepers; " +
      "IVF form identical when pods fit cells") {
    val e = fixture.select("id", "vec")
    val got = Mining.thresholdClusters(spark, e, 900)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .sorted.toSeq
    assert(got == Seq(
      (0L, 0L, 3L, true), (1L, 0L, 3L, false), (2L, 0L, 3L, false),
      (3L, 3L, 3L, true), (4L, 3L, 3L, false), (5L, 3L, 3L, false),
      (6L, 6L, 1L, true)))
    // keepers = one per cluster, and exactly the SemDeDup survivors
    assert(got.count(_._4) == 3)
    val ivf = Mining.thresholdClustersIvf(spark, e, 900,
        cells = 4, multiAssign = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .sorted.toSeq
    assert(ivf == got)
  }

  test("clustersDelta with an edge-free EMPTY batch leaves labels " +
      "untouched (the quiet-day maintenance run)") {
    val (corpus, batch) = growth
    val boot = Mining.semanticClusters(spark, corpus, 2)
    val before = boot
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val after = Mining.clustersDelta(spark, boot.select("node", "comp_id"),
        corpus, batch.where(org.apache.spark.sql.functions.lit(false)), 900)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(after == before)
  }

  test("clustersDeltaIvf ≡ clustersDelta when pods fit cells") {
    val (corpus, batch) = growth
    val boot = Mining.semanticClusters(spark, corpus, 2)
      .select("node", "comp_id")
    val brute = Mining.clustersDelta(spark, boot, corpus, batch, 900)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val ivf = Mining.clustersDeltaIvf(spark, boot, corpus, batch, 900,
        cells = 4, multiAssign = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(ivf == brute)
  }
}
