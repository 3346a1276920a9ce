package graft

import graft.llm.SketchOps

/** Pins the quality of the q38 multi-table hyperplane ANN: average
  * recall@5 vs the exact brute-force top-5 must stay ≥ 0.8 on the
  * sf0.01 embeddings (near-uniform vectors, the hardest case for LSH —
  * measured 0.875 with 8 tables × 4 planes). Deterministic: hash family
  * and data are fixed, so this cannot flap.
  */
class AnnRecallSpec extends SparkSpec {
  test("q38_recall: avg recall@5 >= 0.8 vs exact top-5 at sf0.01") {
    val rows = SketchOps.all("q38_recall").fn(spark, "/root/testdata/sf0.01").collect()
    assert(rows.length == 8, s"expected 8 query rows, got ${rows.length}")
    val avg = rows.map(_.getAs[Double]("recall_at_5")).sum / rows.length
    assert(avg >= 0.8, s"avg recall@5 $avg < 0.8")
  }

  test("q55_pq_recall: avg recall@5 >= 0.8 vs exact top-5 at sf0.01") {
    // PQ/ADC with top-100 exact re-rank — measured 0.9; deterministic
    // (seeded sample, k-center codebooks, ordered folds)
    val rows = graft.llm.PqOps.all("q55_pq_recall").fn(spark, "/root/testdata/sf0.01").collect()
    assert(rows.length == 8, s"expected 8 query rows, got ${rows.length}")
    val avg = rows.map(_.getAs[Double]("recall_at_5")).sum / rows.length
    assert(avg >= 0.8, s"avg recall@5 $avg < 0.8")
  }

  test("q56_ivfpq_recall: avg recall@5 >= 0.8 vs exact top-5 at sf0.01") {
    // IVFADC (IVF pruning + PQ residual codes, 2-way multiple
    // assignment) — measured 0.875, same as plain IVF at 32× less
    // scan payload; deterministic (shared seeding, ordered folds)
    val rows = graft.llm.IvfPqOps.all("q56_ivfpq_recall").fn(spark, "/root/testdata/sf0.01").collect()
    assert(rows.length == 8, s"expected 8 query rows, got ${rows.length}")
    val avg = rows.map(_.getAs[Double]("recall_at_5")).sum / rows.length
    assert(avg >= 0.8, s"avg recall@5 $avg < 0.8")
  }

  test("q47_ivf_recall: avg recall@5 >= 0.8 vs exact top-5 at sf0.01") {
    // 2-way multiple assignment at nProbe 6/16 with deterministic
    // k-center seeding — measured 0.875 (single assignment with random
    // seeds was 0.65); deterministic (seeded init, ordered folds)
    val rows = graft.llm.IvfOps.all("q47_ivf_recall").fn(spark, "/root/testdata/sf0.01").collect()
    assert(rows.length == 8, s"expected 8 query rows, got ${rows.length}")
    val avg = rows.map(_.getAs[Double]("recall_at_5")).sum / rows.length
    assert(avg >= 0.8, s"avg recall@5 $avg < 0.8")
  }
}
