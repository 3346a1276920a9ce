package graft

import org.apache.spark.sql.functions._
import graft.llm.{AnnIndex, IvfOps}
import graft.rel.Tables

/** The persisted-IVF serving path: probing a saved index must be
  * BIT-IDENTICAL to IvfOps.ivfTopK's train-and-probe on the same
  * corpus, and the index scan must be partition-pruned to the probe
  * cells.
  */
class AnnIndexSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.01"

  private def emb = Tables.embeddings(spark, d)
    .select(col("vec_id").as("id"), col("embedding").as("vec"))
  private def q = emb.filter(col("id") < 8)
    .select(col("id").as("qid"), col("vec").as("qvec"))

  test("probeIvf on a saved index equals ivfTopK bit-for-bit") {
    val dir = java.nio.file.Files.createTempDirectory("annidx").toString
    AnnIndex.saveIvf(spark, emb, dir)
    val got = AnnIndex.probeIvf(spark, dir, q, 5).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3), r.getLong(4))).toSeq
    val want = IvfOps.ivfTopK(spark, emb, q, 5).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3), r.getLong(4))).toSeq
    assert(got == want)
  }

  test("probeIvfPq on a saved IVFADC index equals ivfPqTopK bit-for-bit") {
    val dir = java.nio.file.Files.createTempDirectory("annidx-pq").toString
    AnnIndex.saveIvfPq(spark, emb, dir)
    val got = AnnIndex.probeIvfPq(spark, dir, q, 5).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3), r.getLong(4))).toSeq
    val want = graft.llm.IvfPqOps.ivfPqTopK(spark, emb, q, 5).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3), r.getLong(4))).toSeq
    assert(got == want)
  }

  test("OPQ-rotated IVFADC index: rotation persists; probe equals train-and-probe bit-for-bit") {
    val dir = java.nio.file.Files.createTempDirectory("annidx-opq").toString
    AnnIndex.saveIvfPq(spark, emb, dir, opqIters = 8)
    assert(new java.io.File(s"$dir/rotation").exists(),
      "trained rotation not persisted with the index")
    val got = AnnIndex.probeIvfPq(spark, dir, q, 5).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3), r.getLong(4))).toSeq
    val want = graft.llm.IvfPqOps.ivfPqTopK(spark, emb, q, 5, opqIters = 8).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3), r.getLong(4))).toSeq
    assert(got == want)
  }

  test("re-saving without OPQ removes the stale rotation from a prior rotated save") {
    // a rotation-less save into a dir that previously held a rotated
    // index must not leave rotation/ behind — probeIvfPq would apply a
    // rotation the codes were not encoded with (silently wrong ADC)
    val dir = java.nio.file.Files.createTempDirectory("annidx-stale").toString
    AnnIndex.saveIvfPq(spark, emb, dir, opqIters = 8)
    assert(new java.io.File(s"$dir/rotation").exists())
    AnnIndex.saveIvfPq(spark, emb, dir, opqIters = 0)
    assert(!new java.io.File(s"$dir/rotation").exists(),
      "stale rotation survived an unrotated re-save")
    val got = AnnIndex.probeIvfPq(spark, dir, q, 5).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3), r.getLong(4))).toSeq
    val want = graft.llm.IvfPqOps.ivfPqTopK(spark, emb, q, 5).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3), r.getLong(4))).toSeq
    assert(got == want)
  }

  test("probePq on a saved flat-PQ index equals pqTopK bit-for-bit") {
    val dir = java.nio.file.Files.createTempDirectory("annidx-flatpq").toString
    AnnIndex.savePq(spark, emb, dir)
    val got = AnnIndex.probePq(spark, dir, q, 5).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3), r.getLong(4))).toSeq
    val want = graft.llm.PqOps.pqTopK(spark, emb, q, 5).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3), r.getLong(4))).toSeq
    assert(got == want)
  }

  test("OPQ-rotated flat-PQ index: rotation persists; probe equals opqTopK bit-for-bit") {
    val dir = java.nio.file.Files.createTempDirectory("annidx-flatopq").toString
    AnnIndex.savePq(spark, emb, dir, opqIters = 8)
    assert(new java.io.File(s"$dir/rotation").exists(),
      "trained rotation not persisted with the index")
    val got = AnnIndex.probePq(spark, dir, q, 5).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3), r.getLong(4))).toSeq
    val want = graft.llm.OpqOps.opqTopK(spark, emb, q, 5).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3), r.getLong(4))).toSeq
    assert(got == want)
    // unrotated re-save into the same dir drops the stale rotation
    AnnIndex.savePq(spark, emb, dir)
    assert(!new java.io.File(s"$dir/rotation").exists(),
      "stale rotation survived an unrotated flat-PQ re-save")
  }

  test("streaming append finds new vectors; duplicate appends change nothing") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = java.nio.file.Files.createTempDirectory("annidx").toString
    val ck1 = java.nio.file.Files.createTempDirectory("annidx-ck1").toString
    val ck2 = java.nio.file.Files.createTempDirectory("annidx-ck2").toString
    // index built WITHOUT vector 0 — then 0 arrives on the stream
    AnnIndex.saveIvf(spark, emb.filter(col("id") =!= 0), dir)
    val newRows = emb.filter(col("id") === 0)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
    val mem = MemoryStream[(Long, Seq[Float])]
    mem.addData(newRows: _*)
    val sq = AnnIndex.appendIvfStream(spark, mem.toDF.toDF("id", "vec"), dir, ck1)
    try sq.processAllAvailable() finally sq.stop()
    // a self-probe with vector 0's own embedding must now find id 0 first
    val probe = AnnIndex.probeIvf(spark, dir,
      emb.filter(col("id") === 0).select(col("id").as("qid"), col("vec").as("qvec")),
      k = 3, excludeSelfId = false).collect()
    assert(probe.head.getLong(2) == 0L && probe.head.getDouble(3) > 0.999999)
    // at-least-once tolerance: append the SAME rows again -> probe
    // output is unchanged (duplicated assignment rows are harmless)
    val mem2 = MemoryStream[(Long, Seq[Float])]
    mem2.addData(newRows: _*)
    val sq2 = AnnIndex.appendIvfStream(spark, mem2.toDF.toDF("id", "vec"), dir, ck2)
    try sq2.processAllAvailable() finally sq2.stop()
    val probe2 = AnnIndex.probeIvf(spark, dir,
      emb.filter(col("id") === 0).select(col("id").as("qid"), col("vec").as("qvec")),
      k = 3, excludeSelfId = false).collect()
    assert(probe2.map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq ==
      probe.map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq)
  }

  test("compaction collapses duplicate appended rows; probe output is bit-identical") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = java.nio.file.Files.createTempDirectory("annidx-compact").toString
    val ck1 = java.nio.file.Files.createTempDirectory("annidx-cck1").toString
    val ck2 = java.nio.file.Files.createTempDirectory("annidx-cck2").toString
    AnnIndex.saveIvf(spark, emb.filter(col("id") >= 10), dir)
    val newRows = emb.filter(col("id") < 10)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
    // the same rows appended twice (an at-least-once redelivery)
    for (ck <- Seq(ck1, ck2)) {
      val mem = MemoryStream[(Long, Seq[Float])]
      mem.addData(newRows: _*)
      val sq = AnnIndex.appendIvfStream(spark, mem.toDF.toDF("id", "vec"), dir, ck)
      try sq.processAllAvailable() finally sq.stop()
    }
    val before = spark.read.parquet(s"$dir/assignments").count()
    val probeBefore = AnnIndex.probeIvf(spark, dir, q, 5).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3), r.getLong(4))).toSeq
    AnnIndex.compactIvf(spark, dir)
    val after = spark.read.parquet(s"$dir/assignments").count()
    val distinctRows = spark.read.parquet(s"$dir/assignments")
      .select("id", "cell").distinct().count()
    assert(after < before && after == distinctRows,
      s"compaction: $before -> $after rows, distinct $distinctRows")
    val probeAfter = AnnIndex.probeIvf(spark, dir, q, 5).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3), r.getLong(4))).toSeq
    assert(probeAfter == probeBefore, "compaction changed probe output")
  }

  test("the index scan is partition-pruned to the probe cells") {
    val dir = java.nio.file.Files.createTempDirectory("annidx").toString
    AnnIndex.saveIvf(spark, emb, dir)
    val pruned = AnnIndex.prunedAssignments(spark, dir, Seq(0, 3, 5))
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"),
      s"no partition pruning in plan:\n$plan")
    // the pruned scan sees only the requested cells' rows
    val cellsRead = pruned.select("cell").distinct().collect().map(_.getInt(0)).toSet
    assert(cellsRead.subsetOf(Set(0, 3, 5)))
    // and a full scan sees all 16
    val allCells = spark.read.parquet(s"$dir/assignments")
      .select("cell").distinct().count()
    assert(allCells == 16)
  }
}
