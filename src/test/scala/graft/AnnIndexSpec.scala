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
