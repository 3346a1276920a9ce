package graft

import org.apache.spark.sql.functions._
import graft.rel.Tables

/** Source/sink format coverage beyond parquet: the same table round-trips
  * through JSONL and CSV with content intact (schema enforced on read —
  * inference is a scan-the-data-twice anti-pattern at scale).
  */
class SourcesSpec extends SparkSpec {

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.select(col("doc_id"), col("source"), col("lang"), col("n_chars"), col("text"))
      .orderBy("doc_id").collect().toSeq

  test("documents round-trip through JSONL and CSV") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "source", "lang", "n_chars", "text")
    val want = canon(docs)

    val jdir = java.nio.file.Files.createTempDirectory("graft_jsonl").toString
    docs.write.mode("overwrite").json(jdir)
    val jback = spark.read.schema(docs.schema).json(jdir)
    assert(canon(jback) == want, "jsonl round-trip")

    val cdir = java.nio.file.Files.createTempDirectory("graft_csv").toString
    // text contains arbitrary punctuation/newlines: quote + escape modes on
    docs.write.mode("overwrite")
      .option("header", "true").option("escape", "\"").option("multiLine", "true")
      .csv(cdir)
    val cback = spark.read.schema(docs.schema)
      .option("header", "true").option("escape", "\"").option("multiLine", "true")
      .csv(cdir)
    assert(canon(cback) == want, "csv round-trip")
  }

  test("hive-partitioned write is pruned at the scan by a partition filter") {
    // the at-scale layout: data partitioned by a low-cardinality column so
    // a filter on it prunes whole directories BEFORE any IO happens —
    // visible in the scan's "partition filters" rather than data filters
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "lang", "n_chars", "text")
    val pdir = java.nio.file.Files.createTempDirectory("graft_part").toString
    docs.write.mode("overwrite").partitionBy("lang").parquet(pdir)
    val back = spark.read.parquet(pdir)
    val filtered = back.filter(col("lang") === "en")
    val scan = filtered.queryExecution.executedPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.getOrElse(fail("no FileSourceScanExec in plan"))
    assert(scan.partitionFilters.exists(_.toString.contains("lang")),
      s"lang filter not pushed to partition pruning: ${scan.partitionFilters}")
    // pruning is real: the selected partition count shrinks vs the table's
    val langs = docs.select("lang").distinct().count()
    assert(langs > 1, "fixture has a single lang — pruning not exercised")
    assert(scan.selectedPartitions.partitionCount < langs,
      s"scan read ${scan.selectedPartitions.partitionCount} partitions of $langs")
    // and the data comes back intact for the pruned slice
    val want = docs.filter(col("lang") === "en").select("doc_id", "n_chars")
      .orderBy("doc_id").collect().toSeq
    val got = filtered.select("doc_id", "n_chars").orderBy("doc_id").collect().toSeq
    assert(got == want)
  }
}
