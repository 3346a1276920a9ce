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
}
