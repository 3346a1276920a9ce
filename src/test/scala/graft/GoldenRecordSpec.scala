package graft

import org.apache.spark.sql.functions._

/** q145's survivorship policy on constructed duplicate clusters. */
class GoldenRecordSpec extends SparkSpec {

  test("richest-copy policy picks max tokens, ties to lower id") {
    val s = spark
    import s.implicits._
    val work = java.nio.file.Files.createTempDirectory("golden").toString
    // cluster A: docs 1,2,3 near-identical; 2 is longest -> canonical 2.
    // cluster B: docs 10,11 same length -> tie -> canonical 10.
    // doc 99 unrelated -> no cluster row.
    val base = (1 to 30).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, base), (2L, base + " extra word"), (3L, base),
      (10L, "x y z " * 10 + "p q r s t u v w"),
      (11L, "x y z " * 10 + "p q r s t u v w"),
      (99L, "completely different content with nothing shared here at all " * 3))
    docs.toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("src0").as("source"), length(col("text")).cast("long").as("n_chars"))
      .write.mode("overwrite").parquet(s"$work/documents.parquet")
    val got = graft.SparkEntry.queries("q145_golden_record")(s, work)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got(1L) == (2L, 3L), s"cluster 1 should canonicalize to doc 2: $got")
    assert(got(10L) == (10L, 2L), s"tie should go to the lower id: $got")
    assert(got.size == 2, s"unclustered docs must not appear: $got")
  }
}
