package graft.rel

import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.rel.RelQueries.Q
import graft.rel.Tables

/** TABLE-MAINTENANCE OPERATORS — the operational side of a lakehouse
  * engine: small-file compaction (and, already elsewhere, Z-order
  * clustering q71, snapshot diff q101, SCD2 q117, index compaction in
  * the lexical/ANN tiers).
  */
object Maintenance {

  /** one fragmented-documents rewrite per dataset for the q183 entry */
  private val fragmented = scala.collection.concurrent.TrieMap[String, String]()

  /** one two-generation (v1 without `lang` / v2 with it) rewrite per
    * dataset for the q195 schema-evolution entry; even doc_ids are the
    * v1 generation
    */
  private val evolved = scala.collection.concurrent.TrieMap[String, String]()

  private def evolvedDirFor(s: org.apache.spark.sql.SparkSession,
      d: String): String =
    evolved.getOrElseUpdate(d, {
      val work = java.nio.file.Files.createTempDirectory("graft-q195")
      sys.addShutdownHook {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(work.toFile)
      }
      val base = work.resolve("docs").toString
      val docs = Tables.documents(s, d)
      docs.filter(col("doc_id") % 2 === 0)
        .select(col("doc_id"), col("n_chars")) // v1 schema: no lang
        .write.mode("overwrite").parquet(s"$base/gen=1")
      docs.filter(col("doc_id") % 2 === 1)
        .select(col("doc_id"), col("n_chars"), col("lang"))
        .write.mode("overwrite").parquet(s"$base/gen=2")
      base
    })

  private def fragmentedDirFor(s: org.apache.spark.sql.SparkSession,
      d: String): String =
    fragmented.getOrElseUpdate(d, {
      val work = java.nio.file.Files.createTempDirectory("graft-q183")
      sys.addShutdownHook {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(work.toFile)
      }
      val dir = work.resolve("frag").toString
      // simulate streaming-ingest decay: 50 tiny files
      Tables.documents(s, d).repartition(50)
        .write.mode("overwrite").parquet(dir)
      dir
    })

  val all: ListMap[String, Q] = ListMap(
    // ---- q183: COMPACTION — a 50-small-file documents table rewritten
    //      under maxRecordsPerFile=200 ([[graft.io.Layout.compact]]).
    //      The entry pins the maintenance CONTRACT: row parity, the
    //      deterministic post-compaction file count
    //      ceil(rows / 200), and that the rewritten table still
    //      aggregates identically (per-lang counts replayed by the
    //      oracle from the ORIGINAL table — compaction must be
    //      invisible to readers). ----
    "q183_compaction" -> Q(
      (s, d) => {
        val frag = fragmentedDirFor(s, d)
        val out = java.nio.file.Files.createTempDirectory("graft-q183-out")
          .resolve("compact").toString
        val (before, after, rows) =
          graft.io.Layout.compact(s, frag, out, maxRecordsPerFile = 200L,
            sortCols = Seq("doc_id"))
        val stats = s.range(1).select(
          lit(before).as("files_before"), lit(after).as("files_after"),
          lit(rows).as("rows"))
        val byLang = s.read.parquet(out).groupBy("lang")
          .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"))
        byLang.crossJoin(stats)
          .select(col("lang"), col("n_docs"), col("sum_chars"),
            col("files_before"), col("files_after"), col("rows"))
          .orderBy("lang")
      },
      Some("""SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
             |  CAST(50 AS BIGINT) AS files_before,
             |  CAST(ceil(CAST((SELECT count(*) FROM documents) AS DOUBLE) / 200)
             |    AS BIGINT) AS files_after,
             |  CAST((SELECT count(*) FROM documents) AS BIGINT) AS rows
             |FROM documents GROUP BY lang ORDER BY lang""".stripMargin)),

    // ---- q195: SCHEMA EVOLUTION READ — two parquet generations of the
    //      documents table (v1 without `lang`, v2 with it) read through
    //      ONE mergeSchema scan: old files surface the new column as
    //      NULL, which is the lakehouse schema-evolution contract every
    //      long-lived table depends on. The entry pins the unified
    //      schema and the null-fill accounting; the oracle replays the
    //      generation split from the source table. ----
    "q195_schema_evolution" -> Q(
      (s, d) => {
        val base = evolvedDirFor(s, d)
        s.read.option("mergeSchema", "true").parquet(base)
          .groupBy(coalesce(col("lang"), lit("_absent_in_v1")).as("lang_read"))
          .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"))
          .orderBy("lang_read")
      },
      Some("""SELECT lang_read, CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(n_chars) AS BIGINT) AS sum_chars FROM (
             |  SELECT CASE WHEN doc_id % 2 = 0 THEN '_absent_in_v1' ELSE lang END
             |    AS lang_read, n_chars
             |  FROM documents)
             |GROUP BY lang_read ORDER BY lang_read""".stripMargin)),
  )
}
