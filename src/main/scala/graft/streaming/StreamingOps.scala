package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import scala.collection.immutable.ListMap
import graft.rel.RelQueries.Q

/** Driver-tier streaming entry: the same Structured Streaming pipeline the
  * spec suite exercises, driven END TO END from a file source through a
  * real StreamingQuery and hash-checked against a DuckDB oracle — so the
  * streaming path has an oracle-gated entry, not only `sbt test`
  * coverage.
  */
object StreamingOps {

  /** Run [[EventStream.hourlyByType]] as a file-source streaming query in
    * COMPLETE mode, drained to completion (memory sink — the full result
    * stays on the driver, which is the point of a verification entry;
    * production sinks stream append-mode deltas instead). Complete mode
    * ignores the watermark, so the final table equals the batch
    * aggregation over all data — that equivalence is exactly what the
    * oracle pins.
    */
  def hourlyByTypeFromFiles(s: SparkSession, dir: String,
      queryName: String = "stream_hourly"): DataFrame = {
    val path = s"$dir/events.parquet"
    // batch-side footer read provides the fixed schema (file streaming
    // sources require one — inference would scan the data twice)
    val sch = s.read.parquet(path).schema
    // the fixture is a single file, not a directory: the file stream
    // source insists on a directory/glob path, so address the file via a
    // {…} alternation glob — matches ONLY the fixture, not sibling paths
    // sharing the prefix (a bare `events.parquet*` would silently widen
    // the source to e.g. events.parquet_bak)
    val raw = s.readStream.schema(sch).parquet(s"$dir/{events.parquet}")
    val ev =
      if (sch("ts").dataType == LongType)
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else raw
    val q = EventStream.hourlyByType(ev)
      .writeStream.format("memory").queryName(queryName)
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    s.table(queryName)
  }

  val all: ListMap[String, Q] = ListMap(
    "q54_stream_hourly" -> Q(
      (s, d) =>
        hourlyByTypeFromFiles(s, d)
          .orderBy("wstart", "event_type"),
      Some("""SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS wstart,
             |  event_type, count(*) AS cnt,
             |  CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS value_cents
             |FROM events GROUP BY 1, 2 ORDER BY wstart, event_type""".stripMargin)),
  )
}
