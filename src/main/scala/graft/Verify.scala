package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // Optional 3rd arg: comma-separated query keys for a fast local
    // subset run (the driver always runs the full map).
    val keys: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(',').toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // ICU case-mapping tables take ~60s of CPU to build on first
      // upper()/lower() call (CollationAwareUTF8String static init);
      // the JVM path is identical for this corpus (ASCII) and instant
      .config("spark.sql.icu.caseMappings.enabled", "false")
      // events.ts ships as TIMESTAMP(NANOS) in some fixture generations
      // (read as long under this flag) and TIMESTAMP(MICROS) NTZ in
      // others; graft.rel.Tables.events normalizes both to microsecond
      // TimestampType
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // concurrent query workers share the session: FAIR keeps a long
      // entry from serializing the others behind it
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // WindowExec's global-window WARN fires on every execution of the
    // repo's domain-bounded post-agg frames (adjudicated per round in
    // VERDICT) — hundreds of copies bury real warnings in the driver log
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window",
      org.apache.logging.log4j.Level.ERROR)
    ObservedMetricsLog.register(spark)
    new java.io.File(outDir).mkdirs()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // oracle_sql.json is written BEFORE the queries run: if the driver's
    // wall-clock budget kills this process mid-dump, the completed
    // parquet dirs + this file still yield a partial scoreboard instead
    // of an empty one (r7 failure mode: ~140 queries outran the budget
    // and the round recorded {}).
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => keys.forall(_.contains(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Queries run on a worker pool: entries are independent single-JVM
    // Spark jobs that individually underuse local[cpus], so overlapping
    // them cuts the dump from ~7 min sequential to well inside the
    // driver budget. Each worker writes its own outDir/<name> — no
    // shared mutable state beyond the (thread-safe) session.
    val par = sys.env.getOrElse("SPARK_GRAFT_VERIFY_PAR", "4").toInt.max(1)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(par)
    val entries = SparkEntry.queries
      .filter { case (name, _) => keys.forall(_.contains(name)) }.toSeq
    val latch = new java.util.concurrent.CountDownLatch(entries.length)
    entries.foreach { case (name, fn) =>
      pool.submit(new Runnable {
        def run(): Unit = {
          val t0 = System.nanoTime()
          try {
            fn(spark, sfDir).coalesce(1).write.mode("overwrite")
              .parquet(s"$outDir/$name")
            System.err.println(f"[verify] $name ok in ${(System.nanoTime() - t0) / 1e9}%.1fs")
          } catch { case e: Throwable =>
            System.err.println(s"[verify] $name failed: $e")
          } finally latch.countDown()
        }
      })
    }
    latch.await()
    pool.shutdown()
    spark.stop()
  }
}
