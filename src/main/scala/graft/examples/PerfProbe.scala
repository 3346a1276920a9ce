package graft.examples

import org.apache.spark.sql.SparkSession

/** Isolates where per-query wall time goes (session start, codegen warmup,
  * warm re-run) — run: sbt "runMain graft.examples.PerfProbe"
  */
object PerfProbe {
  def time[A](tag: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[probe] $tag: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = time("session start") {
      val s = SparkSession.builder()
        .master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
      // ICU case-mapping tables take ~60s of CPU to build on first
      // upper()/lower() call (CollationAwareUTF8String static init);
      // the JVM path is identical for this corpus (ASCII) and instant
      .config("spark.sql.icu.caseMappings.enabled", "false")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.extensions", "graft.functions.GraftExtensions")
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      s
    }
    time("range count") { spark.range(1000000).count() }
    time("range count 2") { spark.range(1000000).count() }
    val q01 = graft.rel.RelQueries.all("q01_pricing_summary").fn
    time("q01 cold") { q01(spark, sfDir).count() }
    time("q01 warm") { q01(spark, sfDir).count() }
    time("q01 warm2") { q01(spark, sfDir).count() }
    for (qn <- Seq("q03_top_revenue", "q06_revenue_forecast", "q01_pricing_summary")) {
      println(s"===== $qn =====")
      graft.rel.RelQueries.all(qn).fn(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
