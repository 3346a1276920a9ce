package graft.examples

import org.apache.spark.sql.SparkSession

/** Robustness sweep: run EVERY `SparkEntry.queries` entry against a
  * directory (default sf0.1 — 10× the verify tier) and classify each
  * as ok / guarded (the VALUES-pinned set must fail loud with the
  * fixture-guard message, never silently go wrong) / FAILED. The
  * claim this maintains: no entry silently breaks, OOMs, or goes
  * quietly wrong above its verify scale.
  * Run: sbt "runMain graft.examples.ScaleSweep [sfDir]"
  */
object ScaleSweep {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var ok, guarded, failed = 0
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        ok += 1
        println(s"[sweep] OK      $name")
      } catch {
        case e: Throwable =>
          val msg = Option(e.getMessage).getOrElse("") +
            Option(e.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
          if (msg.contains("pins oracle VALUES") || msg.contains("fixture")) {
            guarded += 1
            println(s"[sweep] GUARDED $name")
          } else {
            failed += 1
            println(s"[sweep] FAILED  $name: ${e.toString.take(300)}")
          }
      }
    }
    println(s"[sweep] total ok=$ok guarded=$guarded failed=$failed")
    spark.stop()
  }
}
