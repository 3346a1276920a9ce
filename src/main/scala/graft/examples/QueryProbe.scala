package graft.examples

import org.apache.spark.sql.SparkSession

/** Run named SparkEntry queries in isolation with timing reps — the
  * iterate-on-one-query loop (Bench runs the whole headline set; Verify
  * dumps everything). Usage:
  *   sbt "runMain graft.examples.QueryProbe <sfDir> <name> [<name>...]"
  * Env: PROBE_REPS (default 3), PROBE_SHOW=1 prints the result.
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: QueryProbe <sfDir> <name> [<name>...]")
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    val reps = sys.env.get("PROBE_REPS").flatMap(_.toIntOption).getOrElse(3)
    val show = sys.env.get("PROBE_SHOW").contains("1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.ObservedMetricsLog.register(spark)
    names.foreach { name =>
      val fn = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query '$name'; known: ${graft.SparkEntry.queries.keys.mkString(", ")}"))
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $name reps=${times.map(t => f"$t%.2f").mkString(",")} min=${times.min}%.2fs")
      if (show) fn(spark, sfDir).show(50, truncate = false)
    }
    spark.stop()
  }
}
