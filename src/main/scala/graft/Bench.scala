package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // ICU case-mapping tables take ~60s of CPU to build on first
      // upper()/lower() call (CollationAwareUTF8String static init);
      // the JVM path is identical for this corpus (ASCII) and instant
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // headline set: representative operators, timed end-to-end (results
    // drained via a cheap count over the final plan)
    val headline = (graft.rel.RelQueries.all ++ graft.llm.LlmOps.all).collect {
      case (k, q) if q.headline => k -> q.fn
    }
    // drain through the noop sink: forces full evaluation of every output
    // column (count() would let Catalyst prune unused aggregates)
    def drain(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    // one warm-up pass per query: measure steady-state execution, not
    // first-call codegen/classloading (which a long-lived cluster amortizes)
    headline.foreach { case (_, fn) =>
      try drain(fn) catch { case _: Throwable => () }
    }
    // a crashing query must surface as -1, not as a fast "success" timing
    val results = headline.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { drain(fn); name -> (System.nanoTime() - t0) / 1e9 }
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name FAILED: $e")
        name -> -1.0
      }
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
