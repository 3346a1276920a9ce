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
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    ObservedMetricsLog.register(spark)
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
    // Best-of-N per query, reps INTERLEAVED round-robin across queries:
    // the host is shared and sees periodic CPU-starvation bursts of
    // ~12-70s (3-6x slowdowns). Back-to-back reps of a ~1s query all fit
    // inside one burst — min-of-N is then pure noise; spreading each
    // query's reps a full round (~10s+) apart means a burst costs each
    // query at most one rep. A crashing query surfaces as -1, not as a
    // fast "success" timing.
    val repsRaw = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "5")
    val reps = repsRaw.toIntOption.getOrElse(
      sys.error(s"SPARK_GRAFT_BENCH_REPS must be an integer >= 1, got '$repsRaw'"))
    require(reps >= 1, s"SPARK_GRAFT_BENCH_REPS must be >= 1, got $reps")
    val rounds = (1 to reps).map { _ =>
      headline.map { case (name, fn) =>
        val t0 = System.nanoTime()
        name -> (try { drain(fn); (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: $e")
          -1.0
        })
      }
    }
    val results = headline.map { case (name, _) =>
      val times = rounds.map(_(name))
      val ok = times.filter(_ >= 0)
      name -> (if (ok.isEmpty) -1.0 else ok.min, times)
    }
    val qs = results.map { case (k, (v, _)) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // every rep per query, so the consumer can see host-starvation
    // variance (3-6x run-to-run here) instead of a lone min poisoned or
    // flattered by one outlier rep; -1 marks a failed rep
    val repJson = results.map { case (k, (_, ts)) =>
      s"\"" + k + "\":" + ts.mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val total = results.map(_._2._1).filter(_ >= 0).sum
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"rep_times":$repJson,"sf":"$sfDir"}"""
    println(json)
    // belt-and-suspenders for consumers that can't see a clean stdout
    // (e.g. output multiplexed through a build-tool logger)
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH_local.json"),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Throwable => System.err.println(s"[bench] file write failed: $e") }
    spark.stop()
  }
}
