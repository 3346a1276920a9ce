package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.rel.Experiment

/** Measured demo for the Poisson bootstrap's scale claim
  * ([[graft.rel.Experiment.bootstrapCi]]): all R replicates ride ONE
  * narrow pass whose R×-expanded weighted rows collapse by MAP-SIDE
  * partial aggregation to |groups|·R partial sums before the shuffle.
  *
  * The number that transfers to cluster scale is shuffle WRITE bytes:
  * the naive "materialize each resample, then aggregate" shape
  * (forced here by repartitioning the expanded rows on (group,
  * replicate) before the agg — exactly what an implementation that
  * builds R resampled tables does) puts R× the corpus on the wire;
  * the operator's shape puts |groups|·R partial rows there, a volume
  * independent of the corpus. Replicate means are asserted IDENTICAL
  * between the shapes before timing.
  *
  * Run: sbt "runMain graft.examples.ExperimentBench [sfDir] [reps]"
  */
object ExperimentBench {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(40)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val events = graft.rel.Tables.events(spark, src)
      .select(col("event_type"), col("event_id"),
        round(col("value") * 1000, 0).cast("long").as("v"))
      .cache()
    val n = events.count()

    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        shuffleBytes.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })
    def settle(): Long = { Thread.sleep(1500); shuffleBytes.get() }
    def time[T](f: => T): (T, Double, Long) = {
      val b0 = settle()
      val t0 = System.nanoTime(); val r = f
      val dt = (System.nanoTime() - t0) / 1e9
      (r, dt, settle() - b0)
    }

    // output invariance across plan shape BEFORE timing
    val mCombine = Experiment.bootstrapMeans(events, "event_type",
      "event_id", "v", reps).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sorted
    val mShuffled = Experiment.bootstrapMeans(events, "event_type",
      "event_id", "v", reps, shuffleExpanded = true).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sorted
    require(mCombine.sameElements(mShuffled),
      "replicate means must be identical across plan shapes")

    val (_, tC, bC) = time {
      Experiment.bootstrapMeans(events, "event_type", "event_id", "v", reps)
        .write.format("noop").mode("overwrite").save()
    }
    val (_, tS, bS) = time {
      Experiment.bootstrapMeans(events, "event_type", "event_id", "v", reps,
        shuffleExpanded = true)
        .write.format("noop").mode("overwrite").save()
    }
    println(f"[exp] map-side combine: wall $tC%.1f s, shuffle ${bC / 1048576.0}%.2f MB")
    println(f"[exp] naive resample:   wall $tS%.1f s, shuffle ${bS / 1048576.0}%.2f MB")
    println(f"""EXPERIMENTBENCH {"rows": $n, "reps": $reps, "combine_mb": ${bC / 1048576.0}%.2f, "naive_mb": ${bS / 1048576.0}%.2f, "cut_x": ${bS.toDouble / math.max(bC, 1)}%.1f}""")
    spark.stop()
  }
}
