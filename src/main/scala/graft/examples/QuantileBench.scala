package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.rel.Robust

/** Measured demo for the grouped exact-quantile claim
  * ([[graft.rel.Robust.groupedExactQuantiles]]): all (group, q) values
  * ride ONE histogram pass + a single-bucket refinement, vs the naive
  * per-group sort window (`row_number() OVER (PARTITION BY g ORDER BY
  * c)`) that sorts EVERY group's full row set on single tasks.
  *
  * The number that transfers is the LARGEST SINGLE-TASK LOAD, not
  * shuffle bytes (both forms move roughly the column once — measured
  * here and recorded honestly): the window form sorts each group on
  * ONE task, so its heaviest task carries the largest whole group —
  * unbounded at 100 TB; the histogram form's heaviest stage is a hash
  * aggregation over (group, value) that parallelizes freely, so its
  * heaviest task carries ~1/partitions of one bucket's value counts.
  * Outputs asserted identical before timing.
  *
  * Run: sbt "runMain graft.examples.QuantileBench [sfDir]"
  */
object QuantileBench {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val qs = Seq(500L, 900L, 990L)
    val li = spark.read.parquet(s"$src/lineitem.parquet")
      .select(col("l_returnflag").as("g"),
        round(col("l_extendedprice") * 100, 0).cast("long").as("c"))
      .cache()
    val n = li.count()

    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
    val maxTaskRecords = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        shuffleBytes.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
      override def onTaskEnd(
          te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null)
          maxTaskRecords.getAndAccumulate(
            te.taskMetrics.shuffleReadMetrics.recordsRead, math.max)
    })
    def settle(): (Long, Long) = {
      Thread.sleep(1500); (shuffleBytes.get(), maxTaskRecords.get())
    }
    def time[T](f: => T): (T, Double, Long, Long) = {
      settle(); maxTaskRecords.set(0L)
      val (b0, _) = settle()
      val t0 = System.nanoTime(); val r = f
      val dt = (System.nanoTime() - t0) / 1e9
      val (b1, m1) = settle()
      (r, dt, b1 - b0, m1)
    }

    import spark.implicits._
    def naive() = {
      val w = Window.partitionBy("g").orderBy("c")
      val ranked = li.withColumn("rn", row_number().over(w))
      val st = li.groupBy("g").agg(count(lit(1)).as("n"))
      val targets = st.crossJoin(
          qs.map(q => (q, q)).toDF("q_milli", "q2").select(col("q_milli")))
        .withColumn("k", (col("q_milli") * (col("n") - 1)) / lit(1000L) + 1)
        .withColumn("k", col("k").cast("long"))
      ranked.join(targets, ranked("g") === targets("g")
          && ranked("rn") === targets("k"))
        .select(ranked("g"), col("q_milli"), col("n"), col("c").as("value"))
    }

    val hOut = Robust.groupedExactQuantiles(li, "g", "c", qs)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3))).sorted
    val nOut = naive().collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3))).sorted
    require(hOut.sameElements(nOut),
      s"quantile outputs must match: ${hOut.toSeq} vs ${nOut.toSeq}")

    val (_, tH, bH, mH) = time {
      Robust.groupedExactQuantiles(li, "g", "c", qs)
        .write.format("noop").mode("overwrite").save()
    }
    val (_, tN, bN, mN) = time {
      naive().write.format("noop").mode("overwrite").save()
    }
    println(f"[quant] histogram selection: wall $tH%.1f s, shuffle ${bH / 1048576.0}%.2f MB, max task $mH records")
    println(f"[quant] per-group sort:      wall $tN%.1f s, shuffle ${bN / 1048576.0}%.2f MB, max task $mN records")
    println(f"""QUANTILEBENCH {"rows": $n, "hist_mb": ${bH / 1048576.0}%.2f, "sort_mb": ${bN / 1048576.0}%.2f, "max_task_hist": $mH, "max_task_sort": $mN, "task_cut_x": ${mN.toDouble / math.max(mH, 1)}%.1f}""")
    spark.stop()
  }
}
