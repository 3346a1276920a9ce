package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.llm.Dsir

/** Measured demo for DSIR's two scoring shapes
  * ([[graft.llm.Dsir]]): the exact gram-keyed path vs the m-bucket
  * hashed path, scored over the same corpus with PRE-BUILT models so
  * only the per-doc scoring stage is timed.
  *
  * The number that transfers to cluster scale is shuffle WRITE bytes:
  * the exact path must co-locate every gram occurrence with its two
  * model rows — at web scale the distinct-n-gram vocabulary (billions)
  * cannot broadcast, so the occurrence stream crosses the wire; the
  * hashed path's model is m rows BY CONSTRUCTION (broadcastable at any
  * corpus size), so scoring is map-side and the only shuffle left is
  * the docs-sized per-id aggregation. Broadcasts are forced OFF for
  * the exact path to show that cluster-scale shape (same rationale as
  * TriangleBench/EmbeddednessBench: at sf0.1 the vocab still fits a
  * local broadcast and would hide the shuffle); the hashed model's
  * broadcast is explicit in the operator and always valid.
  *
  * Output invariance is asserted BEFORE timing: the exact path's
  * weights are bit-identical with broadcasts on and off (plan shape
  * changes, results must not), and the two paths' top-k selections are
  * compared via [[Dsir.hashedAgreement]].
  *
  * Run: sbt "runMain graft.examples.DsirBench [sfDir] [buckets]"
  */
object DsirBench {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val buckets = args.lift(1).map(_.toInt).getOrElse(16384)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$src/documents.parquet")
      .select(col("doc_id"), col("text"), col("lang")).cache()
    val n = docs.count()
    val target = docs.filter(col("lang") === "en")

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
    def noBroadcast[T](f: => T): T = {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      try f finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "10485760")
      }
    }

    // pre-build and materialize both model generations: only SCORING
    // is under measurement
    val (tm, rm, tot) = Dsir.trainModels(spark, target, docs)
    Seq(("tm", tm), ("rm", rm), ("tot", tot)).foreach { case (nm, df) =>
      df.write.mode("overwrite").parquet(s"/tmp/graft_dsir_bench/$nm")
    }
    val tmD = spark.read.parquet("/tmp/graft_dsir_bench/tm")
    val rmD = spark.read.parquet("/tmp/graft_dsir_bench/rm")
    val totD = spark.read.parquet("/tmp/graft_dsir_bench/tot")
    println(s"[dsir] corpus $n docs, exact model ${rmD.count()} grams, " +
      s"hashed model $buckets buckets")

    // output invariance across plan shape (broadcasts on vs off)
    val wOn = Dsir.dsirScoreWithModels(spark, docs, tmD, rmD, totD)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted
    val wOff = noBroadcast {
      Dsir.dsirScoreWithModels(spark, docs, tmD, rmD, totD)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted
    }
    require(wOn.sameElements(wOff),
      "exact scoring must be plan-shape-invariant in its output")

    // --- exact scoring, cluster shape (vocab too big to broadcast) ---
    val (_, tExact, bExact) = time {
      noBroadcast {
        Dsir.dsirScoreWithModels(spark, docs, tmD, rmD, totD)
          .write.format("noop").mode("overwrite").save()
      }
    }
    // --- hashed scoring (model broadcast is explicit in the operator) ---
    val (_, tHashed, bHashed) = time {
      Dsir.dsirWeightsHashed(spark, target, docs, buckets)
        .write.format("noop").mode("overwrite").save()
    }
    val agree = Dsir.hashedAgreement(spark, target, docs, 25, buckets)
      .collect()(0).getLong(2)

    println(f"[dsir] exact  scoring: wall $tExact%.1f s, shuffle ${bExact / 1048576.0}%.1f MB")
    println(f"[dsir] hashed scoring: wall $tHashed%.1f s, shuffle ${bHashed / 1048576.0}%.1f MB " +
      f"(incl. its model build; top-25 agreement $agree milli)")
    println(f"""DSIRBENCH {"docs": $n, "exact_mb": ${bExact / 1048576.0}%.1f, "hashed_mb": ${bHashed / 1048576.0}%.1f, "cut_x": ${bExact.toDouble / math.max(bHashed, 1)}%.1f, "agree_milli": $agree}""")
    spark.stop()
  }
}
