package graft.examples

import java.util.concurrent.atomic.LongAdder
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.rel.BloomJoin

/** Measured demo for [[graft.rel.BloomJoin]]: a parquet fact table
  * joined to a build side whose selectivity (2%) comes from a filter on
  * a NON-KEY column — the shape where Catalyst cannot transfer the
  * predicate across the join (InferFiltersFromConstraints only moves
  * key-derivable predicates; a filter on `o_orderpriority` tells the
  * optimizer nothing about `l_orderkey`). Both sides are materialized
  * parquet so no functional relation is visible in the plan, broadcast
  * is off (the production build side is big, just selective), and a
  * listener records ACTUAL shuffle-write bytes — the Bloom pre-filter's
  * cut is measured, not inferred.
  *
  * Results go to BASELINE.md next to the BloomJoin scaladoc.
  * Run: sbt "runMain graft.examples.BloomBench [nFact [keySpace]]"
  */
object BloomBench {
  def main(args: Array[String]): Unit = {
    val nFact = args.headOption.map(_.toLong).getOrElse(20000000L)
    val keySpace = args.lift(1).map(_.toLong).getOrElse(1000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      // AQE's own runtime conversion must not quietly broadcast the
      // local fixture and dodge the shuffle the demo measures
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val shuffleBytes = new LongAdder
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null)
          shuffleBytes.add(e.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })

    // materialize both sides: parquet hides how `flag` relates to `key`,
    // exactly like a real dim table's attribute columns
    val dir = java.nio.file.Files.createTempDirectory("bloombench").toString
    spark.range(0, nFact, 1, 32)
      .select(pmod(col("id") * 2654435761L, lit(keySpace)).as("key"),
        col("id").cast("double").as("v"))
      .write.mode("overwrite").parquet(s"$dir/fact")
    spark.range(keySpace)
      .select(col("id").as("key"), pmod(col("id"), lit(50)).cast("int").as("flag"),
        (col("id") * 3).cast("double").as("w"))
      .write.mode("overwrite").parquet(s"$dir/build")

    def fact: DataFrame = spark.read.parquet(s"$dir/fact")
    def build: DataFrame = spark.read.parquet(s"$dir/build")
      .filter(col("flag") === 0).select(col("key"), col("w"))

    def agg(joined: DataFrame): DataFrame =
      joined.groupBy().agg(sum(col("v") * col("w")).as("s"))

    def plain = agg(fact.join(build, "key"))
    def bloomed = agg(BloomJoin.bloomEquiJoin(spark, fact, build, "key",
      expectedNdv = keySpace / 50 + 1))

    def measure(df: => DataFrame): (Double, Long) = {
      // listener events are async: give the bus a moment to settle so
      // the byte counts attribute to this run (a bench, not a proof)
      Thread.sleep(500)
      shuffleBytes.reset()
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      (sec, shuffleBytes.sum())
    }

    measure(plain); measure(bloomed) // warm-up
    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BLOOM_REPS", "3").toInt)
    val runs = (1 to reps).map(_ => (measure(plain), measure(bloomed)))
    val pSec = runs.map(_._1._1).min; val pBytes = runs.map(_._1._2).max
    val bSec = runs.map(_._2._1).min; val bBytes = runs.map(_._2._2).max
    println(f"[bloombench] nFact=$nFact keySpace=$keySpace reps=$reps " +
      f"plain=${pSec}%.2fs/${pBytes / 1e6}%.1fMB " +
      f"bloom=${bSec}%.2fs/${bBytes / 1e6}%.1fMB " +
      f"speedup=${pSec / bSec}%.2fx shuffle_cut=${pBytes.toDouble / bBytes}%.1fx")
    println(s"""{"metric":"bloom_join","nfact":$nFact,""" +
      s""""plain_sec":$pSec,"plain_shuffle_bytes":$pBytes,""" +
      s""""bloom_sec":$bSec,"bloom_shuffle_bytes":$bBytes}""")
    spark.stop()
  }
}
