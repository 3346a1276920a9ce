package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.rel.SkewJoin

/** Measured demo for [[graft.rel.SkewJoin.saltedEquiJoin]]: a join whose
  * left side is deliberately skewed (87.5% of rows on one key), sized so
  * the hot key's rows land on ONE reduce task and stall the stage.
  *
  * Three variants, timed best-of-N interleaved:
  *   - plain:          defaults (AQE skew-join ON — may or may not split,
  *                     see below)
  *   - plain_no_aqe:   AQE skew-join disabled — the unprotected stall
  *   - salted:         [[SkewJoin.saltedEquiJoin]], AQE skew-join disabled
  *                     (salting must stand on its own)
  *
  * The join output feeds a groupBy on the SAME key: the final aggregate
  * requires hash-distribution by key, the join's shuffle already
  * provides it, and AQE's OptimizeSkewedJoin declines to split a
  * partition whose output distribution a downstream operator depends on
  * — the exact shape where manual salting is the only lever. (The
  * broadcast threshold is set to -1: in production the build side is a
  * big dim that doesn't broadcast; letting the 100k-row fixture
  * broadcast would dodge the shuffle the demo measures.)
  *
  * Results are recorded in BASELINE.md next to the SkewJoin scaladoc
  * citation. Run: sbt "runMain graft.examples.SkewBench [nLeft [salts]]"
  */
object SkewBench {
  def main(args: Array[String]): Unit = {
    val nLeft = args.headOption.map(_.toLong).getOrElse(20000000L)
    val salts = args.lift(1).map(_.toInt).getOrElse(32)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // 7/8 of the fact rows share key 0; the rest spread over 100k keys.
    // v is a per-row payload so the aggregate can't be constant-folded.
    def left: DataFrame = spark.range(0, nLeft, 1, 32)
      .select(
        when(col("id") % 8 === 0, pmod(col("id"), lit(100000L))).otherwise(0L).as("key"),
        col("id").cast("double").as("v"))
    def right: DataFrame = spark.range(100000)
      .select(col("id").as("key"), (col("id") * 2).cast("double").as("w"))

    def drain(df: DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def perKeyAgg(joined: DataFrame): DataFrame =
      joined.groupBy("key").agg(sum(col("v") * col("w")).as("s"))

    def plain = perKeyAgg(left.join(right, "key"))
    def salted = perKeyAgg(SkewJoin.saltedEquiJoin(left, right, "key", salts))

    def withSkewAqe[T](on: Boolean)(f: => T): T = {
      val k = "spark.sql.adaptive.skewJoin.enabled"
      val prev = spark.conf.get(k)
      spark.conf.set(k, on.toString)
      try f finally spark.conf.set(k, prev)
    }

    // warm-up (codegen/classloading), then best-of-N interleaved
    withSkewAqe(true)(drain(plain)); withSkewAqe(false)(drain(salted))
    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_SKEW_REPS", "3").toInt)
    val times = (1 to reps).map { _ =>
      (withSkewAqe(true)(drain(plain)),
        withSkewAqe(false)(drain(plain)),
        withSkewAqe(false)(drain(salted)))
    }
    val (pa, pn, sa) = (times.map(_._1).min, times.map(_._2).min, times.map(_._3).min)
    println(f"[skewbench] nLeft=$nLeft salts=$salts reps=$reps " +
      f"plain_aqe=${pa}%.2fs plain_no_aqe=${pn}%.2fs salted=${sa}%.2fs " +
      f"speedup_vs_plain_no_aqe=${pn / sa}%.2fx")
    println(s"""{"metric":"skew_join","nleft":$nLeft,"salts":$salts,""" +
      s""""plain_aqe_sec":$pa,"plain_no_aqe_sec":$pn,"salted_sec":$sa}""")
    spark.stop()
  }
}
