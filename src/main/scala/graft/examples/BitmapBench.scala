package graft.examples

import org.apache.spark.sql.{Encoders, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{BitmapAgg, BitmapMergeCardAgg}

/** Measured demo for [[graft.functions.BitmapAgg]]: the re-aggregation
  * read path. A fact table of (day, user) events is rolled up once into
  * per-(type, day) bitmap partials (persisted parquet — the nightly
  * job); then WEEKLY exact distinct users are computed two ways:
  *   (a) the only option without mergeable state: re-scan all facts and
  *       COUNT(DISTINCT) at the weekly grain;
  *   (b) merge the persisted daily partials (word-OR + popcount) —
  *       facts never touched.
  * Equality is asserted before timing (both are exact). The structural
  * number is rows touched: (b) reads |types|·|days| bitmap rows however
  * large the fact table grows — at 100 TB the fact re-scan is the job
  * and the partial merge is a footnote.
  *
  * Results go to BASELINE.md. Run:
  *   sbt "runMain graft.examples.BitmapBench [nFacts [nUsers [nDays]]]"
  */
object BitmapBench {
  def main(args: Array[String]): Unit = {
    val nFacts = args.headOption.map(_.toLong).getOrElse(20000000L)
    val nUsers = args.lift(1).map(_.toInt).getOrElse(200000)
    val nDays = args.lift(2).map(_.toInt).getOrElse(56)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = java.nio.file.Files.createTempDirectory("bitmapbench").toString
    // facts: deterministic pseudo-random (type, day, user); users are
    // dictionary-dense ids, the domain bitmaps are built for
    spark.range(0, nFacts, 1, 32)
      .select(
        pmod(col("id") * 2654435761L, lit(5)).cast("int").as("etype"),
        pmod(col("id") * 40503L, lit(nDays)).cast("int").as("day"),
        pmod(col("id") * 1299721L, lit(nUsers)).as("uid"))
      .write.mode("overwrite").parquet(s"$dir/facts")
    val facts = spark.read.parquet(s"$dir/facts")

    // nightly rollup: per-(type, day) bitmap partials, persisted
    val bm = udaf(new BitmapAgg(1 << 18), Encoders.scalaLong)
    val t0 = System.nanoTime()
    facts.groupBy("etype", "day").agg(bm(col("uid")).as("bmap"))
      .write.mode("overwrite").parquet(s"$dir/daily_bitmaps")
    val buildS = (System.nanoTime() - t0) / 1e9
    val partials = spark.read.parquet(s"$dir/daily_bitmaps")

    val mc = udaf(new BitmapMergeCardAgg, Encoders.BINARY)
    def weeklyFromFacts() = facts
      .groupBy(col("etype"), (col("day") / 7).cast("int").as("week"))
      .agg(countDistinct(col("uid")).as("n"))
    def weeklyFromPartials() = partials
      .groupBy(col("etype"), (col("day") / 7).cast("int").as("week"))
      .agg(mc(col("bmap")).as("n"))

    // exactness: both paths must agree on every (type, week)
    val a = weeklyFromFacts().collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val b = weeklyFromPartials().collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    require(a == b, s"paths disagree: ${a.size} vs ${b.size} groups")
    println(s"[bitmapbench] equality OK over ${a.size} (type, week) groups")

    def time(f: () => Unit): Double = {
      val reps = (1 to 3).map { _ =>
        val s0 = System.nanoTime(); f(); (System.nanoTime() - s0) / 1e9
      }
      reps.min
    }
    val factS = time(() => weeklyFromFacts().collect())
    val partS = time(() => weeklyFromPartials().collect())
    println(f"[bitmapbench] nFacts=$nFacts nUsers=$nUsers nDays=$nDays " +
      f"partialBuild=$buildS%.2fs factRescan=$factS%.2fs " +
      f"partialMerge=$partS%.2fs speedup=${factS / partS}%.1fx " +
      f"partialRows=${partials.count()} factRows=$nFacts")
    spark.stop()
  }
}
