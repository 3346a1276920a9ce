package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.llm.Curation

/** Measured demo for [[graft.llm.Curation.shuffleCorpus]]: assigning a
  * deterministic global training-order position to every document. The
  * naive formulation — `row_number() OVER (ORDER BY hash)` — range-
  * partitions into a total order whose RANKING collapses onto a single
  * window task (a global running count has one consumer); the
  * bucket-offset decomposition ranks each hash bucket independently and
  * adds driver-computed prefix offsets, so every reducer works and the
  * largest task is ~1/buckets of the data. At cluster scale the naive
  * plan is not slow, it is DEAD — one task holding 100 TB of rank
  * state; locally the gap is already visible.
  *
  * Both variants are checked to produce THE SAME permutation before
  * timing (the decomposition is exact, not an approximation).
  *
  * Results go to BASELINE.md. Run:
  *   sbt "runMain graft.examples.ShuffleBench [nDocs]"
  */
object ShuffleBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(10000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = java.nio.file.Files.createTempDirectory("shufflebench").toString
    spark.range(0, n, 1, 32).select(col("id").as("doc_id"))
      .write.mode("overwrite").parquet(s"$dir/docs")
    def docs: DataFrame = spark.read.parquet(s"$dir/docs")

    def naive(seed: Long): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val hv = conv(substring(md5(
          concat(lit(seed.toString), lit(":"), col("doc_id").cast("string")).cast("binary")),
        1, 15), 16, 10).cast("long")
      docs.withColumn("hv", hv)
        .withColumn("pos",
          (row_number().over(Window.orderBy(col("hv"), col("doc_id"))) - 1).cast("long"))
        .drop("hv")
    }
    def bucketed(seed: Long): DataFrame = Curation.shuffleCorpus(spark, docs, seed)

    // equivalence first: same (doc_id, pos) multiset, checked via an
    // order-insensitive aggregate of the full permutation
    def fp(df: DataFrame): Long =
      df.agg(bit_xor(xxhash64(col("doc_id"), col("pos")))).collect()(0).getLong(0)
    val small = 100000L
    val sDir = java.nio.file.Files.createTempDirectory("shufflebench-s").toString
    spark.range(small).select(col("id").as("doc_id"))
      .write.mode("overwrite").parquet(s"$sDir/docs")
    val sDocs = spark.read.parquet(s"$sDir/docs")
    import org.apache.spark.sql.expressions.Window
    val sHv = conv(substring(md5(
        concat(lit("7"), lit(":"), col("doc_id").cast("string")).cast("binary")),
      1, 15), 16, 10).cast("long")
    val sNaive = sDocs.withColumn("hv", sHv)
      .withColumn("pos",
        (row_number().over(Window.orderBy(col("hv"), col("doc_id"))) - 1).cast("long"))
      .drop("hv")
    require(fp(sNaive) == fp(Curation.shuffleCorpus(spark, sDocs, 7L)),
      "bucketed permutation diverged from the naive window at 100k docs")
    println(s"[shufflebench] equivalence OK at $small docs")

    def time(tag: String, mk: Long => DataFrame): Double = {
      val ts = (1 to 3).map { rep =>
        val t0 = System.nanoTime()
        mk(7L + rep).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[shufflebench] $tag: best ${ts.min}%.2f s of ${ts.map(t => f"$t%.2f").mkString(", ")}")
      ts.min
    }
    val tB = time(s"bucketed ($n docs)", bucketed)
    val tN = time(s"naive global window ($n docs)", naive)
    println(f"[shufflebench] speedup ${tN / tB}%.2fx (naive $tN%.2f s / bucketed $tB%.2f s)")
    spark.stop()
  }
}
