package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.rel.FuzzyJoin

/** Measured demo for [[graft.rel.FuzzyJoin]]: deletion-neighborhood
  * blocking vs the brute-force cross join it replaces. Both compute
  * the SAME answer (asserted before timing); the difference is the
  * pair space — blocking examines only candidate pairs that share a
  * deletion variant, brute force scores all n(n-1)/2.
  *
  * Caveats recorded with the numbers: local[32] wall times measure a
  * single node; the structural number — candidate pairs examined vs
  * the quadratic pair space — is what transfers to cluster scale,
  * because at 100 TB the cross join is not slow, it is unrunnable.
  * Run: sbt "runMain graft.examples.FuzzyBench [sfDir]"
  */
object FuzzyBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val cust = spark.read.parquet(s"$dir/customer.parquet")
      .select("c_custkey", "c_name").cache()
    val n = cust.count()

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // --- blocked path: candidates examined = distinct id pairs that
    //     meet in some deletion-variant bucket (re-derived here with
    //     the operator's own blocking, pre-verify) ---
    val (blockedPairs, tBlocked) = time {
      FuzzyJoin.selfPairs(spark, cust, "c_custkey", "c_name", maxDist = 1)
        .count()
    }
    // candidate count: pairs sharing >= 1 variant hash (the verify
    // input), computed once for the structural ratio
    val keys = cust.select(col("c_custkey").cast("long").as("id"),
        explode(FuzzyJoin.delVariants(col("c_name"), 1)).as("v"))
      .select(xxhash64(col("v")).as("vh"), col("id"))
    val candidates = keys.as("a").join(keys.as("b"), "vh")
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id")).distinct().count()

    // --- brute force: length-filtered cross join, exact levenshtein on
    //     every surviving pair ---
    val (brutePairs, tBrute) = time {
      val a = cust.select(col("c_custkey").as("ida"), col("c_name").as("sa"))
      val b = cust.select(col("c_custkey").as("idb"), col("c_name").as("sb"))
      a.join(b, col("ida") < col("idb"))
        .filter(levenshtein(col("sa"), col("sb")) <= 1)
        .count()
    }

    require(blockedPairs == brutePairs,
      s"answers differ: blocked=$blockedPairs brute=$brutePairs")

    val quadratic = n * (n - 1) / 2
    val json = f"""{"rows": $n, "true_pairs": $blockedPairs, """ +
      f""""candidates": $candidates, "quadratic_pairs": $quadratic, """ +
      f""""pair_space_cut": ${quadratic.toDouble / candidates}%.1f, """ +
      f""""blocked_sec": $tBlocked%.2f, "brute_sec": $tBrute%.2f, """ +
      f""""speedup": ${tBrute / tBlocked}%.2f}"""
    println(s"FUZZYBENCH $json")
    spark.stop()
  }
}
