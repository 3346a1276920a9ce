package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** SNM vs LSH candidate-pair volume on a BOILERPLATE-SKEWED corpus —
  * the measured form of q240's structural claim: a duplicate cluster
  * of c near-identical documents puts its whole O(c²) pair space into
  * one LSH band bucket, while sorted-neighborhood caps the cluster's
  * contribution at w·c. On crawl corpora (login walls, cookie
  * banners, mirrored templates) c reaches the millions, which is the
  * difference between a shuffle and an outage.
  *
  * Corpus: `nClusters` template clusters of `clusterSize` docs each
  * (identical 32-char prefix, tiny suffix edits — SNM sorts them
  * adjacent AND their shingles collide in LSH bands) plus `nUnique`
  * unrelated docs. Both paths then measure CANDIDATE PAIRS GENERATED
  * — the number that transfers to cluster scale — with wall clock as
  * the local footnote.
  *
  * Run: sbt "runMain graft.examples.SnmBench [clusterSize] [nClusters] [nUnique]"
  */
object SnmBench {
  def main(args: Array[String]): Unit = {
    val clusterSize = args.headOption.map(_.toInt).getOrElse(2000)
    val nClusters = args.lift(1).map(_.toInt).getOrElse(5)
    val nUnique = args.lift(2).map(_.toInt).getOrElse(50000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def junk(seed: Long, n: Int): String = {
      var s = seed * 6364136223846793005L + 1442695040888963407L
      val sb = new StringBuilder
      (0 until n).foreach { _ =>
        s = s * 6364136223846793005L + 1442695040888963407L
        sb.append(('a' + math.floorMod(s, 26)).toChar)
        if (math.floorMod(s >> 8, 5) == 0) sb.append(' ')
      }
      sb.toString
    }
    val clustered = (0 until nClusters).flatMap { c =>
      val template = s"template $c cookie banner accept terms " + junk(c, 200)
      (0 until clusterSize).map { i =>
        (c.toLong * 10_000_000L + i, template + s" variant $i")
      }
    }
    val unique = (0 until nUnique).map(i =>
      (900_000_000L + i, junk(1000 + i, 240)))
    val docs = (clustered ++ unique).toDF("doc_id", "text")
      .repartition(cpus.toInt).cache()
    docs.count()

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    // SNM: window 10 on the 32-char prefix — pair volume ≤ (w−1)·n
    val keyed = docs.select(col("doc_id"),
      lower(substring(col("text"), 1, 32)).as("key"))
    val (snmPairs, snmWall) = time {
      graft.llm.SortedNeighborhood.neighborhoodPairs(
        keyed, Seq(col("key"), col("doc_id")), "doc_id", w = 10).count()
    }
    // LSH: banded minhash candidates — the boilerplate cluster's bands
    // all collide, so its pair space is C(clusterSize, 2) per cluster
    val (lshPairs, lshWall) = time {
      graft.llm.Dedup.minhashCandidates(spark,
        docs.select(col("doc_id").as("id"), col("text"))).count()
    }
    val n = clusterSize.toLong * nClusters + nUnique
    println(f"SNMBENCH {" +
      f""""n_docs": $n, "cluster_size": $clusterSize, """ +
      f""""snm_pairs": $snmPairs, "snm_wall_s": $snmWall%.1f, """ +
      f""""lsh_pairs": $lshPairs, "lsh_wall_s": $lshWall%.1f, """ +
      f""""pair_ratio": ${lshPairs.toDouble / snmPairs}%.1f}""")
    spark.stop()
  }
}
