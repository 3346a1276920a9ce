package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Star-contraction vs min-label propagation on a DIAMETER-HEAVY
  * graph — the measured back-to-back for the q239 operator choice.
  * The adversary is a long chain: propagation moves the min label one
  * hop per round (rounds ≈ diameter), large-star/small-star halves
  * tree heights per round (rounds ≈ log₂ n). A chain is not a strawman
  * at corpus scale: near-dup similarity graphs routinely contain long
  * "drifting boilerplate" chains where A≈B≈C≈… without A≈C, which is
  * exactly where the q49-era propagation (capped at maxIter=20)
  * cannot terminate and the contraction closes in a dozen rounds.
  *
  * Shape: one chain of `chainLen` nodes plus `nStars` disjoint
  * 100-node stars (the easy bulk both algorithms eat in one round —
  * keeps the comparison honest about fixed per-round cost).
  * Equality of the component labelings is asserted BEFORE timing.
  *
  * Run: sbt "runMain graft.examples.CcBench [chainLen] [nStars]"
  */
object CcBench {
  def main(args: Array[String]): Unit = {
    val chainLen = args.headOption.map(_.toInt).getOrElse(2000)
    val nStars = args.lift(1).map(_.toInt).getOrElse(500)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val chain = (0L until (chainLen - 1).toLong).map(i => (i, i + 1))
    val stars = (0 until nStars).flatMap { s =>
      val base = 1_000_000L + s * 1000L
      (1 to 100).map(i => (base, base + i))
    }
    val edges = (chain ++ stars).toDF("u", "v").repartition(cpus.toInt)
      .cache()
    edges.count()

    // equality first: same (node -> component) map, modulo column names
    val viaStar = graft.graph.ConnectedComponents
      .connectedComponents(spark, edges)
      .select(col("node"), col("comp_id"))
    // propagation needs rounds ≈ diameter: give it enough iterations
    // to converge so the equality check is apples-to-apples
    val viaProp = graft.llm.Dedup.connectedComponents(
      edges.select(col("u").as("ida"), col("v").as("idb")),
      maxIter = chainLen + 1)
      .select(col("id").as("node"), col("cluster_id").as("comp_id"))
    val diff = viaStar.exceptAll(viaProp).count() +
      viaProp.exceptAll(viaStar).count()
    require(diff == 0, s"labelings disagree on $diff rows")

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val (starRounds, starWall) = {
      val ((_, rounds), w) = time {
        val (df, r) = graft.graph.ConnectedComponents.ccWithRounds(spark, edges)
        (df.count(), r)
      }
      (rounds, w)
    }
    val (_, propWall) = time {
      graft.llm.Dedup.connectedComponents(
        edges.select(col("u").as("ida"), col("v").as("idb")),
        maxIter = chainLen + 1).count()
    }
    println(f"CCBENCH {" +
      f""""chain": $chainLen, "stars": $nStars, """ +
      f""""star_rounds": $starRounds, "star_wall_s": $starWall%.1f, """ +
      f""""prop_wall_s": $propWall%.1f, """ +
      f""""speedup": ${propWall / starWall}%.1f}""")
    spark.stop()
  }
}
