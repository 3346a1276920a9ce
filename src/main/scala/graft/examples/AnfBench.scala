package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** ANF LADDER STATE MEASUREMENT — substantiates the q324/q325 scale
  * claim with numbers instead of prose: on a CONNECTED graph the
  * exact neighborhood function's state is the reachable PAIR set
  * (→ n² once the horizon covers the diameter) while HyperANF's
  * register state is n·m rows regardless of connectivity. The 10×
  * StressProbe cannot show this (its replicas are disjoint
  * components, so the exact rung's pair space only grows linearly
  * there — the caveat recorded in BASELINE.md); this bench builds the
  * adversarial case directly.
  *
  * Graph: ring + doubling chords (i→i+1, i→2i mod n) — connected,
  * O(log n) diameter, fully deterministic. At two sizes n and 4n the
  * bench measures (a) the exact rung's final distance-table rows —
  * the quantity that must go ~16× if the state is quadratic — and
  * (b) the HLL rung's register rows — which must go ~4×; estimates
  * are asserted inside the p=6 error band against the exact curve
  * BEFORE any number is reported (outputs first, timing second — the
  * house bench rule).
  *
  * Run: sbt "runMain graft.examples.AnfBench [n] [factor] [maxT]"
  * (defaults 1000, 4, 12). Prints one ANFBENCH json line.
  */
object AnfBench {

  def main(args: Array[String]): Unit = {
    val n0 = args.headOption.map(_.toInt).getOrElse(1000)
    val factor = args.lift(1).map(_.toInt).getOrElse(4)
    val maxT = args.lift(2).map(_.toInt).getOrElse(12)
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def ringDoubling(n: Int) = {
      val ring = (0 until n).map(i => (i.toLong, ((i + 1) % n).toLong))
      val chords = (2 until n).map(i => (i.toLong, (2L * i) % n))
      (ring ++ chords).filter { case (a, b) => a != b }.toDF("u", "v")
    }

    val out = (0 to 1).map { step =>
      val n = n0 * math.pow(factor.toDouble, step.toDouble).toInt
      val edges = ringDoubling(n).cache()
      val t0 = System.nanoTime()
      val exact = graft.graph.Anf.neighborhoodFunctionExact(
        spark, edges, maxT).collect()
      val exactWall = (System.nanoTime() - t0) / 1e9
      // final cumulative pairs == the exact rung's state row count
      val exactPairs = exact.map(_.getLong(2)).max
      val t1 = System.nanoTime()
      val hllDf = graft.graph.Anf.neighborhoodFunctionHll(spark, edges, maxT)
      val hll = hllDf.collect()
      val hllWall = (System.nanoTime() - t1) / 1e9
      // register-state bound: n nodes x 64 buckets (present rows <=)
      val regRows = n.toLong * 64L
      // estimates must track exact inside the p=6 band BEFORE timing
      // is reported (only where exact has the t)
      val exByT = exact.map(r => r.getLong(0) -> r.getLong(2)).toMap
      hll.foreach { r =>
        val t = r.getLong(0)
        exByT.get(t).foreach { ex =>
          val ratio = r.getLong(1).toDouble / 1e6 / ex.toDouble
          require(ratio > 0.5 && ratio < 1.5,
            s"n=$n t=$t hll/exact ratio $ratio outside band")
        }
      }
      edges.unpersist()
      (n, exactPairs, exactWall, regRows, hllWall)
    }
    val (n1, p1, w1, r1, h1) = out(0)
    val (n2, p2, w2, r2, h2) = out(1)
    println(f"""ANFBENCH {"n": [$n1, $n2], "exact_pairs": [$p1, $p2], """ +
      f""""pairs_growth": ${p2.toDouble / p1}%.1f, """ +
      f""""exact_wall_s": [$w1%.1f, $w2%.1f], """ +
      f""""hll_reg_rows": [$r1, $r2], """ +
      f""""reg_growth": ${r2.toDouble / r1}%.1f, """ +
      f""""hll_wall_s": [$h1%.1f, $h2%.1f]}""")
    spark.stop()
  }
}
