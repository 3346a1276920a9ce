package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the prefix filter's candidate-space cut vs the full
  * posting-list pair machinery on a SKEWED synthetic corpus — the
  * regime the filter exists for (the sf0.01 fixture has almost no
  * frequency skew, so its 6.4× is the filter's floor, not its value).
  *
  * Corpus: `nDocs` docs of ~30 tokens drawn with a power-law skew from
  * a 50k vocabulary (deterministic splitmix64 — no RNG), with an exact
  * near-dup twin planted for every 20th doc. Both paths run at the
  * same threshold and df-cap; outputs are asserted identical BEFORE
  * timing (the filter must be lossless), then candidate counts and
  * walls are reported.
  */
object PrefixBench {
  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def main(args: Array[String]): Unit = {
    val nDocs = if (args.nonEmpty) args(0).toInt else 100000
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.ObservedMetricsLog.register(spark)
    import spark.implicits._
    val vocab = 50000
    val docs = spark.range(nDocs.toLong).as[Long].map { i =>
      // every 20th doc is a near-dup twin of its predecessor (one token
      // swapped at position 7)
      val base = if (i % 20 == 1) i - 1 else i
      // every 4th block of 500 docs opens with the SAME 6-token
      // template (real corpora: licence headers, navigation chrome):
      // its shingles hit df=500 — hot enough to explode the pair space,
      // but UNDER a 512 cap, so the lossy-cap guard does not hide them
      val tg = base / 500
      val template: Seq[String] =
        if (tg % 4 == 0) (0 until 6).map(k => s"tmpl${tg}_$k") else Nil
      val toks = template ++ (0 until 30).map { p =>
        if (i % 20 == 1 && p == 7) s"swapped$i"
        else {
          val u = (mix64(base * 31 + p) >>> 11).toDouble / (1L << 53).toDouble
          // power-law: mass concentrates on low token ids
          val id = (vocab * math.pow(u, 3.0)).toInt.min(vocab - 1)
          s"t$id"
        }
      }
      (i, toks.mkString(" "))
    }.toDF("id", "text").cache()
    println(s"[prefixbench] corpus: ${docs.count()} docs")

    val tMilli = 400
    // a HIGH cap is the point: the q34 df-cap is a LOSSY guard (drops
    // hot shingles and with them true pairs); the prefix filter keeps
    // hot shingles in the corpus — they sort to the END of the global
    // order and fall outside prefixes naturally — so the comparison at
    // a high cap shows the pair-space explosion the filter prevents
    // WITHOUT dropping anything
    val cap = if (args.length > 1) args(1).toInt else 512
    def timed[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prefixbench] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // full machinery, filtered at the same integer threshold
    val fullOut = timed("full jaccardPairs") {
      graft.llm.Dedup.jaccardPairs(spark, docs, minJaccard = 0.0, dfCap = cap,
          observePrefix = Some("full"))
        .filter(col("inter") * 1000 >= lit(tMilli) * (col("na") + col("nb") - col("inter")))
        .select("ida", "idb", "inter")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    }
    val prefOut = timed("prefixJaccardPairs") {
      graft.llm.Dedup.prefixJaccardPairs(spark, docs, minJacMilli = tMilli,
          dfCap = cap, observePrefix = Some("pref"))
        .select("ida", "idb", "inter")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    }
    require(fullOut == prefOut,
      s"LOSSLESSNESS VIOLATED: full=${fullOut.size} prefix=${prefOut.size}")
    println(s"[prefixbench] identical outputs: ${fullOut.size} pairs >= t")
    // candidate-space comparison: the full path's pair space is the
    // co-sharing pair count; the prefix path's is its candidate counter
    val sh = docs.as[(Long, String)].flatMap { case (i, t) =>
      graft.llm.SketchOps.shingles64Of(graft.llm.SketchOps.tokensOf(t))
        .iterator.map(g => (i, g))
    }.toDF("doc", "g")
    val kept = sh.join(
      sh.groupBy("g").agg(count(lit(1)).as("df")).filter(col("df") <= cap), "g")
    val fullPairs = kept.as("a").join(kept.as("b"),
        col("a.g") === col("b.g") && col("a.doc") < col("b.doc"))
      .select(col("a.doc"), col("b.doc")).distinct().count()
    println(s"[prefixbench] full distinct co-sharing pair space: $fullPairs")
    spark.stop()
  }
}
