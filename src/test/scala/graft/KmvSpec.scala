package graft

import org.apache.spark.sql.functions._
import graft.functions.{KmvAgg, KmvBuf}

/** The KMV distinct sketch: set semantics, merge associativity (the
  * property that makes pre-aggregated sketches reusable), estimator
  * accuracy, and the cross-engine md5-prefix hash.
  */
class KmvSpec extends SparkSpec {

  private def sketchOf(agg: KmvAgg, xs: Seq[Long]): KmvBuf =
    xs.foldLeft(agg.zero)(agg.reduce)

  test("reduce keeps the k smallest DISTINCT hashes, sorted") {
    val agg = new KmvAgg(4)
    val b = sketchOf(agg, Seq(9L, 3L, 7L, 3L, 1L, 8L, 2L, 9L))
    assert(b.mins.toSeq == Seq(1L, 2L, 3L, 7L))
  }

  test("merge(a,b) == sketch of concatenation, for random splits") {
    val rnd = new scala.util.Random(7)
    val agg = new KmvAgg(16)
    (1 to 20).foreach { _ =>
      val xs = Seq.fill(300)(rnd.nextLong() & Long.MaxValue)
      val cut = rnd.nextInt(xs.length)
      val (l, r) = xs.splitAt(cut)
      val merged = agg.merge(sketchOf(agg, l), sketchOf(agg, r))
      assert(merged.mins.toSeq == sketchOf(agg, xs).mins.toSeq)
    }
  }

  test("estimate is exact below k and within 40% above it (k=64)") {
    val agg = new KmvAgg(64)
    val small = sketchOf(agg, (1L to 40L).map(x => x * 0x9e3779b97f4a7c15L & ((1L << 60) - 1)))
    assert(agg.finish(small).estimate == 40.0)
    // 5000 distinct pseudo-uniform 60-bit hashes
    val rnd = new scala.util.Random(13)
    val hs = Seq.fill(5000)(rnd.nextLong() & ((1L << 60) - 1)).distinct
    val est = agg.finish(sketchOf(agg, hs)).estimate
    assert(math.abs(est - hs.length) / hs.length < 0.4,
      s"estimate $est too far from ${hs.length}")
  }

  test("spark md5-prefix hash matches DuckDB's hex cast value") {
    // ('0x'||substr(md5('hello'),1,15))::BIGINT in DuckDB = 419982666956583591
    val hv = spark.sql(
      "SELECT CAST(conv(substring(md5(CAST('hello' AS BINARY)), 1, 15), 16, 10) AS BIGINT)")
      .head.getLong(0)
    assert(hv == 419982666956583591L)
  }

  test("q51 sketches at sf0.001 are deterministic across independent runs") {
    val d = "/root/testdata/sf0.001"
    val q = graft.llm.SketchAggOps.all("q51_kmv_distinct").fn
    val a = q(spark, d).collect().map(_.toSeq)
    val b = q(spark, d).collect().map(_.toSeq)
    assert(a.nonEmpty && a.toSeq == b.toSeq)
  }
}
