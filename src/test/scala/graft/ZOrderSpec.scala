package graft

import org.apache.spark.sql.functions._
import graft.functions.ZValue
import graft.io.Layout

/** Z-order layout: the interleave must match a bit-by-bit reference,
  * reject out-of-range inputs loudly, keep curve locality (quadrant
  * prefixes), and the clustered rewrite must preserve the data exactly.
  */
class ZOrderSpec extends SparkSpec {

  /** slow bit-by-bit reference */
  private def ref(a: Long, b: Long): Long = {
    var z = 0L
    var i = 0
    while (i < 31) {
      z |= ((a >> i) & 1L) << (2 * i)
      z |= ((b >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  test("interleave matches the bit-by-bit reference") {
    val r = new scala.util.Random(9)
    assert(ZValue.interleave(0, 0) == 0L)
    assert(ZValue.interleave(1, 0) == 1L)
    assert(ZValue.interleave(0, 1) == 2L)
    assert(ZValue.interleave((1L << 31) - 1, (1L << 31) - 1) == (1L << 62) - 1)
    (1 to 1000).foreach { _ =>
      val a = r.nextLong() & 0x7fffffffL
      val b = r.nextLong() & 0x7fffffffL
      assert(ZValue.interleave(a, b) == ref(a, b), s"mismatch at ($a, $b)")
    }
  }

  test("out-of-range inputs fail loudly, not with masked garbage") {
    intercept[IllegalArgumentException](ZValue.interleave(-1, 0))
    intercept[IllegalArgumentException](ZValue.interleave(0, 1L << 31))
  }

  test("quadrant locality: the top bit pair is the quadrant id") {
    val h = 1L << 30
    // (lo,lo) < (hi,lo) < (lo,hi) < (hi,hi) regardless of low bits
    val corners = Seq((h - 1, h - 1), (h, 0L), (0L, h), (h, h))
      .map { case (a, b) => ZValue.interleave(a, b) >> 60 }
    assert(corners == Seq(0L, 1L, 2L, 3L))
  }

  test("z_value is callable from SQL and codegen'd") {
    val s = spark
    ZValue.register(s)
    val got = s.sql("SELECT z_value(5L, 9L) AS z").collect()(0).getLong(0)
    assert(got == ref(5, 9))
  }

  test("zorderWrite preserves the data exactly") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    val df = s.range(0, 10000)
      .select(pmod(col("id") * 7919, lit(512)).as("k1"),
        pmod(col("id") * 104729, lit(512)).as("k2"),
        col("id").as("payload"))
    Layout.zorderWrite(s, df, "k1", "k2", dir, files = 4)
    val got = s.read.parquet(dir).as[(Long, Long, Long)].collect().sorted.toSeq
    val want = df.as[(Long, Long, Long)].collect().sorted.toSeq
    assert(got == want)
  }
}
