package graft

import org.apache.spark.sql.functions._
import graft.rel.Encode

/** WoE encoding: hand-computed smoothed log-odds, single-class
  * categories kept finite by the Laplace floor, and sign semantics
  * (positive-heavy category → positive WoE).
  */
class EncodeSpec extends SparkSpec {

  test("woeEncode: hand values, smoothing, and signs") {
    val sp = spark
    import sp.implicits._
    // a: 3 pos / 1 neg; b: 1 pos / 3 neg; c: 0 pos / 2 neg (smoothed)
    val df = Seq(
      ("a", true), ("a", true), ("a", true), ("a", false),
      ("b", true), ("b", false), ("b", false), ("b", false),
      ("c", false), ("c", false)
    ).toDF("cat", "y")
    val got = Encode.woeEncode(df, "cat", col("y"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    val tp = 4.0; val tn = 6.0
    def woe(p: Long, n: Long): Double =
      BigDecimal(math.log(((p + 0.5) / tp) / ((n + 0.5) / tn)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got("a") == ((3L, 1L, woe(3, 1))))
    assert(got("b") == ((1L, 3L, woe(1, 3))))
    assert(got("c") == ((0L, 2L, woe(0, 2))))
    assert(got("a")._3 > 0 && got("b")._3 < 0 && got("c")._3 < 0)
    // zero-count class survives smoothing with a finite value
    assert(!got("c")._3.isInfinite)
  }
}
