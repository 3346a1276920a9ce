package graft

import graft.functions.HllAgg

/** HLL register semantics, merge algebra, and estimate accuracy. */
class HllSpec extends SparkSpec {

  private val P = 9

  private def sketch(values: Seq[Long]): Array[Byte] = {
    val agg = new HllAgg(P)
    values.foldLeft(agg.zero)((b, v) => agg.reduce(b, v)).regs.clone()
  }

  // the engine's 60-bit md5-prefix hash, computed locally
  private def h60(s: String): Long =
    java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .take(8).map("%02x".format(_)).mkString.take(15), 16)

  test("bucket and rank derive from the hash bits; all-zero remainder pins rank 52") {
    val agg = new HllAgg(P)
    // hv with bucket 3 and remainder 1 -> rank 51
    val hv = (3L << 51) | 1L
    val b = agg.reduce(agg.zero, hv)
    assert(b.regs(3) == 51 && b.regs.count(_ != 0) == 1)
    // all-zero remainder -> rank 52 (W+1)
    val b2 = agg.reduce(agg.zero, 5L << 51)
    assert(b2.regs(5) == 52)
    // top remainder bit set -> rank 1
    val b3 = agg.reduce(agg.zero, (1L << 51) - 1)
    assert(b3.regs(0) == 1)
  }

  test("merge is elementwise max: split sketch equals whole sketch") {
    val vals = (1 to 5000).map(i => h60(s"tok$i"))
    val (l, r) = vals.splitAt(2500)
    val agg = new HllAgg(P)
    val merged = agg.merge(graft.functions.HllBuf(sketch(l)),
      graft.functions.HllBuf(sketch(r))).regs
    assert(java.util.Arrays.equals(merged, sketch(vals)))
  }

  test("estimate lands within 5% at 20k distinct (raw branch) and exact-ish at 50 (linear branch)") {
    val big = sketch((1 to 20000).map(i => h60(s"w$i")))
    val est = HllAgg.estimate(big, P)
    assert(math.abs(est - 20000) / 20000.0 < 0.05, s"est $est")
    val small = sketch((1 to 50).map(i => h60(s"w$i")))
    val estS = HllAgg.estimate(small, P)
    assert(math.abs(estS - 50) / 50.0 < 0.05, s"est $estS")
  }

  test("denominator units are exact: empty sketch = 512 * 2^52") {
    assert(HllAgg.denomUnits(new Array[Byte](512), P) == 512L * (1L << 52))
  }
}
