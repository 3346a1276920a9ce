package graft

import org.apache.spark.sql.functions._
import graft.io.Wav
import graft.llm.ImageOps

class AudioDedupSpec extends SparkSpec {

  test("every planted near-dup pair is recovered within the Hamming budget") {
    val s = spark
    import s.implicits._
    val n = 200L
    val blobs = (0L until n)
      .map(id => (id, Wav.build16(8000, ImageOps.syntheticPcmNearDup(id))))
      .toDF("doc_id", "audio")
    val pairs = ImageOps.audioFingerprintDups(s, blobs)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val planted = (0L until n).filter(_ % 11 == 7).map(i => (i - 1, i))
    // deterministic fixture → deterministic recall: 17 of 18 planted
    // pairs surface; (28, 29) sits at Hamming 5 with its bits spread
    // over all four bands — the documented banding miss mode (the
    // pigeonhole guarantee covers Hamming ≤ 3 only, asserted below)
    val found = planted.filter(pairs.contains)
    assert(found.size == 17 && !pairs.contains((28L, 29L)),
      s"recall changed: ${found.size}/18")
    found.foreach(p => assert(pairs(p) <= 6, s"pair $p at ${pairs(p)}"))
    // all 17 found pairs sit within Hamming 3, where a clean band is
    // GUARANTEED by pigeonhole — recovery is structural, not luck
    assert(found.count(p => pairs(p) <= 3) == 17)
    // near-dup, not byte-dup: the perturbed copies differ as blobs
    val b = blobs.collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    planted.foreach { case (a, c) =>
      assert(!java.util.Arrays.equals(b(a), b(c)))
    }
  }

  test("the energy-delta fingerprint is invariant under uniform gain") {
    val s = spark
    import s.implicits._
    val base = ImageOps.syntheticPcmNearDup(3L) // an original, |s| <= 12000
    val doubled = base.map(x => (x * 2).toShort) // still inside 16-bit range
    val blobs = Seq(
      (0L, Wav.build16(8000, base)),
      (1L, Wav.build16(8000, doubled)))
      .toDF("doc_id", "audio")
    val got = ImageOps.audioFingerprintDups(s, blobs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((0L, 1L, 0L))) // identical fingerprint
  }
}
