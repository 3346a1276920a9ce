package graft

import graft.llm.SketchOps

/** The q40/q40b multimodal decode entries against hand-computed
  * features — specifically the ASCII-coupling contract the r5 verdict
  * flagged: q40's byte-based oracle is guarded (fail loud on non-ASCII,
  * never silently wrong), and q40b's codepoint-based 16-bit path stays
  * exact on a non-ASCII corpus.
  */
class MultimodalDecodeSpec extends SparkSpec {

  private def docsDf(texts: Seq[String]) = {
    val s = spark
    import s.implicits._
    texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "fixture") }
      .toDF("doc_id", "text", "source")
  }

  private val nonAscii = Seq(
    "héllo wörld",        // Latin-1 accents: 2-byte UTF-8
    "你好, world ✓",   // CJK + dingbat: 3-byte UTF-8
    "plain ascii line")

  test("multimodalDecode16 is exact on a non-ASCII corpus (codepoint oracle semantics)") {
    val got = SketchOps.multimodalDecode16(spark, docsDf(nonAscii)).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3),
        r.getLong(4), r.getInt(5), r.getString(6)))
    val want = nonAscii.zipWithIndex.map { case (t, i) =>
      val cps = t.codePoints().toArray
      (i.toLong, 16000, 16, cps.length.toLong, cps.map(_.toLong).sum, cps.max, "fixture")
    }
    assert(got.toSeq == want)
  }

  test("multimodalDecode16 fails loud past U+7FFF instead of aliasing") {
    val e = intercept[Exception] {
      val past = "beyond " + Character.toString(0x8001) + " bmp" // U+8001 > U+7FFF
      SketchOps.multimodalDecode16(spark, docsDf(Seq(past))).collect()
    }
    assert(e.getMessage.contains("U+7FFF") || e.getCause != null)
  }

  test("multimodalDecode8 guards the corpus-is-ASCII oracle assumption loudly") {
    val e = intercept[IllegalArgumentException] {
      SketchOps.multimodalDecode8(spark, docsDf(nonAscii))
    }
    assert(e.getMessage.contains("non-ASCII"))
  }

  test("multimodalDecode8 matches byte arithmetic on an ASCII corpus") {
    val ascii = Seq("hello world", "a", "The quick brown fox! 0123")
    val got = SketchOps.multimodalDecode8(spark, docsDf(ascii)).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3),
        r.getLong(4), r.getInt(5), r.getString(6)))
    val want = ascii.zipWithIndex.map { case (t, i) =>
      val bs = t.getBytes("UTF-8").map(_ & 0xff)
      (i.toLong, 16000, 8, bs.length.toLong, bs.map(_.toLong).sum, bs.max, "fixture")
    }
    assert(got.toSeq == want)
  }
}
