package graft

import graft.io.Warc

/** WARC reader/writer (q356): round-trip and the strict-parse guards. */
class WarcSpec extends SparkSpec {

  private def rec(id: Long, body: String) =
    (Map("WARC-Type" -> "response",
      "WARC-Target-URI" -> s"http://x/doc/$id"),
      body.getBytes("UTF-8"))

  test("multi-record round-trip preserves headers and payload bytes") {
    val bytes = Warc.build(Seq(rec(1, "hello world"), rec(2, ""),
      rec(3, "payload with\r\nCRLF inside")))
    val got = Warc.parse(bytes)
    assert(got.map(_.targetUri.get) ==
      Seq("http://x/doc/1", "http://x/doc/2", "http://x/doc/3"))
    assert(new String(got(2).payload, "UTF-8") == "payload with\r\nCRLF inside",
      "Content-Length framing must survive CRLF bytes inside the payload")
    assert(got(1).payload.isEmpty)
    assert(got.forall(_.warcType == "response"))
  }

  test("gzip multi-member round-trip (the Common Crawl layout) and corrupt-member raise") {
    val recs = Seq(rec(1, "hello"), rec(2, "world wide web"))
    val gz = Warc.buildGz(recs.map(r => (r._1, r._2)))
    val got = Warc.parseGz(gz)
    assert(got.map(r => new String(r.payload, "UTF-8")) ==
      Seq("hello", "world wide web"))
    // two independent members: the second starts with its own magic
    val magic2 = gz.indexOfSlice(Array(0x1f.toByte, 0x8b.toByte), 2)
    assert(magic2 > 0, "expected a second gzip member")
    // truncate the last member's CRC/ISIZE trailer: the member check
    // must fail loudly, never return a silently-short record list
    intercept[Exception](
      Warc.parseGz(java.util.Arrays.copyOf(gz, gz.length - 6)))
  }

  test("zstd multi-frame round-trip (.warc.zst) and truncation raise") {
    val recs = Seq(rec(1, "alpha"), rec(2, "beta gamma"))
    val zst = Warc.buildZst(recs.map(r => (r._1, r._2)))
    val got = Warc.parseZst(zst)
    assert(got.map(r => new String(r.payload, "UTF-8")) ==
      Seq("alpha", "beta gamma"))
    intercept[Exception](
      Warc.parseZst(java.util.Arrays.copyOf(zst, zst.length - 5)))
  }

  test("strict guards: truncation, bad version, missing headers, bad terminator") {
    val good = Warc.build(Seq(rec(1, "abcdef")))
    intercept[IllegalArgumentException] {
      Warc.parse(java.util.Arrays.copyOf(good, good.length - 3))
    }
    val badVer = good.clone(); badVer(5) = '9'
    intercept[IllegalArgumentException](Warc.parse(badVer))
    // drop the WARC-Type header
    intercept[IllegalArgumentException] {
      Warc.parse(Warc.build(Seq(
        (Map("WARC-Target-URI" -> "http://x"), "p".getBytes))))
    }
    // corrupt the record terminator
    val badTerm = good.clone(); badTerm(badTerm.length - 1) = 'X'
    intercept[IllegalArgumentException](Warc.parse(badTerm))
  }
}
