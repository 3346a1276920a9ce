package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.io.Tar

/** USTAR codec (io/Tar.scala): golden header fields, 512-boundary
  * payload sizes, checksum validation, quarantine on corruption.
  */
class TarSpec extends AnyFunSuite {

  test("golden header: name, octal size, checksum, magic, typeflag") {
    val body = "hello".getBytes("UTF-8")
    val tar = Tar.build(Seq("doc.txt" -> body))
    // 1 header + 1 padded payload block + 1024 tail
    assert(tar.length == 512 + 512 + 1024)
    assert(new String(tar, 0, 7, "UTF-8") == "doc.txt" && tar(7) == 0)
    assert(new String(tar, 124, 11, "UTF-8") == "00000000005") // size octal
    assert(new String(tar, 257, 5, "UTF-8") == "ustar")
    assert(tar(156) == '0')
    // checksum field: 6 octal digits + NUL + space, matches the sum
    var sum = 0L
    for (i <- 0 until 512)
      sum += (if (i >= 148 && i < 156) ' '.toByte else tar(i)) & 0xff
    val stored = java.lang.Long.parseLong(
      new String(tar, 148, 6, "UTF-8"), 8)
    assert(stored == sum)
  }

  test("round-trips payloads at 512-block boundaries (0/511/512/513)") {
    val members = Seq(0, 511, 512, 513).map { n =>
      s"m$n.bin" -> Array.tabulate(n)(i => ((i * 31 + n) % 256).toByte)
    }
    val back = Tar.parse(Tar.build(members))
    assert(back.length == 4)
    back.zip(members).foreach { case ((n1, b1), (n2, b2)) =>
      assert(n1 == n2 && java.util.Arrays.equals(b1, b2), n2)
    }
  }

  test("quarantine: corrupt magic, broken checksum, truncation all reject") {
    val good = Tar.build(Seq("a.txt" -> "abc".getBytes))
    val badMagic = good.clone(); badMagic(257) = 'X'
    intercept[IllegalArgumentException](Tar.parse(badMagic))
    val badSum = good.clone(); badSum(0) = 'z' // name change breaks chksum
    intercept[IllegalArgumentException](Tar.parse(badSum))
    intercept[IllegalArgumentException](Tar.parse(good.take(512 + 256)))
    intercept[IllegalArgumentException](
      Tar.parse(java.util.Arrays.copyOf(good, 512))) // no end marker
  }
}
