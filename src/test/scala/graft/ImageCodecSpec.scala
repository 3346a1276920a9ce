package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.{ByteBuffer, ByteOrder}
import graft.io.{Bmp, Fseq}

/** The pure-JVM BMP and FSEQ codecs behind q58/q59: round-trips
  * (including the 4-byte row padding and bottom-up order a naive BMP
  * reader gets wrong), top-down negative-height handling, resize
  * floor-sampling arithmetic, and strict failures on malformed blobs.
  */
class ImageCodecSpec extends AnyFunSuite {

  test("build24/parse round-trip, width chosen so rows need padding") {
    // width 5 → 15 bytes/row, padded to 16: exercises the stride path
    val img = Bmp.Gray(5, 3, Array.tabulate(15)(i => (i * 17) % 256))
    val p = Bmp.parse(Bmp.build24(img))
    assert(p.width == 5 && p.height == 3)
    assert(p.pixels.toSeq == img.pixels.toSeq)
  }

  test("gray luminance round-trips exactly (77+150+29 = 256)") {
    val img = Bmp.Gray(4, 1, Array(0, 1, 128, 255))
    assert(Bmp.parse(Bmp.build24(img)).pixels.toSeq == Seq(0, 1, 128, 255))
  }

  test("negative height means top-down rows, per the DIB spec") {
    val img = Bmp.Gray(2, 2, Array(10, 20, 30, 40))
    val blob = Bmp.build24(img)
    // flip to top-down: negate height and reverse the two 8-byte rows
    val bb = ByteBuffer.wrap(blob.clone()).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(22, -2)
    val stride = 8
    val off = 54
    val row0 = blob.slice(off, off + stride)
    val row1 = blob.slice(off + stride, off + 2 * stride)
    System.arraycopy(row1, 0, bb.array(), off, stride)
    System.arraycopy(row0, 0, bb.array(), off + stride, stride)
    assert(Bmp.parse(bb.array()).pixels.toSeq == img.pixels.toSeq)
  }

  test("resizeNearest uses floor sampling (ox*w/ow, oy*h/oh)") {
    val img = Bmp.Gray(6, 4, Array.tabulate(24)(identity))
    val rz = Bmp.resizeNearest(img, 3, 2)
    // expected samples: x in {0,2,4}, y in {0,2}
    assert(rz.pixels.toSeq == Seq(0, 2, 4, 12, 14, 16))
    // upscale repeats source pixels, never reads out of bounds
    val up = Bmp.resizeNearest(Bmp.Gray(2, 1, Array(7, 9)), 5, 2)
    assert(up.pixels.toSeq == Seq(7, 7, 7, 9, 9, 7, 7, 7, 9, 9))
  }

  test("malformed BMPs fail loudly") {
    val ok = Bmp.build24(Bmp.Gray(3, 2, Array.fill(6)(1)))
    intercept[IllegalArgumentException](Bmp.parse(ok.take(30)))
    val notBmp = ok.clone(); notBmp(0) = 'X'
    intercept[IllegalArgumentException](Bmp.parse(notBmp))
    val bad8bpp = ok.clone()
    ByteBuffer.wrap(bad8bpp).order(ByteOrder.LITTLE_ENDIAN).putShort(28, 8)
    intercept[IllegalArgumentException](Bmp.parse(bad8bpp))
    val compressed = ok.clone()
    ByteBuffer.wrap(compressed).order(ByteOrder.LITTLE_ENDIAN).putInt(30, 1)
    intercept[IllegalArgumentException](Bmp.parse(compressed))
    // a doctored pixel-data offset pointing INTO the headers must not
    // silently decode header bytes as pixels
    val hdrOff = ok.clone()
    ByteBuffer.wrap(hdrOff).order(ByteOrder.LITTLE_ENDIAN).putInt(10, 0)
    intercept[IllegalArgumentException](Bmp.parse(hdrOff))
    // a huge declared width must not wrap Int stride arithmetic past the
    // bounds check into a giant allocation
    val hugeW = ok.clone()
    ByteBuffer.wrap(hugeW).order(ByteOrder.LITTLE_ENDIAN).putInt(18, 715827883)
    intercept[IllegalArgumentException](Bmp.parse(hugeW))
    // height = Int.MinValue survives math.abs (stays negative) and would
    // slip past the bounds checks as a negative LHS, dying with
    // NegativeArraySizeException outside the codec's documented contract
    val minH = ok.clone()
    ByteBuffer.wrap(minH).order(ByteOrder.LITTLE_ENDIAN).putInt(22, Int.MinValue)
    intercept[IllegalArgumentException](Bmp.parse(minH))
  }

  test("FSEQ round-trip and frame extraction") {
    val frames = Seq(Array.tabulate(6)(i => i.toByte),
      Array.tabulate(6)(i => (10 + i).toByte),
      Array.tabulate(6)(i => (20 + i).toByte))
    val v = Fseq.parse(Fseq.build(3, 2, frames))
    assert(v.width == 3 && v.height == 2 && v.frames == 3)
    assert(v.frame(1).toSeq == frames(1).toSeq)
    intercept[IllegalArgumentException](v.frame(3))
  }

  test("seeded random round-trips: every width mod 4, random payloads") {
    val r = new scala.util.Random(42)
    (1 to 40).foreach { _ =>
      val w = 1 + r.nextInt(33) // hits all 4 stride-padding classes
      val h = 1 + r.nextInt(17)
      val px = Array.fill(w * h)(r.nextInt(256))
      val got = Bmp.parse(Bmp.build24(Bmp.Gray(w, h, px)))
      assert(got.width == w && got.height == h && got.pixels.toSeq == px.toSeq,
        s"bmp round-trip failed at ${w}x$h")
      val n = r.nextInt(200)
      val wav = Array.fill(n)((r.nextInt(65536) - 32768).toShort)
      assert(Wav16RoundTrip(wav), s"wav16 round-trip failed at n=$n")
      val fw = 1 + r.nextInt(9); val fh = 1 + r.nextInt(9)
      val frames = Seq.fill(r.nextInt(5))(Array.fill(fw * fh)(r.nextInt(256).toByte))
      val v = Fseq.parse(Fseq.build(fw, fh, frames))
      assert(v.frames == frames.length &&
        frames.indices.forall(i => v.frame(i).toSeq == frames(i).toSeq),
        s"fseq round-trip failed at ${fw}x$fh x${frames.length}")
    }
  }

  private def Wav16RoundTrip(data: Array[Short]): Boolean = {
    val p = graft.io.Wav.parse(graft.io.Wav.build16(16000, data))
    p.bitsPerSample == 16 && p.samples.toSeq == data.map(_.toInt).toSeq
  }

  test("malformed FSEQ fails loudly") {
    val ok = Fseq.build(2, 2, Seq(Array.fill(4)(1.toByte)))
    intercept[IllegalArgumentException](Fseq.parse(ok.take(10)))
    val short = ok.dropRight(1)
    intercept[IllegalArgumentException](Fseq.parse(short))
    val notFseq = ok.clone(); notFseq(0) = 'X'
    intercept[IllegalArgumentException](Fseq.parse(notFseq))
  }
}
