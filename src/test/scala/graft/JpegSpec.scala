package graft

import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO
import javax.imageio.stream.MemoryCacheImageOutputStream
import java.awt.image.BufferedImage

import org.scalatest.funsuite.AnyFunSuite

import graft.io.{Bmp, Jpeg}

/** Baseline JFIF codec (io/Jpeg.scala): DC-exact bit-identical
  * roundtrip (the oracle-replayable fixture path), near-lossless
  * general roundtrip at unit quant, restart markers, interop against
  * the JDK's own ImageIO JPEG codec (gray and 4:2:0 color), and the
  * quarantine contract on progressive/corrupt streams.
  */
class JpegSpec extends AnyFunSuite {

  /** scrambled deterministic raster (the q93 pixel function) */
  private def scrambled(w: Int, h: Int, seed: Long): Bmp.Gray =
    Bmp.Gray(w, h, Array.tabulate(w * h) { i =>
      ((seed * 2654435761L + i.toLong * 40503L) % 509L % 256L).toInt
    })

  test("DC-exact quant roundtrips pixel-constant blocks bit-identically") {
    for (seed <- 1L to 5L) {
      val g = scrambled(5 + (seed % 12).toInt, 4 + (seed % 9).toInt, seed)
      val up = Jpeg.upsample(g, 8)
      val back = Jpeg.parse(Jpeg.buildGray(up, Jpeg.DcExactQuant))
      assert(back.width == up.width && back.height == up.height)
      assert(back.pixels.sameElements(up.pixels), s"seed $seed not bit-exact")
    }
  }

  test("upsampled raster nearest-resizes to the same 8x8 cells as the source") {
    val g = scrambled(11, 7, 3L)
    val up = Jpeg.upsample(g, 8)
    val a = Bmp.resizeNearest(g, 8, 8).pixels
    val b = Bmp.resizeNearest(up, 8, 8).pixels
    assert(a.sameElements(b))
  }

  test("general content roundtrips within +-2 at unit quant (padding included)") {
    // 21x13 is deliberately not a multiple of 8: edge-replicated padding
    val g = scrambled(21, 13, 9L)
    val back = Jpeg.parse(Jpeg.buildGray(g, Jpeg.UnitQuant))
    assert(back.width == 21 && back.height == 13)
    val maxErr = g.pixels.zip(back.pixels).map { case (a, b) => math.abs(a - b) }.max
    assert(maxErr <= 2, s"max roundtrip error $maxErr > 2")
  }

  test("restart markers decode (DRI + RSTn, DC predictors reset)") {
    val g = scrambled(40, 24, 4L) // 5x3 = 15 blocks
    val jpg = Jpeg.buildGray(g, Jpeg.UnitQuant, restartInterval = 4)
    // stream really contains a DRI segment and at least one RST marker
    assert(jpg.sliding(2).exists(p => (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xdd))
    assert(jpg.sliding(2).exists(p => (p(0) & 0xff) == 0xff && ((p(1) & 0xff) & 0xf8) == 0xd0
      && (p(1) & 0xff) != 0xd8 && (p(1) & 0xff) != 0xd9))
    val back = Jpeg.parse(jpg)
    val maxErr = g.pixels.zip(back.pixels).map { case (a, b) => math.abs(a - b) }.max
    assert(maxErr <= 2, s"max roundtrip error with restarts $maxErr > 2")
  }

  private def imageIoBytes(img: BufferedImage, progressive: Boolean = false): Array[Byte] = {
    val w = ImageIO.getImageWritersByFormatName("jpg").next()
    val p = w.getDefaultWriteParam
    if (progressive) p.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val bos = new ByteArrayOutputStream()
    val ios = new MemoryCacheImageOutputStream(bos)
    w.setOutput(ios)
    w.write(null, new javax.imageio.IIOImage(img, null, null), p)
    ios.flush(); w.dispose()
    bos.toByteArray
  }

  test("interop: decodes an ImageIO-written grayscale JPEG like ImageIO does") {
    val g = scrambled(33, 17, 6L)
    val bi = new BufferedImage(33, 17, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 17; x <- 0 until 33)
      bi.getRaster.setSample(x, y, 0, g.pixels(y * 33 + x))
    val jpg = imageIoBytes(bi)
    val mine = Jpeg.parse(jpg)
    val ref = ImageIO.read(new java.io.ByteArrayInputStream(jpg))
    assert(mine.width == 33 && mine.height == 17)
    // two independent IDCTs of the same stream: the spec allows +-1,
    // allow one more for the float-vs-integer IDCT difference
    val diffs = for (y <- 0 until 17; x <- 0 until 33)
      yield math.abs(mine.pixels(y * 33 + x) - ref.getRaster.getSample(x, y, 0))
    assert(diffs.max <= 2, s"max interop diff ${diffs.max} > 2")
  }

  test("interop: decodes an ImageIO-written 4:2:0 color JPEG (smooth content)") {
    // smooth low-frequency color content: chroma upsampling filter
    // differences (replication here vs libjpeg's triangle) stay tiny
    val (w, h) = (32, 24)
    val bi = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) {
      val r = 60 + x * 2
      val g = 100 + y * 2
      val b = 140
      bi.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val jpg = imageIoBytes(bi)
    val mine = Jpeg.parse(jpg)
    val ref = ImageIO.read(new java.io.ByteArrayInputStream(jpg))
    val diffs = for (y <- 0 until h; x <- 0 until w) yield {
      val rgb = ref.getRGB(x, y)
      val luma = (77 * ((rgb >> 16) & 0xff) + 150 * ((rgb >> 8) & 0xff)
        + 29 * (rgb & 0xff)) >> 8
      math.abs(mine.pixels(y * w + x) - luma)
    }
    assert(diffs.max <= 4, s"max color interop diff ${diffs.max} > 4")
  }

  test("quarantine: progressive (SOF2) streams are rejected loudly") {
    val bi = new BufferedImage(16, 16, BufferedImage.TYPE_BYTE_GRAY)
    val jpg = imageIoBytes(bi, progressive = true)
    val e = intercept[IllegalArgumentException](Jpeg.parse(jpg))
    assert(e.getMessage.contains("progressive"))
  }

  test("quarantine: non-baseline SOS scan parameters are rejected loudly") {
    // a SOF0 container whose SOS declares spectral selection /
    // successive approximation (Ss/Se/AhAl != 0/63/0) is
    // non-conforming; decoding it as full-band sequential data would
    // be silent corruption (the r13 advisory)
    val good = Jpeg.buildGray(scrambled(16, 16, 2L), Jpeg.UnitQuant)
    val sos = (0 until good.length - 1).find(i =>
      (good(i) & 0xff) == 0xff && (good(i + 1) & 0xff) == 0xda).get
    // grayscale SOS: FFDA len(2) ns(1) comp(2) Ss Se AhAl
    def withByte(off: Int, v: Int): Array[Byte] = {
      val b = good.clone(); b(sos + off) = v.toByte; b
    }
    val eSs = intercept[IllegalArgumentException](
      Jpeg.parse(withByte(7, 1))) // Ss = 1
    assert(eSs.getMessage.contains("non-baseline scan parameters"))
    val eSe = intercept[IllegalArgumentException](
      Jpeg.parse(withByte(8, 7))) // Se = 7
    assert(eSe.getMessage.contains("non-baseline scan parameters"))
    val eAh = intercept[IllegalArgumentException](
      Jpeg.parse(withByte(9, 0x10))) // Ah = 1
    assert(eAh.getMessage.contains("non-baseline scan parameters"))
  }

  test("quarantine: corrupt and truncated streams are rejected loudly") {
    val good = Jpeg.buildGray(scrambled(16, 16, 2L), Jpeg.UnitQuant)
    intercept[IllegalArgumentException](Jpeg.parse(Array[Byte](1, 2, 3)))
    intercept[IllegalArgumentException] {
      val broken = good.clone(); broken(1) = 0; Jpeg.parse(broken) // no SOI
    }
    intercept[IllegalArgumentException](
      Jpeg.parse(good.take(good.length / 2))) // truncated mid-scan
  }
}
