package graft

import graft.io.{Bmp, Png}

/** PNG codec (q347): round-trips through every filter type, color-type
  * luminance parity with the BMP contract, and the strict-parse
  * quarantine guards.
  */
class PngSpec extends SparkSpec {

  private def raster(w: Int, h: Int): Bmp.Gray =
    Bmp.Gray(w, h, Array.tabulate(w * h)(i => (i * 2654435761L % 251L).toInt))

  test("grayscale round-trip under each fixed filter and the cycling mode") {
    val img = raster(13, 9) // odd sizes exercise the x<bpp/y=0 edges
    for (f <- Seq(-1, 0, 1, 2, 3, 4)) {
      val got = Png.parse(Png.buildGray(img, filterMode = f))
      assert(got.width == 13 && got.height == 9)
      assert(got.pixels.toSeq == img.pixels.toSeq, s"filter $f")
    }
  }

  test("RGB decodes to the same BT.601 luminance the BMP path uses") {
    val w = 7; val h = 5
    val rgb = Array.tabulate(w * h) { i =>
      val r = (i * 37) % 256; val g = (i * 91) % 256; val b = (i * 143) % 256
      (r << 16) | (g << 8) | b
    }
    val got = Png.parse(Png.buildRgb(w, h, rgb, filterMode = -1))
    val want = rgb.map { p =>
      (77 * ((p >> 16) & 0xff) + 150 * ((p >> 8) & 0xff) + 29 * (p & 0xff)) >> 8
    }
    assert(got.pixels.toSeq == want.toSeq)
  }

  test("PNG and BMP of the same raster produce the identical raster") {
    val img = raster(11, 6)
    val viaPng = Png.parse(Png.buildGray(img))
    val viaBmp = Bmp.parse(Bmp.build24(img))
    assert(viaPng.pixels.toSeq == viaBmp.pixels.toSeq)
  }

  test("corrupt streams raise: bad signature, flipped CRC, truncated IDAT, interlace") {
    val img = raster(8, 8)
    val good = Png.buildGray(img)
    val badSig = good.clone(); badSig(0) = 0
    intercept[IllegalArgumentException](Png.parse(badSig))
    val badCrc = good.clone()
    badCrc(badCrc.length - 5) = (badCrc(badCrc.length - 5) ^ 0x55).toByte
    intercept[IllegalArgumentException](Png.parse(badCrc))
    val truncated = java.util.Arrays.copyOf(good, good.length - 16)
    intercept[IllegalArgumentException](Png.parse(truncated))
    // interlace flag sits at IHDR data offset 12 (byte 8+8+4+12 = 32);
    // flipping it must be caught by the CRC, and with a recomputed CRC
    // by the Adam7 guard — exercise the guard via a hand-built IHDR
    val interlaced = good.clone()
    interlaced(8 + 8 + 4 + 12) = 1
    intercept[IllegalArgumentException](Png.parse(interlaced))
  }

  test("lenient near-dup boundary quarantines corrupt blobs and keeps planted pairs") {
    val s = spark
    import s.implicits._
    val blobs = (0L until 52L).map { id =>
      val png = Png.buildGray(
        graft.llm.ImageOps.syntheticGrayNearDup(id), filterMode = -1)
      if (id % 13 == 0) png(0) = 0
      (id, png)
    }.toDF("doc_id", "img")
    val pairs = graft.llm.ImageOps.imagePerceptualDupsPng(s, blobs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // planted copies at id%13==12 pair with id-1; corrupt ids (0,13,26,39)
    // must appear in no pair
    assert(Set((11L, 12L), (24L, 25L), (37L, 38L), (50L, 51L)).subsetOf(pairs))
    assert(!pairs.exists(p => p._1 % 13 == 0 || p._2 % 13 == 0))
  }
}
