package graft

import graft.io.{Bmp, Gif, Png}

/** GIF codec (q363): LZW round-trips and strict-parse guards. */
class GifSpec extends SparkSpec {

  private def raster(w: Int, h: Int, seed: Long): Bmp.Gray =
    Bmp.Gray(w, h, Array.tabulate(w * h)(i =>
      ((i * seed + 2654435761L) % 251L).toInt))

  test("round-trips: scrambled, constant (deep LZW chains), and striped rasters") {
    for ((img, tag) <- Seq(
      (raster(37, 23, 40503L), "scrambled"),
      (Bmp.Gray(64, 64, Array.fill(4096)(7)), "constant"),
      (Bmp.Gray(50, 20, Array.tabulate(1000)(i => (i / 50) * 12)), "striped"),
      (raster(3, 2, 17L), "tiny"))) {
      val got = Gif.parse(Gif.buildGray(img))
      assert(got.width == img.width && got.height == img.height, tag)
      assert(got.pixels.toSeq == img.pixels.toSeq, tag)
    }
  }

  test("large raster crosses code-size growth and the 4096-entry clear") {
    val img = raster(200, 150, 1103515245L) // 30k pixels, rich dictionary
    val got = Gif.parse(Gif.buildGray(img))
    assert(got.pixels.toSeq == img.pixels.toSeq)
  }

  test("GIF, PNG and BMP of the same raster decode identically") {
    val img = raster(19, 11, 97L)
    val viaGif = Gif.parse(Gif.buildGray(img)).pixels.toSeq
    val viaPng = Png.parse(Png.buildGray(img)).pixels.toSeq
    val viaBmp = Bmp.parse(Bmp.build24(img)).pixels.toSeq
    assert(viaGif == viaPng && viaPng == viaBmp)
  }

  test("strict guards: bad signature, truncation, interlace flag, missing trailer") {
    val good = Gif.buildGray(raster(16, 16, 31L))
    val badSig = good.clone(); badSig(0) = 'X'.toByte
    intercept[IllegalArgumentException](Gif.parse(badSig))
    intercept[IllegalArgumentException](
      Gif.parse(java.util.Arrays.copyOf(good, good.length - 10)))
    // image-descriptor packed byte: 6 (sig) + 7 (LSD) + 768 (GCT)
    // + 1 (0x2c) + 8 (pos+size) = offset 790
    val inter = good.clone(); inter(790) = 0x40.toByte
    intercept[IllegalArgumentException](Gif.parse(inter))
    val noTrailer = java.util.Arrays.copyOf(good, good.length - 1)
    intercept[IllegalArgumentException](Gif.parse(noTrailer))
  }
}
