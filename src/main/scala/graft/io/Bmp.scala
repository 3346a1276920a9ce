package graft.io

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal BMP (Windows DIB, 24-bit uncompressed) codec — pure JVM, no
  * ImageIO/codecs, so the multimodal IMAGE decode path (q58) runs a
  * REAL parser in this container, like [[Wav]] does for audio. Covers
  * the canonical layout: BITMAPFILEHEADER + BITMAPINFOHEADER (40-byte),
  * bottom-up rows, 24-bit BGR pixels, rows padded to 4-byte boundaries
  * — the padding and bottom-up order being exactly the details a naive
  * reader gets wrong, which is why the spec pins them.
  *
  * Parse is strict (magic, header sizes, dimensions, bounds) for the
  * same reason [[Wav.parse]] is: a 100 TB multimodal pipeline meets
  * malformed blobs, and a counted loud failure beats silent garbage
  * features.
  */
object Bmp {

  /** grayscale image, row-major top-down, one Int 0-255 per pixel */
  final case class Gray(width: Int, height: Int, pixels: Array[Int])

  private val fileHeader = 14
  private val infoHeader = 40

  private def rowSize(width: Int): Long = (width.toLong * 3 + 3) & ~3L

  /** wrap a top-down grayscale raster as a 24-bit BMP (B=G=R=value) */
  def build24(img: Gray): Array[Byte] = {
    require(img.width > 0 && img.height > 0, "empty image")
    require(img.pixels.length == img.width * img.height,
      s"pixel count ${img.pixels.length} != ${img.width}x${img.height}")
    val stride = rowSize(img.width).toInt
    val size = fileHeader + infoHeader + stride * img.height
    val bb = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(size)
      .putShort(0).putShort(0).putInt(fileHeader + infoHeader)
    bb.putInt(infoHeader).putInt(img.width).putInt(img.height)
      .putShort(1) // planes
      .putShort(24) // bpp
      .putInt(0) // BI_RGB (uncompressed)
      .putInt(stride * img.height)
      .putInt(2835).putInt(2835) // 72 dpi
      .putInt(0).putInt(0)
    // bottom-up: last raster row first
    var y = img.height - 1
    while (y >= 0) {
      var x = 0
      while (x < img.width) {
        val v = (img.pixels(y * img.width + x) & 0xff).toByte
        bb.put(v).put(v).put(v)
        x += 1
      }
      var pad = stride - img.width * 3
      while (pad > 0) { bb.put(0.toByte); pad -= 1 }
      y -= 1
    }
    bb.array()
  }

  /** strict parse of a 24-bit uncompressed BMP to top-down grayscale
    * (luminance by integer BT.601: (77R + 150G + 29B) >> 8)
    */
  def parse(bytes: Array[Byte]): Gray = {
    require(bytes.length >= fileHeader + infoHeader,
      s"BMP too short: ${bytes.length} bytes")
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(bb.get() == 'B'.toByte && bb.get() == 'M'.toByte, "not a BMP")
    val declared = bb.getInt
    require(declared <= bytes.length, s"declared size $declared overruns buffer")
    bb.getShort(); bb.getShort()
    val dataOff = bb.getInt
    val hdrSize = bb.getInt
    require(hdrSize >= infoHeader, s"unsupported DIB header size $hdrSize")
    val width = bb.getInt
    val heightRaw = bb.getInt
    // Int.MinValue would survive math.abs (stays negative) and turn the
    // bounds checks below into vacuous negative-LHS comparisons, dying
    // later with NegativeArraySizeException instead of this codec's
    // IllegalArgumentException contract (which quarantine catches)
    require(width > 0 && heightRaw != 0 && heightRaw != Int.MinValue,
      s"bad dimensions ${width}x$heightRaw")
    val topDown = heightRaw < 0 // negative height = top-down, per the spec
    val height = math.abs(heightRaw)
    require(bb.getShort() == 1, "planes must be 1")
    val bpp = bb.getShort()
    require(bpp == 24, s"only 24-bit supported, got $bpp")
    require(bb.getInt == 0, "only uncompressed (BI_RGB) supported")
    // lower bound too: a doctored offset pointing INTO the headers would
    // silently decode header bytes as pixels (and width*height must fit
    // an Int — stride is Long so a huge declared width can't wrap the
    // bounds check into passing)
    require(dataOff >= fileHeader + infoHeader && dataOff <= bytes.length,
      s"bad pixel data offset $dataOff")
    val stride64 = rowSize(width)
    require(width.toLong * height <= Int.MaxValue &&
      dataOff.toLong + stride64 * height <= bytes.length,
      s"pixel data overruns buffer")
    val stride = stride64.toInt
    val px = new Array[Int](width * height)
    var row = 0
    while (row < height) {
      val srcY = if (topDown) row else height - 1 - row
      var x = 0
      var off = dataOff + srcY * stride
      while (x < width) {
        val b = bytes(off) & 0xff
        val g = bytes(off + 1) & 0xff
        val r = bytes(off + 2) & 0xff
        px(row * width + x) = (77 * r + 150 * g + 29 * b) >> 8
        x += 1
        off += 3
      }
      row += 1
    }
    Gray(width, height, px)
  }

  /** nearest-neighbor resize (the pixel at (ox*w/ow, oy*h/oh) — integer
    * floor sampling, the arithmetic a SQL oracle can reproduce exactly)
    */
  def resizeNearest(img: Gray, ow: Int, oh: Int): Gray = {
    require(ow > 0 && oh > 0, "empty target")
    val out = new Array[Int](ow * oh)
    var oy = 0
    while (oy < oh) {
      val sy = oy * img.height / oh
      var ox = 0
      while (ox < ow) {
        val sx = ox * img.width / ow
        out(oy * ow + ox) = img.pixels(sy * img.width + sx)
        ox += 1
      }
      oy += 1
    }
    Gray(ow, oh, out)
  }
}
