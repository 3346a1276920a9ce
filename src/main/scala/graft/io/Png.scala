package graft.io

import java.nio.ByteBuffer
import java.util.zip.{CRC32, Deflater, Inflater}

/** Minimal PNG codec — pure JVM (java.util.zip Inflater/Deflater +
  * CRC32; the container ships no image codecs), so the multimodal
  * image path runs on the format real crawled corpora actually use,
  * not just the q58 BMP. Implements the public spec (PNG is RFC 2083 /
  * ISO 15948): 8-byte signature, length/type/data/CRC chunks, IHDR
  * validation, zlib-inflated IDAT, and ALL FIVE row filters (None,
  * Sub, Up, Average, Paeth) for 8-bit gray / gray+alpha / RGB / RGBA.
  * Interlaced (Adam7) and sub-8-bit images raise loudly — a counted
  * quarantine beats silent garbage (the [[Bmp]]/[[Wav]] strictness
  * contract). Output is [[Bmp.Gray]] (top-down row-major luminance,
  * integer BT.601 (77R + 150G + 29B) >> 8 — the same pixel contract
  * the BMP path feeds the perceptual hash).
  */
object Png {

  private val Sig: Array[Byte] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  private def crcOf(typeAndData: Array[Byte]): Int = {
    val c = new CRC32
    c.update(typeAndData)
    c.getValue.toInt
  }

  private def chunk(ctype: String, data: Array[Byte]): Array[Byte] = {
    val td = ctype.getBytes("US-ASCII") ++ data
    val bb = ByteBuffer.allocate(4 + td.length + 4)
    bb.putInt(data.length).put(td).putInt(crcOf(td))
    bb.array()
  }

  /** Encode a grayscale raster as an 8-bit color-type-0 PNG.
    * `filterMode`: 0–4 apply that row filter everywhere; -1 cycles
    * filters by row (y mod 5) — the spec uses it to exercise every
    * defilter branch against one image.
    */
  def buildGray(img: Bmp.Gray, filterMode: Int = -1): Array[Byte] =
    build(img.width, img.height, 1,
      img.pixels.map(v => (v & 0xff).toByte), filterMode)

  /** Encode packed 0xRRGGBB pixels as an 8-bit color-type-2 PNG. */
  def buildRgb(width: Int, height: Int, rgb: Array[Int],
      filterMode: Int = -1): Array[Byte] = {
    require(rgb.length == width * height, "pixel count mismatch")
    val raw = new Array[Byte](width * height * 3)
    var i = 0
    while (i < rgb.length) {
      raw(i * 3) = ((rgb(i) >> 16) & 0xff).toByte
      raw(i * 3 + 1) = ((rgb(i) >> 8) & 0xff).toByte
      raw(i * 3 + 2) = (rgb(i) & 0xff).toByte
      i += 1
    }
    build(width, height, 3, raw, filterMode)
  }

  private def build(width: Int, height: Int, channels: Int,
      raw: Array[Byte], filterMode: Int): Array[Byte] = {
    require(width > 0 && height > 0, "empty image")
    require(filterMode >= -1 && filterMode <= 4, s"bad filter $filterMode")
    val bpp = channels
    val stride = width * channels
    val filtered = new Array[Byte](height * (1 + stride))
    var y = 0
    while (y < height) {
      val f = if (filterMode == -1) y % 5 else filterMode
      filtered(y * (1 + stride)) = f.toByte
      var x = 0
      while (x < stride) {
        val cur = raw(y * stride + x) & 0xff
        val left = if (x >= bpp) raw(y * stride + x - bpp) & 0xff else 0
        val up = if (y > 0) raw((y - 1) * stride + x) & 0xff else 0
        val ul = if (y > 0 && x >= bpp) raw((y - 1) * stride + x - bpp) & 0xff else 0
        val enc = f match {
          case 0 => cur
          case 1 => cur - left
          case 2 => cur - up
          case 3 => cur - (left + up) / 2
          case 4 => cur - paeth(left, up, ul)
        }
        filtered(y * (1 + stride) + 1 + x) = (enc & 0xff).toByte
        x += 1
      }
      y += 1
    }
    val defl = new Deflater(Deflater.DEFAULT_COMPRESSION)
    defl.setInput(filtered); defl.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!defl.finished()) out.write(buf, 0, defl.deflate(buf))
    defl.end()
    val colorType = channels match {
      case 1 => 0; case 2 => 4; case 3 => 2; case 4 => 6
    }
    val ihdr = ByteBuffer.allocate(13)
      .putInt(width).putInt(height)
      .put(8.toByte).put(colorType.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    Sig ++ chunk("IHDR", ihdr) ++ chunk("IDAT", out.toByteArray) ++
      chunk("IEND", Array.emptyByteArray)
  }

  /** Strict parse to top-down grayscale: signature, chunk CRCs, IHDR
    * constraints (8-bit, color type 0/2/4/6, no interlace), complete
    * inflated payload, all five defilters. Any violation raises
    * IllegalArgumentException — the quarantine contract.
    */
  def parse(bytes: Array[Byte]): Bmp.Gray = {
    require(bytes.length >= 8 + 25, s"PNG too short: ${bytes.length} bytes")
    var i = 0
    while (i < 8) {
      require(bytes(i) == Sig(i), "not a PNG (bad signature)")
      i += 1
    }
    val bb = ByteBuffer.wrap(bytes)
    bb.position(8)
    var width = 0; var height = 0; var channels = 0
    var seenIhdr = false; var seenIend = false
    val idat = new java.io.ByteArrayOutputStream()
    while (!seenIend) {
      require(bb.remaining() >= 12, "truncated PNG (chunk header)")
      val len = bb.getInt
      require(len >= 0 && len <= bb.remaining() - 8,
        s"chunk length $len overruns buffer")
      val td = new Array[Byte](4 + len)
      bb.get(td)
      val crc = bb.getInt
      require(crc == crcOf(td), "PNG chunk CRC mismatch")
      val ctype = new String(td, 0, 4, "US-ASCII")
      ctype match {
        case "IHDR" =>
          require(!seenIhdr, "duplicate IHDR")
          require(len == 13, s"IHDR length $len")
          val hb = ByteBuffer.wrap(td, 4, 13)
          width = hb.getInt; height = hb.getInt
          require(width > 0 && height > 0 &&
            width.toLong * height <= 100000000L,
            s"unreasonable dimensions ${width}x$height")
          val depth = hb.get() & 0xff
          val ct = hb.get() & 0xff
          val comp = hb.get() & 0xff
          val filt = hb.get() & 0xff
          val inter = hb.get() & 0xff
          require(depth == 8, s"unsupported bit depth $depth (8 only)")
          channels = ct match {
            case 0 => 1; case 2 => 3; case 4 => 2; case 6 => 4
            case other =>
              throw new IllegalArgumentException(s"unsupported color type $other")
          }
          require(comp == 0 && filt == 0, "nonstandard compression/filter")
          require(inter == 0, "interlaced (Adam7) PNG unsupported")
          seenIhdr = true
        case "IDAT" =>
          require(seenIhdr, "IDAT before IHDR")
          idat.write(td, 4, len)
        case "IEND" => seenIend = true
        case _ => () // ancillary chunk: CRC-validated, content ignored
      }
    }
    require(seenIhdr, "missing IHDR")
    val stride = width * channels
    val expect = height.toLong * (1 + stride)
    require(expect <= Int.MaxValue, "raster too large")
    val raw = new Array[Byte](expect.toInt)
    val infl = new Inflater()
    infl.setInput(idat.toByteArray)
    var off = 0
    while (off < raw.length && !infl.finished()) {
      val n = infl.inflate(raw, off, raw.length - off)
      require(n > 0 || infl.finished() || !infl.needsInput,
        "truncated IDAT stream")
      if (n == 0 && infl.needsInput && !infl.finished())
        throw new IllegalArgumentException("truncated IDAT stream")
      off += n
    }
    infl.end()
    require(off == raw.length, s"inflated $off bytes, expected ${raw.length}")
    // defilter in place, row by row
    val bpp = channels
    var y = 0
    while (y < height) {
      val rowOff = y * (1 + stride)
      val f = raw(rowOff) & 0xff
      require(f <= 4, s"bad row filter $f")
      var x = 0
      while (x < stride) {
        val pos = rowOff + 1 + x
        val left = if (x >= bpp) raw(pos - bpp) & 0xff else 0
        val up = if (y > 0) raw(pos - 1 - stride) & 0xff else 0
        val ul = if (y > 0 && x >= bpp) raw(pos - bpp - 1 - stride) & 0xff else 0
        val v = f match {
          case 0 => raw(pos) & 0xff
          case 1 => ((raw(pos) & 0xff) + left) & 0xff
          case 2 => ((raw(pos) & 0xff) + up) & 0xff
          case 3 => ((raw(pos) & 0xff) + (left + up) / 2) & 0xff
          case 4 => ((raw(pos) & 0xff) + paeth(left, up, ul)) & 0xff
        }
        raw(pos) = v.toByte
        x += 1
      }
      y += 1
    }
    // luminance to the Bmp.Gray contract
    val px = new Array[Int](width * height)
    y = 0
    while (y < height) {
      var xi = 0
      while (xi < width) {
        val base = y * (1 + stride) + 1 + xi * channels
        px(y * width + xi) = channels match {
          case 1 | 2 => raw(base) & 0xff
          case _ =>
            val r = raw(base) & 0xff
            val g = raw(base + 1) & 0xff
            val b = raw(base + 2) & 0xff
            (77 * r + 150 * g + 29 * b) >> 8
        }
        xi += 1
      }
      y += 1
    }
    Bmp.Gray(width, height, px)
  }
}
