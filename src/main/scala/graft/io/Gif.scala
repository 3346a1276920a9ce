package graft.io

/** Minimal GIF87a codec — pure JVM, completing the lossless image trio
  * next to [[Bmp]] and [[Png]]: logical screen descriptor, global
  * color table, ONE image block, real LZW (variable code width,
  * LSB-first bit packing, clear/end codes, dictionary growth to 12
  * bits with the KwKwK early-reference case). Interlaced images and
  * missing color tables raise loudly; extension blocks (0x21) are
  * CRC-free by design, so they are length-walked and skipped.
  *
  * Decode output is [[Bmp.Gray]] via the shared integer BT.601
  * luminance of the palette entries — a GIF, PNG, and BMP of the same
  * raster hash identically through the perceptual pipeline.
  */
object Gif {

  /** Encode a grayscale raster as a GIF87a with a 256-gray palette and
    * real LZW compression.
    */
  def buildGray(img: Bmp.Gray): Array[Byte] = {
    require(img.width > 0 && img.height > 0 && img.width <= 0xffff &&
      img.height <= 0xffff, "bad dimensions")
    require(img.pixels.length == img.width * img.height, "pixel count")
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write("GIF87a".getBytes("US-ASCII"))
    w16(img.width); w16(img.height)
    out.write(0xf7) // GCT present, 8 bits, 256 entries
    out.write(0); out.write(0)
    var i = 0
    while (i < 256) { out.write(i); out.write(i); out.write(i); i += 1 }
    out.write(0x2c) // image descriptor
    w16(0); w16(0); w16(img.width); w16(img.height)
    out.write(0) // no LCT, not interlaced
    out.write(8) // LZW minimum code size
    out.write(lzwEncode(img.pixels.map(_ & 0xff), 8))
    out.write(0)    // block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** GIF-LZW encode `data` (values < 2^minCode) into length-prefixed
    * sub-blocks.
    */
  private def lzwEncode(data: Array[Int], minCode: Int): Array[Byte] = {
    val clear = 1 << minCode; val end = clear + 1
    val bits = new java.io.ByteArrayOutputStream()
    var cur = 0L; var nbits = 0
    var codeSize = minCode + 1
    def emit(code: Int): Unit = {
      cur |= code.toLong << nbits; nbits += codeSize
      while (nbits >= 8) { bits.write((cur & 0xff).toInt); cur >>= 8; nbits -= 8 }
    }
    var dict = scala.collection.mutable.HashMap.empty[List[Int], Int]
    var next = end + 1
    def reset(): Unit = { dict = scala.collection.mutable.HashMap.empty
      next = end + 1; codeSize = minCode + 1 }
    emit(clear); reset()
    var prefix: List[Int] = Nil
    var prefixCode = -1
    data.foreach { px =>
      val cand = px :: prefix // reversed-list key: cheap prepend
      val candCode = if (prefix.isEmpty) px else dict.getOrElse(cand, -1)
      if (candCode >= 0) { prefix = cand; prefixCode = candCode }
      else {
        emit(prefixCode)
        dict(cand) = next; next += 1
        // GIF's "early change": the code width grows as soon as the
        // table size reaches the current code space
        if (next == (1 << codeSize) && codeSize < 12) codeSize += 1
        if (next >= 4096) { emit(clear); reset() }
        prefix = px :: Nil; prefixCode = px
      }
    }
    if (prefix.nonEmpty) emit(prefixCode)
    emit(end)
    if (nbits > 0) bits.write((cur & 0xff).toInt)
    val raw = bits.toByteArray
    val out = new java.io.ByteArrayOutputStream()
    var off = 0
    while (off < raw.length) {
      val n = math.min(255, raw.length - off)
      out.write(n); out.write(raw, off, n); off += n
    }
    out.toByteArray
  }

  /** Strict parse to top-down grayscale. */
  def parse(bytes: Array[Byte]): Bmp.Gray = {
    require(bytes.length > 13, s"GIF too short: ${bytes.length}")
    val sig = new String(bytes, 0, 6, "US-ASCII")
    require(sig == "GIF87a" || sig == "GIF89a", s"not a GIF: '$sig'")
    var pos = 6
    def u8(): Int = { val v = bytes(pos) & 0xff; pos += 1; v }
    def u16(): Int = { val v = (bytes(pos) & 0xff) | ((bytes(pos + 1) & 0xff) << 8)
      pos += 2; v }
    val sw = u16(); val sh = u16()
    val packed = u8(); u8(); u8()
    val gct: Array[Int] =
      if ((packed & 0x80) != 0) readPalette(bytes, 1 << ((packed & 7) + 1),
        { val p = pos; pos += 3 * (1 << ((packed & 7) + 1)); p })
      else Array.empty
    var result: Bmp.Gray = null
    var done = false
    while (!done) {
      require(pos < bytes.length, "truncated GIF (no trailer)")
      u8() match {
        case 0x3b => done = true
        case 0x21 => // extension: label + length-walked sub-blocks
          u8()
          var n = u8()
          while (n != 0) { pos += n; require(pos < bytes.length,
            "truncated GIF extension"); n = u8() }
        case 0x2c =>
          require(result == null, "multi-image GIF unsupported")
          u16(); u16() // left, top
          val iw = u16(); val ih = u16()
          require(iw == sw && ih == sh,
            "sub-rectangle image blocks unsupported")
          val ipacked = u8()
          require((ipacked & 0x40) == 0, "interlaced GIF unsupported")
          val pal: Array[Int] =
            if ((ipacked & 0x80) != 0) readPalette(bytes,
              1 << ((ipacked & 7) + 1),
              { val p = pos; pos += 3 * (1 << ((ipacked & 7) + 1)); p })
            else gct
          require(pal.nonEmpty, "GIF image has no color table")
          val minCode = u8()
          require(minCode >= 2 && minCode <= 8, s"bad LZW min code $minCode")
          // concatenate sub-blocks
          val data = new java.io.ByteArrayOutputStream()
          var n = u8()
          while (n != 0) {
            require(pos + n <= bytes.length, "truncated GIF image data")
            data.write(bytes, pos, n); pos += n; n = u8()
          }
          val idx = lzwDecode(data.toByteArray, minCode, iw * ih)
          val px = idx.map { v =>
            require(v < pal.length, s"palette index $v out of range")
            pal(v)
          }
          result = Bmp.Gray(iw, ih, px)
        case other =>
          throw new IllegalArgumentException(
            f"unknown GIF block 0x$other%02x at ${pos - 1}")
      }
    }
    require(result != null, "GIF contains no image block")
    result
  }

  /** palette → BT.601 luminance ints */
  private def readPalette(bytes: Array[Byte], n: Int, at: Int): Array[Int] = {
    require(at + 3 * n <= bytes.length, "truncated color table")
    Array.tabulate(n) { i =>
      val r = bytes(at + 3 * i) & 0xff
      val g = bytes(at + 3 * i + 1) & 0xff
      val b = bytes(at + 3 * i + 2) & 0xff
      (77 * r + 150 * g + 29 * b) >> 8
    }
  }

  /** GIF-LZW decode exactly `expect` indices. */
  private def lzwDecode(data: Array[Byte], minCode: Int,
      expect: Int): Array[Int] = {
    val clear = 1 << minCode; val end = clear + 1
    val out = new Array[Int](expect)
    var outN = 0
    var codeSize = minCode + 1
    // dictionary as (prefixCode, lastChar); roots are codes < clear
    val prefixOf = new Array[Int](4096)
    val charOf = new Array[Int](4096)
    var next = end + 1
    def firstChar(code: Int): Int = {
      var c = code
      while (c >= clear) c = prefixOf(c)
      c
    }
    def expand(code: Int): Unit = {
      // write code's string; measure length by walking prefixes
      var len = 0; var c = code
      while (c >= clear) { len += 1; c = prefixOf(c) }
      len += 1
      require(outN + len <= expect, "LZW output exceeds raster size")
      var w = outN + len - 1; c = code
      while (c >= clear) { out(w) = charOf(c); w -= 1; c = prefixOf(c) }
      out(w) = c
      outN += len
    }
    var cur = 0L; var nbits = 0; var pos = 0
    def read(): Int = {
      while (nbits < codeSize) {
        require(pos < data.length, "truncated LZW stream")
        cur |= (data(pos) & 0xffL) << nbits; pos += 1; nbits += 8
      }
      val v = (cur & ((1L << codeSize) - 1)).toInt
      cur >>= codeSize; nbits -= codeSize
      v
    }
    var prev = -1
    var done = false
    // the decoder's table trails the encoder's by ONE entry (it can
    // only define the previous code's continuation after seeing the
    // current code), so it must widen one entry earlier than the
    // encoder's early-change point
    def grow(): Unit =
      if (next == (1 << codeSize) - 1 && codeSize < 12) codeSize += 1
    while (!done) {
      val code = read()
      if (code == end) done = true
      else if (code == clear) { next = end + 1; codeSize = minCode + 1; prev = -1 }
      else if (prev < 0) {
        // first code after a clear must be a palette root
        require(code < clear, s"LZW stream starts with non-root code $code")
        expand(code); prev = code
      } else if (code == next) {
        // KwKwK: the code being referenced is the one being defined
        require(next < 4096, "LZW table overflow")
        prefixOf(next) = prev; charOf(next) = firstChar(prev); next += 1
        grow()
        expand(code); prev = code
      } else {
        require(code < next, s"undefined LZW code $code")
        expand(code)
        if (next < 4096) {
          prefixOf(next) = prev; charOf(next) = firstChar(code); next += 1
          grow()
        }
        prev = code
      }
    }
    require(outN == expect, s"LZW decoded $outN of $expect pixels")
    out
  }
}
