package graft.io

import java.io.ByteArrayOutputStream

/** Baseline JFIF (ISO/IEC 10918-1 sequential DCT, Huffman) codec —
  * pure JVM, no ImageIO/codecs, so the dominant image format of real
  * crawled corpora runs a REAL parser in this container, completing
  * the BMP/PNG/GIF ladder ([[Bmp]], [[Png]], [[Gif]]). Decoder covers
  * the baseline profile a crawl actually yields: SOF0/SOF1, 8-bit,
  * 1- or 3-component (grayscale / YCbCr), chroma sampling factors 1-2
  * (4:4:4, 4:2:2, 4:2:0), multiple DQT/DHT segments, restart markers
  * (DRI/RSTn), byte stuffing, APPn/COM skip. Progressive (SOF2),
  * arithmetic (SOF9+), hierarchical, and 12-bit streams are REJECTED
  * with IllegalArgumentException — the decode-quarantine contract
  * (q77/q347 pattern): a counted loud failure beats silent garbage
  * features.
  *
  * Exactness note for oracles: JPEG is lossy, so fixture entries that
  * need a SQL-replayable raster encode PIXEL-CONSTANT 8×8 blocks with
  * [[DcExactQuant]] (DC step 8). A constant block's DCT is DC-only
  * with F(0,0) = 8·(v−128): quantizing by 8 stores v−128 exactly and
  * the IDCT reconstructs v bit-for-bit — the roundtrip is EXACT by
  * construction, while still driving the full marker / Huffman /
  * dequant / IDCT path. General content roundtrips are covered by
  * specs (within-±2 at quant 1, plus javax.imageio interop).
  *
  * The encoder is grayscale-only (fixtures); tables are the public
  * Annex K luminance sets.
  */
object Jpeg {

  /** zigzag position -> natural (row-major) coefficient index */
  private val Zig: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  /** Annex K Table K.3 — luminance DC Huffman spec (counts per code
    * length 1..16, then the symbols in canonical order)
    */
  private val DcLumBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcLumVals = (0 to 11).map(_.toByte).toArray

  /** Annex K Table K.5 — luminance AC Huffman spec */
  private val AcLumBits = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcLumVals: Array[Byte] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16,
    0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7,
    0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5,
    0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4,
    0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea,
    0xf1, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa
  ).map(_.toByte)

  /** Annex K Table K.1 — the standard luminance quantization table
    * (quality ~50), natural order
    */
  val StdLumQuant: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)

  /** near-lossless table (all 1s) — specs roundtrip general content
    * through it within ±2
    */
  val UnitQuant: Array[Int] = Array.fill(64)(1)

  /** DC step 8, AC step 1: pixel-constant 8×8 blocks (F(0,0)=8·(v−128),
    * all AC zero) roundtrip BIT-EXACTLY — the oracle-replayable encode
    */
  val DcExactQuant: Array[Int] = { val q = Array.fill(64)(1); q(0) = 8; q }

  /** IDCT/FDCT cosine table via StrictMath — identical on every JVM */
  private val Cos: Array[Double] = {
    val t = new Array[Double](64)
    var u = 0
    while (u < 8) {
      var x = 0
      while (x < 8) {
        t(u * 8 + x) = StrictMath.cos((2 * x + 1) * u * StrictMath.PI / 16.0)
        x += 1
      }
      u += 1
    }
    t
  }
  private val InvSqrt2 = 1.0 / StrictMath.sqrt(2.0)

  // ---------------------------------------------------------------- encode

  private final class BitWriter(out: ByteArrayOutputStream) {
    private var acc = 0L
    private var nbits = 0
    def put(bits: Int, n: Int): Unit = {
      require(n >= 0 && n <= 24, s"bad bit count $n")
      acc = (acc << n) | (bits & ((1L << n) - 1))
      nbits += n
      while (nbits >= 8) {
        val b = ((acc >>> (nbits - 8)) & 0xff).toInt
        out.write(b)
        if (b == 0xff) out.write(0x00) // byte stuffing
        nbits -= 8
      }
    }
    def flush(): Unit = if (nbits > 0) put(0x7f, 8 - nbits) // pad with 1s
  }

  private def canonicalCodes(bits: Array[Int], vals: Array[Byte]): Map[Int, (Int, Int)] = {
    // symbol -> (code, length), canonical assignment per the spec
    var code = 0
    var k = 0
    val m = Map.newBuilder[Int, (Int, Int)]
    var len = 1
    while (len <= 16) {
      var i = 0
      while (i < bits(len - 1)) {
        m += (vals(k) & 0xff) -> (code, len)
        code += 1; k += 1; i += 1
      }
      code <<= 1
      len += 1
    }
    m.result()
  }

  private lazy val DcEnc = canonicalCodes(DcLumBits, DcLumVals)
  private lazy val AcEnc = canonicalCodes(AcLumBits, AcLumVals)

  private def bitLen(v: Int): Int = 32 - Integer.numberOfLeadingZeros(v)

  private def fdct(block: Array[Double]): Array[Double] = {
    val tmp = new Array[Double](64)
    val out = new Array[Double](64)
    // rows then columns, separable
    var y = 0
    while (y < 8) {
      var u = 0
      while (u < 8) {
        var s = 0.0
        var x = 0
        while (x < 8) { s += block(y * 8 + x) * Cos(u * 8 + x); x += 1 }
        tmp(y * 8 + u) = s * (if (u == 0) InvSqrt2 else 1.0)
        u += 1
      }
      y += 1
    }
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var s = 0.0
        var yy = 0
        while (yy < 8) { s += tmp(yy * 8 + u) * Cos(v * 8 + yy); yy += 1 }
        out(v * 8 + u) = s * (if (v == 0) InvSqrt2 else 1.0) * 0.25
        v += 1
      }
      u += 1
    }
    out
  }

  private def seg(out: ByteArrayOutputStream, marker: Int, body: Array[Byte]): Unit = {
    out.write(0xff); out.write(marker)
    val len = body.length + 2
    out.write((len >> 8) & 0xff); out.write(len & 0xff)
    out.write(body, 0, body.length)
  }

  /** encode a grayscale raster as baseline JFIF (1 component, no
    * subsampling, Annex K Huffman tables); `quant` is the 64-entry
    * natural-order quantization table
    */
  def buildGray(img: Bmp.Gray, quant: Array[Int] = StdLumQuant,
      restartInterval: Int = 0): Array[Byte] = {
    require(img.width > 0 && img.height > 0, "empty image")
    require(img.pixels.length == img.width * img.height, "pixel count mismatch")
    require(quant.length == 64 && quant.forall(q => q >= 1 && q <= 255),
      "quant table must be 64 entries in 1..255")
    require(restartInterval >= 0 && restartInterval <= 0xffff,
      s"bad restart interval $restartInterval")
    val out = new ByteArrayOutputStream()
    out.write(0xff); out.write(0xd8) // SOI
    seg(out, 0xe0, Array[Byte]('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    seg(out, 0xdb, (Array(0x00) ++ Zig.map(quant(_))).map(_.toByte)) // DQT tq=0, zigzag order
    seg(out, 0xc0, Array( // SOF0: 8-bit, h, w, 1 component, 1x1, tq 0
      8, img.height >> 8, img.height & 0xff, img.width >> 8, img.width & 0xff,
      1, 1, 0x11, 0).map(_.toByte))
    seg(out, 0xc4, (Array(0x00) ++ DcLumBits ++ DcLumVals.map(_ & 0xff)).map(_.toByte))
    seg(out, 0xc4, (Array(0x10) ++ AcLumBits ++ AcLumVals.map(_ & 0xff)).map(_.toByte))
    if (restartInterval > 0)
      seg(out, 0xdd, Array(restartInterval >> 8, restartInterval & 0xff).map(_.toByte))
    seg(out, 0xda, Array(1, 1, 0x00, 0, 63, 0).map(_.toByte)) // SOS
    val bw = new BitWriter(out)
    val bx = (img.width + 7) / 8
    val by = (img.height + 7) / 8
    var pred = 0
    var rst = 0
    val block = new Array[Double](64)
    var byi = 0
    while (byi < by) {
      var bxi = 0
      while (bxi < bx) {
        val mcuIdx = byi * bx + bxi
        if (restartInterval > 0 && mcuIdx > 0 && mcuIdx % restartInterval == 0) {
          bw.flush()
          out.write(0xff); out.write(0xd0 + rst % 8)
          rst += 1
          pred = 0
        }
        var y = 0
        while (y < 8) { // edge-replicated block, level-shifted
          val sy = math.min(byi * 8 + y, img.height - 1)
          var x = 0
          while (x < 8) {
            val sx = math.min(bxi * 8 + x, img.width - 1)
            block(y * 8 + x) = (img.pixels(sy * img.width + sx) & 0xff) - 128.0
            x += 1
          }
          y += 1
        }
        val f = fdct(block)
        val qz = new Array[Int](64) // zigzag-ordered quantized coefficients
        var k = 0
        while (k < 64) {
          val nat = Zig(k)
          qz(k) = math.round(f(nat) / quant(nat)).toInt
          k += 1
        }
        // DC difference
        val diff = qz(0) - pred
        pred = qz(0)
        val s = if (diff == 0) 0 else bitLen(math.abs(diff))
        val (dcode, dlen) = DcEnc(s)
        bw.put(dcode, dlen)
        if (s > 0) bw.put(if (diff >= 0) diff else diff + (1 << s) - 1, s)
        // AC run-lengths with ZRL/EOB
        var last = 63
        while (last >= 1 && qz(last) == 0) last -= 1
        var run = 0
        k = 1
        while (k <= last) {
          if (qz(k) == 0) run += 1
          else {
            while (run >= 16) {
              val (zc, zl) = AcEnc(0xf0); bw.put(zc, zl); run -= 16
            }
            val v = qz(k)
            val ss = bitLen(math.abs(v))
            val (ac, al) = AcEnc((run << 4) | ss)
            bw.put(ac, al)
            bw.put(if (v >= 0) v else v + (1 << ss) - 1, ss)
            run = 0
          }
          k += 1
        }
        if (last < 63) { val (ec, el) = AcEnc(0x00); bw.put(ec, el) } // EOB
        bxi += 1
      }
      byi += 1
    }
    bw.flush()
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  // ---------------------------------------------------------------- decode

  private final class HuffTable(bits: Array[Int], vals: Array[Byte]) {
    // F.2.2.3 canonical decode tables
    val mincode = new Array[Int](17)
    val maxcode = Array.fill(17)(-1)
    val valptr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var len = 1
      while (len <= 16) {
        if (bits(len - 1) > 0) {
          valptr(len) = k
          mincode(len) = code
          code += bits(len - 1); k += bits(len - 1)
          maxcode(len) = code - 1
        }
        code <<= 1
        len += 1
      }
      require(k == vals.length, s"DHT counts ${k} != symbols ${vals.length}")
    }
    def decode(br: BitReader): Int = {
      var code = br.bit()
      var len = 1
      while (maxcode(len) < 0 || code > maxcode(len)) {
        len += 1
        require(len <= 16, "corrupt Huffman stream")
        code = (code << 1) | br.bit()
      }
      vals(valptr(len) + code - mincode(len)) & 0xff
    }
  }

  private final class BitReader(bytes: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nbits = 0
    var sawEoS = false // hit a non-RST marker inside entropy data
    def bit(): Int = {
      if (nbits == 0) {
        require(pos < bytes.length, "entropy data truncated")
        var b = bytes(pos) & 0xff
        pos += 1
        if (b == 0xff) {
          require(pos < bytes.length, "entropy data truncated at 0xFF")
          val m = bytes(pos) & 0xff
          if (m == 0x00) pos += 1 // stuffed literal 0xFF
          else { sawEoS = true; b = 0 } // marker: feed zeros (spec F.2.2.5)
        }
        acc = b; nbits = 8
      }
      nbits -= 1
      (acc >> nbits) & 1
    }
    def receive(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    /** byte-align and consume the next RSTn marker (resync: skip the
      * ≤2 pad/stuffing bytes the encoder may leave before it)
      */
    def restart(): Unit = {
      nbits = 0
      val limit = math.min(bytes.length - 1, pos + 8)
      while (pos < limit && !((bytes(pos) & 0xff) == 0xff &&
          ((bytes(pos + 1) & 0xff) & 0xf8) == 0xd0)) pos += 1
      require(pos + 1 < bytes.length && (bytes(pos) & 0xff) == 0xff &&
        ((bytes(pos + 1) & 0xff) & 0xf8) == 0xd0,
        s"expected RSTn near byte $pos")
      pos += 2
    }
  }

  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  private def idct(coef: Array[Int]): Array[Int] = {
    val tmp = new Array[Double](64)
    // columns: for each output row y accumulate over v
    var x = 0
    while (x < 8) {
      var y = 0
      while (y < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) {
          val c = coef(v * 8 + x)
          if (c != 0) s += (if (v == 0) InvSqrt2 else 1.0) * c * Cos(v * 8 + y)
          v += 1
        }
        tmp(y * 8 + x) = s
        y += 1
      }
      x += 1
    }
    val out = new Array[Int](64)
    var y = 0
    while (y < 8) {
      var xx = 0
      while (xx < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) {
          s += (if (u == 0) InvSqrt2 else 1.0) * tmp(y * 8 + u) * Cos(u * 8 + xx)
          u += 1
        }
        val p = math.round(s * 0.25 + 128.0).toInt
        out(y * 8 + xx) = if (p < 0) 0 else if (p > 255) 255 else p
        xx += 1
      }
      y += 1
    }
    out
  }

  private final case class Comp(id: Int, h: Int, v: Int, tq: Int) {
    var td = 0
    var ta = 0
  }

  /** strict parse of a baseline JFIF stream to top-down grayscale
    * (1-component: the Y plane; 3-component: JFIF YCbCr→RGB, then the
    * house integer BT.601 luma (77R+150G+29B)>>8 — the [[Bmp.parse]]
    * contract, so all four image codecs hash identically)
    */
  def parse(bytes: Array[Byte]): Bmp.Gray = {
    require(bytes.length >= 4, s"JPEG too short: ${bytes.length} bytes")
    require((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8, "not a JPEG (no SOI)")
    var pos = 2
    def u8(): Int = { require(pos < bytes.length, "truncated"); val v = bytes(pos) & 0xff; pos += 1; v }
    def u16(): Int = { val hi = u8(); (hi << 8) | u8() }
    val qt = new Array[Array[Int]](4) // zigzag-ordered as stored
    val dcT = new Array[HuffTable](4)
    val acT = new Array[HuffTable](4)
    var comps: Array[Comp] = null
    var w = 0
    var h = 0
    var restartInterval = 0
    var scanStart = -1
    while (scanStart < 0) {
      var m = u8()
      require(m == 0xff, f"expected marker, got $m%02x at ${pos - 1}")
      m = u8()
      while (m == 0xff) m = u8() // fill bytes
      m match {
        case 0xd8 => () // spurious SOI: ignore
        case 0xd9 => require(false, "EOI before SOS — no image data")
        case 0xdb =>
          val len = u16() // NOTE: read length BEFORE touching pos
          val end = pos + len - 2
          require(end <= bytes.length, "DQT overruns buffer")
          while (pos < end) {
            val pq = u8()
            val prec = pq >> 4
            val tq = pq & 0x0f
            require(prec <= 1 && tq < 4, s"bad DQT precision/slot $pq")
            qt(tq) = Array.fill(64)(if (prec == 0) u8() else u16())
          }
        case 0xc4 =>
          val len = u16()
          val end = pos + len - 2
          require(end <= bytes.length, "DHT overruns buffer")
          while (pos < end) {
            val tcth = u8()
            val tc = tcth >> 4
            val th = tcth & 0x0f
            require(tc <= 1 && th < 4, s"bad DHT class/slot $tcth")
            val bits = Array.fill(16)(u8())
            val n = bits.sum
            require(n <= 256 && pos + n <= end, "DHT symbol count overruns segment")
            val vals = Array.fill(n)(u8().toByte)
            val t = new HuffTable(bits, vals)
            if (tc == 0) dcT(th) = t else acT(th) = t
          }
        case 0xc0 | 0xc1 => // baseline / extended sequential Huffman
          u16()
          require(u8() == 8, "only 8-bit precision supported")
          h = u16(); w = u16()
          require(w > 0 && h > 0 && w.toLong * h <= 64L * 1024 * 1024,
            s"bad dimensions ${w}x$h")
          val nc = u8()
          require(nc == 1 || nc == 3, s"only 1- or 3-component streams supported, got $nc")
          comps = Array.fill(nc) {
            val id = u8()
            val hv = u8()
            val tq = u8()
            val ch = hv >> 4
            val cv = hv & 0x0f
            require(ch >= 1 && ch <= 2 && cv >= 1 && cv <= 2,
              s"sampling factors beyond 2 unsupported: ${ch}x$cv")
            require(tq < 4, s"bad quant slot $tq")
            Comp(id, ch, cv, tq)
          }
        case 0xc2 => require(false, "progressive JPEG (SOF2) unsupported")
        case 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb | 0xcd | 0xce | 0xcf =>
          require(false, f"unsupported SOF marker $m%02x (non-baseline)")
        case 0xdd =>
          require(u16() == 4, "bad DRI length")
          restartInterval = u16()
        case 0xda =>
          val len = u16()
          val end = pos + len - 2
          require(comps != null, "SOS before SOF")
          val ns = u8()
          require(ns == comps.length, "partial scans unsupported (non-interleaved)")
          var i = 0
          while (i < ns) {
            val cs = u8()
            val tdta = u8()
            val c = comps.find(_.id == cs).getOrElse(throw
              new IllegalArgumentException(s"scan references unknown component $cs"))
            c.td = tdta >> 4
            c.ta = tdta & 0x0f
            i += 1
          }
          // baseline-required spectral selection / successive
          // approximation: Ss=0, Se=63, Ah=Al=0 (ISO 10918-1 B.2.3).
          // A stream declaring anything else in a SOF0 container is
          // non-conforming — quarantine loudly rather than decoding
          // it as full-band sequential data.
          val ss = u8(); val se = u8(); val ahal = u8()
          require(ss == 0 && se == 63 && ahal == 0,
            f"non-baseline scan parameters Ss=$ss Se=$se AhAl=$ahal%02x")
          require(pos == end, "bad SOS length")
          scanStart = pos
        case mm if mm >= 0xe0 && mm <= 0xef =>
          val len = u16() // length read must precede the pos update
          pos += len - 2 // APPn
        case 0xfe =>
          val len = u16()
          pos += len - 2 // COM
        case other => require(false, f"unexpected marker $other%02x before SOS")
      }
    }
    require(comps != null && w > 0, "missing SOF")
    comps.foreach { c =>
      require(qt(c.tq) != null, s"component ${c.id} references missing DQT ${c.tq}")
      require(dcT(c.td) != null && acT(c.ta) != null,
        s"component ${c.id} references missing DHT ${c.td}/${c.ta}")
    }
    val hmax = comps.map(_.h).max
    val vmax = comps.map(_.v).max
    val mcuX = (w + 8 * hmax - 1) / (8 * hmax)
    val mcuY = (h + 8 * vmax - 1) / (8 * vmax)
    // per-component padded planes (MCU-aligned)
    val planeW = comps.map(c => mcuX * c.h * 8)
    val planeH = comps.map(c => mcuY * c.v * 8)
    val planes = comps.indices.map(i => new Array[Int](planeW(i) * planeH(i))).toArray
    val br = new BitReader(bytes, scanStart)
    val pred = new Array[Int](comps.length)
    val coef = new Array[Int](64)
    var mcu = 0
    val nMcu = mcuX * mcuY
    while (mcu < nMcu) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        br.restart()
        java.util.Arrays.fill(pred, 0)
      }
      val my = mcu / mcuX
      val mx = mcu % mcuX
      var ci = 0
      while (ci < comps.length) {
        val c = comps(ci)
        val q = qt(c.tq)
        var bv = 0
        while (bv < c.v) {
          var bh = 0
          while (bh < c.h) {
            require(!br.sawEoS, "entropy data ended before all MCUs decoded")
            java.util.Arrays.fill(coef, 0)
            val s = dcT(c.td).decode(br)
            require(s <= 11, s"bad DC category $s")
            pred(ci) += extend(br.receive(s), s)
            coef(0) = pred(ci) * q(0)
            var k = 1
            var eob = false
            while (k < 64 && !eob) {
              val rs = acT(c.ta).decode(br)
              val r = rs >> 4
              val ss = rs & 0x0f
              if (ss == 0) {
                if (r == 15) k += 16 else eob = true
              } else {
                k += r
                require(k < 64, "AC coefficient index overruns block")
                coef(Zig(k)) = extend(br.receive(ss), ss) * q(k)
                k += 1
              }
            }
            val px = idct(coef)
            val ox = (mx * c.h + bh) * 8
            val oy = (my * c.v + bv) * 8
            var yy = 0
            while (yy < 8) {
              System.arraycopy(px, yy * 8, planes(ci), (oy + yy) * planeW(ci) + ox, 8)
              yy += 1
            }
            bh += 1
          }
          bv += 1
        }
        ci += 1
      }
      mcu += 1
    }
    // assemble grayscale output
    val out = new Array[Int](w * h)
    if (comps.length == 1) {
      var y = 0
      while (y < h) {
        System.arraycopy(planes(0), y * planeW(0), out, y * w, w)
        y += 1
      }
    } else {
      // nearest (pixel-replication) chroma upsampling, JFIF YCbCr→RGB,
      // then the house luma so JPEG/BMP/PNG/GIF rasters hash identically
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          def samp(ci: Int): Int = {
            val c = comps(ci)
            planes(ci)((y * c.v / vmax) * planeW(ci) + (x * c.h / hmax))
          }
          val yv = samp(0).toDouble
          val cb = samp(1) - 128.0
          val cr = samp(2) - 128.0
          def cl(d: Double): Int = {
            val v = math.round(d).toInt
            if (v < 0) 0 else if (v > 255) 255 else v
          }
          val r = cl(yv + 1.402 * cr)
          val g = cl(yv - 0.344136 * cb - 0.714136 * cr)
          val b = cl(yv + 1.772 * cb)
          out(y * w + x) = (77 * r + 150 * g + 29 * b) >> 8
          x += 1
        }
        y += 1
      }
    }
    Bmp.Gray(w, h, out)
  }

  /** replicate each source pixel into an f×f tile — the DC-exact
    * fixture transform: constant 8×8 blocks make the lossy codec
    * lossless (see object doc), and nearest-resize to 8×8 of the
    * upsampled raster samples exactly the q93 aHash pixels
    */
  def upsample(img: Bmp.Gray, f: Int): Bmp.Gray = {
    require(f >= 1 && img.width.toLong * f * img.height * f <= Int.MaxValue,
      s"bad upsample factor $f")
    val w = img.width * f
    val out = new Array[Int](w * img.height * f)
    var y = 0
    while (y < img.height * f) {
      var x = 0
      while (x < w) {
        out(y * w + x) = img.pixels((y / f) * img.width + (x / f))
        x += 1
      }
      y += 1
    }
    Bmp.Gray(w, img.height * f, out)
  }
}
