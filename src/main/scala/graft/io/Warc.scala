package graft.io

import java.nio.charset.StandardCharsets

/** Minimal WARC (ISO 28500 / WARC/1.0) reader+writer — pure JVM, the
  * container format web-crawl corpora (Common Crawl) actually arrive
  * in. A WARC file is a sequence of records:
  *
  *   WARC/1.0\r\n
  *   <header-name>: <value>\r\n ...
  *   Content-Length: N\r\n
  *   \r\n
  *   <N payload bytes>\r\n\r\n
  *
  * Parse is STRICT in the [[Bmp]]/[[Wav]]/[[Png]] tradition: version
  * line, mandatory WARC-Type / Content-Length headers, exact
  * Content-Length framing, the record-terminating CRLF CRLF — a 100 TB
  * ingest meets truncated and gzip-misframed records, and a counted
  * loud failure beats silently mis-framed payload bytes leaking into
  * the next record.
  *
  * Scale shape note: real WARCs are per-record gzip members; this
  * reader handles the UNCOMPRESSED stream (decompress per-member with
  * java.util.zip ahead of it). The parallelism unit is the WARC FILE —
  * files map to partitions, records never span files.
  */
object Warc {

  final case class Record(headers: Map[String, String], payload: Array[Byte]) {
    def warcType: String = headers.getOrElse("WARC-Type", "")
    def targetUri: Option[String] = headers.get("WARC-Target-URI")
  }

  /** Serialize records to one WARC stream. */
  def build(records: Seq[(Map[String, String], Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    records.foreach { case (hdrs, payload) =>
      val sb = new StringBuilder
      sb.append("WARC/1.0\r\n")
      hdrs.foreach { case (k, v) =>
        require(!k.contains(':') || k.startsWith("WARC"),
          s"bad header name: $k")
        sb.append(k).append(": ").append(v).append("\r\n")
      }
      sb.append("Content-Length: ").append(payload.length).append("\r\n\r\n")
      out.write(sb.toString.getBytes(StandardCharsets.UTF_8))
      out.write(payload)
      out.write("\r\n\r\n".getBytes(StandardCharsets.UTF_8))
    }
    out.toByteArray
  }

  /** Serialize records as a MULTI-MEMBER GZIP stream — one gzip member
    * per record, the Common Crawl on-disk layout (each record
    * independently decompressible, so a reader can skip by member
    * boundaries).
    */
  def buildGz(records: Seq[(Map[String, String], Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    records.foreach { r =>
      val gz = new java.util.zip.GZIPOutputStream(out)
      gz.write(build(Seq(r)))
      gz.finish()
    }
    out.toByteArray
  }

  /** Parse a gzipped WARC: decompresses ALL members (JDK
    * GZIPInputStream reads concatenated members transparently) and
    * parses the concatenated stream — per-member framing and the
    * record framing coincide by construction, and a truncated or
    * corrupt member surfaces as either a zip error or the strict
    * record-framing raise.
    */
  def parseGz(bytes: Array[Byte]): Seq[Record] = {
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n >= 0) {
      out.write(buf, 0, n)
      n = in.read(buf)
    }
    in.close()
    parse(out.toByteArray)
  }

  /** Serialize records as a MULTI-FRAME ZSTD stream — one frame per
    * record, the `.warc.zst` layout (zstd-jni ships on the Spark
    * classpath). Same skippable-per-record property as [[buildGz]].
    */
  def buildZst(records: Seq[(Map[String, String], Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    records.foreach { r =>
      out.write(com.github.luben.zstd.Zstd.compress(build(Seq(r))))
    }
    out.toByteArray
  }

  /** Parse a zstd-compressed WARC by an EXPLICIT frame walk: each
    * frame's compressed size is read from its header, the frame
    * decompressed against its declared content size, and any leftover
    * or short bytes raise — ZstdInputStream was measured to silently
    * EOF on a truncated trailing frame (returning the records decoded
    * so far), the exact failure this reader's strictness contract
    * forbids.
    */
  def parseZst(bytes: Array[Byte]): Seq[Record] = {
    import com.github.luben.zstd.Zstd
    val out = new java.io.ByteArrayOutputStream()
    var pos = 0
    while (pos < bytes.length) {
      val rest = java.util.Arrays.copyOfRange(bytes, pos, bytes.length)
      val fsize =
        try Zstd.findFrameCompressedSize(rest)
        catch { case e: Exception =>
          throw new IllegalArgumentException(
            s"truncated/corrupt zstd frame at offset $pos: ${e.getMessage}")
        }
      require(fsize > 0 && pos + fsize <= bytes.length,
        s"truncated zstd frame at offset $pos")
      val frame = java.util.Arrays.copyOfRange(bytes, pos, pos + fsize.toInt)
      val csize = Zstd.getFrameContentSize(frame)
      require(csize >= 0 && csize <= Int.MaxValue,
        s"zstd frame at offset $pos lacks a valid content size")
      out.write(Zstd.decompress(frame, csize.toInt))
      pos += fsize.toInt
    }
    parse(out.toByteArray)
  }

  /** Strict parse of an uncompressed WARC stream into its records. */
  def parse(bytes: Array[Byte]): Seq[Record] = {
    val recs = Seq.newBuilder[Record]
    var pos = 0
    def line(): String = {
      val start = pos
      while (pos + 1 < bytes.length &&
        !(bytes(pos) == '\r' && bytes(pos + 1) == '\n')) pos += 1
      require(pos + 1 < bytes.length, "truncated WARC (no CRLF)")
      val s = new String(bytes, start, pos - start, StandardCharsets.UTF_8)
      pos += 2
      s
    }
    while (pos < bytes.length) {
      val version = line()
      require(version == "WARC/1.0" || version == "WARC/1.1",
        s"not a WARC record at offset: '$version'")
      var headers = Map.empty[String, String]
      var h = line()
      while (h.nonEmpty) {
        val i = h.indexOf(':')
        require(i > 0, s"malformed WARC header: '$h'")
        headers += (h.substring(0, i).trim -> h.substring(i + 1).trim)
        h = line()
      }
      require(headers.contains("WARC-Type"), "record missing WARC-Type")
      val len = headers.getOrElse("Content-Length",
        throw new IllegalArgumentException("record missing Content-Length"))
        .toLong
      require(len >= 0 && pos + len + 4 <= bytes.length,
        s"Content-Length $len overruns the stream")
      val payload = java.util.Arrays.copyOfRange(bytes, pos, (pos + len).toInt)
      pos += len.toInt
      require(bytes(pos) == '\r' && bytes(pos + 1) == '\n' &&
        bytes(pos + 2) == '\r' && bytes(pos + 3) == '\n',
        "record not terminated by CRLF CRLF")
      pos += 4
      recs += Record(headers, payload)
    }
    recs.result()
  }
}
