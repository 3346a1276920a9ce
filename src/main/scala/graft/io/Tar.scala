package graft.io

/** Minimal USTAR (POSIX.1-1988 tar) writer/reader — pure JVM, the
  * container format of WebDataset-style training shards (a shard IS a
  * tar of `<key>.<ext>` members; loaders stream it sequentially). Like
  * [[Bmp]]/[[Wav]]/[[Jpeg]], the point is a REAL format with a strict
  * parser: 512-byte headers with octal sizes and the space-seeded
  * checksum, 512-padded payloads, two zero blocks at the end — and
  * loud IllegalArgumentException on anything malformed (the
  * quarantine contract).
  *
  * Size arithmetic is part of the public contract (the q429 oracle
  * recomputes it): tar bytes = Σ_members (512 + ceil(size/512)·512)
  * + 1024.
  */
object Tar {

  private val Block = 512

  /** on-disk shard naming contract — ONE definition shared by the
    * batch shard writer ([[graft.llm.Pack.writeTarShards]]) and the
    * `wds-shards` DataSource V2 reader so they cannot drift (the
    * [[BlockIO.blockFileName]] rule)
    */
  private[graft] val shardFileName = "shard_(\\d+)\\.tar$".r

  private[graft] def shardFileNameOf(shard: Long): String =
    f"shard_$shard%05d.tar"

  private[graft] def parseShardFileName(name: String): Option[Int] =
    shardFileName.findFirstMatchIn(name)
      .map(m => m.group(1).toInt)

  private def octal(v: Long, width: Int): Array[Byte] = {
    // width-1 octal digits, NUL terminated (the classic layout)
    val s = java.lang.Long.toOctalString(v)
    require(s.length <= width - 1, s"value $v overflows $width-char octal field")
    val out = new Array[Byte](width)
    val pad = width - 1 - s.length
    var i = 0
    while (i < pad) { out(i) = '0'; i += 1 }
    s.foreach { c => out(i) = c.toByte; i += 1 }
    out(width - 1) = 0
    out
  }

  /** one member's 512-byte ustar header — shared by the in-memory
    * [[build]] and the streaming [[StreamWriter]] so the layouts
    * cannot drift
    */
  private def memberHeader(name: String, size: Int): Array[Byte] = {
    val nb = name.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    require(nb.length > 0 && nb.length <= 100, s"member name must be 1..100 bytes: '$name'")
    val h = new Array[Byte](Block)
    System.arraycopy(nb, 0, h, 0, nb.length)
    System.arraycopy(octal(420, 8), 0, h, 100, 8) // mode 0644
    System.arraycopy(octal(0, 8), 0, h, 108, 8) // uid
    System.arraycopy(octal(0, 8), 0, h, 116, 8) // gid
    System.arraycopy(octal(size.toLong, 12), 0, h, 124, 12)
    System.arraycopy(octal(0, 12), 0, h, 136, 12) // mtime 0: reproducible
    java.util.Arrays.fill(h, 148, 156, ' '.toByte) // chksum seed
    h(156) = '0' // typeflag: regular file
    System.arraycopy("ustar".getBytes, 0, h, 257, 5) // magic + NUL version
    h(262) = 0; h(263) = '0'; h(264) = '0'
    var sum = 0L
    var i = 0
    while (i < Block) { sum += h(i) & 0xff; i += 1 }
    System.arraycopy(octal(sum, 7), 0, h, 148, 7)
    h(155) = ' '
    h
  }

  /** serialize (name, payload) members into one ustar archive */
  def build(members: Seq[(String, Array[Byte])]): Array[Byte] = {
    val total = members.map { case (_, b) =>
      Block + ((b.length + Block - 1) / Block) * Block
    }.sum + 2 * Block
    val out = new Array[Byte](total)
    var pos = 0
    members.foreach { case (name, body) =>
      System.arraycopy(memberHeader(name, body.length), 0, out, pos, Block)
      pos += Block
      System.arraycopy(body, 0, out, pos, body.length)
      pos += ((body.length + Block - 1) / Block) * Block
    }
    out // trailing 1024 bytes stay zero — the end-of-archive marker
  }

  /** STREAMING archive writer — constant memory regardless of shard
    * size: each member's header + payload + padding go straight to
    * `out`; [[finish]] emits the 1024-byte end-of-archive marker.
    * The write half of [[memberIterator]] — the `wds-shards`
    * DataSource V2 SINK streams shards through this, so a 1 GiB
    * shard never materializes in executor memory. The caller owns
    * closing `out`.
    */
  final class StreamWriter(out: java.io.OutputStream) {
    private var finished = false
    private var count = 0L
    private var payload = 0L
    private var written = 0L

    def write(name: String, body: Array[Byte]): Unit = {
      require(!finished, "StreamWriter: write after finish")
      out.write(memberHeader(name, body.length))
      out.write(body)
      val padded = ((body.length + Block - 1) / Block) * Block
      if (padded > body.length) out.write(new Array[Byte](padded - body.length))
      count += 1
      payload += body.length
      written += Block + padded
    }

    def members: Long = count
    def payloadBytes: Long = payload
    /** total archive size including the end-of-archive marker */
    def tarBytes: Long = written + 2L * Block

    def finish(): Unit = {
      require(!finished, "StreamWriter: double finish")
      out.write(new Array[Byte](2 * Block))
      finished = true
    }
  }

  /** strict parse back to (name, payload) members */
  def parse(bytes: Array[Byte]): Seq[(String, Array[Byte])] = {
    require(bytes.length % Block == 0 && bytes.length >= 2 * Block,
      s"tar length ${bytes.length} is not a positive multiple of 512 (+1024 tail)")
    memberIterator(new java.io.ByteArrayInputStream(bytes), withPayload = true)
      .map { case (name, _, body) => name -> body.get }
      .toSeq
  }

  private def readFully(in: java.io.InputStream, buf: Array[Byte],
      msg: => String): Unit = {
    var off = 0
    while (off < buf.length) {
      val n = in.read(buf, off, buf.length - off)
      require(n > 0, msg)
      off += n
    }
  }

  private def skipFully(in: java.io.InputStream, count: Long,
      msg: => String): Unit = {
    var left = count
    while (left > 0) {
      val n = in.skip(left)
      if (n <= 0) { require(in.read() >= 0, msg); left -= 1 }
      else left -= n
    }
  }

  /** STREAMING strict parse — the loader-side contract: one pass over
    * an InputStream, one (name, size, payload?) per member, the same
    * quarantine behavior as [[parse]] (bad magic, checksum mismatch,
    * truncation die loud). With `withPayload = false` the payload and
    * its 512-padding are SKIPPED, not read — the IO a metadata-only
    * shard scan never pays (the `wds-shards` DataSource's decode-
    * skipping projection rides this). The caller owns closing `in`.
    */
  def memberIterator(in: java.io.InputStream, withPayload: Boolean)
      : Iterator[(String, Long, Option[Array[Byte]])] =
    new Iterator[(String, Long, Option[Array[Byte]])] {
      private val h = new Array[Byte](Block)
      private var nextM: (String, Long, Option[Array[Byte]]) = _
      private var finished = false

      private def advance(): Unit = {
        nextM = null
        if (!finished) {
          readFully(in, h, "tar truncated: no end-of-archive marker")
          var allZero = true
          var i = 0
          while (allZero && i < Block) { allZero = h(i) == 0; i += 1 }
          if (allZero) finished = true
          else {
            val magic = new String(h, 257, 5,
              java.nio.charset.StandardCharsets.US_ASCII)
            require(magic == "ustar", s"bad tar magic '$magic'")
            var nameEnd = 0
            while (nameEnd < 100 && h(nameEnd) != 0) nameEnd += 1
            require(nameEnd > 0, "empty member name")
            val name = new String(h, 0, nameEnd,
              java.nio.charset.StandardCharsets.UTF_8)
            // checksum: header bytes with the chksum field read as spaces
            var sum = 0L
            i = 0
            while (i < Block) {
              val b = if (i >= 148 && i < 156) ' '.toByte else h(i)
              sum += b & 0xff
              i += 1
            }
            val stored = parseOctal(h, 148, 8)
            require(stored == sum,
              s"tar checksum mismatch for '$name': stored $stored, computed $sum")
            val size = parseOctal(h, 124, 12)
            require(size >= 0 && size <= Int.MaxValue.toLong, s"bad member size $size")
            val padded = ((size + Block - 1) / Block) * Block
            if (withPayload) {
              val body = new Array[Byte](size.toInt)
              readFully(in, body, s"member '$name' payload overruns archive")
              skipFully(in, padded - size, s"member '$name' padding overruns archive")
              nextM = (name, size, Some(body))
            } else {
              skipFully(in, padded, s"member '$name' payload overruns archive")
              nextM = (name, size, None)
            }
          }
        }
      }

      advance()
      override def hasNext: Boolean = nextM != null
      override def next(): (String, Long, Option[Array[Byte]]) = {
        val m = nextM; advance(); m
      }
    }

  private def parseOctal(bytes: Array[Byte], off: Int, len: Int): Long = {
    var v = 0L
    var i = off
    val end = off + len
    // skip leading spaces, read octal digits, stop at NUL/space
    while (i < end && bytes(i) == ' ') i += 1
    var any = false
    while (i < end && bytes(i) >= '0' && bytes(i) <= '7') {
      v = v * 8 + (bytes(i) - '0'); i += 1; any = true
    }
    require(any, s"empty octal field at $off")
    v
  }
}
