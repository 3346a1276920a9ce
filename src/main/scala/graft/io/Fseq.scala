package graft.io

import java.nio.{ByteBuffer, ByteOrder}

/** Tiny raw-frame video container ("FSEQ"): magic + width + height +
  * frame count (LE int32s), then `frames` consecutive width×height
  * 8-bit grayscale rasters. Stands in for a real video codec the way
  * [[Wav]]/[[Bmp]] stand in for audio/image ones — the Spark-side
  * plumbing (binary column, per-partition decode, frame SAMPLING
  * without decoding unsampled frames) is the part that must be real,
  * and strict bounds-checked parsing keeps malformed blobs loud.
  */
object Fseq {

  /** `data` is the WHOLE container blob with frames at `dataOff` — parse
    * does not copy the payload, so sampling extracts only the sampled
    * frames' bytes (the property the frame-sample path advertises)
    */
  final case class Video(width: Int, height: Int, frames: Int,
      data: Array[Byte], dataOff: Int) {
    def frame(i: Int): Array[Byte] = {
      require(i >= 0 && i < frames, s"frame $i out of range [0, $frames)")
      val sz = width * height
      java.util.Arrays.copyOfRange(data, dataOff + i * sz, dataOff + (i + 1) * sz)
    }
  }

  private val magic = Array[Byte]('F', 'S', 'E', 'Q')

  def build(width: Int, height: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
    require(width > 0 && height > 0, "empty frame geometry")
    frames.foreach(f => require(f.length == width * height,
      s"frame size ${f.length} != ${width}x$height"))
    val bb = ByteBuffer.allocate(16 + width * height * frames.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.put(magic).putInt(width).putInt(height).putInt(frames.length)
    frames.foreach(bb.put)
    bb.array()
  }

  def parse(bytes: Array[Byte]): Video = {
    require(bytes.length >= 16, s"FSEQ too short: ${bytes.length} bytes")
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val m = new Array[Byte](4); bb.get(m)
    require(java.util.Arrays.equals(m, magic), "not an FSEQ container")
    val w = bb.getInt; val h = bb.getInt; val n = bb.getInt
    require(w > 0 && h > 0 && n >= 0, s"bad geometry ${w}x$h x$n")
    require(16L + w.toLong * h * n == bytes.length,
      s"payload ${bytes.length - 16} != ${w}x${h}x$n")
    Video(w, h, n, bytes, 16)
  }
}
