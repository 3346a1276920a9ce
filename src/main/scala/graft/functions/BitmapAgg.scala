package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Word-aligned bitmap buffer; words(i) bit j ⇔ id i*64+j present. */
final case class BitmapBuf(var words: Array[Long])

/** EXACT re-aggregatable distinct — the bitmap index primitive every
  * warehouse ships (BITMAP_AGG / BITMAP_OR_AGG): per-group state is a
  * bitset over the id domain, merge is word-wise OR (associative,
  * commutative, idempotent), so EXACT distinct counts can be rolled up
  * from persisted partials — the thing COUNT(DISTINCT) can't do without
  * re-touching the facts, and the thing the KMV/HLL sketches (q51/q147/
  * q160) only approximate.
  *
  * The dense-words layout is deliberate: production bitmap columns sit
  * behind a dictionary encode that maps raw ids to a dense [0, n)
  * domain, after which dense words beat container indirection up to
  * millions of ids (the roaring container split only pays off on SPARSE
  * high-cardinality domains). The id cap fails loud, not silent: an id
  * past the declared domain throws rather than growing state unboundedly
  * — the same fail-fast discipline as the ANN probe batches.
  *
  * State size: domain/8 bytes per group (16 KiB per 2¹⁷ ids); partial
  * aggregation does the heavy OR-ing map-side, and the serialized
  * finish trims trailing zero words so sparse groups persist small.
  */
final class BitmapAgg(maxId: Int) extends Aggregator[Long, BitmapBuf, Array[Byte]] {
  require(maxId > 0 && maxId <= (1 << 26),
    s"bitmap domain must be in (0, 2^26]: $maxId")
  private val nWords = (maxId + 63) >>> 6

  override def zero: BitmapBuf = BitmapBuf(new Array[Long](nWords))

  override def reduce(b: BitmapBuf, id: Long): BitmapBuf = {
    if (id < 0 || id >= maxId)
      throw new IllegalArgumentException(
        s"id $id outside declared bitmap domain [0, $maxId)")
    b.words((id >>> 6).toInt) |= 1L << (id & 63)
    b
  }

  override def merge(a: BitmapBuf, b: BitmapBuf): BitmapBuf = {
    var i = 0
    while (i < nWords) { a.words(i) |= b.words(i); i += 1 }
    a
  }

  override def finish(r: BitmapBuf): Array[Byte] = BitmapAgg.serialize(r.words)

  override def bufferEncoder: Encoder[BitmapBuf] = Encoders.product[BitmapBuf]
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

/** Second-level rollup: OR serialized bitmap partials, return the exact
  * cardinality — the "merge persisted shard/day bitmaps into a coarser
  * grain without the facts" read path.
  */
final class BitmapMergeCardAgg extends Aggregator[Array[Byte], BitmapBuf, Long] {

  override def zero: BitmapBuf = BitmapBuf(Array.emptyLongArray)

  override def reduce(b: BitmapBuf, bytes: Array[Byte]): BitmapBuf =
    merge(b, BitmapBuf(BitmapAgg.deserialize(bytes)))

  override def merge(a: BitmapBuf, b: BitmapBuf): BitmapBuf = {
    if (b.words.length > a.words.length) return merge(b, a)
    var i = 0
    while (i < b.words.length) { a.words(i) |= b.words(i); i += 1 }
    a
  }

  override def finish(r: BitmapBuf): Long = {
    var c = 0L; var i = 0
    while (i < r.words.length) { c += java.lang.Long.bitCount(r.words(i)); i += 1 }
    c
  }

  override def bufferEncoder: Encoder[BitmapBuf] = Encoders.product[BitmapBuf]
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}

object BitmapAgg {
  /** little-endian words, trailing zero words trimmed */
  def serialize(words: Array[Long]): Array[Byte] = {
    var n = words.length
    while (n > 0 && words(n - 1) == 0L) n -= 1
    val bb = java.nio.ByteBuffer.allocate(n * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i < n) { bb.putLong(words(i)); i += 1 }
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val words = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < words.length) { words(i) = bb.getLong(); i += 1 }
    words
  }

  def cardinality(bytes: Array[Byte]): Long = {
    val words = deserialize(bytes)
    var c = 0L; var i = 0
    while (i < words.length) { c += java.lang.Long.bitCount(words(i)); i += 1 }
    c
  }

  /** |a ∩ b| without materializing the intersection — the audience-
    * overlap read over persisted bitmaps.
    */
  def andCardinality(a: Array[Byte], b: Array[Byte]): Long = {
    val wa = deserialize(a); val wb = deserialize(b)
    val n = math.min(wa.length, wb.length)
    var c = 0L; var i = 0
    while (i < n) { c += java.lang.Long.bitCount(wa(i) & wb(i)); i += 1 }
    c
  }

  /** |a \ b| — the "did A but never B" exclusion count. */
  def andNotCardinality(a: Array[Byte], b: Array[Byte]): Long = {
    val wa = deserialize(a); val wb = deserialize(b)
    var c = 0L; var i = 0
    while (i < wa.length) {
      val m = if (i < wb.length) wb(i) else 0L
      c += java.lang.Long.bitCount(wa(i) & ~m); i += 1
    }
    c
  }
}
