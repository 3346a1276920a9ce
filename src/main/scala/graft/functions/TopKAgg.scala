package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bounded-heap per-key top-k — the scale-safe replacement for
  * `row_number().over(Window.partitionBy(key).orderBy(score desc, id))`
  * in the ANN re-rank paths.
  *
  * The window form shuffles EVERY scored row into one partition per key
  * and sorts there: at 10⁹ corpus rows × q queries that is q partitions
  * of 10⁹ rows each — a single-task wall no cluster width fixes. This
  * aggregator keeps a k-bounded sorted buffer per key on the MAP side
  * (ObjectHashAggregate partial mode), so the shuffle carries at most
  * k rows per key per map partition and the reducer merges small sorted
  * buffers. Same outputs, same tie-breaks: (score desc, id asc) is a
  * total order because ids are unique.
  *
  * Selection semantics match `row_number ... <= k` exactly — the first k
  * rows of the total order — not rank/dense_rank tie expansion.
  */
object TopK {

  /** parallel arrays sorted by (score desc, id asc), length ≤ k */
  case class Buf(scores: Array[Double], ids: Array[Long])

  /** strict total order: higher score wins, ties to the lower id */
  @inline private def better(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 > s2 || (s1 == s2 && i1 < i2)

  class TopKAgg(k: Int) extends Aggregator[(Long, Double), Buf, Buf] {
    require(k > 0, s"top-k needs k > 0, got $k")

    def zero: Buf = Buf(Array.emptyDoubleArray, Array.emptyLongArray)

    /** insert one (id, score) keeping the buffer sorted and ≤ k long.
      * O(1) reject for the common below-threshold row; O(k) arraycopy
      * otherwise (k is a re-rank depth, ≤ a few hundred).
      */
    def reduce(b: Buf, a: (Long, Double)): Buf = {
      val (id, score) = a
      val n = b.scores.length
      if (n == k && !better(score, id, b.scores(n - 1), b.ids(n - 1))) return b
      var pos = n
      while (pos > 0 && better(score, id, b.scores(pos - 1), b.ids(pos - 1))) pos -= 1
      val m = math.min(n + 1, k)
      val ns = new Array[Double](m)
      val ni = new Array[Long](m)
      System.arraycopy(b.scores, 0, ns, 0, pos)
      System.arraycopy(b.ids, 0, ni, 0, pos)
      ns(pos) = score
      ni(pos) = id
      val tail = m - pos - 1
      if (tail > 0) {
        System.arraycopy(b.scores, pos, ns, pos + 1, tail)
        System.arraycopy(b.ids, pos, ni, pos + 1, tail)
      }
      Buf(ns, ni)
    }

    /** two-pointer merge of sorted buffers, capped at k — commutative and
      * associative under the (score desc, id asc) total order, so reducer
      * arrival order cannot change the result
      */
    def merge(x: Buf, y: Buf): Buf = {
      if (y.scores.isEmpty) return x
      if (x.scores.isEmpty) return y
      val m = math.min(x.scores.length + y.scores.length, k)
      val ns = new Array[Double](m)
      val ni = new Array[Long](m)
      var i = 0; var j = 0; var o = 0
      while (o < m) {
        val takeX = j >= y.scores.length ||
          (i < x.scores.length && better(x.scores(i), x.ids(i), y.scores(j), y.ids(j)))
        if (takeX) { ns(o) = x.scores(i); ni(o) = x.ids(i); i += 1 }
        else { ns(o) = y.scores(j); ni(o) = y.ids(j); j += 1 }
        o += 1
      }
      Buf(ns, ni)
    }

    def finish(b: Buf): Buf = b
    def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    def outputEncoder: Encoder[Buf] = Encoders.product[Buf]
  }

  /** `udaf`-wrapped aggregator usable on the Column path:
    * `df.groupBy(key).agg(TopK.topK(k)(col(id), col(score)))`
    */
  def topK(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new TopKAgg(k), Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble))

  /** Top-k rows per key of `df`, ordered by (`score` desc, `id` asc) —
    * drop-in for the window form: output columns (key, rnName, id, score)
    * with `rnName` = 1-based rank, rows emitted in rank order per key.
    * `id` must be unique per key for the tie-break to be total; `key` and
    * `id` must be integral (cast to long in the output), `score` numeric
    * (cast to double). Float scores widen f32→f64, which is exact (every
    * f32 is representable as f64) — but ties then break by the widened
    * values, i.e. with full f64 tie-break semantics; callers comparing
    * against an f32-native rank order should be aware.
    */
  def perKeyTopK(df: DataFrame, k: Int, key: String, id: String, score: String,
      rnName: String = "rn"): DataFrame = {
    df.groupBy(col(key))
      .agg(topK(k)(col(id).cast("long"), col(score).cast("double")).as("_top"))
      .select(col(key),
        posexplode(arrays_zip(col("_top.ids").as("i"), col("_top.scores").as("s"))))
      .select(col(key), (col("pos") + 1).cast("int").as(rnName),
        col("col.i").as(id), col("col.s").as(score))
  }

  /** parallel arrays sorted by (score desc, id asc), length ≤ k — the
    * exact-integer twin of [[Buf]] for LONG scores
    */
  case class LBuf(scores: Array[Long], ids: Array[Long])

  @inline private def betterL(s1: Long, i1: Long, s2: Long, i2: Long): Boolean =
    s1 > s2 || (s1 == s2 && i1 < i2)

  /** [[TopKAgg]] with EXACT LONG scores — for the integer-key paths
    * (centroid-outlier dist_key, Hamming distances): a long key past
    * 2⁵³ loses bits in the double cast and near-ties could swap, so the
    * exact-integer operators keep their scores in long end-to-end.
    */
  class TopKLongAgg(k: Int) extends Aggregator[(Long, Long), LBuf, LBuf] {
    require(k > 0, s"top-k needs k > 0, got $k")

    def zero: LBuf = LBuf(Array.emptyLongArray, Array.emptyLongArray)

    def reduce(b: LBuf, a: (Long, Long)): LBuf = {
      val (id, score) = a
      val n = b.scores.length
      if (n == k && !betterL(score, id, b.scores(n - 1), b.ids(n - 1))) return b
      var pos = n
      while (pos > 0 && betterL(score, id, b.scores(pos - 1), b.ids(pos - 1))) pos -= 1
      val m = math.min(n + 1, k)
      val ns = new Array[Long](m)
      val ni = new Array[Long](m)
      System.arraycopy(b.scores, 0, ns, 0, pos)
      System.arraycopy(b.ids, 0, ni, 0, pos)
      ns(pos) = score
      ni(pos) = id
      val tail = m - pos - 1
      if (tail > 0) {
        System.arraycopy(b.scores, pos, ns, pos + 1, tail)
        System.arraycopy(b.ids, pos, ni, pos + 1, tail)
      }
      LBuf(ns, ni)
    }

    def merge(x: LBuf, y: LBuf): LBuf = {
      if (y.scores.isEmpty) return x
      if (x.scores.isEmpty) return y
      val m = math.min(x.scores.length + y.scores.length, k)
      val ns = new Array[Long](m)
      val ni = new Array[Long](m)
      var i = 0; var j = 0; var o = 0
      while (o < m) {
        val takeX = j >= y.scores.length ||
          (i < x.scores.length && betterL(x.scores(i), x.ids(i), y.scores(j), y.ids(j)))
        if (takeX) { ns(o) = x.scores(i); ni(o) = x.ids(i); i += 1 }
        else { ns(o) = y.scores(j); ni(o) = y.ids(j); j += 1 }
        o += 1
      }
      LBuf(ns, ni)
    }

    def finish(b: LBuf): LBuf = b
    def bufferEncoder: Encoder[LBuf] = Encoders.product[LBuf]
    def outputEncoder: Encoder[LBuf] = Encoders.product[LBuf]
  }

  def topKLong(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new TopKLongAgg(k), Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))

  /** [[perKeyTopK]] with exact long scores — same (score desc, id asc)
    * total order, no double cast anywhere, so integer keys rank
    * bit-exactly all the way to ±2⁶³.
    */
  def perKeyTopKLong(df: DataFrame, k: Int, key: String, id: String, score: String,
      rnName: String = "rn"): DataFrame = {
    df.groupBy(col(key))
      .agg(topKLong(k)(col(id).cast("long"), col(score).cast("long")).as("_top"))
      .select(col(key),
        posexplode(arrays_zip(col("_top.ids").as("i"), col("_top.scores").as("s"))))
      .select(col(key), (col("pos") + 1).cast("int").as(rnName),
        col("col.i").as(id), col("col.s").as(score))
  }
}
