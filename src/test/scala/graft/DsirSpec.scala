package graft

import org.apache.spark.sql.functions._
import graft.llm.Dsir

class DsirSpec extends SparkSpec {

  /** Target corpus is pure "cats"; the raw pool has one target-like doc,
    * one mixed, one out-of-domain, one empty — the weight ORDER is known
    * by construction, and the target-like doc's weight is hand-checked
    * against an independently computed expectation. */
  private def target = {
    val s = spark
    import s.implicits._
    Seq((100L, "cat sat mat"), (101L, "cat sat mat")).toDF("doc_id", "text")
  }

  private def raw = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "cat sat mat"),   // = target
      (2L, "cat dog"),       // mixed
      (3L, "dog ran far"),   // out-of-domain
      (4L, " ")              // gram-less
    ).toDF("doc_id", "text")
  }

  /** independent add-one-smoothed multinomial log-ratio, plain Scala */
  private def expectedAvgLr(grams: Seq[String], ct: Map[String, Int], nt: Int,
      cr: Map[String, Int], nr: Int, v: Int): Double = {
    val lrs = grams.map { g =>
      math.log((ct.getOrElse(g, 0) + 1).toDouble / (nt + v)) -
        math.log((cr.getOrElse(g, 0) + 1).toDouble / (nr + v))
    }
    math.rint(lrs.sum / lrs.size * 1e6) / 1e6
  }

  test("dsirWeights matches a hand-computed multinomial log-ratio and ranks by domain") {
    val w = Dsir.dsirWeights(spark, target, raw).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap

    // models: target = 2× "cat sat mat" → grams cat,sat,mat,"cat sat","sat mat" ×2
    val ct = Map("cat" -> 2, "sat" -> 2, "mat" -> 2, "cat sat" -> 2, "sat mat" -> 2)
    // raw pool grams
    val cr = Map(
      "cat" -> 2, "sat" -> 1, "mat" -> 1, "cat sat" -> 1, "sat mat" -> 1,
      "dog" -> 2, "cat dog" -> 1, "ran" -> 1, "far" -> 1,
      "dog ran" -> 1, "ran far" -> 1)
    val v = cr.size // target vocab ⊆ raw vocab here
    val nt = ct.values.sum; val nr = cr.values.sum

    assert(w(1L)._1 == 5L)
    assert(w(1L)._2 ==
      expectedAvgLr(Seq("cat", "sat", "mat", "cat sat", "sat mat"), ct, nt, cr, nr, v))
    assert(w(3L)._2 ==
      expectedAvgLr(Seq("dog", "ran", "far", "dog ran", "ran far"), ct, nt, cr, nr, v))
    // domain order: target-like > mixed > out-of-domain
    assert(w(1L)._2 > w(2L)._2 && w(2L)._2 > w(3L)._2)
    // gram-less doc surfaces with the 0-weight floor, not a dropped row
    assert(w(4L) == ((0L, 0.0)))
  }

  test("gumbel selection is deterministic, excludes gram-less docs, and tau=0 is weight order") {
    val sel0 = Dsir.dsirGumbelTopK(spark, target, raw, k = 3, tauMilli = 0).collect()
    assert(sel0.map(_.getLong(1)).toSeq == Seq(1L, 2L, 3L)) // weight order
    assert(sel0.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L)) // ranks 1..k

    val a = Dsir.dsirGumbelTopK(spark, target, raw, k = 4, tauMilli = 500).collect()
    val b = Dsir.dsirGumbelTopK(spark, target, raw, k = 4, tauMilli = 500).collect()
    assert(a.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq ==
      b.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq)
    // doc 4 has no grams: never selected even with k > |eligible|
    assert(!a.map(_.getLong(1)).contains(4L))
    assert(a.length == 3)
  }

  test("hashed path: huge m has no collisions -> weights equal the exact path exactly") {
    // with m >> vocab² the birthday bound makes collisions vanishingly
    // unlikely for this 11-gram vocab; smoothing dimension still differs
    // (m vs v), so compare RANK ORDER, which smoothing preserves, and
    // agreement, which must be total
    val m = 1 << 20
    val exact = Dsir.dsirWeights(spark, target, raw).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val hashed = Dsir.dsirWeightsHashed(spark, target, raw, m).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    def order(w: Map[Long, Double]) =
      w.toSeq.sortBy { case (id, lw) => (-lw, id) }.map(_._1)
    assert(order(exact) == order(hashed))

    val agree = Dsir.hashedAgreement(spark, target, raw, k = 3, buckets = m).collect()(0)
    assert(agree.getLong(0) == 3L && agree.getLong(1) == 3L && agree.getLong(2) == 1000L)
  }

  test("frozen-model scoring equals the one-shot batch path, incl. unseen grams") {
    val s = spark
    import s.implicits._
    val (tm, rm, tot) = Dsir.trainModels(s, target, raw)
    val viaModels = Dsir.dsirScoreWithModels(s, raw, tm, rm, tot)
      .collect().map(_.toSeq).toSet
    val oneShot = Dsir.dsirWeights(s, target, raw).collect().map(_.toSeq).toSet
    assert(viaModels == oneShot)
    // a doc with grams NEITHER model saw scores at both smoothed floors
    // (lr = ln((0+1)/(nt+v)) - ln((0+1)/(nr+v)) per gram), not an error
    val novel = Seq((9L, "zzz qqq")).toDF("doc_id", "text")
    val scored = Dsir.dsirScoreWithModels(s, novel, tm, rm, tot).collect()(0)
    assert(scored.getLong(1) == 3L) // zzz, qqq, "zzz qqq"
    val v = 11; val nt = 10; val nr = 13 // fixture model sizes
    val exp = math.rint((math.log(1.0 / (nt + v)) - math.log(1.0 / (nr + v))) * 1e6) / 1e6
    assert(scored.getDouble(2) == exp)
  }

  test("model fold is exact: fold(train(A), train(B)) scores == train(A∪B) scores") {
    val s = spark
    import s.implicits._
    val a = raw.filter(org.apache.spark.sql.functions.col("doc_id") <= 2)
    val b = raw.filter(org.apache.spark.sql.functions.col("doc_id") > 2)
    val (tmA, rmA, _) = Dsir.trainModels(s, target, a)
    // target corpus unchanged across the fold; its batch model is empty
    val (tmB, rmB, _) = Dsir.trainModels(s, target.limit(0), b)
    val tm = Dsir.foldCounts(tmA, tmB, "ct")
    val rm = Dsir.foldCounts(rmA, rmB, "cr")
    val folded = Dsir.dsirScoreWithModels(s, raw, tm, rm, Dsir.totalsOf(tm, rm))
      .collect().map(_.toSeq).toSet
    val retrained = Dsir.dsirWeights(s, target, raw).collect().map(_.toSeq).toSet
    assert(folded == retrained)
  }

  test("tiny m degrades gracefully: agreement row still well-formed") {
    val agree = Dsir.hashedAgreement(spark, target, raw, k = 3, buckets = 2).collect()(0)
    assert(agree.getLong(0) == 3L)
    assert(agree.getLong(1) >= 0L && agree.getLong(1) <= 3L)
  }
}
