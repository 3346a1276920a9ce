package graft

import org.apache.spark.sql.functions._
import graft.llm.SqOps

/** SQ8 codec properties: codes stay in one byte, dequantization error
  * is bounded by half a ladder step per dimension, constant dimensions
  * survive, and the full top-k path finds an exact-duplicate vector
  * first.
  */
class SqSpec extends SparkSpec {
  private def s = spark

  test("codes in [0,255]; |dequant - x| <= step/2; constant dims exact") {
    val sp = s
    import sp.implicits._
    val rnd = new scala.util.Random(5)
    val vecs = (1L to 50L).map(i =>
      (i, Array.fill(8)(rnd.nextFloat() * 10f - 5f).updated(3, 7.5f)))
    val df = vecs.toDF("id", "vec")
    val (mn, step) = SqOps.ladder(df, "vec")
    assert(step(3) == 0.0) // dimension 3 is constant
    val out = df.select(col("id"),
        SqOps.encode(col("vec"), mn, step).as("codes"))
      .select(col("id"), col("codes"),
        SqOps.dequantize(col("codes"), mn, step).as("dq"))
      .collect()
    val byId = vecs.toMap
    out.foreach { r =>
      val codes = r.getSeq[Int](1)
      val dq = r.getSeq[Float](2)
      val orig = byId(r.getLong(0))
      assert(codes.forall(c => c >= 0 && c <= 255))
      orig.indices.foreach { i =>
        val tol = if (step(i) == 0.0) 1e-6 else step(i) / 2 + 1e-6
        assert(math.abs(dq(i) - orig(i)) <= tol,
          s"dim $i: ${dq(i)} vs ${orig(i)} (step ${step(i)})")
      }
      assert(dq(3) == 7.5f) // constant dim reconstructs exactly
    }
  }

  test("top-k ranks an exact duplicate of the query first") {
    val sp = s
    import sp.implicits._
    val rnd = new scala.util.Random(11)
    val base = Array.fill(8)(rnd.nextFloat())
    val corpus = (2L to 40L).map(i =>
      (i, Array.fill(8)(rnd.nextFloat() * 2f))) :+ (99L, base.clone)
    val emb = corpus.toDF("id", "vec")
    val q = Seq((1L, base)).toDF("qid", "qvec")
    val top = SqOps.sqTopK(s, emb, q, k = 3).collect()
      .sortBy(_.getAs[Int]("rn"))
    assert(top.head.getAs[Long]("id") == 99L,
      s"duplicate not ranked first: ${top.toSeq}")
  }
}
