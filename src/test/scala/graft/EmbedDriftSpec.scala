package graft

import org.apache.spark.sql.functions._
import graft.llm.EmbedDrift

/** Embedding drift (llm/EmbedDrift.scala): zero on identical windows,
  * a hand-computed single-dimension shift, the argmax dimension, and
  * the empty-window guard.
  */
class EmbedDriftSpec extends SparkSpec {

  private def emb(rows: (Long, Seq[Float])*) = {
    val s = spark
    import s.implicits._
    rows.toDF("vec_id", "embedding")
  }

  test("identical windows show zero drift") {
    val v = Seq(0.1f, 0.2f, 0.3f)
    val got = EmbedDrift.embeddingDrift(
      emb(0L -> v, 2L -> v, 1L -> v, 3L -> v),
      col("vec_id") % 2 === 0).collect()(0)
    assert(got.getDouble(3) == 0.0 && got.getLong(5) == 0L, s"$got")
    assert(got.getLong(0) == 2L && got.getLong(1) == 2L
      && got.getLong(2) == 3L)
  }

  test("a planted shift in one dimension is measured exactly") {
    // ref mean dim1 = 0.5, cur mean dim1 = 0.3 -> shift 0.2 = 2e5 micro
    val got = EmbedDrift.embeddingDrift(
      emb(0L -> Seq(1.0f, 0.5f), 2L -> Seq(1.0f, 0.5f),
        1L -> Seq(1.0f, 0.3f), 3L -> Seq(1.0f, 0.3f)),
      col("vec_id") % 2 === 0).collect()(0)
    assert(got.getLong(4) == 1L, s"top dim: $got")
    assert(got.getLong(5) == 200000L, s"shift: $got")
    assert(got.getDouble(3) == 0.2, s"l2: $got")
  }

  test("an empty window raises") {
    val ex = intercept[Exception] {
      EmbedDrift.embeddingDrift(emb(0L -> Seq(1.0f)),
        col("vec_id") % 2 === 0).collect()
    }
    assert(ex.getMessage.contains("non-empty"), ex.getMessage)
  }
}
