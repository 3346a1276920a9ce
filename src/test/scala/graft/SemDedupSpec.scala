package graft

import org.apache.spark.sql.functions._
import graft.llm.LlmOps

/** SemDeDup-shaped semantic dedup: planted near-identical vectors must
  * be flagged no matter how the corpus clusters (identical inputs land
  * in identical cells — assignment is a pure function of the vector),
  * every flag must be SOUND (truly above the threshold), and the
  * representative must be the smallest qualifying id.
  */
class SemDedupSpec extends SparkSpec {

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
      i += 1
    }
    d / (math.sqrt(na) * math.sqrt(nb))
  }

  test("planted copies are flagged with their source as representative; flags are sound") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(1)
    val base = (0L until 200L).map(i => (i, Array.fill(16)(rnd.nextFloat() * 2 - 1)))
    // ten exact copies (cos = 1) of spread-out base vectors, higher ids
    val copies = (0 until 10).map(k => (1000L + k, base(k * 19)._2.clone()))
    val all = base ++ copies
    val emb = all.map { case (i, v) => (i, v.toSeq) }.toDF("id", "vec")
    val out = LlmOps.semDedup(s, emb, cells = 8, threshold = 0.95)
    assert(out.count() == 210, "semDedup must return every doc")
    val byId = all.toMap
    val flagged = out.filter(col("dup_of").isNotNull).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    (0 until 10).foreach { k =>
      val copyId = 1000L + k
      val srcId = base(k * 19)._1
      assert(flagged.contains(copyId), s"planted copy $copyId not flagged")
      assert(flagged(copyId) <= srcId, s"representative for $copyId above its source")
    }
    // soundness: every flagged (dup, representative) pair is truly >= 0.95
    flagged.foreach { case (j, i) =>
      assert(cos(byId(i), byId(j)) >= 0.95, s"unsound flag: $j -> $i")
    }
  }
}
