package graft

import org.apache.spark.sql.functions._
import graft.llm.Curation

/** Bigram-LM quality scoring ([[graft.llm.Curation.bigramLmScore]]).
  * Pins the add-one-smoothing arithmetic on a hand-computed corpus, the
  * unseen-gram floor when model and docs differ (left-join semantics —
  * unseen grams score, they don't drop), the <2-token zero case, and
  * the signal itself: text made of the model's common bigrams outscores
  * a scrambled version of the same tokens.
  */
class BigramLmSpec extends SparkSpec {
  import spark.implicits._

  private def r6(x: Double) = math.rint(x * 1e6) / 1e6

  test("hand-computed: corpus 'a b a' scoring itself") {
    val docs = Seq((0L, "a b a")).toDF("doc_id", "text")
    val got = Curation.bigramLmScore(spark, docs, docs)
      .as[(Long, Long, Double)].collect().toSeq
    // uni: a=2 b=1, V=2; big: "a b"=1, "b a"=1
    // lp(a b) = ln((1+1)/(2+2)), lp(b a) = ln((1+1)/(1+2))
    val exp = r6((math.log(2.0 / 4.0) + math.log(2.0 / 3.0)) / 2)
    assert(got == Seq((0L, 2L, exp)))
  }

  test("unseen bigrams and unigrams score at the smoothed floor") {
    val model = Seq((0L, "a b")).toDF("doc_id", "text")
    val docs = Seq((1L, "c d"), (2L, "a")).toDF("doc_id", "text")
    val got = Curation.bigramLmScore(spark, model, docs)
      .orderBy("doc_id").as[(Long, Long, Double)].collect().toSeq
    // "c d": c2=0, c1=0, V=2 -> ln(1/2); "a": no bigrams -> (0, 0.0)
    assert(got == Seq((1L, 1L, r6(math.log(0.5))), (2L, 0L, 0.0)))
  }

  test("in-domain text outscores scrambled tokens") {
    val r = new scala.util.Random(108)
    // model: 200 docs of a fixed 6-token phrase -> its bigrams dominate
    val phrase = "the quick brown fox jumps over"
    val model = (0L until 200L).map((_, phrase)).toDF("doc_id", "text")
    val scrambled = r.shuffle(phrase.split(" ").toList).mkString(" ")
    val docs = Seq((0L, phrase), (1L, scrambled)).toDF("doc_id", "text")
    val sc = Curation.bigramLmScore(spark, model, docs)
      .orderBy("doc_id").as[(Long, Long, Double)].collect()
    assert(sc(0)._3 > sc(1)._3,
      s"in-domain ${sc(0)._3} should beat scrambled ${sc(1)._3}")
  }
}
