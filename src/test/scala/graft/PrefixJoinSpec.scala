package graft

import org.apache.spark.sql.functions._
import graft.llm.Dedup

/** Prefix-filtered Jaccard join: the filter must be LOSSLESS — its
  * output is pinned bit-identical to the full pair machinery filtered
  * at the same threshold, which is the property the prefix bound
  * (shared shingle within the first n − ⌈t·n⌉ + 1 under the global df
  * order) guarantees.
  */
class PrefixJoinSpec extends SparkSpec {

  private def corpus = {
    val s = spark
    import s.implicits._
    // near-dup pair (1, 2), an excerpt (3), and unrelated filler —
    // enough shingle overlap structure to exercise prefixes at t=0.4
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "the quick brown fox jumps over the lazy cat tonight"),
      (3L, "quick brown fox jumps over"),
      (4L, "completely different words about spark shuffles and joins"),
      (5L, "spark shuffles and joins are completely different words about"),
      (6L, "short doc"),
      (7L, "")).toDF("id", "text")
  }

  test("prefix-filtered output equals full jaccardPairs at the same threshold") {
    val s = spark
    val full = Dedup.jaccardPairs(s, corpus, minJaccard = 0.0)
      .filter(col("inter") * 1000 >= lit(400) * (col("na") + col("nb") - col("inter")))
      .select("ida", "idb", "inter", "jac")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val pref = Dedup.prefixJaccardPairs(s, corpus, minJacMilli = 400)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(pref == full)
    assert(pref.nonEmpty) // the (1,2) near-dup must survive
    assert(pref.exists { case (a, b, _, _) => (a, b) == (1L, 2L) })
  }

  test("threshold 1.0 keeps only exact-set duplicates") {
    val s = spark
    import s.implicits._
    val dup = corpus.unionAll(Seq(
      (8L, "the quick brown fox jumps over the lazy dog tonight")).toDF("id", "text"))
    val got = Dedup.prefixJaccardPairs(s, dup, minJacMilli = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 8L)))
  }
}
