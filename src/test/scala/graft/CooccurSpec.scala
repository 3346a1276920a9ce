package graft

import org.apache.spark.sql.functions._
import graft.llm.Cooccur

class CooccurSpec extends SparkSpec {

  private def run(texts: Seq[String], window: Int, minCount: Long):
      Map[(String, String), (Long, Double)] = {
    val s = spark
    import s.implicits._
    Cooccur.pmiPairs(s, texts.toDF("text"), window, minCount)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
  }

  /** driver-side replay: window pairs, counts, and the same
    * ln-of-ordered-multiplies arithmetic
    */
  private def replay(texts: Seq[String], window: Int, minCount: Long):
      Map[(String, String), (Long, Double)] = {
    val docs = texts.map(_.trim.toLowerCase.split("\\s+").filter(_.nonEmpty))
    val pairs = docs.flatMap { w =>
      for {
        i <- w.indices
        o <- 1 to window
        if i + o < w.length
      } yield if (w(i) <= w(i + o)) (w(i), w(i + o)) else (w(i + o), w(i))
    }
    val toks = docs.flatten
    val pc = pairs.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val uc = toks.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val np = pc.values.sum
    val nt = toks.length.toLong
    pc.collect { case ((a, b), c2) if c2 >= minCount =>
      val pmi = math.log(
        (c2.toDouble * nt.toDouble * nt.toDouble) /
          (np.toDouble * uc(a).toDouble * uc(b).toDouble))
      (a, b) -> (c2, math.rint(pmi * 1e6) / 1e6)
    }
  }

  test("matches the analytic PMI on a constructed corpus") {
    // "x y" always adjacent (strong collocation); "p"/"q" appear often
    // but never within a window of each other
    val corpus = Seq.fill(6)("x y p") ++ Seq.fill(6)("q r s x y")
    val got = run(corpus, window = 2, minCount = 5)
    val want = replay(corpus, window = 2, minCount = 5)
    assert(got == want)
    assert(got.contains(("x", "y")))
    assert(!got.contains(("p", "q")), "p and q never co-occur in-window")
  }

  test("window bounds pair generation; minCount filters") {
    // tokens 3 apart are NOT a pair at window=2
    val corpus = Seq.fill(5)("a m n b")
    val got = run(corpus, window = 2, minCount = 5)
    assert(!got.contains(("a", "b")), "distance-3 pair must not appear at w=2")
    assert(got.contains(("a", "m")) && got.contains(("b", "n")))
    val w3 = run(corpus, window = 3, minCount = 5)
    assert(w3.contains(("a", "b")), "distance-3 pair appears at w=3")
    assert(run(corpus, 2, 6).isEmpty, "count-5 pairs drop at minCount=6")
  }

  test("a token repeated within the window pairs with itself") {
    val corpus = Seq.fill(5)("z z")
    val got = run(corpus, window = 2, minCount = 5)
    assert(got.keySet == Set(("z", "z")))
    assert(got == replay(corpus, 2, 5))
  }

  test("empty and single-token docs contribute no pairs") {
    val corpus = Seq.fill(5)("a b") ++ Seq("", "   ", "solo")
    val got = run(corpus, window = 2, minCount = 5)
    val want = replay(corpus, window = 2, minCount = 5)
    assert(got == want)
    assert(got.contains(("a", "b")))
  }
}
