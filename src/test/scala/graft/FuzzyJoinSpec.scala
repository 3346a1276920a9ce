package graft

import org.apache.spark.sql.functions._
import graft.rel.FuzzyJoin

class FuzzyJoinSpec extends SparkSpec {

  /** driver-side Levenshtein for the brute-force ground truth */
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1)(i => i)
    for (j <- 1 to b.length) {
      var prev = d(0); d(0) = j
      for (i <- 1 to a.length) {
        val t = d(i)
        d(i) = math.min(math.min(d(i) + 1, d(i - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = t
      }
    }
    d(a.length)
  }

  private def bruteSelf(rows: Seq[(Long, String)], t: Int): Set[(Long, Long, Long)] =
    (for {
      (ia, sa) <- rows; (ib, sb) <- rows
      if ia < ib && lev(sa, sb) <= t
    } yield (ia, ib, lev(sa, sb).toLong)).toSet

  test("delVariants enumerates the exact deletion neighborhood") {
    val s = spark
    import s.implicits._
    def variants(str: String, t: Int): Set[String] =
      Seq(str).toDF("s")
        .select(FuzzyJoin.delVariants(col("s"), t).as("v"))
        .collect().head.getSeq[String](0).toSet
    assert(variants("abc", 1) == Set("abc", "bc", "ac", "ab"))
    assert(variants("abc", 2) == Set("abc", "bc", "ac", "ab", "a", "b", "c"))
    assert(variants("", 1) == Set(""))
    assert(variants("", 2) == Set(""))
    assert(variants("a", 2) == Set("a", ""))
    // duplicate-producing deletions collapse (delete either 'a' of "aa")
    assert(variants("aa", 1) == Set("aa", "a"))
  }

  test("selfPairs == brute-force levenshtein pairs at t = 1 and t = 2") {
    val s = spark
    import s.implicits._
    // mixed cluster: substitutions, inserts, deletes, short strings,
    // an exact duplicate value under two ids, and unrelated strings
    val rows: Seq[(Long, String)] = Seq(
      1L -> "acme corp", 2L -> "acme crop", 3L -> "acme  corp",
      4L -> "acme co", 5L -> "a", 6L -> "b", 7L -> "",
      8L -> "zebra holdings", 9L -> "acme corp",
      10L -> "zebra holding")
    val df = rows.toDF("id", "s")
    for (t <- Seq(1, 2)) {
      val got = FuzzyJoin.selfPairs(s, df, "id", "s", maxDist = t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == bruteSelf(rows, t), s"t=$t")
    }
  }

  test("selfPairs completeness on random strings (property)") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(42)
    val alphabet = "abc" // tiny alphabet → dense near-neighborhoods
    val rows: Seq[(Long, String)] = (0L until 60L).map { i =>
      i -> Seq.fill(2 + rnd.nextInt(5))(alphabet(rnd.nextInt(3))).mkString
    }
    val df = rows.toDF("id", "s")
    val got = FuzzyJoin.selfPairs(s, df, "id", "s", maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == bruteSelf(rows, 2))
  }

  test("joinPairs == brute force cross-table; null strings match nothing") {
    val s = spark
    import s.implicits._
    val left: Seq[(Long, String)] = Seq(1L -> "kitten", 2L -> "flag", 3L -> "ab")
    val right: Seq[(Long, String)] = Seq(
      10L -> "sitten", 11L -> "flap", 12L -> "abc", 13L -> "unrelated")
    val ldf = left.toDF("lid", "ls")
    val rdf = right.toDF("rid", "rs")
      .unionAll(Seq((14L, null.asInstanceOf[String])).toDF("rid", "rs"))
    val got = FuzzyJoin.joinPairs(s, ldf, "lid", "ls", rdf, "rid", "rs", maxDist = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = (for {
      (la, sa) <- left; (rb, sb) <- right
      if lev(sa, sb) <= 1
    } yield (la, rb, lev(sa, sb).toLong)).toSet
    assert(got == want)
    assert(want.contains((1L, 10L, 1L)) && want.contains((2L, 11L, 1L)))
  }

  test("over-cap buckets drop pairs and surface in the observation") {
    val s = spark
    import s.implicits._
    // every string blocks to variant "x" (they all contain it), so one
    // bucket holds all ids; cap=2 must drop it and count the drop
    val rows = (0L until 5L).map(i => i -> "x")
    val df = rows.toDF("id", "s")
    val res = FuzzyJoin.selfPairs(s, df, "id", "s", maxDist = 1, cap = 2,
      observePrefix = Some("t"))
    val n = res.count()
    assert(n == 0L) // the only bucket overflowed
    // uncapped: all C(5,2) exact-dup pairs at distance 0
    val full = FuzzyJoin.selfPairs(s, df, "id", "s", maxDist = 1)
    assert(full.count() == 10L)
  }
}
