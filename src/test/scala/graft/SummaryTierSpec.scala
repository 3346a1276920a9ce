package graft

import org.apache.spark.sql.functions._
import graft.graph.Assortativity
import graft.llm.Phrase
import graft.rel.{Categorical, Cohort, Summary}

/** Analytic ground truth for the round's summary/behavioral operators:
  * assortativity on graphs with known coefficients, weighted median and
  * CUSUM on hand-computable series, mode tie order, and phrase
  * adjacency edge cases.
  */
class SummaryTierSpec extends SparkSpec {

  test("assortativity: 3-path is exactly -1; edge direction of input irrelevant") {
    val s = spark
    import s.implicits._
    // path 0-1-2: endpoint degree pairs are perfectly anti-correlated
    val got = Assortativity.degreeAssortativity(s,
      Seq((0L, 1L), (2L, 1L)).toDF("a", "b")).collect()(0)
    assert(got.getLong(0) == 4L) // 2 undirected edges -> 4 directed
    assert(got.getDouble(1) == -1.0)
  }

  test("assortativity: 5-star is exactly -1 and noise edges are canonicalized") {
    val s = spark
    import s.implicits._
    // star centre 0: every edge pairs degree 5 with degree 1 -> r = -1.
    // Duplicates / reversals / self-loops must not change the value.
    val edges = (1L to 5L).map(h => (0L, h)) ++ Seq((3L, 0L), (0L, 3L), (2L, 2L))
    val got = Assortativity.degreeAssortativity(s, edges.toDF("a", "b")).collect()(0)
    assert(got.getLong(0) == 10L)
    assert(got.getDouble(1) == -1.0)
  }

  test("weighted median: cumulative-weight threshold, exact at 2*cumw == W") {
    val s = spark
    import s.implicits._
    val df = Seq(("a", 10L, 1L), ("a", 20L, 2L), ("a", 30L, 1L),
      ("b", 5L, 1L), ("b", 7L, 1L)).toDF("g", "v", "w")
    val got = Summary.weightedMedian(df, "g", "v", "w")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // a: W=4, cum(10)=1, cum(20)=3 -> 2*3 >= 4 -> 20
    // b: W=2, cum(5)=1 -> 2*1 >= 2 -> the LOWER median by the pinned rule
    assert(got == Map("a" -> (20L, 4L), "b" -> (5L, 2L)))
  }

  test("cusum scan: n-scaled statistic peaks at the level shift") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, 1L), (2L, 1L), (3L, 10L), (4L, 10L)).toDF("t", "x")
    val got = Cohort.cusumScan(df, "t", "x")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // n=4, tot=22, cum=[1,2,12,22]: 4*cum - t*22 = [-18, -36, -18, 0]
    assert(got == Map(1L -> -18L, 2L -> -36L, 3L -> -18L, 4L -> 0L))
    // the largest |S| sits on the last pre-shift point
    assert(got.minBy(_._2)._1 == 2L)
  }

  test("group mode: count wins, ties break to the lexicographically smaller value") {
    val s = spark
    import s.implicits._
    val df = Seq(("g1", "x"), ("g1", "x"), ("g1", "y"),
      ("g2", "b"), ("g2", "a")).toDF("g", "v")
    val got = Categorical.groupMode(df, "g", "v")
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(got == Map("g1" -> ("x", 2L), "g2" -> ("a", 1L)))
  }

  test("phrase counts: overlap, repetition, and too-short docs") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "fast table fast table fast"), // two non-overlapping hits
      (2L, "fast"),                       // shorter than the phrase
      (3L, "table fast"),                 // reversed: no hit
      (4L, "a a a"),                      // repetition of the same token
      (5L, "")).toDF("id", "text")
    val hits = Phrase.phraseCounts(docs, "id", "text", Seq("fast", "table"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hits == Map(1L -> 2L))
    val aa = Phrase.phraseCounts(docs, "id", "text", Seq("a", "a"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(aa == Map(4L -> 2L)) // positions (1,2) and (2,3) both count
  }

  test("pivot/unpivot shapes agree with a hand-built contingency") {
    val s = spark
    import s.implicits._
    val df = Seq(("n1", "p1", 5L), ("n1", "p2", 7L), ("n2", "p1", 3L))
      .toDF("g", "k", "v")
    val wide = df.groupBy("g").pivot("k", Seq("p1", "p2")).sum("v")
      .select(col("g"), coalesce(col("p1"), lit(0L)).as("p1"),
        coalesce(col("p2"), lit(0L)).as("p2"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(wide == Map("n1" -> (5L, 7L), "n2" -> (3L, 0L)))
  }
}
