package graft

import graft.rel.Tree

/** Gini split-gain finder (q361). */
class TreeSpec extends SparkSpec {

  test("a perfectly separating feature gets the parent impurity as gain; noise gets ~0") {
    val s = spark
    import s.implicits._
    // leak separates y at x <= 5 perfectly; noise is independent of y
    val rows = (1 to 400).map { i =>
      val y = i % 2
      (if (y == 1) 3L + i % 3 else 8L + i % 3,
        (i * 2654435761L >> 3) % 10, y.toLong)
    }
    val got = Tree.splitGains(rows.toDF("leak", "noise", "y"),
      Seq("leak", "noise")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(6))).toMap
    val (leakSplit, leakGain) = got("leak")
    assert(leakSplit == 5L && math.abs(leakGain - 0.5) < 1e-9,
      s"perfect separator must gain the full parent impurity: $got")
    assert(got("noise")._2 < 0.02, s"noise gain must be ~0: $got")
  }

  test("tie-break picks the smallest threshold; constant features drop") {
    val s = spark
    import s.implicits._
    // x in {1,2,3}: splitting at 1 or 2 yields identical gain by
    // symmetry (y = x <= ... no — construct explicit tie: y=1 iff x=2)
    val rows = Seq((1L, 9L, 0L), (2L, 9L, 1L), (3L, 9L, 0L),
      (1L, 9L, 0L), (2L, 9L, 1L), (3L, 9L, 0L))
    val got = Tree.splitGains(rows.toDF("x", "const", "y"), Seq("x", "const"))
      .collect()
    assert(got.length == 1 && got.head.getString(0) == "x",
      s"constant feature must drop: ${got.toSeq}")
    // y=1 iff x=2: split at x<=1 isolates a pure-0 left (gain g1);
    // split at x<=2 leaves a pure-0 right — both reduce impurity;
    // the argmax must be deterministic
    assert(Seq(1L, 2L).contains(got.head.getLong(1)))
  }

  test("unbinned feature raises the distinct-value guard") {
    val s = spark
    import s.implicits._
    val rows = (1 to 70000).map(i => (i.toLong, (i % 2).toLong))
    val ex = intercept[Exception] {
      Tree.splitGains(rows.toDF("x", "y"), Seq("x")).collect()
    }
    assert(ex.getMessage.contains("bin it first"), ex.getMessage)
  }
}
