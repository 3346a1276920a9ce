package graft

import graft.llm.NaiveBayes

/** Multinomial naive Bayes (llm/NaiveBayes.scala): hand-checked model
  * cells (Laplace smoothing, micro quantization), prior fallback for
  * out-of-vocabulary docs, argmax tie determinism, and the confusion
  * matrix on a separable corpus.
  */
class NaiveBayesSpec extends SparkSpec {

  private def docs = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "aa aa bb", "x"), (2L, "aa bb", "x"), (3L, "aa aa", "x"),
      (4L, "cc cc bb", "y"), (5L, "cc bb", "y"), (6L, "cc cc", "y")
    ).toDF("doc_id", "text", "lang")
  }

  test("model cells replay the smoothed micro-quantized likelihoods") {
    val m = NaiveBayes.naiveBayesModel(spark, docs, minDf = 2)
      .collect()
      .map(r => (r.getString(0), Option(r.getString(1))) -> r.getLong(2))
      .toMap
    // vocab = {aa, bb, cc} (all df >= 2); x counts: aa=5, bb=2, cc=0,
    // N_x=7; ln((5+1)/(7+3)) = ln(0.6)
    assert(m(("x", Some("aa"))) == math.round(math.log(6.0 / 10.0) * 1e6))
    assert(m(("x", Some("cc"))) == math.round(math.log(1.0 / 10.0) * 1e6))
    // y counts: cc=5, bb=2, aa=0, N_y=7
    assert(m(("y", Some("cc"))) == math.round(math.log(6.0 / 10.0) * 1e6))
    // priors: 3/6 each
    assert(m(("x", None)) == math.round(math.log(0.5) * 1e6))
    assert(m(("y", None)) == math.round(math.log(0.5) * 1e6))
  }

  test("separable corpus self-classifies on the diagonal") {
    val got = NaiveBayes.naiveBayesConfusion(spark, docs, minDf = 2)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == Map(("x", "x") -> 3L, ("y", "y") -> 3L))
  }

  test("zero-in-vocab docs fall back to the prior argmax, tie -> label asc") {
    val s = spark
    import s.implicits._
    // doc 7's only token is below the df floor; priors tie at 50/50
    // after adding one doc per class -> prediction must be the
    // lexicographically first label among the tied argmax
    val d2 = docs.union(Seq((7L, "zz", "y")).toDF("doc_id", "text", "lang"))
    val got = NaiveBayes.naiveBayesConfusion(spark, d2, minDf = 2)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // priors now x: 3/7, y: 4/7 -> the OOV doc goes to y (larger prior)
    assert(got(("y", "y")) == 4L)
  }

  test("a label with every term below the df floor gets smoothed cells, not a prior-only free ride") {
    val s = spark
    import s.implicits._
    // label z's only tokens (qq, rr) fall below minDf=2: it trains with
    // n_z = 0 but must still get ln(1/(0+|V|)) cells for every vocab
    // term — with prior-only scoring (the pre-fix bug) its score lacks
    // the per-token likelihood penalty and it wins the argmax for any
    // sufficiently long document
    val d3 = docs.union(
      Seq((7L, "qq", "z"), (8L, "rr", "z")).toDF("doc_id", "text", "lang"))
    val model = NaiveBayes.naiveBayesModel(spark, d3, minDf = 2)
    val m = model.collect()
      .map(r => (r.getString(0), Option(r.getString(1))) -> r.getLong(2))
      .toMap
    // vocab stays {aa, bb, cc}; z's smoothed cell: ln((0+1)/(0+3))
    assert(m(("z", Some("aa"))) == math.round(math.log(1.0 / 3.0) * 1e6))
    assert(m(("z", Some("cc"))) == math.round(math.log(1.0 / 3.0) * 1e6))
    // a long in-vocabulary document must not drift to the label that
    // never earned any in-vocab evidence
    val longDoc = Seq((9L, Seq.fill(50)("aa").mkString(" "), "x"))
      .toDF("doc_id", "text", "lang")
    val pred = NaiveBayes.naiveBayesScore(longDoc, model).collect()
    assert(pred.length == 1 && pred.head.getString(2) == "x")
  }

  test("mcnemar: perfectly-agreeing classifiers yield a null statistic") {
    val s = spark
    import s.implicits._
    // disjoint words AND characters per class: both classifiers perfect
    val d = Seq(
      (1L, "aaa aaa aaa", "x"), (2L, "aaa aaa", "x"), (3L, "aaa", "x"),
      (4L, "bbb bbb bbb", "y"), (5L, "bbb bbb", "y"), (6L, "bbb", "y")
    ).toDF("doc_id", "text", "lang")
    val r = NaiveBayes.mcnemarNbVsTrigram(spark, d, minDf = 2).collect()(0)
    assert(r.getLong(0) == 6L && r.getLong(1) == 6L && r.getLong(2) == 6L,
      s"$r")
    assert(r.getLong(3) == 0L && r.getLong(4) == 0L && r.isNullAt(5), s"$r")
  }

  test("mcnemar: the statistic replays (b-c)^2/(b+c) from the counts") {
    val s = spark
    import s.implicits._
    // word signal is clean; trigrams are poisoned by a shared suffix
    val d = Seq(
      (1L, "red apple", "x"), (2L, "red apple", "x"),
      (3L, "red banana", "x"),
      (4L, "blue banana", "y"), (5L, "blue banana", "y"),
      (6L, "blue apple", "y")
    ).toDF("doc_id", "text", "lang")
    val r = NaiveBayes.mcnemarNbVsTrigram(spark, d, minDf = 1).collect()(0)
    val (b, c) = (r.getLong(3), r.getLong(4))
    if (b + c > 0) {
      val want = BigDecimal((b - c).toDouble * (b - c) / (b + c))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(5) == want, s"$r")
    } else assert(r.isNullAt(5), s"$r")
  }

  test("label-noise audit surfaces a planted flipped label first") {
    val s = spark
    import s.implicits._
    val d = Seq(
      (1L, "aa aa aa", "x"), (2L, "aa aa", "x"), (3L, "aa aa aa aa", "x"),
      (4L, "bb bb bb", "y"), (5L, "bb bb", "y"),
      (6L, "aa aa aa", "y") // the plant: pure-x text labeled y
    ).toDF("doc_id", "text", "lang")
    val got = NaiveBayes.labelNoiseAudit(spark, d, minDf = 2, k = 5)
      .collect()
    assert(got.nonEmpty && got(0).getLong(0) == 6L
      && got(0).getString(1) == "y" && got(0).getString(2) == "x"
      && got(0).getLong(3) > 0L, s"${got.toSeq}")
  }

  test("a clean separable corpus yields an empty relabel queue") {
    val got = NaiveBayes.labelNoiseAudit(spark, docs, minDf = 2, k = 5)
      .collect()
    assert(got.isEmpty, s"${got.toSeq}")
  }

  test("classifier report: hand-checked tp/fp/fn on a planted error") {
    val s = spark
    import s.implicits._
    val d = Seq(
      (1L, "aa aa aa", "x"), (2L, "aa aa", "x"),
      (3L, "bb bb bb", "y"), (4L, "bb bb", "y"),
      (5L, "aa aa aa", "y") // mislabeled: predicted x, truth y
    ).toDF("doc_id", "text", "lang")
    val got = NaiveBayes.classifierReport(spark, d, minDf = 2)
      .collect().map(r => r.getString(0) -> r).toMap
    val x = got("x"); val y = got("y")
    // x: tp=2, fp=1 (doc 5), fn=0 -> p=2/3, r=1, f1=4/5
    assert(x.getLong(2) == 2L && x.getLong(3) == 1L && x.getLong(4) == 0L,
      s"$x")
    assert(x.getDouble(5) == 0.666667 && x.getDouble(6) == 1.0
      && x.getDouble(7) == 0.8, s"$x")
    // y: tp=2, fp=0, fn=1 -> p=1, r=2/3
    assert(y.getLong(2) == 2L && y.getLong(3) == 0L && y.getLong(4) == 1L,
      s"$y")
    assert(y.getDouble(5) == 1.0 && y.getDouble(6) == 0.666667, s"$y")
  }

  test("df floor drops rare terms from the model") {
    // distinct-doc frequencies: aa=3, bb=4, cc=3
    val t3 = NaiveBayes.naiveBayesModel(spark, docs, minDf = 3)
      .collect().flatMap(r => Option(r.getString(1))).toSet
    val t4 = NaiveBayes.naiveBayesModel(spark, docs, minDf = 4)
      .collect().flatMap(r => Option(r.getString(1))).toSet
    assert(t3 == Set("aa", "bb", "cc") && t4 == Set("bb"),
      s"got $t3 / $t4")
  }
}
