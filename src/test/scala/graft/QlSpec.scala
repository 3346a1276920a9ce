package graft

import graft.llm.Ql

/** Query-likelihood retrieval (Ql.scala): the sparse decomposition must
  * equal the FULL-FORM log-likelihood Σ qtf·ln p(t|d) computed directly
  * on the fixture, term by term, for both smoothers; plus the
  * degenerations and the dropped-term rule.
  */
class QlSpec extends SparkSpec {

  // collection: c_len = 9; cf: a=3, b=4, c=2
  private def docs = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "a a b"),
      (2L, "a c"),
      (3L, "b b b c")
    ).toDF("doc_id", "text")
  }

  private val toks = Map(
    1L -> Seq("a", "a", "b"),
    2L -> Seq("a", "c"),
    3L -> Seq("b", "b", "b", "c"))
  private val cf = Map("a" -> 3.0, "b" -> 4.0, "c" -> 2.0)
  private val cLen = 9.0
  private def pc(t: String) = cf(t) / cLen
  private def tf(d: Long, t: String) = toks(d).count(_ == t).toDouble
  private def len(d: Long) = toks(d).size.toDouble

  /** full-form Dirichlet: Σ_t qtf·ln((tf + µ·p_c)/(len + µ)) */
  private def fullDirichlet(d: Long, q: Seq[String], mu: Double): Double =
    q.groupBy(identity).map { case (t, xs) =>
      xs.size * math.log((tf(d, t) + mu * pc(t)) / (len(d) + mu))
    }.sum

  /** full-form JM: Σ_t qtf·ln((1−λ)·tf/len + λ·p_c) */
  private def fullJm(d: Long, q: Seq[String], lam: Double): Double =
    q.groupBy(identity).map { case (t, xs) =>
      xs.size * math.log((1 - lam) * tf(d, t) / len(d) + lam * pc(t))
    }.sum

  test("dirichlet sparse score equals the full-form log-likelihood on every candidate") {
    val q = Seq(0 -> Seq("a", "b"))
    val got = Ql.qlDirichletTopK(spark, docs, q, k = 10, mu = 1.0)
      .collect().map(r => r.getLong(2) -> r.getDouble(3)).toMap
    assert(got.keySet == Set(1L, 2L, 3L)) // all docs match ≥1 term
    for (d <- got.keySet)
      assert(math.abs(got(d) -
        math.rint(fullDirichlet(d, Seq("a", "b"), 1.0) * 1e6) / 1e6) < 1e-9,
        s"doc $d")
  }

  test("jm sparse score equals the full-form log-likelihood on every candidate") {
    val q = Seq(0 -> Seq("a", "b"))
    val got = Ql.qlJmTopK(spark, docs, q, k = 10, lambdaMilli = 400)
      .collect().map(r => r.getLong(2) -> r.getDouble(3)).toMap
    assert(got.keySet == Set(1L, 2L, 3L))
    for (d <- got.keySet)
      assert(math.abs(got(d) -
        math.rint(fullJm(d, Seq("a", "b"), 0.4) * 1e6) / 1e6) < 1e-9,
        s"doc $d")
  }

  test("repeated query terms weight by qtf (query [a,a] = 2x the [a] matching sum)") {
    val one = Ql.qlJmTopK(spark, docs, Seq(0 -> Seq("a")), 10, 400)
      .collect().map(r => r.getLong(2) -> r.getDouble(3)).toMap
    val two = Ql.qlJmTopK(spark, docs, Seq(0 -> Seq("a", "a")), 10, 400)
      .collect().map(r => r.getLong(2) -> r.getDouble(3)).toMap
    for (d <- one.keySet)
      assert(math.abs(two(d) - math.rint(2 * 1e6 * one(d) + 0.0) / 1e6) < 2e-6,
        s"doc $d: ${two(d)} vs 2*${one(d)}")
  }

  test("collection-absent query terms are dropped: scores unchanged, candidates unchanged") {
    val base = Ql.qlDirichletTopK(spark, docs, Seq(0 -> Seq("a", "b")), 10, 1.0)
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    val zz = Ql.qlDirichletTopK(spark, docs, Seq(0 -> Seq("a", "b", "zzz")), 10, 1.0)
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(base == zz)
  }

  test("jm lambda=1000 degenerates to the pure collection model: all candidates tie, ranked by id") {
    val got = Ql.qlJmTopK(spark, docs, Seq(0 -> Seq("a", "b")), 10, 1000)
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(got.map(_._2).toSeq == Seq(1L, 2L, 3L)) // id order under equal scores
    assert(got.map(_._3).distinct.size == 1)
    val expect = math.rint((math.log(pc("a")) + math.log(pc("b"))) * 1e6) / 1e6
    assert(math.abs(got.head._3 - expect) < 1e-9)
  }

  test("dirichlet favors the doc with more query-term mass at matched length") {
    // docs 1 (a a b) and 3 (b b b c) both match; for query [b] doc 3
    // must outrank doc 1 (3 of 4 tokens vs 1 of 3)
    val got = Ql.qlDirichletTopK(spark, docs, Seq(0 -> Seq("b")), 2, 500.0)
      .collect().map(_.getLong(2)).toSeq
    assert(got.head == 3L)
  }

  test("queries with no surviving term produce no rows; others unaffected") {
    val got = Ql.qlDirichletTopK(spark, docs,
      Seq(0 -> Seq("zzz"), 1 -> Seq("c")), 10, 1.0)
      .collect().map(r => (r.getInt(0), r.getLong(2)))
    assert(got.forall(_._1 == 1))
    assert(got.map(_._2).toSet == Set(2L, 3L))
  }

  test("invalid parameters fail loudly") {
    intercept[IllegalArgumentException] {
      Ql.qlDirichletTopK(spark, docs, Seq(0 -> Seq("a")), 5, mu = 0.0)
    }
    intercept[IllegalArgumentException] {
      Ql.qlJmTopK(spark, docs, Seq(0 -> Seq("a")), 5, lambdaMilli = 0)
    }
  }
}
