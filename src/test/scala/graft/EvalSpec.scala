package graft

import org.apache.spark.sql.functions._
import graft.llm.Eval

/** Evaluation harness — hand-computed ground truth for the q233/q234
  * metric layer, exercising the regions the fixture saturates (the
  * corpus makes BM25's prec@5 ≡ 1.0): partial hits, missed relevants,
  * zero-relevant queries, graded NDCG below 1, and the classification
  * report's degenerate classes (never-predicted, invented).
  */
class EvalSpec extends SparkSpec {

  test("rankingMetrics: hand-computed precision/recall/MRR/NDCG") {
    val s = spark
    import s.implicits._
    // q0: ranked (1,2,3), relevant {2(g2,rel), 9(g1,rel)} ->
    //   prec@3 = 1/3, rec = 1/2, mrr = 1/2
    //   dcg = (2^2-1)/log2(3) = 3/1.584963; idcg = 3/1 + 1/1.584963
    // q1: ranked (7,8), nothing relevant -> all zero, but PRESENT
    // q2: ranked (5), relevant {5(g1)} -> everything 1
    val ranked = Seq((0, 1L, 1), (0, 2L, 2), (0, 3L, 3),
      (1, 7L, 1), (1, 8L, 2), (2, 5L, 1))
      .toDF("qid", "doc_id", "rn")
    val qrels = Seq((0, 2L, 2L, true), (0, 9L, 1L, true), (2, 5L, 1L, true))
      .toDF("qid", "doc_id", "grade", "rel")
    val m = Eval.rankingMetrics(s, ranked, qrels, k = 3).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5))).toMap
    assert(m.size == 3)
    val (nRel0, p0, r0, mrr0, ndcg0) = m(0)
    assert(nRel0 == 2L && p0 == 0.333333 && r0 == 0.5 && mrr0 == 0.5)
    val dcg = 3.0 / (math.log(3.0) / math.log(2.0))
    val idcg = 3.0 / (math.log(2.0) / math.log(2.0)) +
      1.0 / (math.log(3.0) / math.log(2.0))
    assert(math.abs(ndcg0 - dcg / idcg) < 1e-6)
    assert(m(1) == ((0L, 0.0, 0.0, 0.0, 0.0))) // no relevant: zeros, kept
    assert(m(2) == ((1L, 0.333333, 1.0, 1.0, 1.0)))
  }

  test("rankingMetrics: graded-but-not-relevant docs feed NDCG only") {
    val s = spark
    import s.implicits._
    // doc 4 is a partial match (grade 1, rel=false): it counts toward
    // DCG/IDCG but not precision/recall/MRR
    val ranked = Seq((0, 4L, 1), (0, 6L, 2)).toDF("qid", "doc_id", "rn")
    val qrels = Seq((0, 4L, 1L, false), (0, 6L, 2L, true))
      .toDF("qid", "doc_id", "grade", "rel")
    val r = Eval.rankingMetrics(s, ranked, qrels, k = 2).collect().head
    assert(r.getLong(1) == 1L)        // n_rel counts only rel=true
    assert(r.getDouble(2) == 0.5)     // prec: 1 of 2
    assert(r.getDouble(4) == 0.5)     // mrr: first REL at rank 2
    // dcg = 1/log2(2) + 3/log2(3); idcg = 3/log2(2) + 1/log2(3) -> < 1
    assert(r.getDouble(5) < 1.0 && r.getDouble(5) > 0.0)
  }

  test("classificationReport: margins, invented and never-predicted classes") {
    val s = spark
    import s.implicits._
    val truth = Seq((1L, "en"), (2L, "en"), (3L, "de"), (4L, "de"), (5L, "fr"))
      .toDF("doc_id", "label")
    val pred = Seq((1L, "en"), (2L, "de"), (3L, "de"), (4L, "xx"), (5L, "en"))
      .toDF("doc_id", "pred")
    val rows = Eval.classificationReport(s, pred, truth).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6))).toMap
    // en: 2 true, 2 predicted, 1 tp -> p=r=f1=0.5
    assert(rows("en") == ((2L, 2L, 1L, 0.5, 0.5, 0.5)))
    // de: 2 true, 2 predicted, 1 tp
    assert(rows("de") == ((2L, 2L, 1L, 0.5, 0.5, 0.5)))
    // fr: never predicted -> recall 0, precision 0 (0 predicted)
    assert(rows("fr") == ((1L, 0L, 0L, 0.0, 0.0, 0.0)))
    // xx: invented class -> support 0, precision 0
    assert(rows("xx") == ((0L, 1L, 0L, 0.0, 0.0, 0.0)))
    assert(rows.size == 4)
  }

  test("cohenKappa: hand-computed, incl. kappa 0 at chance agreement") {
    val s = spark
    import s.implicits._
    // 2x2: truth a,a,b,b; pred a,b,a,b -> po = 0.5, pe = 0.5, kappa 0
    val truth = Seq((1L, "a"), (2L, "a"), (3L, "b"), (4L, "b"))
      .toDF("doc_id", "label")
    val pred = Seq((1L, "a"), (2L, "b"), (3L, "a"), (4L, "b"))
      .toDF("doc_id", "pred")
    val r = Eval.cohenKappa(s, pred, truth).collect().head
    assert(r.getLong(0) == 4L && r.getLong(1) == 2L)
    assert(r.getDouble(2) == 0.5 && r.getDouble(3) == 0.5
      && r.getDouble(4) == 0.0)
    // perfect agreement -> kappa 1
    val perfect = Eval.cohenKappa(s, truth.withColumnRenamed("label", "pred"),
      truth).collect().head
    assert(perfect.getDouble(4) == 1.0)
    // one class everywhere on both sides: pe = 1 -> kappa 0 by
    // convention, not 0/0
    val onec = Seq((1L, "x"), (2L, "x")).toDF("doc_id", "label")
    val k1 = Eval.cohenKappa(s, onec.withColumnRenamed("label", "pred"),
      onec).collect().head
    assert(k1.getDouble(4) == 0.0)
  }

  test("temporalSplit: boundary semantics and embargo bands") {
    val s = spark
    import s.implicits._
    def ts(str: String) =
      java.sql.Timestamp.from(java.time.Instant.parse(str))
    val rows = Seq(
      (1L, ts("2024-01-10T00:00:00Z")), // train
      (2L, ts("2024-01-21T13:00:00Z")), // inside 12h pre-valid embargo
      (3L, ts("2024-01-22T00:00:00Z")), // exactly validFrom -> valid
      (4L, ts("2024-01-25T00:00:00Z")), // valid
      (5L, ts("2024-01-26T23:59:59Z")), // inside pre-test embargo
      (6L, ts("2024-01-27T00:00:00Z")), // exactly testFrom -> test
      (7L, ts("2024-01-29T00:00:00Z"))  // test
    ).toDF("id", "ts")
    val got = graft.llm.Curation.temporalSplit(rows, "ts",
        ts("2024-01-22T00:00:00Z"), ts("2024-01-27T00:00:00Z"),
        java.time.Duration.ofHours(12))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(got == Map(1L -> "train", 2L -> "embargo", 3L -> "valid",
      4L -> "valid", 5L -> "embargo", 6L -> "test", 7L -> "test"))
  }

  test("termMatchQrels: grades count matched terms, rel is AND-match") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "join hash probe"), (2L, "join only here"),
      (3L, "nothing relevant")).toDF("doc_id", "text")
    val q = Eval.termMatchQrels(s, docs, Seq(0 -> Seq("join", "hash")))
      .collect().map(r => r.getLong(1) -> (r.getLong(2), r.getBoolean(3))).toMap
    assert(q(1L) == ((2L, true)))   // both terms -> rel
    assert(q(2L) == ((1L, false)))  // partial -> graded, not rel
    assert(!q.contains(3L))
  }

  test("groupedAuc: perfect, inverted, tied, and undefined groups") {
    val sp = spark
    import sp.implicits._
    val df = Seq(
      // g1: perfect separation -> AUC 1
      ("g1", 1L, false), ("g1", 2L, false), ("g1", 3L, true), ("g1", 4L, true),
      // g2: perfectly inverted -> AUC 0
      ("g2", 9L, false), ("g2", 1L, true),
      // g3: all mass on one tied score -> AUC 1/2 exactly
      ("g3", 5L, true), ("g3", 5L, false), ("g3", 5L, true), ("g3", 5L, false),
      // g4: 3 pos / 1 neg, one discordant pair -> AUC 2/3
      ("g4", 1L, true), ("g4", 2L, false), ("g4", 3L, true), ("g4", 4L, true),
      // g5: no negatives -> undefined, excluded
      ("g5", 1L, true), ("g5", 2L, true)
    ).toDF("g", "s", "y")
    val got = graft.llm.Eval.groupedAuc(df, col("g"), col("s"), col("y"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
      .toMap
    assert(got("g1") == ((2L, 2L, 8L, 1.0)))
    assert(got("g2") == ((1L, 1L, 0L, 0.0)))
    assert(got("g3") == ((2L, 2L, 4L, 0.5)))  // 2·(2·0+2) = 4 of 2·2·2·1
    assert(got("g4") == ((3L, 1L, 4L, 0.666667)))
    assert(!got.contains("g5"))
  }

  test("groupedPrCurve: hand-computed points and step-interpolated AP") {
    val sp = spark
    import sp.implicits._
    val df = Seq(
      // g1: + - + - by descending score -> thresholds 4,3,2,1
      ("g1", 4L, true), ("g1", 3L, false), ("g1", 2L, true), ("g1", 1L, false),
      // g2: all positive on one tied score -> single point, AP = 1
      ("g2", 7L, true), ("g2", 7L, true),
      // g3: no positives -> dropped
      ("g3", 1L, false), ("g3", 2L, false)
    ).toDF("g", "s", "y")
    val got = graft.llm.Eval.groupedPrCurve(df, col("g"), col("s"), col("y"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6)))
      .toMap
    // g1 at s>=4: tp1 fp0 P=1 R=1/2; s>=3: tp1 fp1; s>=2: tp2 fp1
    // P=2/3 R=1; s>=1: tp2 fp2. AP = 1·(1/2) + (2/3)·(1/2) = 5/6
    assert(got(("g1", 4L)) == ((1L, 0L, 1000L, 500L, 0.833333)))
    assert(got(("g1", 3L)) == ((1L, 1L, 500L, 500L, 0.833333)))
    assert(got(("g1", 2L)) == ((2L, 1L, 666L, 1000L, 0.833333)))
    assert(got(("g1", 1L)) == ((2L, 2L, 500L, 1000L, 0.833333)))
    assert(got(("g2", 7L)) == ((2L, 0L, 1000L, 1000L, 1.0)))
    assert(!got.keys.exists(_._1 == "g3"), "zero-positive group must drop")
  }

  test("clusteringAgreement: the textbook contingency, hand-computed " +
      "rand and ARI in truncated milli") {
    val s = spark
    import s.implicits._
    // A: {1,2,3 | 4,5,6}, B: {1,2 | 3,4,5,6} — T=15, pa=6, pb=7, Sb=4
    // rand = 10/15 → 666; ari = 18/55.5 → 324 (trunc)
    val a = Seq((1L, 10L), (2L, 10L), (3L, 10L),
      (4L, 20L), (5L, 20L), (6L, 20L)).toDF("node", "comp_id")
    val b = Seq((1L, 7L), (2L, 7L),
      (3L, 8L), (4L, 8L), (5L, 8L), (6L, 8L)).toDF("node", "comp_id")
    val got = graft.llm.Eval.clusteringAgreement(spark, a, b)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).head
    assert(got == ((6L, 6L, 7L, 4L, 666L, 324L)))
  }

  test("clusteringAgreement: label-id permutations of the SAME partition " +
      "are perfect agreement; trivial vs trivial hits the degenerate rule") {
    val s = spark
    import s.implicits._
    val a = Seq((1L, 10L), (2L, 10L), (3L, 30L), (4L, 30L))
      .toDF("node", "comp_id")
    val sameRenamed = Seq((1L, 99L), (2L, 99L), (3L, 1L), (4L, 1L))
      .toDF("node", "comp_id")
    val got = graft.llm.Eval.clusteringAgreement(spark, a, sameRenamed)
      .collect().map(r => (r.getLong(4), r.getLong(5))).head
    assert(got == ((1000L, 1000L)))
    // all-singletons vs all-singletons: den = 0 → convention ari 1000
    val singles = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("node", "comp_id")
    val deg = graft.llm.Eval.clusteringAgreement(spark, singles, singles)
      .collect().map(r => (r.getLong(3), r.getLong(4), r.getLong(5))).head
    assert(deg == ((0L, 1000L, 1000L)))
  }

  test("lift table: hand gains and lift on a perfect-ish top-heavy score") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    // scores 10..1, positives on the top three scores; k=5 -> 2/tile
    val df = (1L to 10L).map(i => (i, 11L - i, if (i <= 3) 1L else 0L))
      .toDF("id", "sc", "y")
    val got = graft.llm.Eval.liftTable(df, col("sc"), col("y"), col("id"),
      k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    // tile1: pos 2/2, cum 666, lift (2*10*1000)/(3*2) = 3333
    // tile2: pos 1/2, cum 1000, lift (1*10*1000)/(3*2) = 1666
    assert(got.head == ((1L, 2L, 2L, 666L, 3333L)))
    assert(got(1) == ((2L, 2L, 1L, 1000L, 1666L)))
    assert(got.drop(2).forall(t => t._3 == 0L && t._4 == 1000L && t._5 == 0L))
  }

  test("lift table: bad labels and zero positives raise loudly") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    val bad = Seq((1L, 5L, 2L), (2L, 4L, 0L)).toDF("id", "sc", "y")
    val e1 = intercept[Exception](graft.llm.Eval.liftTable(bad, col("sc"),
      col("y"), col("id"), k = 2).collect())
    assert(e1.getMessage.contains("label must be 0/1"), e1.getMessage)
    val none = Seq((1L, 5L, 0L), (2L, 4L, 0L)).toDF("id", "sc", "y")
    val e2 = intercept[Exception](graft.llm.Eval.liftTable(none, col("sc"),
      col("y"), col("id"), k = 2).collect())
    assert(e2.getMessage.contains("no positive labels"), e2.getMessage)
    // fractional scores must raise, not silently truncate to 0
    val frac = Seq((1L, 0.9, 1L), (2L, 0.4, 0L)).toDF("id", "sc", "y")
    val e3 = intercept[Exception](graft.llm.Eval.liftTable(frac, col("sc"),
      col("y"), col("id"), k = 2).collect())
    assert(e3.getMessage.contains("must be integral"), e3.getMessage)
  }
}
