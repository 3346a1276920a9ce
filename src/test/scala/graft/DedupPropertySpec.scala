package graft

import org.apache.spark.sql.functions._
import graft.llm.{Dedup, SketchOps}

/** Brute-force equivalence properties for the dedup kernels on seeded
  * random corpora — the subtle parts (the inline df-cap's effect on
  * both pair intersections AND per-doc sizes; component labels under
  * arbitrary graph shapes) checked against independent driver-side
  * recomputation, not against a fixture that happens to pass.
  */
class DedupPropertySpec extends SparkSpec {

  /** random docs with planted overlap: token sequences drawn from a
    * small vocabulary so shingles genuinely collide across docs
    */
  private def corpus(seed: Int, n: Int): Seq[(Long, String)] = {
    val r = new scala.util.Random(seed)
    val vocab = Array.tabulate(30)(i => s"w$i")
    Seq.tabulate(n) { i =>
      val len = 5 + r.nextInt(20)
      val base = Array.fill(len)(vocab(r.nextInt(vocab.length)))
      (i.toLong, base.mkString(" "))
    }
  }

  /** driver-side recomputation of jaccardPairs' exact contract: shingle
    * sets hashed exactly like the engine, df-cap applied to pairs AND
    * sizes, Jaccard over the capped universe
    */
  private def bruteJaccard(docs: Seq[(Long, String)], cap: Int, minJ: Double)
      : Map[(Long, Long), (Long, Double)] = {
    val sh = docs.map { case (i, t) =>
      i -> SketchOps.shingles64Of(SketchOps.tokensOf(t)).toSet
    }.toMap
    val df = sh.values.flatten.groupBy(identity).view.mapValues(_.size).toMap
    val kept = sh.view.mapValues(_.filter(g => df(g) <= cap)).toMap
    val out = for {
      (a, sa) <- kept.toSeq; (b, sb) <- kept.toSeq if a < b
      inter = (sa & sb).size if inter > 0
      jac = inter.toDouble / (sa.size + sb.size - inter) if jac >= minJ
    } yield (a, b) -> (inter.toLong, jac)
    out.toMap
  }

  test("jaccardPairs equals brute force on random corpora, including the df-cap") {
    val s = spark
    import s.implicits._
    Seq(17, 23, 99).foreach { seed =>
      val docs = corpus(seed, 40)
      // cap = 6 is LOW on purpose: many shingles overflow, so the test
      // exercises the cap path, not just the plain path
      Seq(6, 1000).foreach { cap =>
        val got = Dedup.jaccardPairs(s, docs.toDF("id", "text"),
            minJaccard = 0.05, dfCap = cap).collect()
          .map(r => (r.getLong(1), r.getLong(0)) -> (r.getLong(2), r.getDouble(3)))
          .map { case ((a, b), v) => (math.min(a, b), math.max(a, b)) -> v }
          .toMap
        val want = bruteJaccard(docs, cap, 0.05)
        assert(got.keySet == want.keySet,
          s"seed=$seed cap=$cap: extra=${got.keySet -- want.keySet} missing=${want.keySet -- got.keySet}")
        want.foreach { case (k, (inter, jac)) =>
          assert(got(k)._1 == inter && math.abs(got(k)._2 - jac) < 1e-12,
            s"seed=$seed cap=$cap pair=$k: got ${got(k)}, want ($inter, $jac)")
        }
      }
    }
  }

  test("connectedComponents equals union-find on random graphs") {
    val s = spark
    import s.implicits._
    Seq(3, 41).foreach { seed =>
      val r = new scala.util.Random(seed)
      val n = 80
      val edges = (for {
        a <- 0 until n; b <- a + 1 until n if r.nextDouble() < 0.03
      } yield (a.toLong, b.toLong)).toSeq
      // driver-side union-find ground truth
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val inGraph = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val want = inGraph.map(v => v -> {
        // canonical label = min vertex in the component
        val root = find(v.toInt)
        inGraph.filter(u => find(u.toInt) == root).min
      }).toMap
      val got = Dedup.connectedComponents(edges.toDF("ida", "idb")).collect()
        .map(row => row.getLong(0) -> row.getLong(1)).toMap
      assert(got == want, s"seed=$seed: ${got.toSet -- want.toSet} vs ${want.toSet -- got.toSet}")
    }
  }

  test("repeatedSpans: cross-doc and within-doc repeats, interval merge, gaps") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (0L, "a b c d e f g"),         // shares "a b c d" with doc 1
      (1L, "x y a b c d z"),
      (2L, "p q r p q r p q r"),     // within-doc: every 3-gram repeats
      (3L, "m n o"),                 // unique — absent from output
      (4L, "a b c q9 a b c")         // two NON-adjacent occurrences
    ).toDF("doc_id", "text")
    val got = Dedup.repeatedSpans(s, docs, k = 3, id = "doc_id")
      .select("doc_id", "n_spans", "n_repeated_tokens", "max_span_tokens")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    // doc 0: grams at pos 0,1 merge -> [0,3] (4 tokens); doc 1: [2,5];
    // doc 2: pos 0..6 -> [0,8] (9 tokens); doc 4: [0,2] and [4,6]
    assert(got == Seq((0L, 1L, 4L, 4L), (1L, 1L, 4L, 4L),
      (2L, 1L, 9L, 9L), (4L, 2L, 6L, 3L)), s"got $got")
    // the spans themselves, for a removal caller
    val spans = Dedup.repeatedSpans(s, docs, k = 3, id = "doc_id")
      .filter(col("doc_id") === 4L)
      .select(explode(col("spans"))).select("col._1", "col._2")
      .collect().map(r => (r.getInt(0), r.getInt(1))).sorted.toSeq
    assert(spans == Seq((0, 2), (4, 6)))
    // raising minCount past the occurrence count empties the result
    assert(Dedup.repeatedSpans(s, docs, k = 3, minCount = 5, id = "doc_id")
      .count() == 0)
  }

  test("dedupLines: first occurrence wins corpus-wide, exact-dup docs empty out") {
    val s = spark
    import s.implicits._
    val nl = "\n"
    val docs = Seq(
      (0L, s"alpha beta${nl}boiler plate line"),      // first owner of both
      (1L, s"boiler plate line${nl}gamma delta"),     // loses the boilerplate
      (2L, s"alpha beta${nl}boiler plate line"),      // exact dup -> empty
      (3L, s"solo line${nl}solo line${nl}epsilon"),   // within-doc repeat
      (4L, "unique only")
    ).toDF("doc_id", "text")
    val got = Dedup.dedupLines(s, docs, id = "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1).toSeq
    assert(got == Seq(
      (0L, 2L, 2L, s"alpha beta${nl}boiler plate line"),
      (1L, 2L, 1L, "gamma delta"),
      (2L, 2L, 0L, ""),
      (3L, 3L, 2L, s"solo line${nl}epsilon"),
      (4L, 1L, 1L, "unique only")), s"got $got")
    // the decision path carries hashes and ints only — no text in the
    // winner agg: re-running over a permuted row order is identical
    val shuffled = Dedup.dedupLines(s, docs.repartition(7), id = "doc_id")
      .collect().map(r => (r.getLong(0), r.getString(3))).sortBy(_._1).toSeq
    assert(shuffled == got.map(t => (t._1, t._4)))
  }
}
