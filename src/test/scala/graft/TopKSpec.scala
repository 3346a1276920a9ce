package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TopK

/** The bounded-heap per-key top-k aggregator (graft.functions.TopK) —
  * the scale-safe replacement for the per-key row_number window in every
  * ANN re-rank path. Pins: (1) unit-level parity of the Aggregator's
  * reduce/merge with a brute-force sort under arbitrary split points,
  * (2) DataFrame-level equality with the window form on random data
  * including score ties, (3) plan shape — a partial ObjectHashAggregate
  * and NO Window/global-sort node, which is the whole point.
  */
class TopKSpec extends SparkSpec {
  import TopK.{Buf, TopKAgg}

  private def rng(seed: Long): () => Long = {
    var s = seed
    () => { s = s * 6364136223846793005L + 1442695040888963407L; s }
  }

  private def bruteTopK(rows: Seq[(Long, Double)], k: Int): Seq[(Double, Long)] =
    rows.map { case (id, sc) => (sc, id) }
      .sortBy { case (sc, id) => (-sc, id) }.take(k)

  test("Aggregator reduce+merge equals brute-force sort at any split") {
    val r = rng(7)
    val agg = new TopKAgg(5)
    val rows = (0 until 200).map { i =>
      // deliberately coarse scores → many exact ties, id tie-break live
      (i.toLong, (math.abs(r()) % 7).toDouble)
    }
    for (split <- Seq(0, 1, 50, 100, 199, 200)) {
      val (a, b) = rows.splitAt(split)
      val bufA = a.foldLeft(agg.zero)(agg.reduce)
      val bufB = b.foldLeft(agg.zero)(agg.reduce)
      for (merged <- Seq(agg.merge(bufA, bufB), agg.merge(bufB, bufA))) {
        val got = merged.scores.zip(merged.ids).toSeq
        assert(got == bruteTopK(rows, 5), s"split=$split")
      }
    }
  }

  test("k larger than the group returns the whole group, sorted") {
    val agg = new TopKAgg(10)
    val buf = Seq((3L, 1.0), (1L, 2.0), (2L, 2.0)).foldLeft(agg.zero)(agg.reduce)
    assert(buf.ids.toSeq == Seq(1L, 2L, 3L))
    assert(buf.scores.toSeq == Seq(2.0, 2.0, 1.0))
  }

  test("perKeyTopK equals the row_number window form (ties included)") {
    val s = spark
    import s.implicits._
    val r = rng(42)
    val df = (0 until 4000).map { i =>
      (math.abs(r()) % 8, i.toLong, (math.abs(r()) % 50).toDouble / 10.0)
    }.toDF("qid", "id", "score").repartition(16)
    val w = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("id"))
    val expect = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 7)
      .select(col("qid").cast("long"), col("rn"), col("id"), col("score"))
      .orderBy("qid", "rn").collect().toSeq
    val got = TopK.perKeyTopK(df, 7, "qid", "id", "score")
      .select(col("qid").cast("long"), col("rn"), col("id"), col("score"))
      .orderBy("qid", "rn").collect().toSeq
    assert(got == expect)
  }

  test("plan: partial hash aggregation, no Window, no per-key global sort") {
    val s = spark
    import s.implicits._
    val df = (0 until 100).map(i => (i % 4, i.toLong, i.toDouble)).toDF("qid", "id", "score")
    val plan = TopK.perKeyTopK(df, 3, "qid", "id", "score")
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    // partial (map-side) + final pair — the shuffle carries k-bounded
    // buffers, not scored rows
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2, plan)
    assert(!plan.contains("Window"), plan)
  }

  test("perKeyTopKLong: exact long scores — bit-exact ranking past 2^53 " +
      "where the double cast would collapse near-ties") {
    val s = spark
    import s.implicits._
    // consecutive longs above 2^60: indistinguishable after a double
    // cast (ulp = 256 there), fully ordered in the long aggregator
    val base = 1L << 60
    val df = (0 until 8).map(i => (1, i.toLong, base + i))
      .toDF("key", "id", "score")
    val got = TopK.perKeyTopKLong(df, 3, "key", "id", "score")
      .orderBy("rn").collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq((1, 7L, base + 7), (2, 6L, base + 6), (3, 5L, base + 5)))
    // ties break to the smaller id, same as the double variant
    val tied = Seq((1, 5L, 9L), (1, 2L, 9L), (1, 7L, 9L)).toDF("key", "id", "score")
    val t = TopK.perKeyTopKLong(tied, 2, "key", "id", "score")
      .orderBy("rn").collect().map(_.getLong(2)).toSeq
    assert(t == Seq(2L, 5L))
    // same plan discipline as the double variant
    val plan = TopK.perKeyTopKLong(df, 3, "key", "id", "score")
      .queryExecution.executedPlan.toString
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2 &&
      !plan.contains("Window"), plan)
  }

  test("ANN entries carry no Window node (the re-rank paths are heap-based)") {
    // sf0.01: the dump entries are fixture-guarded there (plan-only —
    // nothing executes except the guard's tiny fingerprint agg)
    val sf = "/root/testdata/sf0.01"
    for (q <- Seq("q37_knn_cosine", "q47_ivf_ann", "q55_pq_ann", "q56_ivfpq_ann")) {
      val plan = graft.SparkEntry.allQ(q).fn(spark, sf)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Window"), s"$q still has a Window node")
    }
  }
}
