package graft

import org.apache.spark.sql.functions._
import graft.llm.Lexical

class LexicalSpec extends SparkSpec {

  test("bm25TopK equals a driver-side recomputation; ranks by rounded score then id") {
    val s = spark
    import s.implicits._
    val docsSeq = Seq(
      (0L, "join join join filter"),
      (1L, "join filter scan scan scan scan"),
      (2L, "filter filter"),
      (3L, "nothing relevant here at all"),
      (4L, "join"))
    val docs = docsSeq.toDF("doc_id", "text")
    val queries = Seq(0 -> Seq("join", "scan"), 1 -> Seq("filter"))
    val got = Lexical.bm25TopK(s, docs, queries, k = 3)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2)).toSeq

    // independent recomputation with plain scala doubles
    val toks = docsSeq.map { case (i, t) => i -> t.split(" ").toSeq }
    val n = toks.length.toDouble
    val avg = toks.map(_._2.length).sum / n
    def df(term: String) = toks.count(_._2.contains(term)).toDouble
    def score(docToks: Seq[String], terms: Seq[String]): Double = {
      val raw = terms.map { term =>
        val tf = docToks.count(_ == term).toDouble
        if (tf == 0) 0.0
        else math.log(1.0 + (n - df(term) + 0.5) / (df(term) + 0.5)) *
          (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * docToks.length / avg))
      }.sum
      math.rint(raw * 1e6) / 1e6
    }
    val expected = queries.flatMap { case (qid, terms) =>
      toks.map { case (i, ts) => (qid, i, score(ts, terms)) }
        .filter(_._3 > 0)
        .sortBy(t => (-t._3, t._2)).take(3)
        .zipWithIndex.map { case ((q, i, sc), r) => (q, r + 1, i, sc) }
    }
    assert(got == expected, s"got $got\nexpected $expected")
    // doc 3 matches no query term and must be absent entirely
    assert(!got.exists(_._3 == 3L))
    // the ranking is the bounded-heap aggregator, not a per-key window
    val plan = Lexical.bm25TopK(s, docs, queries, k = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "ranking must not plan a window sort")
  }

  test("saved lexical index: probe bit-identical to bm25TopK, bucket-pruned scan") {
    val s = spark
    import s.implicits._
    val r = new scala.util.Random(17)
    val vocab = Array.tabulate(50)(i => s"w$i")
    val docs = Seq.tabulate(200)(i =>
      (i.toLong, Array.fill(5 + r.nextInt(30))(vocab(r.nextInt(vocab.length)))
        .mkString(" "))).toDF("doc_id", "text")
    val queries = Seq(0 -> Seq("w3", "w17"), 1 -> Seq("w42"))
    val dir = java.nio.file.Files.createTempDirectory("lexidx").toString
    Lexical.saveLexical(s, docs, dir, buckets = 16)
    val scan = Lexical.bm25TopK(s, docs, queries, k = 7).collect()
      .map(r0 => (r0.getInt(0), r0.getInt(1), r0.getLong(2), r0.getDouble(3))).toSeq
    val probe = Lexical.probeBm25(s, dir, queries, k = 7, buckets = 16).collect()
      .map(r0 => (r0.getInt(0), r0.getInt(1), r0.getLong(2), r0.getDouble(3))).toSeq
    assert(scan.sorted == probe.sorted, "probe must be bit-identical to the scan path")
    // the probe plan prunes to the query terms' bucket partitions
    val plan = Lexical.probeBm25(s, dir, queries, k = 7, buckets = 16)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"),
      "probe scan must carry a bucket partition filter")
  }

  test("streaming append: duplicate batches collapse; compaction restores full parity") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val r = new scala.util.Random(23)
    val vocab = Array.tabulate(40)(i => s"w$i")
    def doc(i: Int) = (i.toLong,
      Array.fill(5 + r.nextInt(20))(vocab(r.nextInt(vocab.length))).mkString(" "))
    val base = Seq.tabulate(80)(doc)
    val tail = Seq.tabulate(20)(j => doc(80 + j))
    val queries = Seq(0 -> Seq("w1", "w20"), 1 -> Seq("w39"))
    val dir = java.nio.file.Files.createTempDirectory("lexapp").toString
    val ck = java.nio.file.Files.createTempDirectory("lexapp-ck").toString
    Lexical.saveLexical(s, base.toDF("doc_id", "text"), dir, buckets = 16)
    val mem = MemoryStream[(Long, String)]
    val q = Lexical.appendLexicalStream(s, mem.toDF.toDF("doc_id", "text"),
      dir, ck, buckets = 16)
    def probeRows() = Lexical.probeBm25(s, dir, queries, k = 50, buckets = 16)
      .collect().map(x => (x.getInt(0), x.getInt(1), x.getLong(2), x.getDouble(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    try {
      mem.addData(tail); q.processAllAvailable()
      val once = probeRows()
      // appended docs are already findable
      assert(once.exists(_._3 >= 80L), "appended docs must be probeable")
      // at-least-once replay: bit-identical duplicate rows change NOTHING
      mem.addData(tail); q.processAllAvailable()
      assert(probeRows() == once, "duplicate append must not change probe output")
    } finally q.stop()
    // compaction refreshes stats: probe == the scan path on the full corpus
    Lexical.compactLexical(s, dir)
    val full = Lexical.bm25TopK(s, (base ++ tail).toDF("doc_id", "text"),
        queries, k = 50)
      .collect().map(x => (x.getInt(0), x.getInt(1), x.getLong(2), x.getDouble(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(probeRows() == full, "post-compaction probe must equal the scan path")
  }
}
