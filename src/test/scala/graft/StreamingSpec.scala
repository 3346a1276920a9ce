package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp
import graft.streaming.EventStream

/** Structured Streaming behavior: windowed agg parity with the batch twin,
  * watermark-driven late-data handling, stateful sessionization.
  */
class StreamingSpec extends SparkSpec {
  import org.apache.spark.sql.streaming.Trigger

  test("hourlyByType matches its batch twin on the same data") {
    val s = spark
    import s.implicits._
    implicit val sq = spark.sqlContext
    val base = Timestamp.valueOf("2024-01-01 00:10:00").getTime
    val rows = (0 until 100).map { i =>
      (i.toLong, new Timestamp(base + i * 60_000L), i.toLong % 7,
        if (i % 2 == 0) "click" else "view", i * 1.5)
    }
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val df = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = EventStream.hourlyByType(df)
      .writeStream.format("memory").queryName("hourly")
      .outputMode("append").start()
    mem.addData(rows: _*)
    q.processAllAvailable()
    // append mode emits only watermark-closed windows: push the watermark
    // far ahead, then run one more batch so closed windows flush
    mem.addData((999L, new Timestamp(base + 10L * 3600_000L), 0L, "click", 0.0))
    q.processAllAvailable()
    mem.addData((1000L, new Timestamp(base + 11L * 3600_000L), 0L, "click", 0.0))
    q.processAllAvailable(); q.stop()

    val streamed = spark.table("hourly")
      .filter(col("wstart") < lit(new Timestamp(base + 2 * 3600_000L)))
      .orderBy("wstart", "event_type")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getLong(3)))

    val batch = spark.createDataset(rows).toDF("event_id", "ts", "user_id", "event_type", "value")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(round(col("value") * 100, 0).cast("long")).as("value_cents"))
      .select(col("w.start").as("wstart"), col("event_type"), col("cnt"), col("value_cents"))
      .orderBy("wstart", "event_type")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getLong(3)))

    assert(streamed.nonEmpty)
    assert(streamed.toSeq == batch.toSeq)
  }

  test("watermark drops data later than the bound") {
    val s = spark
    import s.implicits._
    implicit val sq = spark.sqlContext
    val base = Timestamp.valueOf("2024-02-01 00:00:00").getTime
    val mem = MemoryStream[(Long, Timestamp, String, Double)]
    val df = mem.toDF().toDF("event_id", "ts", "event_type", "value")
    val q = EventStream.hourlyByType(df)
      .writeStream.format("memory").queryName("late")
      .outputMode("append").start()
    mem.addData((1L, new Timestamp(base), "click", 1.0))
    q.processAllAvailable()
    // advance watermark past hour 0 (+2h watermark on a +4h event)
    mem.addData((2L, new Timestamp(base + 4 * 3600_000L), "click", 1.0))
    q.processAllAvailable()
    // this event is 4h late: behind the watermark -> dropped
    mem.addData((3L, new Timestamp(base + 60_000L), "click", 100.0))
    q.processAllAvailable()
    mem.addData((4L, new Timestamp(base + 5 * 3600_000L), "click", 1.0))
    q.processAllAvailable(); q.stop()
    val rows = spark.table("late").filter(col("wstart") === new Timestamp(base)).collect()
    assert(rows.length == 1)
    assert(rows(0).getAs[Long]("cnt") == 1L) // late event not counted
  }

  test("dedupByHash emits one row per content hash within the watermark") {
    val s = spark
    import s.implicits._
    implicit val sq = spark.sqlContext
    val base = Timestamp.valueOf("2024-04-01 00:00:00").getTime
    def at(sec: Long) = new Timestamp(base + sec * 1000)
    val mem = MemoryStream[(Long, Timestamp, String)]
    val df = mem.toDF().toDF("doc_id", "ts", "text")
    val q = EventStream.dedupByHash(df)
      .writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    mem.addData((1L, at(0), "alpha"), (2L, at(10), "beta"), (3L, at(20), "alpha"))
    q.processAllAvailable()
    // same batch and a later batch: both duplicate forms are dropped
    mem.addData((4L, at(30), "beta"), (5L, at(40), "gamma"))
    q.processAllAvailable(); q.stop()
    val rows = spark.table("dedup").orderBy("doc_id").collect()
    assert(rows.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L, 2L, 5L))
    assert(rows.map(_.getAs[String]("text")).toSeq == Seq("alpha", "beta", "gamma"))
  }

  test("purchaseAttribution stream-stream interval join matches its batch twin") {
    val s = spark
    import s.implicits._
    implicit val sq = spark.sqlContext
    val base = Timestamp.valueOf("2024-05-01 00:00:00").getTime
    def at(min: Long) = new Timestamp(base + min * 60_000L)
    // clicks: user 1 at t0,t10,t50; user 2 at t5
    val clickRows = Seq((10L, at(0), 1L), (11L, at(10), 1L), (12L, at(50), 1L), (13L, at(5), 2L))
    // purchases: user 1 at t20 (matches t0,t10), user 2 at t45 (t5 is 40min old: no match)
    val purchRows = Seq((20L, at(20), 1L, 9.99), (21L, at(45), 2L, 5.0))
    val cMem = MemoryStream[(Long, Timestamp, Long)]
    val pMem = MemoryStream[(Long, Timestamp, Long, Double)]
    val cDf = cMem.toDF().toDF("event_id", "ts", "user_id")
    val pDf = pMem.toDF().toDF("event_id", "ts", "user_id", "value")
    val q = EventStream.purchaseAttribution(cDf, pDf)
      .writeStream.format("memory").queryName("attrib")
      .outputMode("append").start()
    cMem.addData(clickRows: _*)
    pMem.addData(purchRows: _*)
    q.processAllAvailable()
    // advance both watermarks so the join state flushes (distinct users:
    // the sentinels must not match each other)
    cMem.addData((99L, at(600), 8L))
    pMem.addData((98L, at(600), 9L, 0.0))
    q.processAllAvailable(); q.stop()
    val got = spark.table("attrib")
      .select("user_id", "purchase_id", "click_id")
      .orderBy("purchase_id", "click_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, 20L, 10L), (1L, 20L, 11L)))
  }

  test("lshCandidates streaming pairs match batch minhashCandidates on sf0.001 docs") {
    val s = spark
    import s.implicits._
    implicit val sq = spark.sqlContext
    implicit val sp = spark
    val d = "/root/testdata/sf0.001"
    val docRows = graft.rel.Tables.documents(spark, d)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().toSeq
    val mem = MemoryStream[(Long, String)]
    val df = mem.toDF().toDF("doc_id", "text")
    val q = EventStream.lshCandidates(df, maxPerBucket = 1024)
      .toDF("ida", "idb")
      .writeStream.format("memory").queryName("lshcand")
      .outputMode("append").start()
    // two micro-batches: pairs must form within AND across batches
    val (first, second) = docRows.splitAt(docRows.length / 2)
    mem.addData(first: _*)
    q.processAllAvailable()
    mem.addData(second: _*)
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("lshcand").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = graft.llm.Dedup.minhashCandidates(spark,
        graft.rel.Tables.documents(spark, d)
          .select(col("doc_id").as("id"), col("text")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batch.nonEmpty, "batch candidate set empty — test data has no near-dups?")
    assert(streamed == batch,
      s"stream-only: ${(streamed -- batch).take(5)}; batch-only: ${(batch -- streamed).take(5)}")
  }

  test("file-source streaming hourlyByType equals the batch aggregation") {
    val d = "/root/testdata/sf0.001"
    val streamed = graft.streaming.StreamingOps
      .hourlyByTypeFromFiles(spark, d, queryName = "spec_stream_hourly")
      .orderBy("wstart", "event_type").collect().map(_.toSeq).toSeq
    val batch = graft.rel.Tables.events(spark, d)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(round(col("value") * 100, 0).cast("long")).as("value_cents"))
      .select(col("w.start").as("wstart"), col("event_type"), col("cnt"), col("value_cents"))
      .orderBy("wstart", "event_type").collect().map(_.toSeq).toSeq
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("sessionize emits gap-separated sessions") {
    val s = spark
    import s.implicits._
    implicit val sq = spark.sqlContext
    implicit val sp = spark
    val base = Timestamp.valueOf("2024-03-01 00:00:00").getTime
    def at(sec: Long) = new Timestamp(base + sec * 1000)
    val mem = MemoryStream[(Long, Timestamp)]
    val df = mem.toDF().toDF("user_id", "ts")
    val q = EventStream.sessionize(df)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    // user 1: two bursts separated by 2h; second burst closes the first
    mem.addData((1L, at(0)), (1L, at(60)), (1L, at(120)))
    q.processAllAvailable()
    mem.addData((1L, at(7200)), (1L, at(7260)))
    q.processAllAvailable(); q.stop()
    val rows = spark.table("sessions").as[EventStream.SessionOut].collect()
    assert(rows.length == 1) // first session closed by the gap
    val us = 1000000L
    val baseUs = base * 1000
    assert(rows(0).n_events == 3 && rows(0).session_start == baseUs &&
      rows(0).session_end == baseUs + 120L * us)
  }

  test("streaming bottom-k sample state is batch-boundary independent (q113 core)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val r = new scala.util.Random(113)
    val rows = (0L until 200L).map { i =>
      (s"t${i % 3}", graft.llm.SketchOps.splitmix64(i), i, r.nextDouble() * 100)
    }
    def drain(batches: Seq[Seq[(String, Long, Long, Double)]], name: String) = {
      val mem = MemoryStream[(String, Long, Long, Double)]
      val agg = new graft.functions.BottomKSampleAgg(16)
      val sk = mem.toDS()
        .groupByKey(_._1).mapValues(t => (t._2, t._3, t._4)).agg(agg.toColumn)
        .map { case (k, sb) => (k, sb.hv.toSeq, sb.id.toSeq, sb.v.toSeq) }
        .toDF("k", "hv", "id", "v")
      val q = sk.writeStream.format("memory").queryName(name)
        .outputMode("complete").start()
      try {
        batches.foreach { b => mem.addData(b); q.processAllAvailable() }
      } finally q.stop()
      spark.table(name).orderBy("k")
        .as[(String, Seq[Long], Seq[Long], Seq[Double])].collect().toSeq
    }
    // one batch vs four batches vs four batches of a shuffled order —
    // plus a REPLAYED batch (set semantics absorb duplicates)
    val one = drain(Seq(rows), "bk_one")
    val four = drain(rows.grouped(50).toSeq, "bk_four")
    val shuffled = r.shuffle(rows.toList).grouped(50).toSeq
    val replay = drain(shuffled ++ Seq(shuffled.head), "bk_replay")
    assert(one == four, "batch boundaries changed the sample")
    assert(one == replay, "arrival order or replay changed the sample")
  }
}
