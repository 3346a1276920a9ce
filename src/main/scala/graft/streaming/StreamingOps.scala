package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.LongType
import scala.collection.immutable.ListMap
import graft.rel.RelQueries.Q

/** Driver-tier streaming entry: the same Structured Streaming pipeline the
  * spec suite exercises, driven END TO END from a file source through a
  * real StreamingQuery and hash-checked against a DuckDB oracle — so the
  * streaming path has an oracle-gated entry, not only `sbt test`
  * coverage.
  */
object StreamingOps {

  /** Same ts normalization as [[graft.rel.Tables.events]], for streaming
    * readers that source the parquet directly: nanos-as-long divides to
    * micros; TIMESTAMP_NTZ casts to LTZ (epoch identity — sessions pin
    * UTC). Watermarks/windows require TimestampType, so NTZ cannot pass
    * through.
    */
  private def normTs(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case LongType =>
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    case org.apache.spark.sql.types.TimestampNTZType =>
      df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
    case _ => df
  }

  /** one 8-file fragmentation of events per dataset, so the q198 file
    * source delivers eight real micro-batches at maxFilesPerTrigger=1
    */
  private val multiBatch = scala.collection.concurrent.TrieMap[String, String]()

  private def multiBatchDirFor(s: SparkSession, d: String): String =
    multiBatch.getOrElseUpdate(d, {
      val work = java.nio.file.Files.createTempDirectory("graft-q198")
      sys.addShutdownHook {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(work.toFile)
      }
      val dir = work.resolve("ev").toString
      s.read.parquet(s"$d/events.parquet").repartition(8)
        .write.mode("overwrite").parquet(dir)
      dir
    })

  /** Run [[EventStream.hourlyByType]] as a file-source streaming query in
    * COMPLETE mode, drained to completion (memory sink — the full result
    * stays on the driver, which is the point of a verification entry;
    * production sinks stream append-mode deltas instead). Complete mode
    * ignores the watermark, so the final table equals the batch
    * aggregation over all data — that equivalence is exactly what the
    * oracle pins.
    */
  def hourlyByTypeFromFiles(s: SparkSession, dir: String,
      queryName: String = "stream_hourly"): DataFrame = {
    val path = s"$dir/events.parquet"
    // batch-side footer read provides the fixed schema (file streaming
    // sources require one — inference would scan the data twice)
    val sch = s.read.parquet(path).schema
    // the fixture is a single file, not a directory: the file stream
    // source insists on a directory/glob path, so address the file via a
    // {…} alternation glob — matches ONLY the fixture, not sibling paths
    // sharing the prefix (a bare `events.parquet*` would silently widen
    // the source to e.g. events.parquet_bak)
    val raw = s.readStream.schema(sch).parquet(s"$dir/{events.parquet}")
    val ev = normTs(raw)
    val q = EventStream.hourlyByType(ev)
      .writeStream.format("memory").queryName(queryName)
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    s.table(queryName)
  }

  /** Exactly-once restart proof: [[EventStream.hourlyByType]] through the
    * checkpointed [[EventStream.parquetSink]], KILLED mid-stream and
    * restarted from the checkpoint — the final sink must equal the batch
    * aggregation (q18's oracle): no lost windows, no duplicated ones.
    *
    * Drive: the corpus is cut into `slices` CONTIGUOUS TIME RANGES
    * written to the source directory in event-time order (append-mode
    * watermarking requires arrival order ≈ event order — randomly
    * sliced files would arrive "late" past the watermark and be dropped,
    * which is a real deployment constraint, not a test convenience).
    * Phase 1 streams one file per micro-batch and is stopped as soon as
    * a data batch has committed — wherever that lands, including
    * mid-batch, is immaterial: the WAL re-runs an uncommitted batch with
    * the same file set, and the file sink's `_spark_metadata` commit log
    * refuses double-commits. While the query is DOWN the remaining
    * slices plus a far-future sentinel event arrive (the sentinel drives
    * the watermark past every real window so append mode finalizes them;
    * its own window never closes and never reaches the sink). Phase 2
    * restarts the same pipeline on the same checkpoint and drains. The
    * final read goes through the sink's commit log, so only committed
    * files are visible — the exactly-once read path.
    */
  def hourlyRestartProof(s: SparkSession, dir: String, slices: Int = 6): DataFrame = {
    val work = java.nio.file.Files.createTempDirectory("graft-q57").toString
    val src = s"$work/src"; val out = s"$work/out"; val ckpt = s"$work/ckpt"
    val ev = graft.rel.Tables.events(s, dir).cache()
    val b = ev.agg(min(col("ts")), max(col("ts"))).head()
    val t0 = b.getTimestamp(0).getTime; val t1 = b.getTimestamp(1).getTime
    val width = (t1 - t0) / slices + 1
    def writeSlice(k: Int): Unit =
      ev.filter(col("ts") >= lit(new java.sql.Timestamp(t0 + k * width)) &&
          col("ts") < lit(new java.sql.Timestamp(t0 + (k + 1) * width)))
        .coalesce(1).write.mode("append").parquet(src)
    val phase1 = slices / 2
    (0 until phase1).foreach(writeSlice)
    val sch = s.read.parquet(src).schema
    def pipeline(): DataFrame =
      EventStream.hourlyByType(
        s.readStream.schema(sch).option("maxFilesPerTrigger", 1).parquet(src))
    // phase 1: kill after the first committed data batch
    val q1 = EventStream.parquetSink(pipeline(), out, ckpt)
    val deadline1 = System.nanoTime() + 120L * 1000 * 1000 * 1000
    while (q1.isActive && !q1.recentProgress.exists(_.numInputRows > 0) &&
        System.nanoTime() < deadline1) Thread.sleep(25)
    q1.stop(); q1.awaitTermination()
    // down time: the rest of the corpus + the watermark-driving sentinel
    (phase1 until slices).foreach(writeSlice)
    val srcDir = new java.io.File(src)
    def partFiles = srcDir.listFiles().filter(_.getName.startsWith("part-")).toSet
    val beforeSentinel = partFiles
    ev.limit(1)
      .withColumn("ts", lit(new java.sql.Timestamp(t1 + 365L * 24 * 3600 * 1000)))
      .coalesce(1).write.mode("append").parquet(src)
    // the file source orders a backlog by (mtime, path); an mtime TIE
    // between the sentinel and a slice file could let the sentinel's
    // random part-name sort first, advance the watermark a year, and
    // drop the remaining slices as late. Force the intended order.
    val maxSlice = beforeSentinel.map(_.lastModified()).max
    (partFiles -- beforeSentinel).foreach(f => f.setLastModified(maxSlice + 60000))
    // phase 2: restart from the checkpoint and drain. processAllAvailable
    // covers the data batches; the final windows flush in the no-data
    // batch the watermark bump schedules, so wait until the sink holds
    // every batch-side group (bounded, fails loud on timeout)
    val expect = ev.select(window(col("ts"), "1 hour"), col("event_type")).distinct().count()
    ev.unpersist()
    val q2 = EventStream.parquetSink(pipeline(), out, ckpt)
    try {
      q2.processAllAvailable()
      val deadline2 = System.nanoTime() + 120L * 1000 * 1000 * 1000
      while (s.read.parquet(out).count() < expect && System.nanoTime() < deadline2)
        Thread.sleep(100)
    } finally { q2.stop(); q2.awaitTermination() }
    val got = s.read.parquet(out)
    require(got.count() == expect,
      s"q57 sink holds ${got.count()} windows, batch says $expect — loss or duplication")
    got.filter(col("wstart") <= lit(new java.sql.Timestamp(t1))) // sentinel guard
      .select(col("wstart").cast("timestamp_ntz").as("wstart"),
        col("event_type"), col("cnt"), col("value_cents"))
      .orderBy("wstart", "event_type")
  }

  val all: ListMap[String, Q] = ListMap(
    "q54_stream_hourly" -> Q(
      (s, d) =>
        hourlyByTypeFromFiles(s, d)
          .orderBy("wstart", "event_type"),
      Some("""SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS wstart,
             |  event_type, count(*) AS cnt,
             |  CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS value_cents
             |FROM events GROUP BY 1, 2 ORDER BY wstart, event_type""".stripMargin)),

    // ---- exactly-once: kill + checkpoint-restart must reproduce the
    //      batch aggregation bit-for-bit ----
    "q57_stream_restart" -> Q(
      (s, d) => hourlyRestartProof(s, d),
      Some("""SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS wstart,
             |  event_type, count(*) AS cnt,
             |  CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS value_cents
             |FROM events GROUP BY 1, 2 ORDER BY wstart, event_type""".stripMargin)),

    // ---- streaming SKETCH aggregation: the KMV distinct sketch
    //      (q51's aggregator, same 60-bit md5-prefix hash) maintained
    //      as streaming state per event_type over the file source. KMV
    //      is a SET of k minimum hashes — order-independent — so the
    //      streaming estimate must equal the batch estimate BIT-FOR-BIT,
    //      which is exactly what the oracle pins. This is the at-scale
    //      pattern for streaming cardinality: state is k longs per key,
    //      never the distinct set. ----
    "q61_stream_kmv" -> Q(
      (s, d) => {
        import s.implicits._
        val sch = s.read.parquet(s"$d/events.parquet").schema
        val raw = s.readStream.schema(sch).parquet(s"$d/{events.parquet}")
        val hashed = raw.select(col("event_type"),
          graft.llm.SketchAggOps.kmvHash(col("user_id").cast("string")).as("hv"))
        val agg = new graft.functions.KmvAgg(graft.llm.SketchAggOps.K)
        val sk = hashed.as[(String, Long)]
          .groupByKey(_._1).mapValues(_._2).agg(agg.toColumn)
          .toDF("event_type", "kmv")
          .select(col("event_type"), col("kmv.estimate").as("kmv_estimate"),
            size(col("kmv.sketch")).as("sketch_size"))
        val q = sk.writeStream.format("memory").queryName("stream_kmv")
          .outputMode("complete").start()
        try q.processAllAvailable() finally q.stop()
        s.table("stream_kmv").orderBy("event_type")
      },
      Some(s"""WITH h AS (SELECT DISTINCT event_type,
             |    ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS hv
             |  FROM events),
             |r AS (SELECT event_type, hv,
             |    row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn,
             |    count(*) OVER (PARTITION BY event_type) AS nh FROM h),
             |est AS (SELECT event_type, max(nh) AS nh,
             |    max(CASE WHEN rn = ${graft.llm.SketchAggOps.K} THEN hv END) AS hk
             |  FROM r GROUP BY event_type)
             |SELECT event_type,
             |  CASE WHEN nh < ${graft.llm.SketchAggOps.K} THEN CAST(nh AS DOUBLE)
             |       ELSE CAST(${graft.llm.SketchAggOps.K - 1} AS DOUBLE) * 1152921504606846976 / hk END
             |    AS kmv_estimate,
             |  CAST(least(nh, ${graft.llm.SketchAggOps.K}) AS INT) AS sketch_size
             |FROM est ORDER BY event_type""".stripMargin)),

    // ---- streaming QUANTILES: the bottom-k-by-hash sample (q64's
    //      aggregator) as streaming state per event_type — k (hash, id,
    //      value) triples per key, never the group. Like KMV (q61) the
    //      retained set is a pure function of the input SET, independent
    //      of arrival order and batch boundaries, so the streaming
    //      p50/p90 estimates equal the batch estimates BIT-FOR-BIT and
    //      the oracle replays them exactly: every order-independent
    //      sketch in the engine streams unchanged. ----
    "q113_stream_quantiles" -> Q(
      (s, d) => {
        import s.implicits._
        val sch = s.read.parquet(s"$d/events.parquet").schema
        val raw = s.readStream.schema(sch).parquet(s"$d/{events.parquet}")
        val rows = raw.select(col("event_type"),
          conv(substring(md5(col("event_id").cast("string").cast("binary")), 1, 15), 16, 10)
            .cast("long").as("hv"),
          col("event_id"), col("value"))
        val agg = new graft.functions.BottomKSampleAgg(32)
        val sk = rows.as[(String, Long, Long, Double)]
          .groupByKey(_._1)
          .mapValues(t => (t._2, t._3, t._4))
          .agg(agg.toColumn)
          .map { case (et, sb) =>
            def q(num: Int) =
              graft.functions.BottomKSample.quantile(sb.v, sb.id, num, 10)
            (et, sb.v.length, q(5), q(9))
          }
          .toDF("event_type", "sample_size", "p50_est", "p90_est")
        val q = sk.writeStream.format("memory").queryName("stream_quantiles")
          .outputMode("complete").start()
        try q.processAllAvailable() finally q.stop()
        s.table("stream_quantiles").orderBy("event_type")
      },
      Some("""WITH v AS (SELECT event_type, event_id, value,
             |    ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))::BIGINT AS hv
             |  FROM events),
             |s AS (SELECT event_type, event_id, value,
             |    row_number() OVER (PARTITION BY event_type ORDER BY hv, event_id) AS rn
             |  FROM v),
             |samp AS (SELECT event_type, event_id, value FROM s WHERE rn <= 32),
             |r AS (SELECT event_type, value,
             |    row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) - 1 AS vr,
             |    count(*) OVER (PARTITION BY event_type) AS m
             |  FROM samp)
             |SELECT event_type, CAST(max(m) AS INT) AS sample_size,
             |  max(CASE WHEN vr = (5*(m-1))//10 THEN value END) AS p50_est,
             |  max(CASE WHEN vr = (9*(m-1))//10 THEN value END) AS p90_est
             |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // ---- streaming RECURRENCE: q124's fixed-point EWMA as per-key
    //      streaming state. An EWMA is non-associative, so its streaming
    //      form is flatMapGroupsWithState — O(1) state per key (last
    //      day, smoothed value, day count) carried across batches, the
    //      exact streaming twin of Series.ewmaFixedPoint's secondary-sort
    //      pass. Within a batch the group's days are aggregated and
    //      folded in order; a batch arriving out of event-time order for
    //      a key fails loud rather than silently corrupting the
    //      recurrence (same contract the watermark gives windowed aggs).
    //      Final per-user state must equal the batch recurrence
    //      BIT-FOR-BIT, which the recursive-CTE oracle pins. ----
    "q127_stream_ewma" -> Q(
      (s, d) => {
        import s.implicits._
        val sch = s.read.parquet(s"$d/events.parquet").schema
        val raw = s.readStream.schema(sch).parquet(s"$d/{events.parquet}")
        val ev = normTs(raw)
        val rows = ev.select(col("user_id").cast("long"),
            unix_date(to_date(date_trunc("DAY", col("ts")))),
            round(col("value") * 100, 0).cast("long"))
          .as[(Long, Int, Long)]
        val out = ewmaStream(rows)
        val q = out.toDF("user_id", "n_days", "last_day_i", "smooth_cents")
          .writeStream.format("memory").queryName("stream_ewma")
          .outputMode("update").start()
        try q.processAllAvailable() finally q.stop()
        // update mode re-emits a key's row each batch it changes in; keep
        // the final emission per key (n_days strictly grows)
        s.table("stream_ewma")
          .groupBy("user_id")
          .agg(max(struct(col("n_days"), col("last_day_i"), col("smooth_cents")))
            .as("m"))
          .select(col("user_id"), col("m.n_days").as("n_days"),
            date_from_unix_date(col("m.last_day_i")).as("last_day"),
            col("m.smooth_cents").as("smooth_cents"))
          .orderBy("user_id")
      },
      Some("""WITH RECURSIVE daily AS (
             |  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
             |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
             |  FROM events GROUP BY 1, 2),
             |base AS (SELECT user_id, day, cents,
             |    row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn
             |  FROM daily),
             |r AS (
             |  SELECT user_id, day, rn, cents AS smooth FROM base WHERE rn = 1
             |  UNION ALL
             |  SELECT b.user_id, b.day, b.rn, (b.cents + 3 * r.smooth) // 4
             |  FROM r JOIN base b ON b.user_id = r.user_id AND b.rn = r.rn + 1),
             |l AS (SELECT user_id, max(rn) AS mx FROM base GROUP BY user_id)
             |SELECT r.user_id, CAST(l.mx AS BIGINT) AS n_days, r.day AS last_day,
             |  r.smooth AS smooth_cents
             |FROM r JOIN l ON r.user_id = l.user_id AND r.rn = l.mx
             |ORDER BY r.user_id""".stripMargin)),

    // ---- streaming COUNT-MIN sketch: q76's aggregator maintained as
    //      streaming state over the event file source (one 4×512
    //      counter array — the at-scale pattern for streaming frequency
    //      tracking: state is depth×width longs, never the key space).
    //      Counter sums are order- and batch-boundary-independent, so
    //      the streamed sketch equals the batch sketch BIT-FOR-BIT and
    //      the oracle rebuilds every counter and estimate in SQL; the
    //      overestimate guarantee rides along as a checked column. ----
    "q136_stream_cms" -> Q(
      (s, d) => {
        import s.implicits._
        val depth = 4; val width = 512
        def idxCol(c: org.apache.spark.sql.Column, i: Int) =
          pmod(conv(substring(md5(concat(c, lit("#"), lit(i)).cast("binary")), 1, 7), 16, 10)
            .cast("long"), lit(width.toLong))
        val sch = s.read.parquet(s"$d/events.parquet").schema
        val raw = s.readStream.schema(sch).parquet(s"$d/{events.parquet}")
        val idx = raw.select(array((0 until depth).map(i =>
          idxCol(col("user_id").cast("string"), i)): _*).as("idx")).as[Seq[Long]]
        val agg = new graft.functions.CmsAgg(depth, width)
        val sk = idx.groupByKey(_ => 0).agg(agg.toColumn).toDF("k", "cms")
        val q = sk.writeStream.format("memory").queryName("stream_cms")
          .outputMode("complete").start()
        try q.processAllAvailable() finally q.stop()
        val sketch = s.table("stream_cms").select("cms.*")
          .as[graft.functions.CmsBuf].head()
        val top = graft.rel.Tables.events(s, d)
          .groupBy("user_id").agg(count(lit(1)).as("tf"))
          .orderBy(col("tf").desc, col("user_id")).limit(20)
          .as[(Long, Long)].collect()
        def idxOf(u: Long, i: Int): Long = {
          val md5hex = java.security.MessageDigest.getInstance("MD5")
            .digest((u.toString + "#" + i).getBytes("UTF-8"))
            .map("%02x".format(_)).mkString
          java.lang.Long.parseLong(md5hex.take(7), 16) % width
        }
        top.toSeq.map { case (u, tf) =>
          val est = graft.functions.CmsAgg.estimate(sketch,
            (0 until depth).map(i => idxOf(u, i)), depth, width)
          (u, tf, est, est >= tf)
        }.toDF("user_id", "tf", "cms_est", "overestimate")
          .orderBy(col("tf").desc, col("user_id"))
      },
      Some("""WITH idx AS (SELECT CAST(user_id AS VARCHAR) AS uk, i.i,
             |    ('0x' || substr(md5(CAST(user_id AS VARCHAR) || '#' || i.i), 1, 7))::BIGINT % 512
             |      AS idx
             |  FROM events CROSS JOIN range(4) i(i)),
             |counters AS (SELECT i, idx, count(*) AS c FROM idx GROUP BY i, idx),
             |top AS (SELECT user_id, count(*) AS tf FROM events
             |  GROUP BY user_id ORDER BY tf DESC, user_id LIMIT 20),
             |q AS (SELECT t.user_id, t.tf, i.i,
             |    ('0x' || substr(md5(CAST(t.user_id AS VARCHAR) || '#' || i.i), 1, 7))::BIGINT % 512
             |      AS idx
             |  FROM top t CROSS JOIN range(4) i(i)),
             |est AS (SELECT q.user_id, min(c.c) AS cms_est FROM q
             |  JOIN counters c ON c.i = q.i AND c.idx = q.idx GROUP BY q.user_id)
             |SELECT t.user_id, t.tf, e.cms_est, e.cms_est >= t.tf AS overestimate
             |FROM top t JOIN est e USING (user_id)
             |ORDER BY t.tf DESC, t.user_id""".stripMargin)),

    // ---- streaming SESSION WINDOWS: Spark's native session_window over
    //      the event stream — per-user 30-minute-gap sessions maintained
    //      as merging window state by the engine itself (the one window
    //      shape whose streaming state MERGES adjacent entries rather
    //      than bucketing). Boundary semantics pinned: session_window
    //      starts a NEW session when the gap is ≥ the 30-min threshold
    //      (an event landing exactly at prev + gap falls outside the
    //      [start, last+gap) window), so the oracle's island rule is
    //      `gap >= 1800000000` — one strict-vs-inclusive notch away
    //      from q120's batch formulation, and exactly why the boundary
    //      is hash-pinned. Complete mode + the finite file source makes
    //      the final table the full session set: batch parity without
    //      waiting out a watermark. ----
    "q178_stream_sessions" -> Q(
      (s, d) => {
        val sch = s.read.parquet(s"$d/events.parquet").schema
        val raw = s.readStream.schema(sch).parquet(s"$d/{events.parquet}")
        val ev = normTs(raw)
        val sess = ev
          .groupBy(col("user_id").cast("long").as("user_id"),
            session_window(col("ts"), "30 minutes").as("sw"))
          .agg(count(lit(1)).as("n_events"), max(col("ts")).as("last_ts"))
        val q = sess.writeStream.format("memory").queryName("stream_sessions")
          .outputMode("complete").start()
        try q.processAllAvailable() finally q.stop()
        s.table("stream_sessions")
          .select(col("user_id"),
            col("sw.start").cast("timestamp_ntz").as("session_start"),
            col("last_ts").cast("timestamp_ntz").as("last_ts"),
            col("n_events"))
          .orderBy("user_id", "session_start")
      },
      Some("""WITH e AS (SELECT CAST(user_id AS BIGINT) AS user_id,
             |    CAST(ts AS TIMESTAMP) AS ts, event_id FROM events),
             |w AS (SELECT *, epoch_us(ts) -
             |      lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             |    AS gap FROM e),
             |f AS (SELECT *, CASE WHEN gap IS NULL OR gap >= 1800000000
             |    THEN 1 ELSE 0 END AS chg FROM w),
             |i AS (SELECT *, sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |    ROWS UNBOUNDED PRECEDING) AS isl FROM f)
             |SELECT user_id, min(ts) AS session_start, max(ts) AS last_ts,
             |  count(*) AS n_events
             |FROM i GROUP BY user_id, isl
             |ORDER BY user_id, session_start""".stripMargin)),

    // ---- STREAM-STATIC ENRICHMENT JOIN: the third streaming join
    //      modality (stream-stream interval join and stream-side-input
    //      broadcast already covered) — each micro-batch joins the
    //      event stream against the STATIC customer dimension (users
    //      are customer keys in this fixture), the pattern every
    //      streaming pipeline uses for dimension enrichment. The dim
    //      is broadcast per batch; purchase revenue rolls up per
    //      market segment. Batch parity is the oracle. ----
    "q192_stream_enrich" -> Q(
      (s, d) => {
        val sch = s.read.parquet(s"$d/events.parquet").schema
        val raw = s.readStream.schema(sch).parquet(s"$d/{events.parquet}")
        val ev = normTs(raw).filter(col("event_type") === "purchase")
          .select(col("user_id").cast("long").as("user_id"),
            round(col("value") * 100, 0).cast("long").as("cents"))
        val dim = broadcast(graft.rel.Tables.customer(s, d)
          .select(col("c_custkey"), col("c_mktsegment")))
        val agg = ev.join(dim, ev("user_id") === dim("c_custkey"))
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n_purchases"), sum("cents").as("revenue_cents"))
        val q = agg.writeStream.format("memory").queryName("stream_enrich")
          .outputMode("complete").start()
        try q.processAllAvailable() finally q.stop()
        s.table("stream_enrich").orderBy("c_mktsegment")
      },
      Some("""SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_purchases,
             |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
             |    AS revenue_cents
             |FROM events e JOIN customer c ON e.user_id = c.c_custkey
             |WHERE e.event_type = 'purchase'
             |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    // ---- the BUILT-IN watermark-bounded dedup operator
    //      (`dropDuplicatesWithinWatermark`, the engine-native twin of
    //      the hand-rolled q54-era stateful dedup): an at-least-once
    //      source is simulated by unioning the stream with itself —
    //      every event arrives exactly twice — and the operator must
    //      emit each event_id once. First occurrences emit immediately
    //      (the watermark governs state EVICTION, not emission), so the
    //      append-mode memory table aggregates batch-side to the plain
    //      batch-distinct oracle. ----
    "q196_stream_dedup_watermark" -> Q(
      (s, d) => {
        val sch = s.read.parquet(s"$d/events.parquet").schema
        def stream() = normTs(
          s.readStream.schema(sch).parquet(s"$d/{events.parquet}"))
          .select(col("event_id"), col("ts"), col("event_type"),
            round(col("value") * 100, 0).cast("long").as("cents"))
        val doubled = stream().unionAll(stream())
        val deduped = doubled
          .withWatermark("ts", "1 hour")
          .dropDuplicatesWithinWatermark("event_id")
        val q = deduped.writeStream.format("memory")
          .queryName("stream_dedup_wm").outputMode("append").start()
        try q.processAllAvailable() finally q.stop()
        s.table("stream_dedup_wm")
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_events"), sum("cents").as("sum_cents"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
             |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
             |    AS sum_cents
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // ---- GENUINELY MULTI-BATCH incremental aggregation: the events
    //      table is fragmented into 8 files and streamed with
    //      maxFilesPerTrigger=1, so the per-type aggregate state is
    //      built across EIGHT real micro-batches (most one-file
    //      streaming entries see a single batch — this one pins the
    //      cross-batch merge itself). Complete-mode final table must
    //      equal the one-shot batch aggregate bit-for-bit. ----
    "q198_stream_multibatch" -> Q(
      (s, d) => {
        val frag = multiBatchDirFor(s, d)
        val sch = s.read.parquet(frag).schema
        val raw = s.readStream.schema(sch)
          .option("maxFilesPerTrigger", 1).parquet(frag)
        val agg = normTs(raw)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_events"),
            sum(round(col("value") * 100, 0).cast("long")).as("sum_cents"),
            max(col("event_id")).as("max_event_id"))
        val q = agg.writeStream.format("memory").queryName("stream_multibatch")
          .outputMode("complete").start()
        try q.processAllAvailable() finally q.stop()
        s.table("stream_multibatch").orderBy("event_type")
      },
      Some("""SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
             |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
             |    AS sum_cents,
             |  CAST(max(event_id) AS BIGINT) AS max_event_id
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // ---- q219: STREAMING PER-KEY QUOTA (rate limiter) — admit at most
    //      k events per user for the stream's lifetime, first-come
    //      first-served: the firehose-throttling / per-tenant-cap
    //      operator (abuse control, freemium caps, budget-bounded
    //      sampling). State per key is TWO LONGS (admitted count +
    //      last-seen ts), which is what makes the operator viable on
    //      unbounded keyed streams — contrast the q113 bounded-sample
    //      state. Determinism contract: arrival order is event-time
    //      order, delivered by day-sliced source files (three real
    //      micro-batches) + an in-batch (ts, event_id) sort; a
    //      monotonicity guard makes any violated delivery assumption
    //      fail loud rather than silently admit the wrong rows. The
    //      oracle replays admission as row_number ≤ k per user over the
    //      same (ts, event_id) order. ----
    "q219_stream_quota" -> Q(
      (s, d) => {
        import s.implicits._
        val work = java.nio.file.Files.createTempDirectory("graft-q219")
        val in = s"$work/ev"
        val ev = normTs(s.read.parquet(s"$d/events.parquet"))
        // three day-range slices, written sequentially -> the file source
        // (mtime order) delivers them as three time-ordered micro-batches
        Seq(col("ts") < lit("2024-01-11").cast("timestamp"),
            col("ts") >= lit("2024-01-11").cast("timestamp") &&
              col("ts") < lit("2024-01-21").cast("timestamp"),
            col("ts") >= lit("2024-01-21").cast("timestamp"))
          .foreach(p => ev.filter(p).coalesce(1).write.mode("append").parquet(in))
        val sch = s.read.parquet(in).schema
        val raw = s.readStream.schema(sch)
          .option("maxFilesPerTrigger", 1).parquet(in)
        val typed = normTs(raw).select(
            col("user_id").cast("long"), col("event_id").cast("long"),
            unix_micros(col("ts")), round(col("value") * 100, 0).cast("long"))
          .as[(Long, Long, Long, Long)]
        val admitted = typed.groupByKey(_._1)
          .flatMapGroupsWithState[QuotaState, (Long, Long, Long)](
            OutputMode.Append(), GroupStateTimeout.NoTimeout)(quotaGroup(5))
        val q = admitted.toDF("user_id", "event_id", "cents")
          .writeStream.format("memory").queryName("stream_quota")
          .outputMode("append").start()
        try q.processAllAvailable() finally q.stop()
        s.table("stream_quota")
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_admitted"), sum("cents").as("admitted_cents"),
            max("event_id").as("last_admitted_event"))
          .orderBy("user_id")
      },
      Some("""WITH ranked AS (SELECT user_id, event_id,
             |    CAST(round(value * 100) AS BIGINT) AS cents,
             |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
             |      AS rn
             |  FROM events)
             |SELECT CAST(user_id AS BIGINT) AS user_id,
             |  count(*) AS n_admitted,
             |  CAST(sum(cents) AS BIGINT) AS admitted_cents,
             |  CAST(max(event_id) AS BIGINT) AS last_admitted_event
             |FROM ranked WHERE rn <= 5
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- q253: LATE-DATA ACCOUNTING — watermark observability on
    //      the streaming dedup operator (the stateful op that filters
    //      late input and exports numRowsDroppedByWatermark;
    //      aggregations in Spark finalize a never-seen late window
    //      instead of dropping it — measured, and why this entry
    //      audits dedup). Spark >= 3.5 filters lateness against the
    //      PREVIOUS micro-batch's watermark (watermarkForLateEvents
    //      leniency), so the fixture inserts a replay batch between
    //      the watermark-advancing batch and the late one:
    //        b1: every order at hour 10/11  -> sets wm ~10:06
    //        b2: exact replays of k%17==0   -> dedup swallows them,
    //            and the b1 watermark becomes the operative late bar
    //        b3: k%5==0 at hour 2 (DROPPED late) + k%5==1 at hour 12
    //      The entry emits per-hour admitted counts + the engine's own
    //      dropped-row total; every number replays in SQL because the
    //      batches are pure functions of the order keys. ----
    "q253_stream_late_audit" -> Q(
      (s, d) => {
        val work = java.nio.file.Files.createTempDirectory("graft-q253")
          .toString
        val in = s"$work/in"
        val k = col("o_orderkey").cast("long")
        // epoch seconds, session TZ is UTC: 2024-01-01 hours 2/10/12
        val base = graft.rel.Tables.orders(s, d).select(k.as("k"))
        val batch1 = base.select(col("k"),
          (lit(1704103200L) + pmod(col("k"), lit(2)) * 3600 +
            pmod(col("k"), lit(7)) * 60).cast("timestamp").as("ts"))
        def ts(hourEpoch: Long) =
          (lit(hourEpoch) + pmod(col("k"), lit(7)) * 60).cast("timestamp")
        def writeBatch(df: DataFrame): Unit = {
          val before = Option(new java.io.File(in).listFiles()).toSeq
            .flatten.filter(_.getName.startsWith("part-")).toSet
          df.coalesce(1).write.mode("append").parquet(in)
          // the file source orders the backlog by (mtime, path); ties
          // would reorder batches — force the intended order (q57)
          if (before.nonEmpty) {
            val m = before.map(_.lastModified()).max
            Option(new java.io.File(in).listFiles()).toSeq.flatten
              .filter(f => f.getName.startsWith("part-") && !before(f))
              .foreach(f => f.setLastModified(m + 60000))
          }
        }
        writeBatch(batch1)
        writeBatch(batch1.filter(pmod(col("k"), lit(17)) === 0))
        writeBatch(base.filter(pmod(col("k"), lit(5)) === 0)
          .select(col("k"), ts(1704074400L).as("ts"))
          .unionAll(base.filter(pmod(col("k"), lit(5)) === 1)
            .select(col("k"), ts(1704110400L).as("ts"))))
        val sch = s.read.parquet(in).schema
        val src = s.readStream.schema(sch)
          .option("maxFilesPerTrigger", 1).parquet(in)
        val admitted = src.withWatermark("ts", "1 hour")
          .dropDuplicates("k", "ts")
        val q = admitted.writeStream.format("memory")
          .queryName("stream_late_audit").outputMode("append").start()
        try q.processAllAvailable() finally q.stop()
        val dropped = q.recentProgress
          .flatMap(p => Option(p.stateOperators).toSeq.flatten)
          .map(_.numRowsDroppedByWatermark).sum
        s.table("stream_late_audit")
          .groupBy(date_trunc("hour", col("ts")).as("hour_start"))
          .agg(count(lit(1)).as("n_admitted"))
          .withColumn("late_dropped_total", lit(dropped))
          .select(col("hour_start").cast("timestamp_ntz").as("hour_start"),
            col("n_admitted").cast("long"), col("late_dropped_total"))
          .orderBy("hour_start")
      },
      Some("""WITH k AS (SELECT o_orderkey AS k FROM orders),
             |c AS (
             |  SELECT TIMESTAMP '2024-01-01 10:00:00' AS hour_start,
             |    count(*) AS n_admitted FROM k WHERE k % 2 = 0
             |  UNION ALL
             |  SELECT TIMESTAMP '2024-01-01 11:00:00', count(*)
             |  FROM k WHERE k % 2 = 1
             |  UNION ALL
             |  SELECT TIMESTAMP '2024-01-01 12:00:00', count(*)
             |  FROM k WHERE k % 5 = 1),
             |dr AS (SELECT count(*) AS n FROM k WHERE k % 5 = 0)
             |SELECT hour_start, CAST(n_admitted AS BIGINT) AS n_admitted,
             |  CAST(dr.n AS BIGINT) AS late_dropped_total
             |FROM c, dr ORDER BY hour_start""".stripMargin)),
  )

  /** Per-key quota state: events admitted so far + the max event ts seen
    * (micros) — the monotone-delivery guard.
    */
  case class QuotaState(admitted: Long, lastMicros: Long)

  /** The q219 pipeline minus source/sink: (user, eventId, micros, cents)
    * rows → admitted (user, eventId, cents). Exposed so specs can drive
    * it over a MemoryStream across batch boundaries.
    */
  private[graft] def quotaStream(
      rows: org.apache.spark.sql.Dataset[(Long, Long, Long, Long)], k: Int)
      : org.apache.spark.sql.Dataset[(Long, Long, Long)] = {
    import rows.sparkSession.implicits._
    rows.groupByKey(_._1)
      .flatMapGroupsWithState[QuotaState, (Long, Long, Long)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout)(quotaGroup(k))
  }

  /** Admit up to `k` events per key, first-come first-served: sort the
    * batch's events by (ts, event_id) — event time IS arrival order
    * under the day-sliced source — admit while under quota, and reject
    * the rest forever. The guard `require(min ts > last seen)` turns a
    * broken delivery-order assumption into a loud failure instead of a
    * silently different admitted set.
    */
  private def quotaGroup(k: Int)(uid: Long, it: Iterator[(Long, Long, Long, Long)],
      st: GroupState[QuotaState]): Iterator[(Long, Long, Long)] = {
    val batch = it.toArray.sortBy(e => (e._3, e._2))
    if (batch.isEmpty) Iterator.empty
    else {
      val st0 = st.getOption.getOrElse(QuotaState(0L, Long.MinValue))
      require(batch.head._3 > st0.lastMicros,
        s"out-of-order batch for key $uid: ${batch.head._3} after ${st0.lastMicros}")
      val room = (k - st0.admitted).toInt.max(0)
      val take = batch.take(room)
      st.update(QuotaState(st0.admitted + take.length, batch.last._3))
      take.iterator.map(e => (uid, e._2, e._4))
    }
  }

  /** Per-key EWMA streaming state: last folded day (epoch days), the
    * smoothed value, and how many days the recurrence has consumed.
    */
  case class EwmaState(lastDay: Int, smooth: Long, nDays: Long)

  /** The q127 pipeline minus source/sink: (key, epochDay, cents) rows →
    * per-batch cumulative (key, n_days, last_day, smooth) emissions.
    * Exposed so specs can drive it over a MemoryStream in multiple
    * batches (cross-batch state carry, out-of-order rejection).
    */
  private[graft] def ewmaStream(rows: org.apache.spark.sql.Dataset[(Long, Int, Long)])
      : org.apache.spark.sql.Dataset[(Long, Long, Int, Long)] = {
    import rows.sparkSession.implicits._
    rows.groupByKey(_._1)
      .flatMapGroupsWithState[EwmaState, (Long, Long, Int, Long)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout)(ewmaGroup)
  }

  /** Fold one batch of a user's events into the EWMA state: aggregate
    * the batch to daily cent totals, then run the s = (x + 3s) div 4
    * recurrence over the days in order, seeding from carried state.
    * Emits the key's cumulative (n_days, last_day, smooth) once per
    * batch. No timeout is registered — state lives for the stream (150
    * keys here; an eviction horizon would use the q61 watermark pattern).
    */
  private def ewmaGroup(uid: Long, it: Iterator[(Long, Int, Long)],
      st: GroupState[EwmaState]): Iterator[(Long, Long, Int, Long)] = {
    val daily = scala.collection.mutable.LongMap.empty[Long]
    it.foreach { case (_, day, c) =>
      daily(day.toLong) = daily.getOrElse(day.toLong, 0L) + c
    }
    if (daily.isEmpty) Iterator.empty
    else {
      val days = daily.keysIterator.toArray.sorted
      var (lastDay, smooth, n) = st.getOption
        .map(s0 => (s0.lastDay, s0.smooth, s0.nDays))
        .getOrElse((Int.MinValue, 0L, 0L))
      require(days.head > lastDay,
        s"out-of-order batch for key $uid: day ${days.head} after $lastDay")
      days.foreach { dl =>
        val x = daily(dl)
        // truncating division, matching Series.ewmaFixedPoint (and
        // DuckDB //, which truncates toward zero on negatives)
        smooth = if (n == 0L) x else (x + 3L * smooth) / 4L
        n += 1
        lastDay = dl.toInt
      }
      st.update(EwmaState(lastDay, smooth, n))
      Iterator.single((uid, n, lastDay, smooth))
    }
  }
}
