package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}

/** Structured Streaming surface over the `events` table shape
  * (event_id, ts timestamp, user_id, event_type, value, props) —
  * SURVEY.md §2b "Streaming" row: the reference is fully batch, so this is
  * extension surface, built on watermarks + windowed aggs +
  * flatMapGroupsWithState.
  *
  * Scale notes: state is keyed by (window, event_type) or user_id —
  * uniformly distributed keys, state store partitions = shuffle
  * partitions; watermark bounds state size; no driver-side state.
  */
object EventStream {

  /** Exactly-once parquet sink: the file sink writes each micro-batch's
    * files then commits them transactionally to the `_spark_metadata` log
    * keyed by batch id, and the checkpoint stores source offsets per
    * batch — so a restarted query (same checkpoint + path) resumes from
    * the last committed batch and a replayed batch's files are never
    * re-committed. Batch reads of `path` go through the metadata log and
    * see only committed files: end-to-end exactly-once for replayable
    * sources (files, Kafka). Stateful operators upstream recover their
    * state store from the same checkpoint. Stop/restart contract — no
    * loss, no duplicates, windowed-agg state surviving restart — is
    * pinned end-to-end by the q57_stream_restart oracle entry
    * ([[StreamingOps.hourlyRestartProof]]): kill mid-stream, restart,
    * hash-equal to the batch aggregation.
    */
  def parquetSink(df: DataFrame, path: String, checkpoint: String): StreamingQuery =
    df.writeStream.format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .start()

  /** Tumbling 1-hour windowed counts/sums with a 2-hour watermark — the
    * streaming twin of the batch query q18_events_hourly (same
    * aggregation expressions, so batch backfill and live stream agree).
    */
  def hourlyByType(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(round(col("value") * 100, 0).cast("long")).as("value_cents"))
      .select(col("w.start").as("wstart"), col("event_type"), col("cnt"), col("value_cents"))

  /** Streaming exact dedup — the streaming twin of q33_exact_dedup: emit
    * the first document seen per content hash. State is bounded by the
    * watermark via dropDuplicatesWithinWatermark (duplicates are only
    * tracked inside the horizon — the standard at-scale tradeoff; global
    * exact dedup stays the batch path). Input needs (ts timestamp, text).
    */
  def dedupByHash(docs: DataFrame, horizon: String = "1 hour"): DataFrame =
    docs
      .withWatermark("ts", horizon)
      .withColumn("content_hash", md5(col("text").cast("binary")))
      .dropDuplicatesWithinWatermark("content_hash")

  /** Stream-stream interval join — the streaming twin of the batch as-of
    * attribution (q22): each purchase joins the same user's clicks from
    * the preceding `windowMinutes`. Watermarks on BOTH sides plus the
    * time-range predicate let Spark evict join state once no future
    * match is possible — the property that bounds state at scale.
    * Inputs need (user_id, ts timestamp) plus side-specific columns.
    */
  def purchaseAttribution(
      clicks: DataFrame, purchases: DataFrame, windowMinutes: Int = 30): DataFrame = {
    val c = clicks
      .select(col("user_id"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
      .withWatermark("click_ts", "1 hour")
    val p = purchases
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"), col("value"))
      .withWatermark("purchase_ts", "1 hour")
    c.join(p,
      col("user_id") === col("p_user") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr(s"INTERVAL $windowMinutes MINUTES"))
      .select(col("user_id"), col("purchase_id"), col("purchase_ts"),
        col("click_id"), col("click_ts"), col("value"))
  }

  final case class BucketState(ids: Array[Long])

  /** Streaming MinHash-LSH near-dup index maintenance — the streaming
    * twin of the batch `Dedup.minhashCandidates`: documents arrive as a
    * stream, each is banded (16 bands × 4 rows, the shared SketchOps
    * family), and per-(band, bucket) state holds the ids seen in that
    * bucket so a new arrival immediately emits candidate pairs against
    * every prior member. Emitted pairs are (min_id, max_id) and may
    * repeat across bands/batches — consumers dedup downstream, exactly
    * like the batch path's `.distinct()`.
    *
    * State bound: near-dup indexing is corpus-cumulative, so instead of
    * a watermark the state is capped at `maxPerBucket` ids per bucket —
    * the streaming twin of the df-cap idea: a degenerate bucket (e.g.
    * boilerplate) stops ACCUMULATING at the cap: arrivals beyond it
    * still pair against the stored prefix and their own micro-batch but
    * are not remembered, so state never exceeds maxPerBucket ids.
    * Docs with <3 tokens emit no bands (their empty-shingle signatures
    * would clique all short docs — same guard as the batch path).
    * Input needs (doc_id, text).
    */
  def lshCandidates(docs: DataFrame, maxPerBucket: Int = 64)(
      implicit spark: SparkSession): Dataset[(Long, Long)] = {
    import spark.implicits._
    import graft.llm.SketchOps
    val bands = docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (i, t) =>
        val sh = SketchOps.shinglesOf(SketchOps.tokensOf(t))
        if (sh.isEmpty) Iterator.empty
        else SketchOps.bandHashes(SketchOps.minhash(sh))
          .iterator.zipWithIndex.map { case (bh, b) => (b, bh, i) }
      }
    bands
      .groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState[BucketState, (Long, Long)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: (Int, Long), rows: Iterator[(Int, Long, Long)], state: GroupState[BucketState]) =>
          val prior = state.getOption.map(_.ids).getOrElse(Array.emptyLongArray)
          val priorSet = prior.toSet
          val fresh = rows.map(_._3).toArray.distinct.sorted.filterNot(priorSet)
          val out = List.newBuilder[(Long, Long)]
          // new vs stored, then new vs new (ascending, so (min, max) holds)
          fresh.foreach { n =>
            prior.foreach { p => out += ((math.min(p, n), math.max(p, n))) }
          }
          var i = 0
          while (i < fresh.length) {
            var j = i + 1
            while (j < fresh.length) { out += ((fresh(i), fresh(j))); j += 1 }
            i += 1
          }
          val room = maxPerBucket - prior.length
          if (room > 0) state.update(BucketState(prior ++ fresh.take(room)))
          out.result().iterator
      }
  }

  final case class SessionState(start: Long, last: Long, n: Int)
  final case class SessionOut(user_id: Long, session_start: Long, session_end: Long, n_events: Int)

  /** Gap-based sessionization (30-min inactivity) via
    * flatMapGroupsWithState with EVENT-time timeout: a session closes when
    * a later event arrives past the gap, or when the watermark passes
    * last_event + gap (so state size is bounded by the watermark — the
    * property that matters at scale). Input: (user_id, ts) with ts in
    * epoch MICROSECONDS; `events` must carry a watermark on a `ts`
    * timestamp column. The batch twin is q20_events_sessions.
    */
  def sessionize(events: DataFrame)(implicit spark: SparkSession): Dataset[SessionOut] = {
    import spark.implicits._
    val gapUs = 30L * 60 * 1000000
    events
      .withWatermark("ts", "30 minutes")
      // the watermarked timestamp column must survive into groupByKey —
      // projecting it to a long would strip the event-time tag
      .select(col("user_id").cast("long").as("user_id"), col("ts"))
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, rows: Iterator[(Long, java.sql.Timestamp)], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(s => SessionOut(user, s.start, s.last, s.n))
            state.remove()
            out.iterator
          } else {
            val ts = rows.map { r =>
              val i = r._2.toInstant
              i.getEpochSecond * 1000000L + i.getNano / 1000L
            }.toArray.sorted
            var cur = state.getOption.orNull
            val closed = List.newBuilder[SessionOut]
            ts.foreach { t =>
              if (cur == null) cur = SessionState(t, t, 1)
              else if (t - cur.last <= gapUs)
                // min/max: a legal late event (within watermark) from a later
                // micro-batch may precede the stored bounds — never let the
                // session regress to start > end
                cur = SessionState(math.min(cur.start, t), math.max(cur.last, t), cur.n + 1)
              else {
                closed += SessionOut(user, cur.start, cur.last, cur.n)
                cur = SessionState(t, t, 1)
              }
            }
            state.update(cur)
            // close via watermark once no event can extend the session
            state.setTimeoutTimestamp((cur.last + gapUs) / 1000)
            closed.result().iterator
          }
      }
  }
}
