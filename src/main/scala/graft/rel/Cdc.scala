package graft.rel

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.rel.RelQueries.Q

/** CDC BATCH APPLY — the MERGE-INTO primitive every warehouse ingest
  * loop runs: apply a change batch (insert/update/delete rows with a
  * per-key sequence) to a keyed snapshot, producing the next snapshot.
  * Within the batch the LAST writer wins per key (max sequence, with a
  * pinned tie-break the caller supplies), then the winner upserts
  * (I/U) or deletes (D); untouched base keys pass through.
  *
  * Scale shape (100 TB): the intra-batch winner is a `max_by` HASH
  * aggregation (map-side combinable — no per-key window, no sort). The
  * apply deliberately AVOIDS the textbook full-outer join — FULL OUTER
  * cannot broadcast, so it would shuffle the whole base for a
  * kilobyte-sized change batch. Instead: untouched = base ANTI-JOIN
  * winners (the small side broadcasts — the base never shuffles),
  * upserts = the winners themselves (a CDC change row carries the full
  * row image). The versioned/streaming form needs the state's sequence
  * and keeps one key-partitioned join; a production loop stores the
  * state generations BUCKETED by key so that exchange also disappears.
  * Nothing driver-side.
  */
object Cdc {

  /** Apply `changes` (key + payload columns + `op` ∈ 'I'|'U'|'D' +
    * `seq`) to `base` (key + the same payload columns). `tieBreak`
    * orders equal-sequence changes deterministically (e.g. a change-id
    * column); the pair (seq, tieBreak) must be a total order per key —
    * the replayability contract.
    */
  def applyBatch(base: DataFrame, changes: DataFrame, keys: Seq[String],
      seqCol: String = "seq", opCol: String = "op",
      tieBreak: Option[String] = None): DataFrame = {
    require(keys.nonEmpty, "keys must be non-empty")
    val payload = base.columns.filterNot(keys.contains).toSeq
    val ordKey: Column = tieBreak match {
      case Some(t) => struct(col(seqCol), col(t))
      case None => struct(col(seqCol))
    }
    // last-writer-wins winner per key: one hash agg, no window
    val winners = changes
      .groupBy(keys.map(col): _*)
      .agg(max_by(
        struct((payload.map(col) :+ col(opCol).as("__op")): _*), ordKey)
        .as("__w"))
      .select(keys.map(col) ++ payload.map(p => col(s"__w.$p").as(s"__c_$p"))
        :+ col("__w.__op").as("__op"): _*)
    // anti + union, NOT a full-outer join: the winner side broadcasts,
    // the base passes through without a shuffle (CdcSpec pins the shape)
    val untouched = base.join(broadcast(winners.select(keys.map(col): _*)),
      keys, "left_anti")
    val upserts = winners.filter(col("__op") =!= "D")
      .select(keys.map(col) ++ payload.map(p => col(s"__c_$p").as(p)): _*)
    untouched.unionByName(upserts)
  }

  /** VERSIONED state apply — the micro-batch/streaming form of
    * [[applyBatch]], safe under REPLAY and out-of-order batch delivery:
    * the state carries each key's applied sequence and a tombstone
    * flag, and a change only lands if its sequence is STRICTLY greater
    * than the state's — so re-delivering a batch (at-least-once
    * sources) is a no-op, and a late-arriving stale change cannot
    * resurrect a newer delete (tombstones are retained, not dropped;
    * [[snapshotOf]] filters them at read time; a production loop ages
    * them out like DedupIndex's eviction). `seqCol` must be a total
    * order per key ACROSS batches — the replayability contract.
    */
  def applyVersioned(state: DataFrame, changes: DataFrame, keys: Seq[String],
      seqCol: String = "seq", opCol: String = "op"): DataFrame = {
    val payload = state.columns
      .filterNot(c => keys.contains(c) || c == seqCol || c == "deleted").toSeq
    val winners = changes
      .groupBy(keys.map(col): _*)
      .agg(max_by(
        struct((payload.map(col) ++ Seq(col(opCol).as("__op"),
          col(seqCol).as("__seq"))): _*), col(seqCol))
        .as("__w"))
      .select(keys.map(col) ++ payload.map(p => col(s"__w.$p").as(s"__c_$p"))
        ++ Seq(col("__w.__op").as("__op"), col("__w.__seq").as("__cseq")): _*)
    val takeWinner = col("__op").isNotNull &&
      (col(seqCol).isNull || col("__cseq") > col(seqCol))
    state.join(winners, keys, "full")
      .select(keys.map(col) ++
        payload.map(p =>
          when(takeWinner, col(s"__c_$p")).otherwise(col(p)).as(p)) ++
        Seq(when(takeWinner, col("__cseq")).otherwise(col(seqCol)).as(seqCol),
          when(takeWinner, col("__op") === "D")
            .otherwise(coalesce(col("deleted"), lit(false))).as("deleted")): _*)
  }

  /** Null-fill into `df` every column `ref` has and it lacks (minus
    * `exclude`), typed from `ref`'s schema — the add-column half of
    * lakehouse schema evolution (Delta/Iceberg mergeSchema semantics).
    */
  private def withMissingFrom(df: DataFrame, ref: DataFrame,
      exclude: Set[String]): DataFrame = {
    val have = df.columns.toSet
    ref.schema.fields
      .filterNot(f => have(f.name) || exclude(f.name))
      .foldLeft(df)((acc, f) =>
        acc.withColumn(f.name, lit(null).cast(f.dataType)))
  }

  /** SCHEMA-EVOLVING batch apply — [[applyBatch]] for the common
    * lakehouse case the fixed-schema form rejects: a change batch that
    * ADDS columns lands against an old-schema snapshot (the new columns
    * null-fill on untouched base rows), and an old-producer batch lands
    * against an evolved snapshot (its rows' unknown columns null-fill —
    * the full-row-image contract means a producer that doesn't know a
    * column writes NULL for it, exactly Delta's CDC merge behavior).
    * Key columns must exist on both sides; only payload evolves.
    */
  def applyBatchEvolving(base: DataFrame, changes: DataFrame,
      keys: Seq[String], seqCol: String = "seq", opCol: String = "op",
      tieBreak: Option[String] = None): DataFrame = {
    keys.foreach(k => require(
      base.columns.contains(k) && changes.columns.contains(k),
      s"key column $k must exist on both sides (keys never evolve)"))
    val meta = Set(seqCol, opCol) ++ tieBreak
    applyBatch(
      withMissingFrom(base, changes, meta),
      withMissingFrom(changes, base, Set.empty),
      keys, seqCol, opCol, tieBreak)
  }

  /** SCHEMA-EVOLVING versioned apply — [[applyVersioned]] with the same
    * add-column alignment: the state parquet written by generation N−1
    * may predate columns a generation-N change batch carries (and vice
    * versa for replayed old batches). Compose with mergeSchema reads
    * when a consumer scans several state generations at once (the q195
    * machinery).
    */
  def applyVersionedEvolving(state: DataFrame, changes: DataFrame,
      keys: Seq[String], seqCol: String = "seq", opCol: String = "op")
      : DataFrame = {
    keys.foreach(k => require(
      state.columns.contains(k) && changes.columns.contains(k),
      s"key column $k must exist on both sides (keys never evolve)"))
    applyVersioned(
      withMissingFrom(state, changes, Set(opCol)),
      withMissingFrom(changes, state, Set("deleted")),
      keys, seqCol, opCol)
  }

  /** lift a plain snapshot into versioned state (sequence 0, live) */
  def bootstrapState(base: DataFrame, seq0: Long = 0L,
      seqCol: String = "seq"): DataFrame =
    base.withColumn(seqCol, lit(seq0)).withColumn("deleted", lit(false))

  /** the live snapshot a versioned state represents */
  def snapshotOf(state: DataFrame, seqCol: String = "seq"): DataFrame =
    state.filter(!col("deleted")).drop(seqCol, "deleted")

  /** SCD2 HISTORY from a CDC change log — the time-travel complement
    * to [[applyBatch]] (which keeps only the latest version): every
    * accepted I/U change becomes a version row valid over
    * [its sequence, the key's next change's sequence), deletes close
    * the preceding interval without opening one, and a key's last
    * non-delete version is flagged current. This is q117's SCD2 shape
    * derived from the CHANGE LOG instead of snapshot diffs — the
    * CDC-native path that never needs two full snapshots.
    *
    * Requires (keys, seqCol) unique — a sequenced CDC log's contract;
    * collapse same-sequence conflicts with [[applyBatch]]'s
    * last-writer-wins first if the source can violate it.
    *
    * Scale: ONE per-key window (lead over the key's own changes) —
    * hash-partitioned by key, never global; entity-bounded partitions.
    */
  def scd2History(changes: DataFrame, keys: Seq[String],
      opCol: String = "op", seqCol: String = "seq"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(seqCol))
    changes
      .withColumn("valid_to_seq", lead(col(seqCol), 1).over(w))
      .filter(col(opCol) =!= "D")
      .withColumn("is_current", col("valid_to_seq").isNull)
      .withColumnRenamed(seqCol, "valid_from_seq")
      .drop(opCol)
  }

  /** CHANGE-LOG GENERATION — the inverse of [[applyBatch]]: diff two
    * keyed snapshots into the minimal I/U/D batch that transforms the
    * old into the new. The closure property `applyBatch(a, diff(a, b))
    * ≡ b` is what makes the pair a complete replication toolkit
    * (spec-pinned on randomized snapshots); diff feeds scd2History for
    * log-shaped archival of snapshot-shaped sources. One full outer
    * join on the key — at scale both sides shuffle once on the key
    * they are usually already bucketed by (the q237-family layout).
    * Payload comparison is null-safe per column (a NULL→value change
    * is a U, not a no-op).
    */
  def diff(oldSnap: DataFrame, newSnap: DataFrame, keys: Seq[String],
      seq: Long = 1L, seqCol: String = "seq", opCol: String = "op"): DataFrame = {
    val payload = oldSnap.columns.filterNot(keys.contains)
    require(payload.sameElements(newSnap.columns.filterNot(keys.contains)),
      "snapshots must share the same payload columns")
    val o = oldSnap.select(
      struct(keys.map(col): _*).as("__k"),
      struct(payload.map(col): _*).as("__po"))
    val n = newSnap.select(
      struct(keys.map(col): _*).as("__k"),
      struct(payload.map(col): _*).as("__pn"))
    val j = o.join(n, Seq("__k"), "full_outer")
    val op = when(col("__po").isNull, "I")
      .when(col("__pn").isNull, "D")
      .otherwise("U")
    j.filter(col("__po").isNull || col("__pn").isNull ||
        !(col("__po") <=> col("__pn")))
      .select(Seq(col("__k.*")) ++
        // payload chosen per ROW, not per column: a per-column coalesce
        // would resurrect the OLD value wherever the new payload is
        // legitimately NULL (value→NULL updates — caught by the
        // apply∘diff closure property)
        payload.map(c => when(col("__pn").isNull, col(s"__po.$c"))
          .otherwise(col(s"__pn.$c")).as(c)) ++
        Seq(op.as(opCol), lit(seq).as(seqCol)): _*)
  }

  /** q237's oracle — shared verbatim by q238: the streaming loop must
    * land on the exact batch-merge result
    */
  private val cdcOracle =
    """WITH a AS (SELECT o_orderkey AS k,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
      |    o_orderstatus AS status
      |  FROM orders),
      |base AS (SELECT * FROM a WHERE k % 7 <> 0),
      |changes AS (
      |  SELECT k, cents, status, 'D' AS op, 2 AS seq
      |    FROM a WHERE k % 10 = 0
      |  UNION ALL
      |  SELECT k, cents + 100, 'U', 'U', 2 FROM a WHERE k % 10 = 1
      |  UNION ALL
      |  SELECT k, cents + 999, 'X', 'U', 1 FROM a WHERE k % 10 = 1
      |  UNION ALL
      |  SELECT k, cents, 'I', 'I', 1 FROM a
      |    WHERE k % 7 = 0 AND k % 10 = 2),
      |w AS (SELECT k, cents, status, op FROM (
      |    SELECT *, row_number() OVER (PARTITION BY k
      |      ORDER BY seq DESC) AS rn FROM changes) t WHERE rn = 1)
      |SELECT coalesce(b.k, w.k) AS k,
      |  CASE WHEN w.op IS NOT NULL THEN w.cents ELSE b.cents END
      |    AS cents,
      |  CASE WHEN w.op IS NOT NULL THEN w.status ELSE b.status END
      |    AS status
      |FROM base b FULL JOIN w ON b.k = w.k
      |WHERE w.op IS NULL OR w.op <> 'D'
      |ORDER BY k""".stripMargin

  /** the q237/q238 shared fixture: snapshot + the change set */
  private def fixture(s: org.apache.spark.sql.SparkSession, d: String)
      : (DataFrame, DataFrame) = {
    val cents = round(col("o_totalprice") * 100, 0).cast("long")
    val all0 = Tables.orders(s, d)
      .select(col("o_orderkey").as("k"), cents.as("cents"),
        col("o_orderstatus").as("status"))
    val base = all0.filter(col("k") % 7 =!= 0)
    val deletes = all0.filter(col("k") % 10 === 0)
      .select(col("k"), col("cents"), col("status"),
        lit("D").as("op"), lit(2L).as("seq"))
    val updLate = all0.filter(col("k") % 10 === 1)
      .select(col("k"), (col("cents") + 100).as("cents"),
        lit("U").as("status"), lit("U").as("op"), lit(2L).as("seq"))
    val updEarly = all0.filter(col("k") % 10 === 1)
      .select(col("k"), (col("cents") + 999).as("cents"),
        lit("X").as("status"), lit("U").as("op"), lit(1L).as("seq"))
    val inserts = all0.filter(col("k") % 7 === 0 && col("k") % 10 === 2)
      .select(col("k"), col("cents"), lit("I").as("status"),
        lit("I").as("op"), lit(1L).as("seq"))
    (base, deletes.unionByName(updLate).unionByName(updEarly)
      .unionByName(inserts))
  }

  val all: ListMap[String, Q] = ListMap(
    // ---- q237: CDC APPLY over an orders snapshot — deletes (keys
    //      %10=0), conflicting double-updates (keys %10=1 get seq 1
    //      AND seq 2 — last-writer-wins is the semantics under test),
    //      and inserts of keys absent from the base (%7=0 ∧ %10=2).
    //      The FULL resulting snapshot hash-compares (not a summary):
    //      every row the merge touches or passes through is checked.
    //      Oracle replays winner selection with a window (the oracle
    //      may sort; the operator must not). ----
    "q237_cdc_apply" -> Q(
      (s, d) => {
        val (base, changes) = fixture(s, d)
        applyBatch(base, changes, Seq("k")).orderBy("k")
      },
      Some(cdcOracle)),

    // ---- q238: STREAMING CDC APPLY — the same change set driven
    //      through the REAL micro-batch engine (file source, one file
    //      per trigger): seq-1 changes, then seq-2 changes, then the
    //      seq-2 file REPLAYED (at-least-once delivery). Each batch
    //      applies via [[applyVersioned]] against parquet state
    //      generations (the q140 A/B pattern); the strictly-greater
    //      sequence rule makes the replay a no-op and tombstones keep
    //      deletes stable. Final snapshot ≡ the q237 batch merge —
    //      SHARED oracle, so the streaming loop's idempotence sits
    //      under the driver's hash compare. ----
    "q238_stream_cdc" -> Q(
      (s, d) => {
        val (base, changes) = fixture(s, d)
        val work = java.nio.file.Files.createTempDirectory("graft-q238")
        val in = s"$work/in"
        // one file per batch: seq 1, seq 2, then seq 2 AGAIN (replay)
        changes.filter(col("seq") === 1).coalesce(1)
          .write.mode("append").parquet(in)
        changes.filter(col("seq") === 2).coalesce(1)
          .write.mode("append").parquet(in)
        changes.filter(col("seq") === 2).coalesce(1)
          .write.mode("append").parquet(in)
        val sch = s.read.parquet(in).schema
        val src = s.readStream.schema(sch)
          .option("maxFilesPerTrigger", 1).parquet(in)
        val stateA = s"$work/state_a"; val stateB = s"$work/state_b"
        def statePath(gen: Long) = if (gen % 2 == 0) stateA else stateB
        bootstrapState(base).write.mode("overwrite").parquet(stateA)
        var gen = 1L
        val q = src.writeStream
          .option("checkpointLocation", s"$work/ckpt")
          .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
            applyVersioned(s.read.parquet(statePath(gen - 1)), batch, Seq("k"))
              .write.mode("overwrite").parquet(statePath(gen))
            gen += 1
          }
          .start()
        try q.processAllAvailable() finally q.stop()
        require(gen >= 4, s"expected >= 3 micro-batches, got ${gen - 1}")
        snapshotOf(s.read.parquet(statePath(gen - 1))).orderBy("k")
      },
      Some(cdcOracle)),

    // ---- q259: CHANGE-LOG GENERATION — diff two order snapshots
    //      (deletes %10=0, cent-bumped updates %10=1, inserted fresh
    //      keys for %10=2) into the minimal I/U/D batch. The oracle
    //      states the EXPECTED log in closed form from the fixture's
    //      construction — the strongest shape: the diff must emit
    //      exactly the edits that were made, nothing else. The
    //      apply∘diff ≡ identity closure is property-pinned in
    //      CdcSpec. ----
    "q259_cdc_diff" -> Q(
      (s, d) => {
        val a = Tables.orders(s, d).select(
          col("o_orderkey").cast("long").as("k"),
          round(col("o_totalprice") * 100, 0).cast("long").as("cents"),
          col("o_orderstatus").as("status"))
        val b = a.filter(col("k") % 10 =!= 0)
          .select(col("k"),
            when(col("k") % 10 === 1, col("cents") + 100)
              .otherwise(col("cents")).as("cents"), col("status"))
          .unionAll(a.filter(col("k") % 10 === 2)
            .select((col("k") + 100000000L).as("k"), col("cents"),
              lit("I").as("status")))
        diff(a, b, Seq("k")).orderBy("k")
      },
      Some("""WITH a AS (SELECT o_orderkey AS k,
             |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             |    o_orderstatus AS status
             |  FROM orders)
             |SELECT k, cents, status, 'D' AS op, 1 AS seq
             |  FROM a WHERE k % 10 = 0
             |UNION ALL
             |SELECT k, cents + 100, status, 'U', 1 FROM a WHERE k % 10 = 1
             |UNION ALL
             |SELECT k + 100000000, cents, 'I', 'I', 1 FROM a WHERE k % 10 = 2
             |ORDER BY k""".stripMargin)),

    // ---- q242: SCD2 HISTORY FROM A CDC LOG — each customer's orders
    //      replayed as that customer's change log (seq = o_orderkey,
    //      globally unique, so the (key, seq) uniqueness contract
    //      holds by construction — l_linenumber deliberately NOT used:
    //      the synthetic lineitem duplicates (orderkey, linenumber));
    //      'P'-status orders become deletes, so keys carry ~10-version
    //      histories with mid-stream deletes and delete-then-reinsert
    //      runs. Full history hash-compares: every interval boundary,
    //      every closed-by-delete row, every current flag. Oracle
    //      replays the per-key lead window verbatim. ----
    "q242_cdc_scd2" -> Q(
      (s, d) => {
        val log = Tables.orders(s, d).select(
          col("o_custkey").cast("long").as("k"),
          round(col("o_totalprice") * 100, 0).cast("long").as("cents"),
          when(col("o_orderstatus") === "P", "D").otherwise("U").as("op"),
          col("o_orderkey").cast("long").as("seq"))
        scd2History(log, Seq("k"))
          .select(col("k"), col("cents"), col("valid_from_seq"),
            col("valid_to_seq"), col("is_current"))
          .orderBy("k", "valid_from_seq")
      },
      Some("""WITH log AS (
             |  SELECT CAST(o_custkey AS BIGINT) AS k,
             |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             |    CASE WHEN o_orderstatus = 'P' THEN 'D' ELSE 'U' END AS op,
             |    CAST(o_orderkey AS BIGINT) AS seq
             |  FROM orders),
             |v AS (SELECT k, cents, op, seq,
             |    lead(seq) OVER (PARTITION BY k ORDER BY seq) AS nxt
             |  FROM log)
             |SELECT k, cents, seq AS valid_from_seq, nxt AS valid_to_seq,
             |  nxt IS NULL AS is_current
             |FROM v WHERE op <> 'D'
             |ORDER BY k, valid_from_seq""".stripMargin)),

    // ---- q265: CDC SCHEMA EVOLUTION — a two-generation-schema change
    //      log applied through parquet state generations: batch 1
    //      (seq 1) still speaks the OLD schema (k, cents, status);
    //      batch 2 (seq 2) arrives from an upgraded producer with an
    //      added `channel` column. Generation 0 is the old-schema
    //      bootstrap; each batch lands via [[applyVersionedEvolving]],
    //      so gen 2's parquet carries the evolved schema with `channel`
    //      null-filled on every row batch 2 didn't touch. The final
    //      snapshot hash-compares against a closed-form DuckDB replay
    //      (including the NULL channel on untouched/old-updated rows —
    //      the exact add-column contract). ----
    "q265_cdc_evolve" -> Q(
      (s, d) => {
        val a = Tables.orders(s, d).select(
          col("o_orderkey").cast("long").as("k"),
          round(col("o_totalprice") * 100, 0).cast("long").as("cents"),
          col("o_orderstatus").as("status"))
        // batch 1: OLD schema — cents bump for k%5=0
        val b1 = a.filter(col("k") % 5 === 0)
          .select(col("k"), (col("cents") + 50).as("cents"), col("status"),
            lit("U").as("op"), lit(1L).as("seq"))
        // batch 2: NEW schema (adds channel) — updates k%5=1, deletes k%5=2
        val b2 = a.filter(col("k") % 5 === 1)
          .select(col("k"), (col("cents") + 7).as("cents"),
            lit("W").as("status"), lit("web").as("channel"),
            lit("U").as("op"), lit(2L).as("seq"))
          .unionByName(a.filter(col("k") % 5 === 2)
            .select(col("k"), col("cents"), col("status"),
              lit(null).cast("string").as("channel"),
              lit("D").as("op"), lit(2L).as("seq")))
        val work = java.nio.file.Files.createTempDirectory("graft-q265")
        def gen(i: Int) = s"$work/state_$i"
        bootstrapState(a).write.mode("overwrite").parquet(gen(0))
        applyVersionedEvolving(s.read.parquet(gen(0)), b1, Seq("k"))
          .write.mode("overwrite").parquet(gen(1))
        applyVersionedEvolving(s.read.parquet(gen(1)), b2, Seq("k"))
          .write.mode("overwrite").parquet(gen(2))
        // a consumer scanning ALL generations needs the q195 machinery:
        // mergeSchema unifies gen 0/1 (old schema) with gen 2 (evolved)
        val merged = s.read.option("mergeSchema", "true")
          .parquet(gen(0), gen(1), gen(2))
        require(merged.columns.contains("channel"),
          s"mergeSchema read lost the evolved column: ${merged.columns.toSeq}")
        snapshotOf(s.read.parquet(gen(2)))
          .select("k", "cents", "status", "channel").orderBy("k")
      },
      Some("""WITH a AS (SELECT o_orderkey AS k,
             |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             |    o_orderstatus AS status
             |  FROM orders)
             |SELECT k,
             |  CASE WHEN k % 5 = 0 THEN cents + 50
             |       WHEN k % 5 = 1 THEN cents + 7
             |       ELSE cents END AS cents,
             |  CASE WHEN k % 5 = 1 THEN 'W' ELSE status END AS status,
             |  CASE WHEN k % 5 = 1 THEN 'web'
             |       ELSE CAST(NULL AS VARCHAR) END AS channel
             |FROM a WHERE k % 5 <> 2
             |ORDER BY k""".stripMargin))
  )
}
