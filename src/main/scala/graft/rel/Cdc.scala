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
  * aggregation (map-side combinable — no per-key window, no sort), and
  * the apply is ONE full-outer join keyed on the snapshot key. Change
  * batches are usually tiny next to the base, so AQE broadcasts the
  * winner side and the base is never shuffled; at worst it is one
  * co-partitioned join. Nothing driver-side.
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
    base.join(winners, keys, "full")
      .filter(coalesce(col("__op") =!= "D", lit(true))) // D: drop the key
      .select(keys.map(col) ++ payload.map(p =>
        // winner payload when the key was touched, else the base row
        when(col("__op").isNotNull, col(s"__c_$p")).otherwise(col(p)).as(p))
        : _*)
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
        val changes = deletes.unionByName(updLate)
          .unionByName(updEarly).unionByName(inserts)
        applyBatch(base, changes, Seq("k")).orderBy("k")
      },
      Some("""WITH a AS (SELECT o_orderkey AS k,
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
             |ORDER BY k""".stripMargin))
  )
}
