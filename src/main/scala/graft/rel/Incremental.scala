package graft.rel

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.rel.RelQueries.Q

/** INCREMENTAL AGGREGATE MAINTENANCE — keep a materialized aggregate
  * current under append batches WITHOUT rescanning the base table: the
  * materialized-view upkeep primitive (daily KPI rollups, metric
  * stores, the "refresh the dashboard from today's partition only"
  * job). Works for any ALGEBRAIC aggregate — one whose state merges
  * key-wise (sum+sum, count+count, min(min), max(max)); averages are
  * derived from merged exact operands at read time.
  *
  * Determinism: every merged measure is exact integer arithmetic
  * (long sums, counts, min/max), so state ⊕ delta is bit-identical to
  * a full recompute — which is precisely what the q131 oracle checks.
  *
  * Scale shape (100 TB): the WHOLE point. A refresh touches the delta
  * partition (narrow scan + one partial agg, map-side combined) plus
  * the existing state table (key-cardinality-sized, not data-sized);
  * the merge is one hash-agg over their union keyed by the group-by
  * key. The 100 TB base table is never re-read. State round-trips
  * through parquet between refreshes — the entry exercises the full
  * persist → read → merge lifecycle, not a fused in-memory plan.
  */
object Incremental {

  /** Aggregate state of the pricing summary over a lineitem slice:
    * one row per (l_returnflag, l_linestatus) with exact-integer
    * measures (quantities are integral in this schema; the cast is
    * loss-free and makes the sum merge-exact).
    */
  def pricingState(li: DataFrame): DataFrame =
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast("long")).as("sum_qty_l"),
        sum(round(col("l_extendedprice") * 100, 0).cast("long")).as("sum_base_cents"),
        count(lit(1)).as("count_order"),
        min(col("l_quantity").cast("long")).as("min_qty_l"),
        max(col("l_quantity").cast("long")).as("max_qty_l"))

  /** Key-wise merge of two aggregate states (either side may have keys
    * the other lacks): sums and counts add, min/max fold.
    */
  def mergeStates(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum("sum_qty_l").as("sum_qty_l"),
        sum("sum_base_cents").as("sum_base_cents"),
        sum("count_order").as("count_order"),
        min("min_qty_l").as("min_qty_l"),
        max("max_qty_l").as("max_qty_l"))

  /** q131: materialize the aggregate at a mid-corpus cutoff, persist it
    * to parquet, read it back, and roll it forward with the delta batch
    * — the oracle recomputes the final window from scratch, so the
    * merged state must be bit-identical to a full recompute.
    */
  val all: ListMap[String, Q] = ListMap(
    "q131_incr_agg" -> Q(
      (s, d) => {
        val cut1 = lit("1995-06-01").cast("timestamp")
        val cut2 = lit("1998-09-02").cast("timestamp")
        val li = Tables.lineitem(s, d)
        val work = java.nio.file.Files.createTempDirectory("graft-q131")
        val statePath = s"$work/pricing_state"
        pricingState(li.filter(col("l_shipdate") <= cut1))
          .write.mode("overwrite").parquet(statePath)
        val state = s.read.parquet(statePath)
        val delta = pricingState(
          li.filter(col("l_shipdate") > cut1 && col("l_shipdate") <= cut2))
        mergeStates(state, delta)
          .orderBy("l_returnflag", "l_linestatus")
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty_l,
             |  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
             |  count(*) AS count_order,
             |  CAST(min(CAST(l_quantity AS BIGINT)) AS BIGINT) AS min_qty_l,
             |  CAST(max(CAST(l_quantity AS BIGINT)) AS BIGINT) AS max_qty_l
             |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // ---- q140: the STREAMING form of the same maintenance — the
    //      aggregate state kept current by a foreachBatch upsert as
    //      micro-batches arrive (the streaming-materialized-view
    //      pattern: per batch, one partial agg over the batch + one
    //      merge against key-cardinality-sized state; the stream is
    //      never re-scanned). Three real micro-batches through the
    //      file source (maxFilesPerTrigger=1), state alternating
    //      between two parquet dirs (never overwrite what the same
    //      job reads). Merge is exact-integer and commutative, so the
    //      final state is bit-identical to q131's batch answer and
    //      shares its oracle. ----
    "q140_stream_incr_agg" -> Q(
      (s, d) => {
        val cut2 = lit("1998-09-02").cast("timestamp")
        val work = java.nio.file.Files.createTempDirectory("graft-q140")
        val in = s"$work/in"
        val li = Tables.lineitem(s, d).filter(col("l_shipdate") <= cut2)
        // three slices by ship year -> three files -> three micro-batches
        Seq(col("l_shipdate") <= lit("1994-12-31").cast("timestamp"),
            col("l_shipdate") > lit("1994-12-31").cast("timestamp") &&
              col("l_shipdate") <= lit("1996-12-31").cast("timestamp"),
            col("l_shipdate") > lit("1996-12-31").cast("timestamp"))
          .foreach(p => li.filter(p).coalesce(1).write.mode("append").parquet(in))
        val sch = s.read.parquet(in).schema
        val src = s.readStream.schema(sch)
          .option("maxFilesPerTrigger", 1).parquet(in)
        val stateA = s"$work/state_a"; val stateB = s"$work/state_b"
        def statePath(gen: Long) = if (gen % 2 == 0) stateA else stateB
        var gen = 0L
        val q = src.writeStream
          .option("checkpointLocation", s"$work/ckpt")
          .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
            val delta = pricingState(batch)
            val merged =
              if (gen == 0L) delta
              else mergeStates(s.read.parquet(statePath(gen - 1)), delta)
            merged.write.mode("overwrite").parquet(statePath(gen))
            gen += 1
          }
          .start()
        try q.processAllAvailable() finally q.stop()
        require(gen >= 3, s"expected >= 3 micro-batches, got $gen")
        s.read.parquet(statePath(gen - 1))
          .orderBy("l_returnflag", "l_linestatus")
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty_l,
             |  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
             |  count(*) AS count_order,
             |  CAST(min(CAST(l_quantity AS BIGINT)) AS BIGINT) AS min_qty_l,
             |  CAST(max(CAST(l_quantity AS BIGINT)) AS BIGINT) AS max_qty_l
             |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // ---- q218: INCREMENTAL JOIN-VIEW MAINTENANCE — the delta algebra
    //      for a materialized JOIN (the other IVM half: q131 maintains
    //      an aggregate; real views are joins UNDER aggregates). With
    //      appends ΔA, ΔB against snapshots A, B:
    //        (A∪ΔA) ⋈ (B∪ΔB) = A⋈B ∪ ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB
    //      so the refresh touches each delta against the OTHER side's
    //      snapshot plus the delta×delta corner — never the persisted
    //      view body. Splits are deterministic key residues (orders
    //      mod 7, customers mod 5), the view body round-trips through
    //      parquet like q131, and the oracle recomputes the full join
    //      from scratch — bit-equality IS the correctness of the
    //      algebra. Scale shape (100 TB): the three increment joins
    //      are delta-sized on at least one side (broadcast the delta);
    //      the view body is appended to, not rebuilt, and the final
    //      read-time aggregate runs over view output, not base facts. ----
    "q218_incr_join" -> Q(
      (s, d) => {
        val ords = Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_custkey"),
            round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
        val custs = Tables.customer(s, d)
          .select(col("c_custkey"), col("c_nationkey").cast("long").as("nation"))
        val oBase = ords.filter(col("o_orderkey") % 7 =!= 0)
        val oDelta = ords.filter(col("o_orderkey") % 7 === 0)
        val cBase = custs.filter(col("c_custkey") % 5 =!= 0)
        val cDelta = custs.filter(col("c_custkey") % 5 === 0)
        def j(a: DataFrame, b: DataFrame): DataFrame =
          a.join(b, col("o_custkey") === col("c_custkey"))
            .select(col("o_orderkey"), col("nation"), col("cents"))
        val work = java.nio.file.Files.createTempDirectory("graft-q218")
        val viewPath = s"$work/order_cust_view"
        j(oBase, cBase).write.mode("overwrite").parquet(viewPath)
        // refresh: three delta terms appended to the persisted body
        j(oDelta, cBase).unionAll(j(oBase, cDelta)).unionAll(j(oDelta, cDelta))
          .write.mode("append").parquet(viewPath)
        s.read.parquet(viewPath)
          .groupBy("nation")
          .agg(count(lit(1)).as("n_rows"), sum("cents").as("sum_cents"))
          .orderBy("nation")
      },
      Some("""SELECT CAST(c_nationkey AS BIGINT) AS nation,
             |  count(*) AS n_rows,
             |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             |    AS sum_cents
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |GROUP BY 1 ORDER BY 1""".stripMargin)),
  )
}
