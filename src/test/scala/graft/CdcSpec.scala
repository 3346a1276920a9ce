package graft

import graft.rel.Cdc

/** CDC batch apply — edge semantics the q237 fixture can't isolate:
  * delete of an absent key (no-op, no ghost row), insert over an
  * existing key (upsert overwrites), intra-batch last-writer-wins with
  * an explicit tie-break at EQUAL sequence, delete-then-reinsert in one
  * batch (the later op wins whole-row), and pass-through of untouched
  * base rows. Plus the plan guard: winner selection is a hash
  * aggregation, not a per-key window.
  */
class CdcSpec extends SparkSpec {

  private def s = spark

  test("upsert/delete semantics incl. absent-key delete and reinsert") {
    val sp = s
    import sp.implicits._
    val base = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "v")
    val changes = Seq(
      (2L, 99L, "U", 1L),  // update existing
      (3L, 0L, "D", 1L),   // delete existing
      (4L, 40L, "I", 1L),  // insert new
      (5L, 0L, "D", 1L),   // delete ABSENT key: must not create a row
      (6L, 60L, "D", 1L),  // delete...
      (6L, 61L, "I", 2L)   // ...then reinsert later in the same batch
    ).toDF("k", "v", "op", "seq")
    val got = Cdc.applyBatch(base, changes, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 10L, 2L -> 99L, 4L -> 40L, 6L -> 61L))
  }

  test("equal-sequence conflicts resolve by the explicit tie-break") {
    val sp = s
    import sp.implicits._
    val base = Seq((1L, 0L)).toDF("k", "v")
    val changes = Seq(
      (1L, 111L, "U", 5L, 2L), // same seq, higher change id -> wins
      (1L, 222L, "U", 5L, 1L)
    ).toDF("k", "v", "op", "seq", "cid")
    val got = Cdc.applyBatch(base, changes, Seq("k"), tieBreak = Some("cid"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 111L))
  }

  test("multi-column keys and multi-column payloads") {
    val sp = s
    import sp.implicits._
    val base = Seq((1L, "a", 10L, "x"), (1L, "b", 20L, "y"))
      .toDF("k1", "k2", "v", "w")
    val changes = Seq((1L, "b", 21L, "z", "U", 1L))
      .toDF("k1", "k2", "v", "w", "op", "seq")
    val got = Cdc.applyBatch(base, changes, Seq("k1", "k2"))
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getString(3))).toMap
    assert(got == Map((1L, "a") -> ((10L, "x")), (1L, "b") -> ((21L, "z"))))
  }

  test("applyVersioned: replay is a no-op, stale changes cannot resurrect") {
    val sp = s
    import sp.implicits._
    val base = Seq((1L, 10L), (2L, 20L)).toDF("k", "v")
    val st0 = Cdc.bootstrapState(base)
    val b1 = Seq((1L, 11L, "U", 5L), (2L, 0L, "D", 5L)).toDF("k", "v", "op", "seq")
    val st1 = Cdc.applyVersioned(st0, b1, Seq("k"))
    assert(Cdc.snapshotOf(st1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap == Map(1L -> 11L))
    // replay the same batch: state unchanged (strictly-greater rule)
    val st2 = Cdc.applyVersioned(st1, b1, Seq("k"))
    assert(Cdc.snapshotOf(st2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap == Map(1L -> 11L))
    // a STALE update (seq 3 < the delete's 5) must not resurrect key 2
    // (the tombstone carries the delete's sequence)
    val stale = Seq((2L, 99L, "U", 3L)).toDF("k", "v", "op", "seq")
    val st3 = Cdc.applyVersioned(st2, stale, Seq("k"))
    assert(Cdc.snapshotOf(st3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap == Map(1L -> 11L))
    // a NEWER reinsert (seq 7 > 5) does land
    val revive = Seq((2L, 77L, "I", 7L)).toDF("k", "v", "op", "seq")
    val st4 = Cdc.applyVersioned(st3, revive, Seq("k"))
    assert(Cdc.snapshotOf(st4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
      == Map(1L -> 11L, 2L -> 77L))
  }

  test("plan: hash-agg winners, broadcast anti join, no full-outer SMJ") {
    val sp = s
    import sp.implicits._
    val base = Seq((1L, 10L)).toDF("k", "v")
    val changes = Seq((1L, 11L, "U", 1L)).toDF("k", "v", "op", "seq")
    val plan = Cdc.applyBatch(base, changes, Seq("k"))
      .queryExecution.sparkPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("Aggregate") || plan.contains("HashAggregate"), plan)
    // the 100x-scale claim: the base side anti-joins against a BROADCAST
    // winner set — never a full-outer SMJ that would shuffle the base
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      plan)
    assert(!plan.contains("FullOuter"), plan)
  }
}
