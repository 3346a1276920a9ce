package graft

import org.apache.spark.sql.functions._
import graft.io.Bucketing
import graft.rel.Tables

/** Pins the bucketed co-located join: two tables bucketed by the join
  * key with equal bucket counts must sort-merge join with NO Exchange
  * and NO Sort on either side (the distribution comes from storage).
  * Broadcast is disabled for the assertion — at real scale neither side
  * fits a broadcast anyway.
  */
class BucketedJoinSpec extends SparkSpec {

  test("co-bucketed tables join without exchange or sort") {
    val d = "/root/testdata/sf0.001"
    val o = Tables.orders(spark, d)
    val c = Tables.customer(spark, d)
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS customer_b")
    Bucketing.writeBucketed(o, "orders_b", 8, "o_custkey")
    Bucketing.writeBucketed(c, "customer_b", 8, "c_custkey")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // off by default since 3.0 (planning-time file listing); with one
      // file per bucket (Bucketing's repartition guarantees it) the scan
      // can expose the written sort order and the SMJ's Sorts vanish
      spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      val j = spark.table("orders_b")
        .join(spark.table("customer_b"), col("o_custkey") === col("c_custkey"))
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
      assert(!plan.contains("Sort "), s"bucket sort order must satisfy the SMJ:\n$plan")
      // result parity with the unbucketed join
      assert(j.count() == o.join(c, col("o_custkey") === col("c_custkey")).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.unset("spark.sql.legacy.bucketedTableScan.outputOrdering")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }
}
