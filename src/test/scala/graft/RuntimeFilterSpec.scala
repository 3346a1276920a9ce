package graft

import org.apache.spark.sql.functions._

/** Catalyst's runtime bloom-filter injection (InjectRuntimeFilter): a
  * selective filter on one join side becomes a bloom filter applied to
  * the OTHER side's scan, pruning shuffle input at runtime — the
  * mechanism that saves the fact-table shuffle when a dim filter is
  * selective at 100 TB. This spec pins that the engine's join shapes are
  * eligible for it (thresholds lowered — the defaults require a 10 GB
  * application side, which no test fixture should have).
  */
class RuntimeFilterSpec extends SparkSpec {

  test("selective dim filter injects a bloom might_contain on the fact scan") {
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      // broadcast joins skip the runtime filter (broadcast already prunes);
      // force a shuffle join so the rewrite has something to save
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val d = "/root/testdata/sf0.01"
      val orders = graft.rel.Tables.orders(spark, d)
      val lineitem = graft.rel.Tables.lineitem(spark, d)
      val joined = lineitem.join(
        orders.filter(col("o_orderpriority") === "1-URGENT"),
        col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain"),
        s"no runtime bloom filter injected:\n$plan")
      // the filtered join still returns the right rows under the rewrite
      val got = joined.count()
      val want = lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
        .filter(col("o_orderpriority") === "1-URGENT").count()
      assert(got == want && got > 0)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
