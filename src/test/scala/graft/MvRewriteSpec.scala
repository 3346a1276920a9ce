package graft

import org.apache.spark.sql.functions._
import graft.plans.MvRegistry

/** MV query rewrite: sound rewrites fire (plan reads the MV, result
  * identical to the base computation), everything else is untouched.
  */
class MvRewriteSpec extends SparkSpec {

  private def scannedPaths(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("coarser-grain SUM + COUNT(*) rewrites to the MV and stays exact") {
    val sp = spark
    import sp.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-mv").toString
    val basePath = s"$work/facts.parquet"
    (1 to 100).map(i => (s"g${i % 5}", s"h${i % 3}", i.toLong))
      .toDF("g", "h", "v").write.mode("overwrite").parquet(basePath)
    val base = sp.read.parquet(basePath)
    MvRegistry.materialize(sp, "mv_facts", base, "/facts.parquet",
      s"$work/mv.parquet", Seq("g", "h"),
      Seq("sum_v" -> (col("v") * 2)), withCount = Some("n"))
    try {
      val q = sp.read.parquet(basePath).groupBy("g")
        .agg(sum(col("v") * 2).as("sv"), count(lit(1)).as("n"))
      val plan = scannedPaths(q)
      assert(plan.contains("mv.parquet"), s"MV not scanned:\n$plan")
      assert(!plan.contains("facts.parquet"), s"base still scanned:\n$plan")
      // exactness vs the directly-computed truth
      val got = q.collect().map(r =>
        r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      val direct = (1 to 100).map(i => (s"g${i % 5}", i.toLong * 2))
        .groupBy(_._1)
        .map { case (g, xs) => g -> (xs.map(_._2).sum, xs.size.toLong) }
      assert(got == direct)
    } finally MvRegistry.unregister("mv_facts")
  }

  test("non-derivable shapes stay on the base: filter, avg, distinct") {
    val sp = spark
    import sp.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-mv2").toString
    val basePath = s"$work/facts.parquet"
    (1 to 50).map(i => (s"g${i % 5}", s"h${i % 3}", i.toLong))
      .toDF("g", "h", "v").write.mode("overwrite").parquet(basePath)
    val base = sp.read.parquet(basePath)
    MvRegistry.materialize(sp, "mv_facts2", base, "/facts.parquet",
      s"$work/mv.parquet", Seq("g", "h"),
      Seq("sum_v" -> col("v")), withCount = Some("n"))
    try {
      val filtered = sp.read.parquet(basePath).filter(col("v") > 10)
        .groupBy("g").agg(sum("v").as("s"))
      assert(scannedPaths(filtered).contains("facts.parquet"))
      val avg = sp.read.parquet(basePath).groupBy("g")
        .agg(org.apache.spark.sql.functions.avg("v").as("a"))
      assert(scannedPaths(avg).contains("facts.parquet"))
      val dist = sp.read.parquet(basePath).groupBy("g")
        .agg(countDistinct("v").as("d"))
      assert(scannedPaths(dist).contains("facts.parquet"))
      // and a sum the MV does not carry
      val other = sp.read.parquet(basePath).groupBy("g")
        .agg(sum(col("v") * 3).as("s3"))
      assert(scannedPaths(other).contains("facts.parquet"))
    } finally MvRegistry.unregister("mv_facts2")
  }

  test("incremental refresh equals a from-scratch rebuild; queries follow") {
    val sp = spark
    import sp.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-mv4").toString
    val basePath = s"$work/facts.parquet"
    val rows0 = (1 to 60).map(i => (s"g${i % 5}", s"h${i % 3}", i.toLong))
    rows0.toDF("g", "h", "v").write.mode("overwrite").parquet(basePath)
    val base = sp.read.parquet(basePath)
    MvRegistry.materialize(sp, "mv_inc", base, "/facts.parquet",
      s"$work/mv0.parquet", Seq("g", "h"),
      Seq("sum_v" -> col("v")), withCount = Some("n"))
    try {
      // append a delta to the base AND fold it into the MV
      val rows1 = (61 to 90).map(i => (s"g${i % 5}", s"h${i % 3}", i.toLong))
      rows1.toDF("g", "h", "v").write.mode("append").parquet(basePath)
      graft.plans.MvMaintenance.refresh(sp, "mv_inc",
        rows1.toDF("g", "h", "v"), Seq("sum_v" -> col("v")),
        s"$work/mv1.parquet")
      // the refreshed MV answers queries over the grown base exactly
      val q = sp.read.parquet(basePath).groupBy("g")
        .agg(sum("v").as("s"), count(lit(1)).as("n"))
      val plan = scannedPaths(q)
      assert(plan.contains("mv1.parquet"), s"refreshed MV not scanned:\n$plan")
      val got = q.collect().map(r =>
        r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      val direct = (rows0 ++ rows1).groupBy(_._1).map { case (g, xs) =>
        g -> (xs.map(_._3).sum, xs.size.toLong) }
      assert(got == direct)
    } finally MvRegistry.unregister("mv_inc")
  }

  test("with nothing registered every plan is untouched") {
    val sp = spark
    import sp.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-mv3").toString
    val basePath = s"$work/facts.parquet"
    (1 to 10).map(i => (s"g${i % 2}", i.toLong)).toDF("g", "v")
      .write.mode("overwrite").parquet(basePath)
    val q = sp.read.parquet(basePath).groupBy("g").agg(sum("v").as("s"))
    assert(scannedPaths(q).contains("facts.parquet"))
  }
}
