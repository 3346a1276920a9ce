package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.rel.GlobalRank

/** GlobalRank — the scale-safe replacement for the unpartitioned
  * `row_number()/ntile()/percent_rank()/cume_dist() OVER (ORDER BY …)`
  * family. Pins: (1) byOrder is bit-identical to the window row_number
  * under a total order, on tied data, ascending and descending, across
  * partition counts (boundary ties must not perturb ranks); (2) each
  * closed-form transform equals its window twin exactly — ntile across
  * remainder shapes (n mod k ≠ 0), percent_rank/cume_dist as IEEE
  * doubles; (3) plan shape — the ranked plan contains NO partition-less
  * sort-window over the input (the single-reducer shape the utility
  * exists to kill): every Window node in the physical plan carries a
  * partition spec.
  */
class GlobalRankSpec extends SparkSpec {

  private def rng(seed: Long): () => Long = {
    var s = seed
    () => { s = s * 6364136223846793005L + 1442695040888963407L; math.abs(s) }
  }

  private def tied(n: Int, mod: Int, seed: Long) = {
    val s = spark
    import s.implicits._
    val r = rng(seed)
    // coarse values → heavy exact ties; id makes the order total
    (0 until n).map(i => (i.toLong, (r() % mod).toInt))
      .toDF("id", "v").repartition(7)
  }

  test("byOrder equals row_number() OVER (ORDER BY v, id) on tied data") {
    val df = tied(5000, 9, 11L)
    val got = GlobalRank.byOrder(df, Seq(col("v"), col("id")), "rk", "n")
    val want = df.withColumn("rk",
      row_number().over(Window.orderBy("v", "id")).cast("long"))
    assert(got.select("id", "rk").except(want.select("id", "rk")).isEmpty)
    assert(want.select("id", "rk").except(got.select("id", "rk")).isEmpty)
    assert(got.select("n").distinct().collect().map(_.getLong(0)).toSeq
      == Seq(5000L))
  }

  test("byOrder with a DESC leading key matches the descending window") {
    val df = tied(3000, 5, 23L)
    val got = GlobalRank.byOrder(
      df, Seq(col("v").desc, col("id")), "rk", "n")
    val want = df.withColumn("rk",
      row_number().over(Window.orderBy(col("v").desc, col("id"))).cast("long"))
    assert(got.select("id", "rk").except(want.select("id", "rk")).isEmpty
      && want.select("id", "rk").except(got.select("id", "rk")).isEmpty)
  }

  test("ntileOf matches ntile() for every remainder shape") {
    for ((n, k) <- Seq((1000, 4), (1001, 4), (1003, 4), (17, 10), (9, 10),
        (40, 7))) {
      val df = tied(n, 6, n * 31L + k)
      val got = GlobalRank.byOrder(df, Seq(col("v"), col("id")), "rk", "nt")
        .select(col("id"),
          GlobalRank.ntileOf(col("rk"), col("nt"), k).as("q"))
      val want = df.select(col("id"),
        ntile(k).over(Window.orderBy("v", "id")).cast("long").as("q"))
      assert(got.except(want).isEmpty && want.except(got).isEmpty,
        s"n=$n k=$k")
    }
  }

  test("percentRankOf / cumeDistOf are IEEE-identical to the windows") {
    val df = tied(2048, 4, 47L)
    val got = GlobalRank.byOrder(df, Seq(col("v"), col("id")), "rk", "nt")
      .select(col("id"),
        GlobalRank.percentRankOf(col("rk"), col("nt")).as("pr"),
        GlobalRank.cumeDistOf(col("rk"), col("nt")).as("cd"))
    val w = Window.orderBy("v", "id")
    // note: with the id tie-break the order is total, so the window's
    // rank/peer-count definitions collapse to the closed forms — the
    // doubles must be bit-equal, hence except() (exact) not tolerance
    val want = df.select(col("id"),
      percent_rank().over(w).as("pr"), cume_dist().over(w).as("cd"))
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("single row: rank 1, percent_rank 0.0, ntile 1") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, 5)).toDF("id", "v")
    val r = GlobalRank.byOrder(df, Seq(col("v"), col("id")), "rk", "n")
      .select(col("rk"), col("n"),
        GlobalRank.ntileOf(col("rk"), col("n"), 4).as("q"),
        GlobalRank.percentRankOf(col("rk"), col("n")).as("pr"),
        GlobalRank.cumeDistOf(col("rk"), col("n")).as("cd"))
      .collect().head
    assert(r.getLong(0) == 1L && r.getLong(1) == 1L && r.getLong(2) == 1L)
    assert(r.getDouble(3) == 0.0 && r.getDouble(4) == 1.0)
  }

  test("one boundary sample: both branches read the checkpointed range " +
      "partitioning, no downstream range exchange") {
    // the histogram and ranking branches MUST observe the same range
    // boundaries; byOrder pins this by local-checkpointing the ranged
    // child, so the fanned-out plan scans one materialized RDD and
    // contains NO range exchange at all (a second range exchange would
    // mean a second, independently-seeded boundary sample — silent rank
    // corruption at scale)
    val df = tied(4000, 6, 77L)
    val qe = GlobalRank.byOrder(df, Seq(col("v"), col("id")), "rk", "n")
      .queryExecution
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.catalyst.plans.physical.RangePartitioning
    val ranges = qe.sparkPlan.collect {
      case e: ShuffleExchangeExec
          if e.outputPartitioning.isInstanceOf[RangePartitioning] => e
    }
    assert(ranges.isEmpty,
      s"range exchange downstream of the checkpoint:\n${qe.sparkPlan}")
    assert(qe.sparkPlan.toString.contains("ExistingRDD"),
      s"ranged child not materialized as an RDD scan:\n${qe.sparkPlan}")
  }

  test("prefixSumByOrder equals the naive global running sum, and " +
      "its plan has no partition-less window") {
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(5)
    val df = (1 to 3000).map(i => (i.toLong, rnd.nextInt(100).toLong - 50))
      .toDF("id", "x")
    val got = GlobalRank.prefixSumByOrder(df, Seq(col("id")), col("x"))
    // naive reference: the very unpartitioned window the utility kills
    val w = org.apache.spark.sql.expressions.Window.orderBy("id")
    val ref = df.select(col("id"),
        sum("x").over(w.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding, 0))
          .as("cum"),
        row_number().over(w).cast("long").as("rk"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val gm = got.collect()
      .map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("cum"), r.getAs[Long]("rk"))).toMap
    assert(gm == ref)
    val tot = got.select("n_total", "sum_total").distinct().collect()
    assert(tot.length == 1 && tot(0).getLong(0) == 3000L)
    // plan: every window carries a partition spec
    val plan = got.queryExecution.sparkPlan
    import org.apache.spark.sql.execution.window.WindowExec
    plan.foreach {
      case we: WindowExec =>
        assert(we.partitionSpec.nonEmpty, s"partition-less window:\n$we")
      case _ =>
    }
  }

  test("plan shape: no partition-less sort-window over the data") {
    val df = tied(1000, 6, 91L)
    // sparkPlan (pre-AQE tree): the adaptive wrapper hides its children
    // from collect(), and AQE never changes window partitioning
    val plan = GlobalRank.byOrder(df, Seq(col("v"), col("id")), "rk", "n")
      .queryExecution.sparkPlan
    import org.apache.spark.sql.execution.window.WindowExec
    val windows = plan.collect { case w: WindowExec => w }
    assert(windows.nonEmpty)
    windows.foreach { w =>
      assert(w.partitionSpec.nonEmpty,
        s"partition-less window in plan: ${w.simpleStringWithNodeId()}")
    }
  }
}
