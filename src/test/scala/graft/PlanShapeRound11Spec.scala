package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._

/** Plan-shape pins for the round-11 tier's scale claims — the shapes
  * the benches measured, frozen so they can't silently regress:
  *  - the bootstrap's R× expansion collapses by partial aggregation
  *    into ONE shuffle (the 6533× ExperimentBench cut);
  *  - CUPED moments are one shuffle over the unit table;
  *  - query-likelihood prunes postings with a broadcast semi-join on
  *    the query terms (never a corpus-sized join).
  */
class PlanShapeRound11Spec extends SparkSpec {

  private def countEx(p: SparkPlan): Int = {
    val self = p match { case _: ShuffleExchangeLike => 1; case _ => 0 }
    val inner = p match {
      case a: AdaptiveSparkPlanExec => countEx(a.executedPlan)
      case _ => 0
    }
    self + inner + p.children.map(countEx).sum
  }
  private def exchanges(df: DataFrame): Int =
    countEx(df.queryExecution.executedPlan)
  private def planText(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("bootstrap replicate means: one shuffle map-side-combined; the naive shape adds one") {
    val s = spark
    import s.implicits._
    val df = (1L to 200L).map(i => ("g", i, i * 10L)).toDF("grp", "id", "v")
    val combined = graft.rel.Experiment.bootstrapMeans(
      df, "grp", "id", "v", 8)
    assert(exchanges(combined) == 1,
      s"expected 1 exchange, got:\n${planText(combined)}")
    // partial aggregation sits BELOW the exchange: the expanded rows
    // never cross the wire unaggregated
    val txt = planText(combined)
    val exIdx = txt.indexOf("Exchange")
    val partialBelow = txt.indexOf("partial_", exIdx)
    assert(partialBelow > exIdx,
      s"expected a partial aggregate below the exchange:\n$txt")
    // the naive shape also plans one exchange (the agg reuses the
    // repartitioning) — but it is the RAW R×-expanded rows that cross
    // it: the partial aggregate sits on the REDUCE side (above the
    // exchange in the plan text), which is exactly the 6533× shuffle
    // difference ExperimentBench measured
    val naive = graft.rel.Experiment.bootstrapMeans(
      df, "grp", "id", "v", 8, shuffleExpanded = true)
    val ntxt = planText(naive)
    val nEx = ntxt.indexOf("Exchange")
    val nPartial = ntxt.indexOf("partial_")
    assert(nPartial >= 0 && nEx >= 0 && nPartial < nEx,
      s"naive shape should aggregate only after the shuffle:\n$ntxt")
  }

  test("CUPED moments are one shuffle over the unit table") {
    val s = spark
    import s.implicits._
    val units = (1L to 50L).map(i => (i % 2, i, i * 2)).toDF("variant", "x", "y")
    assert(exchanges(graft.rel.Experiment.cupedMoments(units)) == 1)
  }

  test("query-likelihood prunes postings with a broadcast semi-join on query terms") {
    val s = spark
    import s.implicits._
    val docs = (1L to 50L).map(i => (i, s"w$i common join hash"))
      .toDF("doc_id", "text")
    val plan = planText(graft.llm.Ql.qlDirichletTopK(
      s, docs, Seq(0 -> Seq("join", "hash")), k = 3))
    assert(plan.contains("LeftSemi"),
      s"expected a LeftSemi postings prune:\n$plan")
    assert(plan.contains("BroadcastExchange"),
      "query-term and model sides must broadcast")
  }
}
