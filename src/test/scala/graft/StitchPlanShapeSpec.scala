package graft

import org.apache.spark.sql.execution.SparkPlan
import graft.core.{Block, BlockGrid, BlockIndex, GridMeta}
import graft.stitch.Stitch

/** Stitch at BLOCK-COUNT scale: the claim that a full-acquisition grid
  * (here 64³ = 262,144 blocks — the task-graph size a 1000-executor
  * cluster stitches) still plans exactly ONE wide shuffle, plus an
  * executed multi-thousand-block run proving the plan is not merely
  * printable. The matching throughput row lives in BASELINE.md
  * (graft.StitchBench `64:8:2`).
  */
class StitchPlanShapeSpec extends SparkSpec {

  /** executor-generated tile grid, as StitchBench builds it — the
    * driver never materializes a block
    */
  private def syntheticGrid(gdim: Int, bsDim: Int, oDim: Int): BlockGrid = {
    val s = spark
    import s.implicits._
    val bs = Array(bsDim, bsDim, bsDim); val o = Array(oDim, oDim, oDim)
    val cs = bsDim + 2 * oDim
    val g = Array(gdim, gdim, gdim)
    val meta = GridMeta(bs.map(_.toLong * gdim), bs, o, g, 1)
    val tiles = s.range(0, meta.numBlocks, 1, 8).map { i =>
      val bi = BlockIndex.fromLinear(i, g)
      val data = new Array[Float](cs * cs * cs)
      var st = i * 6364136223846793005L + 1442695040888963407L
      var j = 0
      while (j < data.length) {
        st = st * 6364136223846793005L + 1442695040888963407L
        data(j) = ((st >>> 40).toInt & 0xffff) / 65536.0f
        j += 1
      }
      Block(bi, cs, cs, cs, 1, data)
    }
    BlockGrid(meta, tiles)
  }

  /** count shuffle exchanges in the rendered plan (AdaptiveSparkPlanExec
    * hides its post-EnsureRequirements tree behind private fields, so the
    * node string — which renders the current physical plan — is the
    * stable way to see them; ReusedExchange references don't match)
    */
  private def shuffleExchanges(p: SparkPlan): Int =
    "(?m)^\\s*\\+?-? ?Exchange ".r.findAllIn(p.toString).length

  test("stitchBlocks on a 64^3-block grid (262,144 blocks) plans exactly ONE shuffle") {
    val plan = Stitch.stitchBlocks(syntheticGrid(64, 8, 2))
      .ds.queryExecution.executedPlan
    assert(shuffleExchanges(plan) == 1, s"plan:\n$plan")
  }

  test("the map_overlap composition keeps the single shuffle at the same block count") {
    val plan = Stitch.stitchBlocksViaMapOverlap(syntheticGrid(64, 8, 2))
      .ds.queryExecution.executedPlan
    assert(shuffleExchanges(plan) == 1, s"plan:\n$plan")
  }

  test("a 16^3-block (4,096) stitch executes: one output block per grid cell") {
    val out = Stitch.stitchBlocks(syntheticGrid(16, 4, 1))
    assert(out.ds.count() == 4096L)
  }
}
