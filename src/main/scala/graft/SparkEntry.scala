package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Block, BlockGrid, BlockIndex}
import graft.affine.{AffineGrid, LocalAffine}
import graft.rel.RelQueries
import graft.stitch.Stitch

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` spans the relational surface (graft.rel, DuckDB-checkable)
  * plus rows-only entries for the stitch core (not SQL-expressible; the
  * golden suite in src/test is their oracle).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelQueries.all("q05_local_supplier").fn(spark, "/root/testdata/sf0.001")

  private def allQ = RelQueries.all ++ graft.llm.LlmOps.all ++ graft.llm.SketchOps.all

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQ.map { case (k, q) => k -> q.fn } ++ stitchQueries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (stitch core, LSH) → driver records a rows-only check.
    */
  def oracleSql: Map[String, String] =
    allQ.collect { case (k, q) if q.sql.isDefined => k -> q.sql.get }

  /** Stitch-core entries (rows-only): exercise the block-grid engine and
    * surface invariants as queryable rows. Golden parity lives in the
    * test suite (fixtures generated from the reference kernels).
    */
  private def stitchQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // 3x3x3 constant tiles -> every output block must be exactly 1.0
    "stitch_blend_const" -> { (s, _) =>
      import s.implicits._
      val bs = Array(8, 8, 8); val o = Array(2, 2, 2); val g = Array(3, 3, 3)
      val tiles = for {
        x <- 0 until 3; y <- 0 until 3; z <- 0 until 3
      } yield Block(BlockIndex(x, y, z), 12, 12, 12, 1, Array.fill(12 * 12 * 12)(1.0f))
      Stitch.stitchBlocks(BlockGrid.fromTiles(s, tiles, bs, o, g, 1))
        .ds.map(b => (b.bi.bx, b.bi.by, b.bi.bz, b.data.min, b.data.max))
        .toDF("bx", "by", "bz", "minval", "maxval")
        .orderBy("bx", "by", "bz")
    },
    // uniform +1 x-translation -> blended displacement field incl. the
    // reference's (4/3)^d seam quirk; per-block dx extrema as rows
    "affine_field_translate" -> { (s, _) =>
      import s.implicits._
      val m = Array.tabulate(2 * 2 * 2)(_ =>
        Array(1.0, 0, 0, 1.0, 0, 1.0, 0, 0, 0, 0, 1.0, 0, 0, 0, 0, 1.0)).flatten
      val aff = AffineGrid(2, 2, 2, 4, 4, m)
      LocalAffine.localAffinesToField(
          s, Array(12L, 12L, 12L), Array(1f, 1f, 1f), aff, Array(6, 6, 6), Array(2, 2, 2))
        .ds.map { b =>
          val dx = b.data.indices.collect { case i if i % 3 == 0 => b.data(i) }
          (b.bi.bx, b.bi.by, b.bi.bz, dx.min, dx.max)
        }
        .toDF("bx", "by", "bz", "dx_min", "dx_max")
        .orderBy("bx", "by", "bz")
    },
  )
}
