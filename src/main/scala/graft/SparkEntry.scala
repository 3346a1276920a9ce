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

  private[graft] def allQ =
    RelQueries.all ++ graft.llm.LlmOps.all ++ graft.llm.SketchOps.all ++
      graft.llm.IvfOps.all ++ graft.rel.SqlSurface.all ++
      graft.llm.SketchAggOps.all ++ graft.streaming.StreamingOps.all ++
      graft.llm.PqOps.all ++ graft.llm.IvfPqOps.all ++ graft.llm.ImageOps.all ++
      graft.llm.AnnIndex.all ++ graft.llm.DedupIndex.all ++ graft.llm.OpqOps.all ++
      graft.llm.Bpe.all ++ graft.llm.Curation.all ++ graft.llm.Pack.all ++
      graft.rel.Profile.all ++ graft.llm.Lexical.all ++ graft.llm.Fusion.all ++
      graft.llm.Pca.all ++ graft.rel.FuzzyJoin.all ++ graft.graph.PageRank.all ++
      graft.rel.Scd.all ++ graft.graph.Triangles.all ++ graft.graph.Bfs.all ++
      graft.graph.KCore.all ++ graft.rel.Series.all ++ graft.rel.Encode.all ++
      graft.rel.Funnel.all ++ graft.llm.Cooccur.all ++
      graft.rel.Incremental.all ++ graft.rel.Quality.all ++
      graft.rel.Intervals.all ++ graft.rel.Stats.all ++
      graft.rel.Skyline.all ++ graft.rel.Basket.all ++
      graft.graph.LabelProp.all ++ graft.rel.Cohort.all ++
      graft.rel.Categorical.all ++ graft.graph.Assortativity.all ++
      graft.llm.Phrase.all ++ graft.rel.Summary.all ++
      graft.rel.Finance.all ++ graft.graph.Temporal.all ++
      graft.rel.Maintenance.all ++ graft.rel.Distribution.all ++
      graft.graph.Scc.all ++ graft.rel.ExactDistinct.all ++
      graft.rel.Parity.all ++ graft.rel.Frequency.all ++
      graft.llm.Unigram.all ++ graft.llm.WordPiece.all ++
      graft.llm.Eval.all ++ graft.rel.Cdc.all ++
      graft.graph.ConnectedComponents.all ++ graft.llm.SortedNeighborhood.all ++
      graft.rel.Privacy.all ++ graft.rel.Linkage.all ++
      graft.rel.EntityResolution.all ++ graft.rel.SkewJoin.all ++
      graft.plans.MvQueries.all ++ graft.llm.SqOps.all ++
      graft.rel.Sampling.all ++ graft.plans.FkQueries.all ++
      graft.llm.LangId.all ++ graft.llm.BinaryAnn.all ++
      graft.llm.Chunk.all ++ graft.llm.Mining.all ++ graft.llm.Mmr.all ++
      graft.llm.Outliers.all ++ graft.llm.Pipeline.all ++ graft.llm.Dsir.all ++
      graft.llm.Rm3.all ++ graft.llm.Ql.all ++
      graft.rel.Experiment.all ++ graft.rel.Robust.all ++
      graft.rel.Survival.all ++ graft.rel.Gram.all ++
      graft.llm.Features.all ++ graft.rel.Inference.all ++
      graft.graph.LinkPrediction.all ++ graft.graph.Hits.all ++
      graft.rel.Shapley.all ++ graft.rel.Attribution.all ++
      graft.llm.Decontam.all ++ graft.rel.Preference.all ++
      graft.graph.Anf.all ++ graft.rel.Isotonic.all ++
      graft.rel.Causal.all ++ graft.graph.Truss.all ++
      graft.graph.Modularity.all ++ graft.llm.Trigram.all ++
      graft.llm.Rbo.all ++ graft.rel.Logistic.all ++
      graft.graph.Louvain.all ++ graft.llm.TextStats.all ++
      graft.rel.Raking.all ++ graft.rel.Tree.all ++ graft.rel.SeqMine.all ++
      graft.llm.NaiveBayes.all ++ graft.graph.Betweenness.all ++
      graft.llm.TextRank.all ++ graft.graph.Walks.all ++
      graft.llm.NegSample.all ++ graft.llm.EmbedDrift.all

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQ.map { case (k, q) => k -> q.fn } ++ stitchQueries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (LSH sketches) → driver records a rows-only check. The stitch-core
    * entries have analytically known outputs (partition of unity; the
    * (4/3)^d seam quirk), pinned as literal VALUES.
    */
  def oracleSql: Map[String, String] =
    allQ.collect { case (k, q) if q.sql.isDefined => k -> q.sql.get } ++ stitchOracles

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
        // doubles, not floats: the literal-VALUES oracle must round-trip
        // bit-exactly through the driver's typed hash compare
        .ds.map(b => (b.bi.bx, b.bi.by, b.bi.bz, b.data.min.toDouble, b.data.max.toDouble))
        .toDF("bx", "by", "bz", "minval", "maxval")
        .orderBy("bx", "by", "bz")
    },
    // generic mapOverlap with Reflect boundary: a 3^3 box mean over
    // constant-2.5 tiles must return exactly 2.5 everywhere (reflection
    // of a constant is the constant; 67.5/27 is exact in binary) — pins
    // halo assembly + boundary fill + kernel through the driver gate
    "mapoverlap_reflect_const" -> { (s, _) =>
      import s.implicits._
      val bs = Array(6, 6, 6); val g = Array(2, 2, 2)
      val tiles = for {
        x <- 0 until 2; y <- 0 until 2; z <- 0 until 2
      } yield Block(BlockIndex(x, y, z), 6, 6, 6, 1, Array.fill(216)(2.5f))
      val in = BlockGrid.fromTiles(s, tiles, bs, Array(0, 0, 0), g, 1)
      val out = in.mapOverlap(Array(1, 1, 1), in.meta, graft.core.Boundary.Reflect) { b =>
        val buf = new Array[Float](216)
        var i = 0
        for (x <- 1 to 6; y <- 1 to 6; z <- 1 to 6) {
          var sum = 0.0
          for (dx <- -1 to 1; dy <- -1 to 1; dz <- -1 to 1)
            sum += b.data(((x + dx) * b.ny + (y + dy)) * b.nz + (z + dz))
          buf(i) = (sum / 27.0).toFloat; i += 1
        }
        Block(b.bi, 6, 6, 6, 1, buf)
      }
      out.ds.map(b => (b.bi.bx, b.bi.by, b.bi.bz, b.data.min.toDouble, b.data.max.toDouble))
        .toDF("bx", "by", "bz", "minval", "maxval")
        .orderBy("bx", "by", "bz")
    },
    // position_grid parity (local_affine.py:7-13): per-block coordinate
    // extrema of a cropped 7x9x5 grid in 4^3 blocks — the oracle computes
    // the same extrema by independent SQL arithmetic
    "position_grid" -> { (s, _) =>
      import s.implicits._
      LocalAffine.positionGrid(s, Array(7L, 9L, 5L), Array(4, 4, 4))
        .ds.map { b =>
          def mm(c: Int): (Double, Double) = {
            var mn = Float.MaxValue; var mx = Float.MinValue
            var i = c
            while (i < b.data.length) {
              val v = b.data(i); if (v < mn) mn = v; if (v > mx) mx = v; i += 3
            }
            (mn.toDouble, mx.toDouble)
          }
          val (xm, xx) = mm(0); val (ym, yx) = mm(1); val (zm, zx) = mm(2)
          (b.bi.bx, b.bi.by, b.bi.bz, xm, xx, ym, yx, zm, zx)
        }
        .toDF("bx", "by", "bz", "x_min", "x_max", "y_min", "y_max", "z_min", "z_max")
        .orderBy("bx", "by", "bz")
    },
    // incremental re-stitch SELF-VERIFYING entry: random 4^3 grid with
    // tile (1,2,1) perturbed; restitchBlocks' 27-block neighborhood is
    // compared BIT-FOR-BIT inside the query against a full re-stitch,
    // and the oracle pins that all 27 comparisons hold
    "stitch_restitch_delta" -> { (s, _) =>
      import s.implicits._
      val bs = Array(6, 6, 6); val o = Array(2, 2, 2); val g = Array(4, 4, 4)
      val n = 10
      val tiles = for {
        x <- 0 until 4; y <- 0 until 4; z <- 0 until 4
      } yield {
        val rnd = new scala.util.Random(x * 100 + y * 10 + z)
        val base = Array.fill(n * n * n)(rnd.nextFloat())
        Block(BlockIndex(x, y, z),
          n, n, n, 1,
          if (x == 1 && y == 2 && z == 1) base.map(_ + 1.0f) else base)
      }
      val grid = BlockGrid.fromTiles(s, tiles, bs, o, g, 1)
      val full = Stitch.stitchBlocks(grid).ds.collect()
        .map(b => (b.bi.bx, b.bi.by, b.bi.bz) -> b.data).toMap
      val fullB = s.sparkContext.broadcast(full)
      Stitch.restitchBlocks(grid, Seq(BlockIndex(1, 2, 1)))
        .ds.map { b =>
          (b.bi.bx, b.bi.by, b.bi.bz,
            java.util.Arrays.equals(b.data, fullB.value((b.bi.bx, b.bi.by, b.bi.bz))))
        }
        .toDF("bx", "by", "bz", "bit_identical")
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
          (b.bi.bx, b.bi.by, b.bi.bz, dx.min.toDouble, dx.max.toDouble)
        }
        .toDF("bx", "by", "bz", "dx_min", "dx_max")
        .orderBy("bx", "by", "bz")
    },
    // pyramid level: 2x mean-pool of a 9x6x6 x-coordinate ramp on a
    // cropped (4,3,3) grid — pooling means are exact in fp (integer
    // sums over cells, halves representable), so the oracle pins the
    // CELL GEOMETRY analytically: interior cells average {2o, 2o+1} ->
    // 2o+0.5; the trailing partial x-cell averages the single column 8.
    // Exercises the alignment rechunk (3->2 on y/z), trailing-crop
    // pooling, and the narrow per-block kernel through the driver gate.
    "stitch_pyramid" -> { (s, _) =>
      import s.implicits._
      val sh = Array(9, 6, 6); val bs = Array(4, 3, 3)
      val g = Array.tabulate(3)(ax => (sh(ax) + bs(ax) - 1) / bs(ax))
      val tiles = for {
        bx <- 0 until g(0); by <- 0 until g(1); bz <- 0 until g(2)
      } yield {
        val x0 = bx * bs(0)
        val nx = math.min(bs(0), sh(0) - x0)
        val ny = math.min(bs(1), sh(1) - by * bs(1))
        val nz = math.min(bs(2), sh(2) - bz * bs(2))
        val data = new Array[Float](nx * ny * nz)
        var i = 0
        for (x <- 0 until nx; _ <- 0 until ny; _ <- 0 until nz) {
          data(i) = (x0 + x).toFloat; i += 1
        }
        Block(BlockIndex(bx, by, bz), nx, ny, nz, 1, data)
      }
      val meta = graft.core.GridMeta(sh.map(_.toLong), bs, Array(0, 0, 0), g, 1)
      val grid = BlockGrid(meta, s.createDataset(tiles)(BlockGrid.blockEncoder))
      grid.downsample(Array(2, 2, 2))
        .ds.map(b => (b.bi.bx, b.bi.by, b.bi.bz, b.data.min.toDouble, b.data.max.toDouble))
        .toDF("bx", "by", "bz", "minval", "maxval")
        .orderBy("bx", "by", "bz")
    },
  )

  /** Literal-VALUES oracles for the stitch entries. Values are the
    * analytically known invariants in exact f64-of-f32 form:
    *   - blend of constant-1 tiles = 1.0 everywhere, except seam voxels
    *     where the f32 partition-of-unity sum lands one ulp high
    *     (1 + 2^-23 = 1.0000001192092896);
    *   - merge_neighbors seam weight sums (4/3)^d (stitch quirk,
    *     local_affine.py:73-106): 4/3 -> 1.3333334922790527,
    *     (4/3)^2 -> 1.7777780294418335, (4/3)^3 -> 2.370370626449585
    *     (each the double value of the f32 result).
    * CAST AS DOUBLE: DuckDB parses bare decimal literals as DECIMAL,
    * which hash-mismatches Spark's f64 even when values print equal.
    */
  private def stitchOracles: Map[String, String] = {
    val blendRows = (for {
      x <- 0 until 3; y <- 0 until 3; z <- 0 until 3
    } yield s"($x, $y, $z, 1.0, 1.0000001192092896)").mkString(", ")
    val quirk = Map(0 -> "1.0000001192092896", 1 -> "1.3333334922790527",
      2 -> "1.7777780294418335", 3 -> "2.370370626449585")
    val affRows = (for {
      x <- 0 until 2; y <- 0 until 2; z <- 0 until 2
    } yield s"($x, $y, $z, 1.0, ${quirk(x + y + z)})").mkString(", ")
    val reflectRows = (for {
      x <- 0 until 2; y <- 0 until 2; z <- 0 until 2
    } yield s"($x, $y, $z, 2.5, 2.5)").mkString(", ")
    val restitchRows = (for {
      dx <- -1 to 1; dy <- -1 to 1; dz <- -1 to 1
    } yield s"(${1 + dx}, ${2 + dy}, ${1 + dz}, TRUE)").mkString(", ")
    Map(
      "mapoverlap_reflect_const" ->
        (s"SELECT bx, by, bz, CAST(minval AS DOUBLE) AS minval, CAST(maxval AS DOUBLE) AS maxval " +
          s"FROM (VALUES $reflectRows) AS t(bx, by, bz, minval, maxval) ORDER BY bx, by, bz"),
      // independent arithmetic: block b spans [b*4, min(b*4+4, shape)-1]
      "position_grid" ->
        ("""SELECT CAST(bx AS INT) AS bx, CAST(by AS INT) AS by, CAST(bz AS INT) AS bz,
           |  CAST(bx*4 AS DOUBLE) AS x_min, CAST(least(bx*4+3, 6) AS DOUBLE) AS x_max,
           |  CAST(by*4 AS DOUBLE) AS y_min, CAST(least(by*4+3, 8) AS DOUBLE) AS y_max,
           |  CAST(bz*4 AS DOUBLE) AS z_min, CAST(least(bz*4+3, 4) AS DOUBLE) AS z_max
           |FROM range(2) tx(bx), range(3) ty(by), range(2) tz(bz)
           |ORDER BY bx, by, bz""".stripMargin),
      "stitch_blend_const" ->
        (s"SELECT bx, by, bz, CAST(minval AS DOUBLE) AS minval, CAST(maxval AS DOUBLE) AS maxval " +
          s"FROM (VALUES $blendRows) AS t(bx, by, bz, minval, maxval) ORDER BY bx, by, bz"),
      "stitch_restitch_delta" ->
        (s"SELECT bx, by, bz, bit_identical " +
          s"FROM (VALUES $restitchRows) AS t(bx, by, bz, bit_identical) ORDER BY bx, by, bz"),
      "affine_field_translate" ->
        (s"SELECT bx, by, bz, CAST(dx_min AS DOUBLE) AS dx_min, CAST(dx_max AS DOUBLE) AS dx_max " +
          s"FROM (VALUES $affRows) AS t(bx, by, bz, dx_min, dx_max) ORDER BY bx, by, bz"),
      // pooled x-ramp: block bx holds cells ox in [2bx, min(2bx+2, 5));
      // cell ox < 4 averages {2ox, 2ox+1} -> 2ox + 0.5, cell 4 is the
      // lone column 8 -> per-block min/max = (4bx+0.5, 4bx+2.5) for
      // bx < 2, (8, 8) for the trailing block; y/z don't affect values
      "stitch_pyramid" ->
        ("""SELECT CAST(bx AS INT) AS bx, CAST(by AS INT) AS by, CAST(bz AS INT) AS bz,
           |  CAST(CASE WHEN bx < 2 THEN 4*bx + 0.5 ELSE 8.0 END AS DOUBLE) AS minval,
           |  CAST(CASE WHEN bx < 2 THEN 4*bx + 2.5 ELSE 8.0 END AS DOUBLE) AS maxval
           |FROM range(3) tx(bx), range(3) ty(by), range(3) tz(bz)
           |ORDER BY bx, by, bz""".stripMargin),
    )
  }
}
