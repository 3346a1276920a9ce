package graft.rel

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.rel.RelQueries.Q
import graft.rel.Tables

/** NORMAL-EQUATIONS GRAM MATRIX — "model training as aggregation", the
  * one-pass pattern behind every closed-form linear fit at cluster
  * scale: X is never materialized or shuffled; the d(d+1)/2 pairwise
  * product sums (plus n) collapse by map-side combine into a single
  * driver-sized row, and the d×d solve happens where d² lives — on the
  * driver. With the TARGET as the last column, one pass yields XᵀX,
  * Xᵀy and yᵀy together; ridge is then (XᵀX + λI)β = Xᵀy
  * ([[ridgeSolveFromGram]]).
  *
  * Exactness: inputs are integer-valued longs under the q290 magnitude
  * cap (per-row products stay exact), sums in DECIMAL(38,0) — the Gram
  * table is EXACT and SQL-replayable; only the driver solve is
  * floating point (spec-pinned on exact-fit fixtures, not
  * driver-gated).
  */
object Gram {

  private val Cap = 3037000499L // sqrt(Long.MaxValue), the q290 rule

  private def guarded(c: Column, name: String): Column =
    when(abs(c) > Cap,
      raise_error(concat(lit(s"gramMatrix: |$name| exceeds exact-product cap: "),
        c.cast("string")))).otherwise(c)

  /** Upper-triangle Gram table over integer-valued columns:
    * one row per 0 ≤ i ≤ j < d with (i, j, n, s = Σ xᵢ·xⱼ, exact).
    */
  def gramMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    val d = cols.size
    require(d >= 1 && d <= 32, s"gramMatrix: d=$d outside [1, 32]")
    val base = df.select(cols.zipWithIndex.map { case (c, i) =>
      guarded(col(c).cast("long"), c).as(s"__g$i")
    }: _*)
    val pairs = for { i <- 0 until d; j <- i until d } yield (i, j)
    val aggs = pairs.map { case (i, j) =>
      sum((col(s"__g$i") * col(s"__g$j")).cast("decimal(38,0)"))
        .as(s"s_${i}_$j")
    }
    val one = base.agg(count(lit(1)).as("n"), aggs: _*)
    val stackExpr = s"stack(${pairs.size}, " + pairs.map { case (i, j) =>
      s"$i, $j, s_${i}_$j"
    }.mkString(", ") + ") AS (i, j, s)"
    one.select(col("n"), expr(stackExpr))
      .select(col("i").cast("int").as("i"), col("j").cast("int").as("j"),
        col("n"), col("s"))
      .orderBy("i", "j")
  }

  /** Ridge solve from a [[gramMatrix]] table whose LAST index is the
    * target y: returns β for (XᵀX + λI)β = Xᵀy with λ =
    * lambdaMilli/1000 (λ is NOT applied to an index the caller marks
    * as intercept via `interceptIdx`). Collects ≤ d(d+1)/2 rows —
    * bounded by d², never by data. Gaussian elimination with partial
    * pivoting on the driver; λ = 0 on an exactly-consistent system
    * recovers the exact coefficients (GramSpec pins it).
    */
  def ridgeSolveFromGram(gram: DataFrame, lambdaMilli: Long,
      interceptIdx: Int = -1): Array[Double] = {
    require(lambdaMilli >= 0, s"lambdaMilli=$lambdaMilli")
    val rows = gram.select("i", "j", "s").collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getDecimal(2).doubleValue()))
      .toMap
    val dAll = rows.keys.map(_._2).max + 1
    require(dAll >= 2, "need at least one feature and the target")
    val d = dAll - 1 // last index is y
    val a = Array.ofDim[Double](d, d + 1)
    for (i <- 0 until d) {
      for (j <- 0 until d)
        a(i)(j) = rows(if (i <= j) (i, j) else (j, i))
      if (i != interceptIdx) a(i)(i) += lambdaMilli / 1000.0
      a(i)(d) = rows((i, d))
    }
    for (p <- 0 until d) {
      val piv = (p until d).maxBy(r => math.abs(a(r)(p)))
      require(math.abs(a(piv)(p)) > 0.0, s"gram matrix singular at column $p")
      val tmp = a(p); a(p) = a(piv); a(piv) = tmp
      for (r <- p + 1 until d) {
        val f = a(r)(p) / a(p)(p)
        for (c <- p to d) a(r)(c) -= f * a(p)(c)
      }
    }
    val beta = new Array[Double](d)
    for (p <- (d - 1) to 0 by -1) {
      var acc = a(p)(d)
      for (c <- p + 1 until d) acc -= a(p)(c) * beta(c)
      beta(p) = acc / a(p)(p)
    }
    beta
  }

  /** PEARSON CORRELATION MATRIX derived from a [[gramMatrix]] table
    * whose index 0 is an all-ones intercept column (so s₀ⱼ = Σxⱼ and
    * the table already carries every first and second moment):
    *
    *   r(i,j) = (n·sᵢⱼ − sᵢ·sⱼ) / (√(n·sᵢᵢ − sᵢ²) · √(n·sⱼⱼ − sⱼ²))
    *
    * — the whole matrix is a few self-joins over the ≤ d(d+1)/2-row
    * gram table; the corpus is never touched again. Zero-variance
    * columns yield null (undefined). Output: (i, j, n, corr_r6) for
    * 1 ≤ i < j.
    */
  def corrFromGram(gram: DataFrame): DataFrame = {
    val g = gram.select(col("i"), col("j"), col("n"),
      col("s").cast("decimal(38,0)").as("s"))
    val off = g.filter(col("i") > 0 && col("j") > col("i"))
      .select(col("i"), col("j"), col("n"), col("s").as("sij"))
    val firsts = g.filter(col("i") === 0 && col("j") > 0)
      .select(col("j").as("k"), col("s").as("sk"))
    val diags = g.filter(col("i") === col("j") && col("i") > 0)
      .select(col("i").as("k"), col("s").as("skk"))
    val joined = off
      .join(firsts.select(col("k").as("i"), col("sk").as("si")), "i")
      .join(firsts.select(col("k").as("j"), col("sk").as("sj")), "j")
      .join(diags.select(col("k").as("i"), col("skk").as("sii")), "i")
      .join(diags.select(col("k").as("j"), col("skk").as("sjj")), "j")
    val nD = col("n").cast("double")
    def d(c: String) = col(c).cast("double")
    val num = (nD * d("sij")) - (d("si") * d("sj"))
    val deni = (nD * d("sii")) - (d("si") * d("si"))
    val denj = (nD * d("sjj")) - (d("sj") * d("sj"))
    joined.select(col("i"), col("j"), col("n"),
      when(deni <= 0.0 || denj <= 0.0, lit(null).cast("double"))
        .otherwise(round(num / (sqrt(deni) * sqrt(denj)), 6)).as("corr_r6"))
      .orderBy("i", "j")
  }

  /** the q301/q308 feature frame: intercept, token count, char count,
    * the q89 model score */
  private def gramDemoFeatures(s: org.apache.spark.sql.SparkSession,
      d: String): DataFrame =
    graft.llm.Curation.scoreQualityModel(s,
      Tables.documents(s, d), graft.llm.Curation.demoWeights(1024))
      .join(Tables.documents(s, d).select(col("doc_id"), col("n_chars")),
        "doc_id")
      .select(lit(1L).as("x0"), col("n_tokens").as("x1"),
        col("n_chars").as("x2"), col("score_sum").as("x3"))

  /** the q301/q308 oracle prelude: the feature frame in SQL */
  private val gramSqlT: String =
    """raw AS (SELECT doc_id, n_chars,
      |    list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
      |      x -> len(x) > 0) AS w
      |  FROM documents),
      |t AS (SELECT 1 AS x0, CAST(len(w) AS BIGINT) AS x1,
      |    CAST(n_chars AS BIGINT) AS x2,
      |    CAST(coalesce(list_sum(list_transform(w, tok ->
      |      ((('0x' || substr(md5(tok), 1, 15))::BIGINT % 1024)
      |        * 2654435761 % 2003) - 1001)), 0) AS BIGINT) AS x3
      |  FROM raw)""".stripMargin

  /** SPEARMAN RANK CORRELATION MATRIX (Spearman 1904, average ranks on
    * ties): ρ = Pearson over the rank transform, computed here as
    * Pearson over DOUBLED average ranks (2·minrank + ties − 1 — an
    * integer, so the gram stays exact; the 2× cancels in r). Ranks
    * come from [[GlobalRank.byOrder]] — the range-partitioned rank
    * decomposition, never an unpartitioned sort window — with
    * per-value min-rank/tie-count joined back on the value. One rank
    * pass per column, one id-keyed join each, then the [[gramMatrix]]
    * → [[corrFromGram]] tail. Output: (i, j, n, rho_r6), i < j
    * indexing `cols` 1-based.
    */
  def spearmanPairs(df: DataFrame, id: String, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2 && cols.size <= 31, s"cols=${cols.size}")
    val base = df.select(col(id).as("__sp_id") +:
      cols.zipWithIndex.map { case (c, k) =>
        col(c).cast("long").as(s"__v$k")
      }: _*).localCheckpoint()
    var acc: DataFrame = base.select(col("__sp_id"))
    cols.indices.foreach { k =>
      val ranked = GlobalRank.byOrder(
        base.select(col("__sp_id"), col(s"__v$k")),
        Seq(col(s"__v$k"), col("__sp_id")), out = "__rk")
      val byVal = ranked.groupBy(col(s"__v$k"))
        .agg(min(col("__rk")).as("__minrk"), count(lit(1)).as("__cnt"))
      val r2 = ranked.join(byVal, s"__v$k")
        .select(col("__sp_id"),
          ((lit(2L) * col("__minrk")) + col("__cnt") - 1).as(s"__r$k"))
      acc = acc.join(r2, "__sp_id")
    }
    val frame = acc.withColumn("__x0", lit(1L))
    corrFromGram(gramMatrix(frame,
      "__x0" +: cols.indices.map(k => s"__r$k")))
      .withColumnRenamed("corr_r6", "rho_r6")
  }

  /** the q308/q309 oracle pair chain: Pearson selects over `xs` */
  private def corrSelectsSql(xs: Int => String, from: String,
      out: String): String = {
    val pairs = Seq((1, 2), (1, 3), (2, 3))
    pairs.map { case (i, j) =>
      val (a, b) = (xs(i), xs(j))
      s"""SELECT $i AS i, $j AS j, count(*) AS n,
         |  CASE WHEN ((CAST(count(*) AS DOUBLE)
         |        * CAST(sum(CAST($a * $a AS HUGEINT)) AS DOUBLE))
         |      - (CAST(sum(CAST($a AS HUGEINT)) AS DOUBLE)
         |        * CAST(sum(CAST($a AS HUGEINT)) AS DOUBLE))) <= 0.0
         |    OR ((CAST(count(*) AS DOUBLE)
         |        * CAST(sum(CAST($b * $b AS HUGEINT)) AS DOUBLE))
         |      - (CAST(sum(CAST($b AS HUGEINT)) AS DOUBLE)
         |        * CAST(sum(CAST($b AS HUGEINT)) AS DOUBLE))) <= 0.0
         |  THEN NULL
         |  ELSE round(((CAST(count(*) AS DOUBLE)
         |      * CAST(sum(CAST($a * $b AS HUGEINT)) AS DOUBLE))
         |    - (CAST(sum(CAST($a AS HUGEINT)) AS DOUBLE)
         |      * CAST(sum(CAST($b AS HUGEINT)) AS DOUBLE)))
         |    / (sqrt((CAST(count(*) AS DOUBLE)
         |        * CAST(sum(CAST($a * $a AS HUGEINT)) AS DOUBLE))
         |      - (CAST(sum(CAST($a AS HUGEINT)) AS DOUBLE)
         |        * CAST(sum(CAST($a AS HUGEINT)) AS DOUBLE)))
         |      * sqrt((CAST(count(*) AS DOUBLE)
         |        * CAST(sum(CAST($b * $b AS HUGEINT)) AS DOUBLE))
         |      - (CAST(sum(CAST($b AS HUGEINT)) AS DOUBLE)
         |        * CAST(sum(CAST($b AS HUGEINT)) AS DOUBLE)))), 6)
         |  END AS $out FROM $from""".stripMargin
    }.mkString("\nUNION ALL\n")
  }

  val all: ListMap[String, Q] = ListMap(
    // ---- q309: SPEARMAN RANK CORRELATION — the robust sibling of
    //      q308 over the same feature pairs: doubled average ranks
    //      (integers, ties handled exactly), then the identical
    //      Pearson chain. Rank windows replay directly in SQL;
    //      Spark's side rides the GlobalRank decomposition. ----
    "q309_spearman" -> Q(
      (s, d) => spearmanPairs(
        graft.llm.Curation.scoreQualityModel(s, Tables.documents(s, d),
            graft.llm.Curation.demoWeights(1024))
          .join(Tables.documents(s, d).select(col("doc_id"), col("n_chars")),
            "doc_id")
          .select(col("doc_id"), col("n_tokens").as("f1"),
            col("n_chars").as("f2"), col("score_sum").as("f3")),
        "doc_id", Seq("f1", "f2", "f3")),
      Some {
        s"""WITH $gramSqlT,
           |r AS (SELECT
           |    (2 * rank() OVER (ORDER BY x1))
           |      + (count(*) OVER (PARTITION BY x1)) - 1 AS r1,
           |    (2 * rank() OVER (ORDER BY x2))
           |      + (count(*) OVER (PARTITION BY x2)) - 1 AS r2,
           |    (2 * rank() OVER (ORDER BY x3))
           |      + (count(*) OVER (PARTITION BY x3)) - 1 AS r3
           |  FROM t)
           |SELECT i, j, n, rho_r6
           |FROM (${corrSelectsSql(k => s"r$k", "r", "rho_r6")})
           |ORDER BY i, j""".stripMargin
      }),

    // ---- q308: PEARSON CORRELATION MATRIX — every feature pair's r
    //      derived from the one-pass gram table (the corpus is touched
    //      once; the matrix is arithmetic over d(d+1)/2 rows). ----
    "q308_corr_matrix" -> Q(
      (s, d) => corrFromGram(
        gramMatrix(gramDemoFeatures(s, d), Seq("x0", "x1", "x2", "x3"))),
      Some {
        s"""WITH $gramSqlT
           |SELECT i, j, n, corr_r6
           |FROM (${corrSelectsSql(k => s"x$k", "t", "corr_r6")})
           |ORDER BY i, j""".stripMargin
      }),

    // ---- q301: NORMAL-EQUATIONS GRAM over documents — intercept,
    //      token count, char count, and the q89 model score as target:
    //      the exact one-pass sufficient statistics for the ridge fit
    //      (the solve itself is driver-side, spec-pinned). ----
    "q301_gram_normal_eq" -> Q(
      (s, d) => gramMatrix(gramDemoFeatures(s, d), Seq("x0", "x1", "x2", "x3"))
        .select(col("i"), col("j"), col("n"), col("s").cast("long").as("s")),
      Some {
        val pairs = for { i <- 0 until 4; j <- i until 4 } yield (i, j)
        val selects = pairs.map { case (i, j) =>
          s"""SELECT $i AS i, $j AS j, count(*) AS n,
             |  CAST(sum(CAST(x$i * x$j AS HUGEINT)) AS BIGINT) AS s FROM t"""
            .stripMargin
        }.mkString("\nUNION ALL\n")
        s"""WITH $gramSqlT
           |SELECT i, j, n, s FROM ($selects)
           |ORDER BY i, j""".stripMargin
      }))
}
