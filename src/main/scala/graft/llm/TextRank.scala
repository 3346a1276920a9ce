package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.rel.RelQueries.Q
import graft.rel.{GlobalRank, Tables}
import graft.graph.PageRank

/** TEXTRANK keyword extraction (Mihalcea & Tarau EMNLP'04, "TextRank:
  * Bringing order into text"): terms are nodes, co-occurrence within
  * a ±w token window is an edge weighted by its count, and keyword
  * salience is PageRank over that graph — the unsupervised keyword
  * ranking every corpus-exploration pipeline wants before any model
  * is trained.
  *
  * Built by composition: the q130 windowed pair generation (minus
  * self-pairs — a term adjacent to itself is not a tie), the q146
  * exact-long weighted PageRank (every iteration integer, so the
  * oracle unrolls all five), and [[GlobalRank.byOrder]] for the
  * term → node-id map (a global rank with NO partition-less window).
  *
  * Scale shape: the pair table is one corpus explode + one hash
  * aggregation; the minCount floor bounds the graph exactly like
  * q130's (edges ≤ corpus windows / minCount); ids come from the
  * two-shuffle global rank over the BOUNDED vocabulary; the PageRank
  * rounds move 16-byte rank rows over the once-shuffled cached edge
  * table. Nothing is corpus-quadratic anywhere.
  */
object TextRank {

  /** Top-k corpus keywords. Output: (term, rank_fp), rank_fp in the
    * q116 1e12-mass fixed-point units, ordered (rank_fp desc, term).
    */
  /** Canonical windowed co-occurrence pair counts (a < b, self-pairs
    * dropped): the q130 generation shared by [[textRankKeywords]] and
    * [[spectralTermAxis]].
    */
  private def pairCounts(s: SparkSession, docs: DataFrame, window: Int,
      minCount: Long, text: String): DataFrame = {
    import s.implicits._
    require(window >= 1, s"window must be >= 1: $window")
    val w = window
    val pairs = docs.select(col(text)).as[String].flatMap { t =>
      val toks = SketchOps.tokensOf(t).filter(_.nonEmpty)
      for {
        i <- toks.indices.iterator
        o <- (1 to w).iterator
        if i + o < toks.length
        x = toks(i)
        y = toks(i + o)
        if x != y
      } yield if (x <= y) (x, y) else (y, x)
    }.toDF("a", "b")
    pairs.groupBy("a", "b").agg(count(lit(1)).as("c2"))
      .filter(col("c2") >= minCount)
      .localCheckpoint()
  }

  def textRankKeywords(s: SparkSession, docs: DataFrame, window: Int = 2,
      minCount: Long = 5, iters: Int = 5, k: Int = 20,
      text: String = "text"): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val pc = pairCounts(s, docs, window, minCount, text)
    val vocab = GlobalRank.byOrder(
      pc.select(col("a").as("term"))
        .unionAll(pc.select(col("b").as("term"))).distinct(),
      Seq(col("term")), out = "id")
      .select(col("term"), col("id"))
      .localCheckpoint()
    val e1 = pc
      .join(vocab.select(col("term").as("a"), col("id").as("u")), "a")
      .join(vocab.select(col("term").as("b"), col("id").as("v")), "b")
      .select(col("u"), col("v"), col("c2").as("w"))
    val ed = e1.unionAll(e1.select(col("v").as("u"), col("u").as("v"),
      col("w")))
    // ed = symmetrized union of unique (a < b ⟹ u < v under the
    // order-preserving id map) aggregated pairs — disjoint
    // orientations, one row per (u, v) by construction
    PageRank.weightedPagerank(s, ed, iters = iters, preAggregated = true)
      .join(vocab.select(col("id").as("node"), col("term")), "node")
      .select(col("term"), col("r").as("rank_fp"))
      .orderBy(desc("rank_fp"), col("term"))
      .limit(k)
  }

  private val dec38 =
    org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)

  /** DOMINANT SPECTRAL AXIS of the PPMI term-association matrix —
    * power iteration toward the Perron eigenvector of the positive
    * pointwise-mutual-information graph (the count-based half of the
    * PMI-factorization view of word embeddings, Levy & Goldberg
    * NeurIPS'14, "Neural word embedding as implicit matrix
    * factorization"): the terms loading highest on the axis are the
    * corpus's strongest association cluster — embedding training
    * distilled to its verifiable first component.
    *
    * Determinism: PPMI edge weights quantize to integer micro at
    * build time (one ln per kept pair — np is Σc2 over the KEPT
    * pairs, documented); each matvec is an exact decimal(38,0) sum of
    * w·v products; normalization is max-norm via integer division
    * ((mv·10⁶) div max|mv|) — no sqrt, no float accumulation, every
    * round's vector is integers both engines agree on.
    *
    * Scale shape: the matrix is the minCount-floored pair table
    * (vocabulary-bounded, the q302/q130 lever); each of the fixed
    * rounds is one hash join + one aggregation moving 16-byte vector
    * rows — the q116 iteration cost class, never a dense matrix.
    */
  def spectralTermAxis(s: SparkSession, docs: DataFrame, window: Int = 2,
      minCount: Long = 5, iters: Int = 5, k: Int = 15,
      text: String = "text"): DataFrame = {
    import s.implicits._
    val pc = pairCounts(s, docs, window, minCount, text)
    val toks = docs.select(col(text)).as[String]
      .flatMap(t => SketchOps.tokensOf(t).filter(_.nonEmpty)).toDF("tok")
    val uc = toks.groupBy("tok").agg(count(lit(1)).as("c1"))
      .localCheckpoint()
    ppmiAxis(s, pc, uc, iters, k)
  }

  /** The PPMI + power-iteration core shared by [[spectralTermAxis]]
    * (word co-occurrence) and [[graft.graph.Walks.nodeEmbeddingAxis]]
    * (walk co-visits — the DeepWalk-as-matrix-factorization view, Qiu
    * et al. WSDM'18): `pc` is the canonical pair-count table
    * (a, b, c2), `uc` the occurrence counts (tok, c1); keys may be
    * strings or longs — every expression here is key-type-agnostic.
    */
  private[graft] def ppmiAxis(s: SparkSession, pc: DataFrame,
      uc: DataFrame, iters: Int, k: Int): DataFrame = {
    require(iters >= 1 && iters <= 10, s"1 <= iters <= 10: $iters")
    require(k >= 1, s"k must be >= 1: $k")
    val np = pc.agg(sum("c2").as("np"))
    val nt = uc.agg(sum("c1").as("nt"))
    val ed0 = pc
      .join(uc.select(col("tok").as("a"), col("c1").as("c1a")), "a")
      .join(uc.select(col("tok").as("b"), col("c1").as("c1b")), "b")
      .crossJoin(broadcast(np)).crossJoin(broadcast(nt))
      .select(col("a"), col("b"),
        greatest(lit(0L), round(log(
          (col("c2").cast("double") * col("nt").cast("double")
            * col("nt").cast("double"))
            / (col("np").cast("double") * col("c1a").cast("double")
              * col("c1b").cast("double"))) * lit(1e6), 0).cast("long"))
          .as("w"))
      .filter(col("w") > 0L)
    val ed = ed0.unionAll(ed0.select(col("b").as("a"), col("a").as("b"),
      col("w"))).localCheckpoint()
    var v = ed.select(col("a").as("term")).distinct()
      .withColumn("v", lit(1000000L))
      .localCheckpoint(true)
    for (_ <- 1 to iters) {
      // the matvec is MATERIALIZED before fanning out to the max-
      // normalizer and the score projection (the q316 renorm lesson,
      // r15 opt): left lazy, the checkpoint of `v` evaluated the
      // join + aggregation once in the main stream and once more
      // inside the broadcast max subtree — 2× the matvec per round.
      // `v` itself stays a lazy projection over the checkpointed
      // matvec (its sole per-round consumer is the next join), so the
      // job count per round is unchanged.
      val mv = ed.join(v.withColumnRenamed("term", "b"), "b")
        .groupBy("a").agg(sum((col("w") * col("v")).cast(dec38)).as("mv"))
        .localCheckpoint(true)
      val m = mv.agg(max(abs(col("mv"))).as("mx"))
      v = mv.crossJoin(broadcast(m))
        .select(col("a").as("term"),
          when(col("mx") <= 0, raise_error(lit(
            "spectralTermAxis: zero matvec — empty PPMI graph")))
            .otherwise(expr("(mv * 1000000) div mx")).as("v"))
    }
    v.select(col("term"), col("v").as("v_micro"))
      .orderBy(desc("v_micro"), col("term"))
      .limit(k)
  }

  val all: ListMap[String, Q] = ListMap(
    // ---- q376: TEXTRANK — the 20 most salient corpus keywords from
    //      the ±2-window co-occurrence graph (pairs seen ≥ 5 times),
    //      5 weighted-PageRank rounds. The oracle replays pair
    //      generation (the q130 offset lists), the row_number id map,
    //      and all five exact-integer iterations. ----
    "q376_textrank" -> Q(
      (s, d) => textRankKeywords(s, Tables.documents(s, d)),
      Some {
        val mass = 1000000000000L
        def iter(prev: String, cur: String): String =
          s"""$cur AS (
             |  SELECT d0.u AS node,
             |    (SELECT base FROM consts) +
             |      (85 * coalesce(m.s, 0)) // 100 AS r
             |  FROM deg d0 LEFT JOIN (
             |    SELECT ed.v, CAST(sum(($prev.r * ed.w) // deg.wu) AS BIGINT) AS s
             |    FROM ed JOIN $prev ON ed.u = $prev.node
             |            JOIN deg ON ed.u = deg.u
             |    GROUP BY ed.v) m ON m.v = d0.u)""".stripMargin
        s"""WITH t AS (SELECT list_filter(
           |    regexp_split_to_array(trim(lower(text)), '\\s+'),
           |    x -> len(x) > 0) AS w FROM documents),
           |p1 AS (SELECT unnest(CASE WHEN len(w) >= 2 THEN
           |    list_transform(range(1, len(w)),
           |      i -> [least(w[i], w[i+1]), greatest(w[i], w[i+1])])
           |    ELSE CAST([] AS VARCHAR[][]) END) AS pr FROM t),
           |p2 AS (SELECT unnest(CASE WHEN len(w) >= 3 THEN
           |    list_transform(range(1, len(w)-1),
           |      i -> [least(w[i], w[i+2]), greatest(w[i], w[i+2])])
           |    ELSE CAST([] AS VARCHAR[][]) END) AS pr FROM t),
           |pc AS (SELECT pr[1] AS a, pr[2] AS b, count(*) AS c2 FROM
           |  (SELECT pr FROM p1 UNION ALL SELECT pr FROM p2)
           |  WHERE pr[1] <> pr[2]
           |  GROUP BY a, b HAVING count(*) >= 5),
           |vocab AS (SELECT term, row_number() OVER (ORDER BY term) AS id
           |  FROM (SELECT a AS term FROM pc UNION SELECT b AS term FROM pc)),
           |e1 AS (SELECT va.id AS u, vb.id AS v, pc.c2 AS w
           |  FROM pc JOIN vocab va ON va.term = pc.a
           |          JOIN vocab vb ON vb.term = pc.b),
           |ed AS (SELECT u, v, w FROM e1 UNION ALL SELECT v, u, w FROM e1),
           |deg AS (SELECT u, sum(w) AS wu FROM ed GROUP BY u),
           |consts AS (
           |  SELECT CAST($mass AS BIGINT) // count(*) AS runit,
           |    (CAST($mass AS BIGINT) // count(*)) * 15 // 100 AS base
           |  FROM deg),
           |r0 AS (SELECT u AS node, (SELECT runit FROM consts) AS r FROM deg),
           |${(1 to 5).map(i => iter(s"r${i - 1}", s"r$i")).mkString(",\n")}
           |SELECT vo.term, CAST(r5.r AS BIGINT) AS rank_fp
           |FROM r5 JOIN vocab vo ON vo.id = r5.node
           |ORDER BY rank_fp DESC, term LIMIT 20""".stripMargin
      }),

    // ---- q380: SPECTRAL TERM AXIS — the 15 terms loading highest on
    //      the Perron eigenvector of the micro-quantized PPMI graph,
    //      5 integer power-iteration rounds. The oracle replays pair
    //      generation, the PPMI quantization, and every matvec +
    //      max-norm round. ----
    "q380_spectral_terms" -> Q(
      (s, d) => spectralTermAxis(s, Tables.documents(s, d)),
      Some {
        def iter(prev: String, r: Int): String =
          s"""mv$r AS MATERIALIZED (SELECT ed.a AS term,
             |    sum(CAST(ed.w AS HUGEINT) * v.v) AS mv
             |  FROM ed JOIN $prev v ON v.term = ed.b GROUP BY ed.a),
             |v$r AS MATERIALIZED (SELECT term,
             |    CAST((mv * 1000000) // (SELECT max(abs(mv)) FROM mv$r)
             |      AS BIGINT) AS v
             |  FROM mv$r)""".stripMargin
        s"""WITH t AS (SELECT list_filter(
           |    regexp_split_to_array(trim(lower(text)), '\\s+'),
           |    x -> len(x) > 0) AS w FROM documents),
           |p1 AS (SELECT unnest(CASE WHEN len(w) >= 2 THEN
           |    list_transform(range(1, len(w)),
           |      i -> [least(w[i], w[i+1]), greatest(w[i], w[i+1])])
           |    ELSE CAST([] AS VARCHAR[][]) END) AS pr FROM t),
           |p2 AS (SELECT unnest(CASE WHEN len(w) >= 3 THEN
           |    list_transform(range(1, len(w)-1),
           |      i -> [least(w[i], w[i+2]), greatest(w[i], w[i+2])])
           |    ELSE CAST([] AS VARCHAR[][]) END) AS pr FROM t),
           |pc AS (SELECT pr[1] AS a, pr[2] AS b, count(*) AS c2 FROM
           |  (SELECT pr FROM p1 UNION ALL SELECT pr FROM p2)
           |  WHERE pr[1] <> pr[2]
           |  GROUP BY a, b HAVING count(*) >= 5),
           |uc AS (SELECT tok, count(*) AS c1 FROM
           |  (SELECT unnest(w) AS tok FROM t) GROUP BY tok),
           |np AS (SELECT sum(c2) AS np FROM pc),
           |nt AS (SELECT sum(c1) AS nt FROM uc),
           |ed0 AS (SELECT pc.a, pc.b,
           |    greatest(CAST(0 AS BIGINT), CAST(round(ln(
           |      (CAST(pc.c2 AS DOUBLE) * CAST(nt.nt AS DOUBLE)
           |        * CAST(nt.nt AS DOUBLE))
           |      / (CAST(np.np AS DOUBLE) * CAST(ua.c1 AS DOUBLE)
           |        * CAST(ub.c1 AS DOUBLE))) * 1e6, 0) AS BIGINT)) AS w
           |  FROM pc JOIN uc ua ON ua.tok = pc.a
           |          JOIN uc ub ON ub.tok = pc.b
           |  CROSS JOIN np CROSS JOIN nt),
           |ed AS MATERIALIZED (SELECT a, b, w FROM ed0 WHERE w > 0
           |  UNION ALL SELECT b, a, w FROM ed0 WHERE w > 0),
           |v0 AS (SELECT DISTINCT a AS term, CAST(1000000 AS BIGINT) AS v
           |  FROM ed),
           |${(1 to 5).map(r => iter(s"v${r - 1}", r)).mkString(",\n")}
           |SELECT term, v AS v_micro FROM v5
           |ORDER BY v_micro DESC, term LIMIT 15""".stripMargin
      }))
}
