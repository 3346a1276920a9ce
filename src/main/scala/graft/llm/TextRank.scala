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
  def textRankKeywords(s: SparkSession, docs: DataFrame, window: Int = 2,
      minCount: Long = 5, iters: Int = 5, k: Int = 20,
      text: String = "text"): DataFrame = {
    import s.implicits._
    require(window >= 1, s"window must be >= 1: $window")
    require(k >= 1, s"k must be >= 1: $k")
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
    val pc = pairs.groupBy("a", "b").agg(count(lit(1)).as("c2"))
      .filter(col("c2") >= minCount)
      .localCheckpoint()
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
    PageRank.weightedPagerank(s, ed, iters = iters)
      .join(vocab.select(col("id").as("node"), col("term")), "node")
      .select(col("term"), col("r").as("rank_fp"))
      .orderBy(desc("rank_fp"), col("term"))
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
      }))
}
