package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.rel.RelQueries.Q
import graft.rel.Tables

/** Windowed CO-OCCURRENCE / PMI statistics (Church & Hanks, CL 1990 —
  * pointwise mutual information over a ±w token window): the corpus
  * collocation primitive behind phrase mining, word-association
  * features, and embedding-training co-occurrence tables (GloVe's
  * input is exactly this table). PMI(a,b) = ln( p(a,b) / (p(a)·p(b)) )
  * with p(a,b) = c(a,b)/Npairs and p(a) = c(a)/Ntokens.
  *
  * Determinism: pair and unigram counts are exact integers; the one
  * floating step is a single ln of a ratio whose operands are built
  * with an explicitly-ordered chain of double casts and multiplies,
  * identical in the oracle, then rounded to 6 decimals — the q107/q108
  * proven pattern.
  *
  * Scale shape (100 TB): pair generation is a NARROW flatMap over the
  * text column (each position emits ≤ w pairs — linear in corpus
  * length, never quadratic; contrast a position self-join keyed by
  * doc_id, whose candidate space is quadratic in document length and
  * melts on book-length docs). The only wide stages are the two
  * hash-aggregations (pairs, unigrams), both with map-side partial
  * combine; their outputs are vocabulary-bounded, not corpus-bounded,
  * and are materialized once (localCheckpoint) so the totals pass and
  * the join pass don't re-scan the corpus. The final PMI join is keyed
  * by token over the POST-aggregation tables — each key appears once
  * per pair, so hot tokens can't skew it. Totals are single-row
  * broadcasts. Driver state: nothing.
  */
object Cooccur {

  /** (a, b, c2, pmi_r6) for unordered token pairs co-occurring within
    * `window` positions, keeping pairs with count ≥ `minCount`.
    * Pair members are ordered lexicographically (a ≤ b); a token
    * co-occurring with itself is a legal pair (a = b).
    */
  def pmiPairs(s: SparkSession, docs: DataFrame, window: Int = 2,
      minCount: Long = 5, text: String = "text"): DataFrame = {
    import s.implicits._
    require(window >= 1, s"window must be >= 1: $window")
    val w = window
    val pairs = docs.select(col(text)).as[String].flatMap { t =>
      val toks = SketchOps.tokensOf(t).filter(_.nonEmpty)
      for {
        i <- toks.indices.iterator
        o <- (1 to w).iterator
        if i + o < toks.length
      } yield {
        val x = toks(i); val y = toks(i + o)
        if (x <= y) (x, y) else (y, x)
      }
    }.toDF("a", "b")
    val toks = docs.select(col(text)).as[String]
      .flatMap(t => SketchOps.tokensOf(t).filter(_.nonEmpty)).toDF("tok")
    // aggregate once, checkpoint the (vocabulary-bounded) count tables:
    // the totals pass and the join pass both read them without
    // re-scanning the corpus, and lineage doesn't leak into the result
    val pc = pairs.groupBy("a", "b").agg(count(lit(1)).as("c2")).localCheckpoint()
    val uc = toks.groupBy("tok").agg(count(lit(1)).as("c1")).localCheckpoint()
    val np = pc.agg(sum("c2").as("np"))
    val nt = uc.agg(sum("c1").as("nt"))
    pc.filter(col("c2") >= minCount)
      .join(uc.select(col("tok").as("a"), col("c1").as("c1a")), "a")
      .join(uc.select(col("tok").as("b"), col("c1").as("c1b")), "b")
      .crossJoin(np).crossJoin(nt)
      .select(col("a"), col("b"), col("c2"),
        round(log(
          (col("c2").cast("double") * col("nt").cast("double") * col("nt").cast("double")) /
            (col("np").cast("double") * col("c1a").cast("double") * col("c1b").cast("double"))),
          6).as("pmi_r6"))
  }

  /** q130: top-100 collocations of the corpus by PMI among pairs seen
    * ≥ 5 times within a ±2 window. The oracle replays pair generation
    * as two explicit offset lists (i,i+1 and i,i+2), the exact count
    * tables, and the same cast-and-multiply chain inside ln.
    */
  val all: ListMap[String, Q] = ListMap(
    "q130_pmi_cooccur" -> Q(
      (s, d) => pmiPairs(s, Tables.documents(s, d))
        .orderBy(desc("pmi_r6"), col("a"), col("b")).limit(100),
      Some("""WITH t AS (SELECT list_filter(
             |    regexp_split_to_array(trim(lower(text)), '\s+'),
             |    x -> len(x) > 0) AS w FROM documents),
             |p1 AS (SELECT unnest(CASE WHEN len(w) >= 2 THEN
             |    list_transform(range(1, len(w)),
             |      i -> [least(w[i], w[i+1]), greatest(w[i], w[i+1])])
             |    ELSE CAST([] AS VARCHAR[][]) END) AS pr FROM t),
             |p2 AS (SELECT unnest(CASE WHEN len(w) >= 3 THEN
             |    list_transform(range(1, len(w)-1),
             |      i -> [least(w[i], w[i+2]), greatest(w[i], w[i+2])])
             |    ELSE CAST([] AS VARCHAR[][]) END) AS pr FROM t),
             |pr AS (SELECT pr[1] AS a, pr[2] AS b FROM
             |  (SELECT pr FROM p1 UNION ALL SELECT pr FROM p2)),
             |pc AS (SELECT a, b, count(*) AS c2 FROM pr GROUP BY a, b),
             |uc AS (SELECT tok, count(*) AS c1 FROM
             |  (SELECT unnest(w) AS tok FROM t) GROUP BY tok),
             |np AS (SELECT sum(c2) AS np FROM pc),
             |nt AS (SELECT sum(c1) AS nt FROM uc)
             |SELECT a, b, CAST(c2 AS BIGINT) AS c2,
             |  round(ln((CAST(c2 AS DOUBLE) * CAST(nt AS DOUBLE) * CAST(nt AS DOUBLE)) /
             |    (CAST(np AS DOUBLE) * CAST(ua.c1 AS DOUBLE) * CAST(ub.c1 AS DOUBLE))), 6)
             |    AS pmi_r6
             |FROM pc JOIN uc ua ON pc.a = ua.tok JOIN uc ub ON pc.b = ub.tok
             |CROSS JOIN np CROSS JOIN nt
             |WHERE c2 >= 5
             |ORDER BY pmi_r6 DESC, a, b LIMIT 100""".stripMargin)),
  )
}
