package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.rel.RelQueries.Q
import graft.rel.Tables
import graft.rel.GlobalRank

/** SORTED-NEIGHBORHOOD near-dup candidate generation (Hernández &
  * Stolfo 1995) — the third blocking family next to LSH bands (q35)
  * and prefix filtering (q182): sort the corpus by a cheap normalized
  * key and compare each record only to its w−1 successors. Candidate
  * volume is LINEAR (≤ w·n pairs) regardless of how skewed the
  * similarity graph is — the regime where banding floods (a giant
  * boilerplate cluster puts its whole O(c²) pair space in one LSH
  * bucket, while SNM caps it at w·c) and where prefix filtering's
  * token statistics are useless (near-dups that differ only deep in
  * the document sort adjacently on any shared-prefix key).
  *
  * The textbook formulation is the classic Spark scale-killer — a
  * GLOBAL row_number window (one reducer sorts the corpus). This one
  * reuses [[graft.rel.GlobalRank.byOrder]]: range-partitioned sort +
  * per-partition offsets, bit-identical to row_number, every reducer
  * touching ~1/P of the data. Neighborhood pairing is then an
  * EQUI-join on window blocks of size w — each row is duplicated into
  * its own block and the next (one `explode` of a 2-element array),
  * so a row meets at most 2w candidates and the join is
  * hash-partitionable; no window function touches the pair step at
  * all. Verify is pluggable; the q240 entry scores 64-char prefix
  * Levenshtein, which both engines implement identically (unit-cost
  * insert/delete/substitute), keeping the whole pipeline — sort key,
  * ranks, blocks, pairs, scores — an exact SQL replay.
  */
object SortedNeighborhood {

  /** Candidate pairs (id_a, id_b, rk gap) among rows within `w`
    * positions of each other in `sortCols` order (a TOTAL order —
    * append the id). Output ids are the `id` column's values with
    * id_a's rank strictly below id_b's.
    */
  def neighborhoodPairs(df: DataFrame, sortCols: Seq[org.apache.spark.sql.Column],
      id: String, w: Int): DataFrame = {
    require(w >= 2, s"window must be >= 2: $w")
    val ranked = GlobalRank.byOrder(df, sortCols, out = "__snm_rk")
      .withColumn("__snm_blk", floor((col("__snm_rk") - 1) / w))
    val a = ranked.select(col(id).as("id_a"), col("__snm_rk").as("rk_a"),
        explode(array(col("__snm_blk"), col("__snm_blk") + 1)).as("__jb"))
    val b = ranked.select(col(id).as("id_b"), col("__snm_rk").as("rk_b"),
      col("__snm_blk").as("__jb"))
    a.join(b, "__jb")
      .filter(col("rk_b") > col("rk_a") && col("rk_b") - col("rk_a") < w)
      .select(col("id_a"), col("id_b"),
        (col("rk_b") - col("rk_a")).as("rank_gap"))
  }

  /** MULTI-PASS SNM (the Hernández–Stolfo recall fix): one pass per
    * sort key, canonical-pair union — a near-dup pair missed by one
    * key's window (different prefixes, same tail) is caught by
    * another's. Pair volume stays linear: ≤ |keys|·w·n.
    */
  def multiPassPairs(df: DataFrame,
      passes: Seq[Seq[org.apache.spark.sql.Column]], id: String, w: Int)
      : DataFrame = {
    require(passes.nonEmpty, "need at least one pass")
    passes.map(p => neighborhoodPairs(df, p, id, w)
        .select(least(col("id_a"), col("id_b")).as("id_a"),
          greatest(col("id_a"), col("id_b")).as("id_b")))
      .reduce(_ unionAll _)
      .distinct()
  }

  /** q240: SNM near-dup pairs over the documents corpus — sort key =
    * lowercased 32-char prefix (id tie-break), window 10, verified by
    * Levenshtein ≤ 8 on the 64-char prefixes. The oracle replays the
    * exact pipeline with a row_number window — the semantics the
    * scale-safe decomposition is pinned against.
    */
  val all: ListMap[String, Q] = ListMap(
    "q240_sorted_neighborhood" -> Q(
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("doc_id"),
            lower(substring(col("text"), 1, 32)).as("key"),
            lower(substring(col("text"), 1, 64)).as("pfx"))
        val pairs = neighborhoodPairs(docs,
          Seq(col("key"), col("doc_id")), "doc_id", w = 10)
        val withPfx = pairs
          .join(docs.select(col("doc_id").as("id_a"), col("pfx").as("pfx_a")),
            "id_a")
          .join(docs.select(col("doc_id").as("id_b"), col("pfx").as("pfx_b")),
            "id_b")
        withPfx
          .withColumn("lev", levenshtein(col("pfx_a"), col("pfx_b")).cast("long"))
          .filter(col("lev") <= 8)
          .select(col("id_a").cast("long"), col("id_b").cast("long"),
            col("rank_gap").cast("long").as("rank_gap"), col("lev"))
          .orderBy("id_a", "id_b")
      },
      Some("""WITH k AS (
             |  SELECT doc_id, lower(substr(text, 1, 32)) AS key,
             |    lower(substr(text, 1, 64)) AS pfx
             |  FROM documents),
             |r AS (SELECT doc_id, pfx,
             |    row_number() OVER (ORDER BY key, doc_id) AS rk
             |  FROM k),
             |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             |    b.rk - a.rk AS rank_gap,
             |    CAST(levenshtein(a.pfx, b.pfx) AS BIGINT) AS lev
             |  FROM r a JOIN r b
             |    ON b.rk > a.rk AND b.rk - a.rk < 10)
             |SELECT CAST(id_a AS BIGINT) AS id_a,
             |  CAST(id_b AS BIGINT) AS id_b,
             |  CAST(rank_gap AS BIGINT) AS rank_gap, lev
             |FROM p WHERE lev <= 8
             |ORDER BY id_a, id_b""".stripMargin)),

    // ---- q261: MULTI-PASS SNM — prefix pass ∪ reversed-text (suffix)
    //      pass: dup pairs whose edits hit the head sort adjacently in
    //      the second pass and vice versa. Canonical distinct pairs;
    //      oracle replays both windows and the union. ----
    "q261_multipass_snm" -> Q(
      (s, d) => {
        val dd = Tables.documents(s, d).select(col("doc_id"),
          lower(substring(col("text"), 1, 32)).as("k1"),
          substring(reverse(lower(col("text"))), 1, 32).as("k2"))
        multiPassPairs(dd,
          Seq(Seq(col("k1"), col("doc_id")), Seq(col("k2"), col("doc_id"))),
          "doc_id", w = 10)
          .select(col("id_a").cast("long"), col("id_b").cast("long"))
          .orderBy("id_a", "id_b")
      },
      Some("""WITH k AS (
             |  SELECT doc_id, lower(substr(text, 1, 32)) AS k1,
             |    substr(reverse(lower(text)), 1, 32) AS k2
             |  FROM documents),
             |r1 AS (SELECT doc_id,
             |    row_number() OVER (ORDER BY k1, doc_id) AS rk FROM k),
             |r2 AS (SELECT doc_id,
             |    row_number() OVER (ORDER BY k2, doc_id) AS rk FROM k),
             |p AS (
             |  SELECT a.doc_id AS x, b.doc_id AS y FROM r1 a JOIN r1 b
             |    ON b.rk > a.rk AND b.rk - a.rk < 10
             |  UNION
             |  SELECT a.doc_id, b.doc_id FROM r2 a JOIN r2 b
             |    ON b.rk > a.rk AND b.rk - a.rk < 10)
             |SELECT DISTINCT CAST(least(x, y) AS BIGINT) AS id_a,
             |  CAST(greatest(x, y) AS BIGINT) AS id_b
             |FROM p ORDER BY id_a, id_b""".stripMargin))
  )
}
