package graft.rel

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.rel.RelQueries.Q

/** FUZZY (APPROXIMATE-STRING) JOIN — record linkage / entity resolution
  * by edit distance: find all pairs within Levenshtein distance ≤ t
  * without ever forming the n² (or |L|·|R|) pair space. The missing
  * dedup modality between exact (q33, hash-equality) and token-set
  * (q34, Jaccard): dirty-entity matching where variants differ by
  * typos, not by token churn ("Acme Corp" vs "Acme Crop").
  *
  * Blocking is the SymSpell deletion-neighborhood scheme (Garbe 2012,
  * public-domain algorithm; same guarantee underlies FastSS,
  * Bocek et al. 2007): every string emits all variants reachable by
  * deleting ≤ t characters (incl. the string itself). COMPLETE for
  * Levenshtein ≤ t — align the ≤ t edit operations: a substitution
  * deletes its position from both sides, an insert/delete deletes the
  * inserted char from one side; after ≤ t deletions per side both
  * strings reach a common variant, so every true pair shares a
  * blocking key. (Unlike q-gram prefix filtering, the guarantee has no
  * short-string escape hatch — "a" vs "b" meet at the 1-deletion
  * variant "".) Candidates are verified with the exact (codegen'd)
  * `levenshtein` before emission, so hash collisions and unrelated
  * neighborhood meets cost work, never correctness.
  *
  * Scale shape (100 TB): per-row fan-out is C(|s|, ≤t) variant keys —
  * bounded by the string length and t, independent of table size — and
  * keys travel as 64-bit xxhash64, never as variant strings (the q34
  * shingle-hash trade: a third of the shuffle bytes; a collision only
  * adds a candidate the verify step rejects). Pair generation is one
  * shuffle keyed by variant hash with the q34 INLINE CAP: a blocking
  * bucket larger than `cap` emits nothing and never buffers more than
  * cap+1 ids, so a pathological key (e.g. the empty string at t ≥
  * max-len) bounds memory instead of exploding; dropped buckets are
  * counted via `observe()` — silent incompleteness is not an option.
  * Verification joins candidate id pairs back to the two string
  * columns (strings move once per CANDIDATE, not once per key) and
  * runs inside whole-stage codegen.
  */
object FuzzyJoin {

  /** All deletion variants of `c` with ≤ maxDist single-character
    * deletions, the string itself included — pure higher-order SQL
    * functions (sequence/transform/flatten), codegen'd, no UDF.
    * maxDist ∈ {1, 2}: t = 1 covers typo-matching; t = 2 is the usual
    * SymSpell serving bound (fan-out is already C(|s|,2)); beyond that
    * deletion neighborhoods stop being the right blocking scheme.
    */
  private[graft] def delVariants(c: Column, maxDist: Int): Column = {
    require(maxDist == 1 || maxDist == 2, s"maxDist must be 1 or 2: $maxDist")
    val len = length(c)
    // drop 0-based position i: prefix [1..i] ++ suffix [i+2..]
    def del1(s: Column, i: Column, l: Column): Column =
      concat(s.substr(lit(1), i), s.substr(i + lit(2), l))
    val d0 = array(c)
    val d1 = when(len >= 1,
        transform(sequence(lit(0), len - 1), i => del1(c, i, len)))
      .otherwise(array())
    if (maxDist == 1) array_distinct(concat(d0, d1))
    else {
      // drop positions i < j (0-based): three-slice concat. Guard the
      // sequence bounds — Spark's sequence(a, b) with a > b generates a
      // DESCENDING range, not an empty one.
      val d2 = when(len >= 2,
          flatten(transform(sequence(lit(0), len - 2), i =>
            transform(sequence(i + lit(1), len - 1), j =>
              concat(c.substr(lit(1), i),
                c.substr(i + lit(2), j - i - lit(1)),
                c.substr(j + lit(2), len))))))
        .otherwise(array())
      array_distinct(concat(d0, d1, d2))
    }
  }

  /** (vh, id): hashed deletion-neighborhood blocking keys of `str`.
    * NULL strings produce no keys (SQL semantics: NULL matches
    * nothing, mirroring the equality-join treatment of NULL keys).
    */
  private def keysOf(df: DataFrame, id: String, str: String,
      maxDist: Int): DataFrame =
    df.filter(col(str).isNotNull)
      .select(col(id).cast("long").as("_id"),
        explode(delVariants(col(str), maxDist)).as("_v"))
      .select(xxhash64(col("_v")).as("vh"), col("_id"))

  /** Self fuzzy-match: all unordered pairs (ida < idb) of rows whose
    * `str` values are within Levenshtein distance ≤ maxDist, plus the
    * exact distance. Output: (ida, idb, dist), one row per pair.
    *
    * `cap` bounds any one blocking bucket (see object doc); buckets
    * over the cap are DROPPED and counted in the observation
    * `<observePrefix>_dropped_buckets` when a prefix is given. With no
    * drops the result is EXACT (the completeness guarantee).
    *
    * Contract: ids must be NON-NEGATIVE longs — the in-flight drop
    * marker is (-1, -1), the same convention as [[graft.llm.Dedup
    * .jaccardPairs]]'s size markers (all the engine's id spaces are
    * parquet surrogate keys ≥ 0).
    */
  def selfPairs(s: SparkSession, df: DataFrame, id: String, str: String,
      maxDist: Int = 1, cap: Int = 10000,
      observePrefix: Option[String] = None): DataFrame = {
    import s.implicits._
    require(cap > 1, s"cap must be > 1: $cap")
    val capL = cap
    // a string can meet ITSELF through several shared variants; ids are
    // distinct per bucket only after the per-bucket sort+dedup below
    val keys = keysOf(df, id, str, maxDist).as[(Long, Long)]
    val rawPairs = keys
      .groupByKey(_._1)
      .flatMapGroups { (_, it) =>
        val buf = new Array[Long](capL + 1)
        var n = 0
        var overflow = false
        while (it.hasNext && !overflow) {
          val v = it.next()._2
          if (n <= capL - 1) { buf(n) = v; n += 1 }
          else overflow = true
        }
        if (overflow) Iterator.single((-1L, -1L)) // drop marker
        else {
          val ids0 = java.util.Arrays.copyOf(buf, n)
          java.util.Arrays.sort(ids0)
          // dedup: the same id may block to one variant through
          // different deletions only pre-array_distinct; ids repeat
          // here only across rows sharing an id value — keep pairs of
          // DISTINCT ids
          val ids = ids0.distinct
          for {
            i <- (0 until ids.length).iterator
            j <- (i + 1 until ids.length).iterator
          } yield (ids(i), ids(j))
        }
      }
      .toDF("ida", "idb")
    val obs = observePrefix.fold(rawPairs)(p =>
      rawPairs.observe(s"${p}_dropped_buckets",
        sum(when(col("ida") === -1L && col("idb") === -1L, 1L).otherwise(0L))
          .as("buckets")))
    val cand = obs.filter(col("ida") =!= -1L).distinct()
    val la = df.select(col(id).cast("long").as("ida"), col(str).as("_sa"))
    val lb = df.select(col(id).cast("long").as("idb"), col(str).as("_sb"))
    cand.join(la, "ida").join(lb, "idb")
      .withColumn("dist", levenshtein(col("_sa"), col("_sb")).cast("long"))
      .filter(col("dist") <= maxDist)
      .select("ida", "idb", "dist")
  }

  /** Cross-table fuzzy join: (lid, rid, dist) for every (left, right)
    * row pair within Levenshtein ≤ maxDist. Same blocking/cap/verify
    * machinery; the per-bucket emission is the L×R cross of the
    * bucket's two sides (each side capped), via the typed cogroup.
    */
  def joinPairs(s: SparkSession, left: DataFrame, lid: String, lstr: String,
      right: DataFrame, rid: String, rstr: String,
      maxDist: Int = 1, cap: Int = 10000,
      observePrefix: Option[String] = None): DataFrame = {
    import s.implicits._
    require(cap > 1, s"cap must be > 1: $cap")
    val capL = cap
    val lk = keysOf(left, lid, lstr, maxDist).as[(Long, Long)].groupByKey(_._1)
    val rk = keysOf(right, rid, rstr, maxDist).as[(Long, Long)].groupByKey(_._1)
    val rawPairs = lk.cogroup(rk) { (_, lit0, rit0) =>
      val lb = new Array[Long](capL + 1); var ln = 0; var lof = false
      while (lit0.hasNext && !lof) {
        val v = lit0.next()._2
        if (ln <= capL - 1) { lb(ln) = v; ln += 1 } else lof = true
      }
      val rb = new Array[Long](capL + 1); var rn = 0; var rof = false
      while (rit0.hasNext && !rof) {
        val v = rit0.next()._2
        if (rn <= capL - 1) { rb(rn) = v; rn += 1 } else rof = true
      }
      if (lof || rof) Iterator.single((-1L, -1L))
      else if (ln == 0 || rn == 0) Iterator.empty
      else {
        val ls = java.util.Arrays.copyOf(lb, ln).distinct
        val rs = java.util.Arrays.copyOf(rb, rn).distinct
        for { a <- ls.iterator; b <- rs.iterator } yield (a, b)
      }
    }.toDF("lid", "rid")
    val obs = observePrefix.fold(rawPairs)(p =>
      rawPairs.observe(s"${p}_dropped_buckets",
        sum(when(col("lid") === -1L && col("rid") === -1L, 1L).otherwise(0L))
          .as("buckets")))
    val cand = obs.filter(col("lid") =!= -1L).distinct()
    val la = left.select(col(lid).cast("long").as("lid"), col(lstr).as("_sa"))
    val rb2 = right.select(col(rid).cast("long").as("rid"), col(rstr).as("_sb"))
    cand.join(la, "lid").join(rb2, "rid")
      .withColumn("dist", levenshtein(col("_sa"), col("_sb")).cast("long"))
      .filter(col("dist") <= maxDist)
      .select("lid", "rid", "dist")
  }

  /** q115: self fuzzy-match of customer names at t = 1. TPC-H names
    * ("Customer#000000042") make a dense typo graph — every pair of
    * keys whose zero-padded numbers differ in one digit position is at
    * distance exactly 1 — so the entry exercises real pair volume
    * (19,500 pairs at sf0.01), and the oracle recomputes the EXACT
    * all-pairs answer (length prefilter, then levenshtein), which is
    * only equal to ours because the deletion-neighborhood blocking is
    * complete and no bucket hits the cap.
    */
  val all: ListMap[String, Q] = ListMap(
    "q115_fuzzy_join" -> Q(
      (s, d) => selfPairs(s, Tables.customer(s, d), "c_custkey", "c_name",
          maxDist = 1, observePrefix = Some("q115"))
        .orderBy("ida", "idb"),
      Some("""SELECT a.c_custkey AS ida, b.c_custkey AS idb,
             |  CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
             |FROM customer a JOIN customer b
             |  ON a.c_custkey < b.c_custkey
             | AND abs(length(a.c_name) - length(b.c_name)) <= 1
             |WHERE levenshtein(a.c_name, b.c_name) <= 1
             |ORDER BY ida, idb""".stripMargin)),
  )
}
