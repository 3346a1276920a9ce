package graft.llm

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import scala.util.hashing.MurmurHash3
import graft.rel.RelQueries.Q
import graft.rel.Tables

/** Sketch-based near-dup / ANN operators (MinHash+LSH, SimHash,
  * random-hyperplane ANN) and the multimodal binary-column plumbing.
  * The sketch kernels are not SQL-expressible, but their ENTRIES are
  * oracle-checked as self-consistency against exact ground truth DuckDB
  * can compute: q35/q36 assert coverage of q34's exact top-Jaccard
  * pairs, q38_recall pins per-query hit counts vs q37-style exact kNN.
  * All outcomes are deterministic (seeded hash families, fixed data).
  *
  * All randomness is derived from splitmix64 over fixed seeds, so every
  * run (and every executor) sees identical hash families.
  *
  * Scale notes: signatures are narrow per-row kernels; candidate
  * generation shuffles only (band, bucket) keys — the full O(n²) pair
  * space is never materialized. At 100 TB the band tables are the only
  * shuffled data (k longs per doc), and bucket joins are standard hash
  * joins AQE can skew-split.
  */
object SketchOps {

  // ---- deterministic hash families ----------------------------------
  private[graft] def splitmix64(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private val MersennePrime = (1L << 61) - 1
  private val NumPerms = 64
  private val Bands = 16 // 16 bands x 4 rows

  private lazy val permA: Array[Long] =
    Array.tabulate(NumPerms)(i => (splitmix64(2 * i + 1) & Long.MaxValue) % (MersennePrime - 1) + 1)
  private lazy val permB: Array[Long] =
    Array.tabulate(NumPerms)(i => (splitmix64(2 * i + 2) & Long.MaxValue) % MersennePrime)

  private[graft] def tokensOf(text: String): Array[String] =
    text.trim.toLowerCase.split("\\s+")

  private[graft] def shinglesOf(toks: Array[String]): Array[Long] = {
    if (toks.length < 3) return Array.empty
    val out = new Array[Long](toks.length - 2)
    var i = 0
    while (i < toks.length - 2) {
      val s = toks(i) + " " + toks(i + 1) + " " + toks(i + 2)
      out(i) = MurmurHash3.stringHash(s).toLong & 0xffffffffL
      i += 1
    }
    out.distinct
  }

  /** 64-bit FNV-1a over a 3-gram's tokens (space-separated, but no
    * string ever built): exact-Jaccard pair generation shuffles these
    * longs instead of shingle strings — ~3× fewer shuffle bytes, long
    * instead of string compares in the shuffle sort, and no per-shingle
    * allocation. 64 bits keeps the collision expectation ~5e-9 per
    * distinct-shingle pair (≈1e-8 corpus-wide at 10⁶ shingles); a
    * collision would flip the q34/q49/q60 string-computed oracles red,
    * so the hash-green gate itself certifies collision-freedom on a
    * given corpus.
    */
  private[graft] def shingles64Of(toks: Array[String]): Array[Long] = {
    if (toks.length < 3) return Array.empty
    val out = new Array[Long](toks.length - 2)
    var i = 0
    while (i < toks.length - 2) {
      var h = 0xcbf29ce484222325L
      var g = 0
      while (g < 3) {
        val t = toks(i + g)
        var c = 0
        while (c < t.length) { h = (h ^ t.charAt(c)) * 0x100000001b3L; c += 1 }
        if (g < 2) h = (h ^ ' ') * 0x100000001b3L
        g += 1
      }
      out(i) = h
      i += 1
    }
    out.distinct
  }

  /** MinHash signature: sig(i) = min over shingles of (a_i*x + b_i) mod p */
  private[graft] def minhash(sh: Array[Long]): Array[Long] = {
    val sig = Array.fill(NumPerms)(Long.MaxValue)
    var j = 0
    while (j < sh.length) {
      val x = sh(j)
      var i = 0
      while (i < NumPerms) {
        // 61-bit Mersenne modular mulAdd without overflow (Math.multiplyHigh)
        val hi = Math.multiplyHigh(permA(i), x)
        val lo = permA(i) * x
        // fold 128-bit product mod 2^61-1: (lo mod) + 8*hi (since 2^64 = 8 mod p)
        var m = (lo & MersennePrime) + (lo >>> 61) + ((hi << 3) & MersennePrime) + (hi >>> 58) + permB(i)
        while (m >= MersennePrime) m -= MersennePrime
        if (m < sig(i)) sig(i) = m
        i += 1
      }
      j += 1
    }
    sig
  }

  private[graft] def bandHashes(sig: Array[Long]): Array[Long] = {
    val r = NumPerms / Bands
    Array.tabulate(Bands) { b =>
      var h = 1125899906842597L
      var i = b * r
      while (i < (b + 1) * r) { h = h * 31 + sig(i); i += 1 }
      h
    }
  }

  // ---- random-hyperplane LSH family (shared by q38 ANN and q41's
  // near-dup blocking key). 8 independent tables of 4 planes each:
  // for a pair at angle θ, P[same bucket in one table] = (1-θ/π)^4 and
  // P[collide in ≥1 of 8 tables] = 1-(1-(1-θ/π)^4)^8 — ≈0.83 at cos 0.5,
  // ≈0.998 at cos 0.9, →1 as cos→1. Few planes per table + many tables
  // trades candidate volume for recall; measured on this corpus
  // (near-uniform embeddings, top-5 cos ≈ 0.3) recall@5 = 0.875
  // (pinned ≥ 0.8 by AnnRecallSpec + the q38_recall driver entry). ----
  private[llm] val AnnDim = 64
  private[llm] val AnnTables = 8
  private[llm] val AnnPlanes = 4

  /** deterministic hyperplanes, uniform [-1,1]; table 0 reproduces the
    * single-table family this op shipped with (seed p*1009+j) */
  private lazy val annHp: Array[Array[Array[Double]]] =
    Array.tabulate(AnnTables, AnnPlanes, AnnDim) { (t, p, j) =>
      splitmix64((t * 131L + p) * 1009L + j).toDouble / Long.MaxValue
    }

  /** per-table bucket signatures (AnnPlanes sign bits each) of one vector */
  private[llm] def annSigs(emb: Seq[Float]): Array[Int] = {
    val out = new Array[Int](AnnTables)
    var t = 0
    while (t < AnnTables) {
      var sig = 0
      var p = 0
      while (p < AnnPlanes) {
        var dot = 0.0
        var j = 0
        while (j < AnnDim) { dot += annHp(t)(p)(j) * emb(j); j += 1 }
        if (dot > 0) sig |= (1 << p)
        p += 1
      }
      out(t) = sig
      t += 1
    }
    out
  }

  /** 64-bit SimHash over token hashes */
  private[llm] def simhash64(toks: Array[String]): Long = {
    val acc = new Array[Int](64)
    var i = 0
    while (i < toks.length) {
      val h = splitmix64(MurmurHash3.stringHash(toks(i)).toLong)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (acc(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** number of ANN probe queries (vec_id < AnnQueries) */
  private val AnnQueries = 8

  /** q38 core: approximate top-5 per query via multi-table union-probe +
    * exact cosine re-rank of the candidate set. Shared with q38_recall.
    */
  private def annTop5(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])]
      .map { case (id, v) => (id, annSigs(v), v) }
      .toDF("vec_id", "sigs", "embedding")
      .cache() // signature kernel feeds the probe join AND the re-rank join
    val flat = e.select(col("vec_id"), posexplode(col("sigs")).as(Seq("t", "bucket")))
    val probes = flat.filter(col("vec_id") < AnnQueries)
      .select(col("vec_id").as("qid"), col("t"), col("bucket"))
    // union-probe: a vector is a candidate if it collides in ANY table;
    // distinct collapses multi-table collisions before the re-rank
    val cand = broadcast(probes).join(flat, Seq("t", "bucket"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id")).distinct()
    val q = e.filter(col("vec_id") < AnnQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val nc = cand.groupBy("qid").agg(count(lit(1)).as("n_candidates"))
    val scored = cand.join(e.select(col("vec_id"), col("embedding")), "vec_id")
      .join(broadcast(q), "qid")
      .withColumn("cos",
        graft.functions.VecFunctions.vecCosine(s, col("qv"), col("embedding")))
    graft.functions.TopK.perKeyTopK(scored, 5, "qid", "vec_id", "cos")
      .join(broadcast(nc), "qid")
      .select(col("qid"), col("rn"), col("vec_id").as("nn_id"), col("cos"),
        col("n_candidates"))
      .orderBy("qid", "rn")
  }

  /** exact brute-force cosine top-5 for the same AnnQueries queries — the
    * ground truth side of q38_recall (q37's shape, widened to 8 queries)
    */
  private[llm] def exactTop5(s: SparkSession, d: String): DataFrame = {
    // every caller is a recall entry whose oracle pins VALUES measured
    // on sf0.01 — fail loud on any other fixture instead of hash-red
    Tables.requirePinnedFixture(s, d, "embeddings", Tables.Sf001EmbeddingsFp,
      "this pinned-recall entry (q38/q47/q55/q56/q65/q69/q78/q84)")
    val e = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    val q = e.filter(col("vec_id") < AnnQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val scored = broadcast(q).join(e, col("vec_id") =!= col("qid"))
      .withColumn("cos",
        graft.functions.VecFunctions.vecCosine(s, col("qv"), col("embedding")))
    graft.functions.TopK.perKeyTopK(scored, 5, "qid", "vec_id", "cos")
      .select(col("qid"), col("vec_id"))
  }

  /** q34's top-20 exact n-gram Jaccard pairs (all jac ≥ 0.966 on this
    * corpus) — the ground-truth near-dups the sketch entries must find.
    * Reusing the q34 builder/SQL keeps both sides in lockstep.
    */
  private def nearDupPairs(s: SparkSession, d: String): DataFrame =
    LlmOps.all("q34_ngram_jaccard").fn(s, d).select("da", "db")

  private def nearDupPairsSql: String =
    LlmOps.all("q34_ngram_jaccard").sql.get

  // ---- multimodal decode kernels (q40/q40b) --------------------------

  /** blobs(doc_id, wav) → per-blob PCM features through the strict
    * [[graft.io.Wav]] parser. The mapPartitions boundary is where a
    * real pipeline initializes its codec once per partition.
    */
  private[llm] def decodeWavFeatures(s: SparkSession, blobs: DataFrame): DataFrame = {
    import s.implicits._
    blobs.as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition decode boundary: codec state would init here
        it.map { case (id, bytes) =>
          val p = graft.io.Wav.parse(bytes)
          var sum = 0L
          var peak = 0
          p.samples.foreach { v => sum += v; if (v > peak) peak = v }
          (id, p.sampleRate, p.bitsPerSample, p.samples.length.toLong, sum, peak)
        }
      }
      .toDF("doc_id", "sample_rate", "bits", "n_samples", "sample_sum", "peak")
  }

  /** QUARANTINE decode: the strict parser's failures become counted
    * rows instead of a failed job — what the decode boundary actually
    * does over 100 TB of crawled blobs, where some fraction IS
    * malformed and "skip and count" beats both crashing and silent
    * garbage. (ok, sample_sum) per blob; bad blobs carry ok=false and
    * the failure stays observable in the output instead of a log.
    */
  private[llm] def decodeWavLenient(s: SparkSession, blobs: DataFrame): DataFrame = {
    import s.implicits._
    blobs.as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          try {
            val p = graft.io.Wav.parse(bytes)
            var sum = 0L
            p.samples.foreach(sum += _)
            (id, true, sum)
          } catch {
            case _: IllegalArgumentException => (id, false, 0L)
          }
        }
      }
      .toDF("doc_id", "ok", "sample_sum")
  }

  /** 8-bit path: each text's UTF-8 bytes as unsigned 8-bit PCM. The
    * DuckDB oracle recomputes the features with CHARACTER arithmetic
    * (len/unicode), exact only while bytes = codepoints — i.e. pure
    * ASCII — so this path guards that assumption loudly instead of
    * going silently red on a non-ASCII corpus. [[multimodalDecode16]]
    * is the non-ASCII-safe variant (codepoint samples).
    */
  def multimodalDecode8(s: SparkSession, docs: DataFrame): DataFrame = {
    import s.implicits._
    val nonAscii = docs
      .filter(octet_length(col("text")) =!= length(col("text"))).count()
    require(nonAscii == 0L,
      s"the 8-bit oracle equates UTF-8 bytes with codepoints; corpus has " +
        s"$nonAscii non-ASCII docs — use the 16-bit codepoint path (q40b)")
    val blobs = docs
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("raw"))
      .as[(Long, Array[Byte])]
      .map { case (id, b) => (id, graft.io.Wav.build8(16000, b)) }
      .toDF("doc_id", "wav")
    decodeWavFeatures(s, blobs)
      .join(docs.select(col("doc_id"), col("source")), "doc_id")
      .orderBy("doc_id")
  }

  /** 16-bit path: each text's Unicode CODEPOINTS as signed 16-bit PCM
    * samples (exact for any text ≤ U+7FFF — fails loud past that
    * rather than aliasing). Exercises the signed-sample parse branch
    * under the driver oracle, and its character-arithmetic oracle stays
    * exact for non-ASCII corpora (unlike the byte-based 8-bit path).
    */
  def multimodalDecode16(s: SparkSession, docs: DataFrame): DataFrame = {
    import s.implicits._
    val blobs = docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, t) =>
        val cps = t.codePoints().toArray
        cps.foreach { cp =>
          require(cp <= 0x7fff,
            s"doc $id has codepoint U+${cp.toHexString.toUpperCase} > U+7FFF — " +
              "does not fit signed 16-bit PCM")
        }
        (id, graft.io.Wav.build16(16000, cps.map(_.toShort)))
      }
      .toDF("doc_id", "wav")
    decodeWavFeatures(s, blobs)
      .join(docs.select(col("doc_id"), col("source")), "doc_id")
      .orderBy("doc_id")
  }

  val all: ListMap[String, Q] = ListMap(
    // ---- q424: MINHASH ESTIMATOR ERROR AUDIT — for every exact
    //      near-dup pair (jac ≥ 0.8), the 64-permutation signature
    //      match fraction must sit within 250 milli of the exact
    //      Jaccard (≈6σ at 64 perms; the hash family is seeded, so
    //      the outcome is a deterministic fact of this corpus). The
    //      estimator drifting past tolerance — a broken permutation,
    //      a signature truncation — goes red. Oracle = the exact
    //      pair list (string shingles) + the pinned TRUE claim. ----
    "q424_minhash_error_audit" -> Q(
      (s, d) => {
        import s.implicits._
        val sig = Tables.documents(s, d)
          .select(col("doc_id"), col("text")).as[(Long, String)]
          .flatMap { case (id, text) =>
            val sh = shinglesOf(tokensOf(text))
            if (sh.isEmpty) None else Some((id, minhash(sh)))
          }.toDF("doc_id", "sig")
        val exact = graft.llm.Dedup.jaccardPairs(s,
            Tables.documents(s, d).select(col("doc_id").as("id"), col("text")),
            minJaccard = 0.8)
          .select(col("ida").as("da"), col("idb").as("db"),
            round(col("jac") * 1000, 0).cast("long").as("jac_milli"))
        exact
          .join(sig.select(col("doc_id").as("da"), col("sig").as("sa")), "da")
          .join(sig.select(col("doc_id").as("db"), col("sig").as("sb")), "db")
          .withColumn("est_milli", expr(
            "(aggregate(zip_with(sa, sb, (x, y) -> IF(x = y, 1, 0)), 0, " +
              "(acc, v) -> acc + v) * 1000) div 64").cast("long"))
          .select(col("da"), col("db"), col("jac_milli"),
            (abs(col("est_milli") - col("jac_milli")) <= 250L)
              .as("est_within_250"))
          .orderBy("da", "db")
      },
      Some(s"""WITH ${LlmOps.pairOracleCtesPublic()},
             |pj AS (SELECT da, db,
             |    CAST(inter AS DOUBLE) / (za.n + zb.n - inter) AS jac
             |  FROM i JOIN z za ON i.da = za.doc_id
             |  JOIN z zb ON i.db = zb.doc_id)
             |SELECT da, db,
             |  CAST(round(jac * 1000) AS BIGINT) AS jac_milli,
             |  TRUE AS est_within_250
             |FROM pj WHERE jac >= 0.8 ORDER BY da, db""".stripMargin)),

    // ---- MinHash + LSH banding, oracle-checked as self-consistency:
    //      every exact top-20 Jaccard pair (jac ≥ 0.966) MUST surface in
    //      the band-bucket candidate join — at 16 bands × 4 rows the miss
    //      probability of a 0.97-Jaccard pair is (1-0.97^4)^16 ≈ 1e-14,
    //      and the hash family is seeded, so the outcome is
    //      deterministic. The oracle recomputes the pair list with q34's
    //      SQL and asserts coverage. ----
    "q35_minhash_lsh" -> Q(
      (s, d) => {
        import s.implicits._
        // shingle-less docs (<3 tokens) emit no bands — their identical
        // all-MaxValue signatures would otherwise clique every short doc
        val sig = Tables.documents(s, d)
          .select(col("doc_id"), col("text")).as[(Long, String)]
          .flatMap { case (id, text) =>
            val sh = shinglesOf(tokensOf(text))
            if (sh.isEmpty) None else Some((id, bandHashes(minhash(sh))))
          }
          .toDF("doc_id", "bands")
        val bandRows = sig.select(col("doc_id"), posexplode(col("bands")).as(Seq("band", "bh")))
        val cands = bandRows.as("a").join(bandRows.as("b"),
            col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
              col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("da"), col("b.doc_id").as("db")).distinct()
        nearDupPairs(s, d)
          .join(cands.withColumn("hit", lit(true)), Seq("da", "db"), "left")
          .select(col("da"), col("db"), coalesce(col("hit"), lit(false)).as("lsh_candidate"))
          .orderBy("da", "db")
      },
      Some(s"SELECT da, db, TRUE AS lsh_candidate FROM ($nearDupPairsSql) t ORDER BY da, db")),

    // ---- SimHash near-dup, oracle-checked on the same ground truth:
    //      every top-20 pair sits within hamming 16 of its twin
    //      (measured max on this corpus: 6), and the 4×16-bit band join
    //      finds every pair EXCEPT (120,332) — hamming 5 spread 2+1+1+1
    //      across the four bands, the canonical single-probe banding
    //      blind spot, pinned here deliberately (it is why q38 probes
    //      multiple tables). ----
    "q36_simhash" -> Q(
      (s, d) => {
        import s.implicits._
        val sig = Tables.documents(s, d)
          .select(col("doc_id"), col("text")).as[(Long, String)]
          .map { case (id, text) => (id, simhash64(tokensOf(text))) }
          .toDF("doc_id", "sim")
          .cache() // reused by the band self-join and the pair join
        // candidates share one of four 16-bit bands
        val bands = sig.select(col("doc_id"),
          explode(array((0 until 4).map(b =>
            struct(lit(b).as("band"),
              shiftrightunsigned(col("sim"), b * 16).bitwiseAND(lit(0xffffL)).as("bh"))): _*)).as("e"))
          .select(col("doc_id"), col("e.band"), col("e.bh"))
        val cands = bands.as("a").join(bands.as("b"),
            col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
              col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("da"), col("b.doc_id").as("db")).distinct()
        nearDupPairs(s, d)
          .join(sig.select(col("doc_id").as("da"), col("sim").as("sa")), "da")
          .join(sig.select(col("doc_id").as("db"), col("sim").as("sb")), "db")
          .join(cands.withColumn("bc", lit(true)), Seq("da", "db"), "left")
          .select(col("da"), col("db"),
            (bit_count(col("sa").bitwiseXOR(col("sb"))) <= 16).as("simhash_near"),
            coalesce(col("bc"), lit(false)).as("band_candidate"))
          .orderBy("da", "db")
      },
      Some(s"""SELECT da, db, TRUE AS simhash_near,
             |  NOT (da = 120 AND db = 332) AS band_candidate
             |FROM ($nearDupPairsSql) t ORDER BY da, db""".stripMargin)),

    // ---- ANN: multi-table random-hyperplane LSH with union-probe.
    //      Candidates = vectors sharing the query's bucket in ANY of the
    //      8 tables; exact cosine re-rank of candidates only. The scan
    //      side explodes to n×8 (t, bucket) rows; the probe side is a
    //      broadcast of the few query buckets — shuffle volume is the
    //      candidate set, never the n² pair space. ----
    "q38_knn_lsh" -> Q((s, d) => AnnPin.pinnable(s, d, annTop5(s, d), "q38_knn_lsh"),
      Some("""SELECT qid, rn, nn_id, cos_milli, n_candidates FROM (VALUES
             |  (0, 1, 365, 370, 233), (0, 2, 334, 363, 233),
             |  (0, 3, 387, 331, 233), (0, 4, 423, 297, 233),
             |  (0, 5, 73, 295, 233), (1, 1, 386, 371, 195),
             |  (1, 2, 407, 327, 195), (1, 3, 195, 323, 195),
             |  (1, 4, 64, 316, 195), (1, 5, 124, 303, 195),
             |  (2, 1, 117, 318, 221), (2, 2, 450, 266, 221),
             |  (2, 3, 145, 263, 221), (2, 4, 188, 263, 221),
             |  (2, 5, 320, 255, 221), (3, 1, 130, 400, 185),
             |  (3, 2, 149, 330, 185), (3, 3, 343, 308, 185),
             |  (3, 4, 174, 304, 185), (3, 5, 207, 292, 185),
             |  (4, 1, 114, 399, 254), (4, 2, 496, 341, 254),
             |  (4, 3, 408, 323, 254), (4, 4, 280, 280, 254),
             |  (4, 5, 249, 280, 254), (5, 1, 404, 328, 223),
             |  (5, 2, 419, 319, 223), (5, 3, 33, 311, 223),
             |  (5, 4, 359, 306, 223), (5, 5, 395, 276, 223),
             |  (6, 1, 430, 323, 222), (6, 2, 145, 298, 222),
             |  (6, 3, 437, 283, 222), (6, 4, 386, 275, 222),
             |  (6, 5, 214, 257, 222), (7, 1, 340, 493, 197),
             |  (7, 2, 425, 408, 197), (7, 3, 209, 394, 197),
             |  (7, 4, 334, 357, 197), (7, 5, 381, 345, 197))
             |  AS t(qid, rn, nn_id, cos_milli, n_candidates)
             |ORDER BY qid, rn""".stripMargin)),

    // ---- recall harness: q38's approximate top-5 vs the exact top-5
    //      (same 8 queries, brute-force cosine). AnnRecallSpec pins
    //      avg recall@5 ≥ 0.8 on sf0.01; the oracle pins the exact
    //      per-query hit counts (deterministic: fixed hash family, fixed
    //      data — a regression pin, not an analytic truth). ----
    "q38_recall" -> Q(
      (s, d) => {
        val approx = annTop5(s, d).select(col("qid"), col("nn_id").as("vec_id"))
        val hits = exactTop5(s, d)
          .join(approx.withColumn("hit", lit(1)), Seq("qid", "vec_id"), "left")
          .groupBy("qid")
          .agg(sum(coalesce(col("hit"), lit(0))).as("n_hits"))
        hits
          .select(col("qid"), col("n_hits"),
            (col("n_hits").cast("double") / 5).as("recall_at_5"))
          .orderBy("qid")
      },
      Some("""SELECT qid, n_hits, CAST(recall AS DOUBLE) AS recall_at_5
             |FROM (VALUES (0, 5, 1.0), (1, 4, 0.8), (2, 5, 1.0), (3, 4, 0.8),
             |  (4, 4, 0.8), (5, 4, 0.8), (6, 4, 0.8), (7, 5, 1.0))
             |  AS t(qid, n_hits, recall)
             |ORDER BY qid""".stripMargin)),

    // ---- multimodal: opaque binary blob column + batch decode through a
    //      REAL parser ([[graft.io.Wav]] — RIFF chunk walk, fmt
    //      validation, PCM sample extraction; pure JVM since the
    //      container ships no codecs). The blob fixture is synthesized
    //      deterministically from the driver's documents table (each
    //      text's UTF-8 bytes as 8-bit PCM), which is what makes the
    //      decoded features DuckDB-checkable: samples ARE the byte
    //      values, so the oracle recomputes sum/peak with character
    //      arithmetic. The mapPartitions boundary is where a real
    //      pipeline initializes its codec once per partition. ----
    "q40_multimodal_decode" -> Q(
      (s, d) => multimodalDecode8(s, Tables.documents(s, d)),
      Some("""SELECT doc_id, 16000 AS sample_rate, 8 AS bits,
             |  CAST(len(text) AS BIGINT) AS n_samples,
             |  CAST(list_sum(list_transform(string_split(text, ''), x -> unicode(x))) AS BIGINT) AS sample_sum,
             |  list_max(list_transform(string_split(text, ''), x -> unicode(x))) AS peak,
             |  source
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---- 16-bit variant: codepoint samples through the SIGNED parse
    //      branch. Character arithmetic is exact here for ANY text up
    //      to U+7FFF, so this oracle (unlike q40's) has no ASCII
    //      coupling — WavSpec pins that on a non-ASCII fixture. ----
    "q40b_multimodal_decode16" -> Q(
      (s, d) => multimodalDecode16(s, Tables.documents(s, d)),
      Some("""SELECT doc_id, 16000 AS sample_rate, 16 AS bits,
             |  CAST(len(text) AS BIGINT) AS n_samples,
             |  CAST(list_sum(list_transform(string_split(text, ''), x -> unicode(x))) AS BIGINT) AS sample_sum,
             |  list_max(list_transform(string_split(text, ''), x -> unicode(x))) AS peak,
             |  source
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---- decode QUARANTINE: every 13th blob is deterministically
    //      corrupted (first magic byte zeroed — the strict parser
    //      rejects it), and the lenient path counts the casualties per
    //      source while decoding the rest. The oracle knows exactly
    //      which docs are corrupt and recomputes the survivors' sample
    //      sums with q40's character arithmetic (same ASCII guard). ----
    // ---- q356: WARC CONTAINER INGEST — the format crawled corpora
    //      actually arrive in ([[graft.io.Warc]], ISO 28500): one WARC
    //      stream per source (response records, doc ids in the target
    //      URI, text as payload bytes), parsed back through the strict
    //      reader and re-derived into per-source features the oracle
    //      recomputes from the documents table with q40's character
    //      arithmetic (same ASCII guard). Scale note: the parallelism
    //      unit of a real ingest is the WARC FILE (records never span
    //      files); this fixture builds one stream per source, so the
    //      group collect is bounded by the same contract that bounds a
    //      file. ----
    "q356_warc_ingest" -> Q(
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d)
        val nonAscii = docs
          .filter(octet_length(col("text")) =!= length(col("text"))).count()
        require(nonAscii == 0L,
          s"q356's oracle equates UTF-8 bytes with codepoints; corpus has " +
            s"$nonAscii non-ASCII docs")
        val blobs = docs.select(col("source"), col("doc_id"), col("text"))
          .as[(String, Long, String)]
          .groupByKey(_._1)
          .mapGroups { (src: String, it: Iterator[(String, Long, String)]) =>
            val recs = it.toSeq.sortBy(_._2).map { case (_, id, text) =>
              (Map("WARC-Type" -> "response",
                "WARC-Target-URI" -> s"http://corpus.local/doc/$id",
                "WARC-Record-ID" -> s"<urn:graft:$id>"),
                text.getBytes("UTF-8"))
            }
            (src, graft.io.Warc.build(recs))
          }.toDF("source", "warc")
        blobs.as[(String, Array[Byte])]
          .flatMap { case (src, bytes) =>
            graft.io.Warc.parse(bytes).map { r =>
              val id = r.targetUri.get.split('/').last.toLong
              var bs = 0L
              r.payload.foreach(b => bs += (b & 0xff))
              (src, id, r.payload.length.toLong, bs)
            }
          }.toDF("source", "doc_id", "n_bytes", "bsum")
          .groupBy("source")
          .agg(count(lit(1)).as("n_records"),
            sum("n_bytes").as("payload_bytes"),
            sum("bsum").as("byte_sum"),
            sum("doc_id").as("id_sum"))
          .orderBy("source")
      },
      Some("""SELECT source, count(*) AS n_records,
             |  CAST(sum(length(text)) AS BIGINT) AS payload_bytes,
             |  CAST(sum(coalesce(list_sum(list_transform(
             |    string_split(text, ''), x -> unicode(x))), 0)) AS BIGINT)
             |    AS byte_sum,
             |  CAST(sum(doc_id) AS BIGINT) AS id_sum
             |FROM documents GROUP BY source ORDER BY source""".stripMargin)),

    // ---- q360: the GZIPPED twin of q356 — one gzip member per record
    //      (the Common Crawl .warc.gz layout), decompressed through
    //      the JDK's concatenated-member Inflater and parsed by the
    //      same strict reader; identical per-source features, same
    //      oracle. ----
    "q360_warc_gz" -> Q(
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d)
        val nonAscii = docs
          .filter(octet_length(col("text")) =!= length(col("text"))).count()
        require(nonAscii == 0L,
          s"q360's oracle equates UTF-8 bytes with codepoints; corpus has " +
            s"$nonAscii non-ASCII docs")
        val blobs = docs.select(col("source"), col("doc_id"), col("text"))
          .as[(String, Long, String)]
          .groupByKey(_._1)
          .mapGroups { (src: String, it: Iterator[(String, Long, String)]) =>
            val recs = it.toSeq.sortBy(_._2).map { case (_, id, text) =>
              (Map("WARC-Type" -> "response",
                "WARC-Target-URI" -> s"http://corpus.local/doc/$id",
                "WARC-Record-ID" -> s"<urn:graft:$id>"),
                text.getBytes("UTF-8"))
            }
            (src, graft.io.Warc.buildGz(recs))
          }.toDF("source", "warc")
        blobs.as[(String, Array[Byte])]
          .flatMap { case (src, bytes) =>
            graft.io.Warc.parseGz(bytes).map { r =>
              val id = r.targetUri.get.split('/').last.toLong
              var bs = 0L
              r.payload.foreach(b => bs += (b & 0xff))
              (src, id, r.payload.length.toLong, bs)
            }
          }.toDF("source", "doc_id", "n_bytes", "bsum")
          .groupBy("source")
          .agg(count(lit(1)).as("n_records"),
            sum("n_bytes").as("payload_bytes"),
            sum("bsum").as("byte_sum"),
            sum("doc_id").as("id_sum"))
          .orderBy("source")
      },
      Some("""SELECT source, count(*) AS n_records,
             |  CAST(sum(length(text)) AS BIGINT) AS payload_bytes,
             |  CAST(sum(coalesce(list_sum(list_transform(
             |    string_split(text, ''), x -> unicode(x))), 0)) AS BIGINT)
             |    AS byte_sum,
             |  CAST(sum(doc_id) AS BIGINT) AS id_sum
             |FROM documents GROUP BY source ORDER BY source""".stripMargin)),

    "q77_decode_quarantine" -> Q(
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d)
        val nonAscii = docs
          .filter(octet_length(col("text")) =!= length(col("text"))).count()
        require(nonAscii == 0L,
          s"q77's oracle equates UTF-8 bytes with codepoints; corpus has " +
            s"$nonAscii non-ASCII docs")
        val blobs = docs
          .select(col("doc_id"), encode(col("text"), "UTF-8").as("raw"))
          .as[(Long, Array[Byte])]
          .map { case (id, b) =>
            val wav = graft.io.Wav.build8(16000, b)
            if (id % 13 == 0) wav(0) = 0 // break the RIFF magic
            (id, wav)
          }
          .toDF("doc_id", "wav")
        decodeWavLenient(s, blobs)
          .join(docs.select(col("doc_id"), col("source")), "doc_id")
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("ok"), 1L).otherwise(0L)).as("n_ok"),
            sum(when(col("ok"), col("sample_sum")).otherwise(0L)).as("ok_sample_sum"))
          .orderBy("source")
      },
      Some("""SELECT source, count(*) AS n_docs,
             |  CAST(sum(CASE WHEN doc_id % 13 != 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_ok,
             |  CAST(sum(CASE WHEN doc_id % 13 != 0
             |    THEN list_sum(list_transform(string_split(text, ''), x -> unicode(x)))
             |    ELSE 0 END) AS BIGINT) AS ok_sample_sum
             |FROM documents GROUP BY source ORDER BY source""".stripMargin)),
  )
}
