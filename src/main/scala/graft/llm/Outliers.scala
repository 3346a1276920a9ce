package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.rel.RelQueries.Q
import graft.rel.Tables

/** EMBEDDING OUTLIER AUDIT — distance of every vector to its group
  * (label) centroid, in EXACT integer arithmetic, with the top-k
  * farthest per group surfaced. The embedding-quality tripwire a
  * training pipeline runs after ingest: mislabeled vectors, corrupt
  * rows, and modality drift all show up as centroid outliers.
  *
  * Exactness: each float32 component is quantized ONCE to integer
  * milli-units — and that rounding is provably engine-identical: an
  * f32 value is m/2^e, so v·1000 (exact in double: 24+10 mantissa bits
  * < 53) can never land on a .5 boundary (that would need denominator
  * 2·5³, impossible for m/2^e) — every subsequent step is integer.
  * The mean is never divided: with S_j = Σ_group µ_j and n = |group|,
  * the comparison key is n²·dist² = Σ_j (n·µ_j − S_j)², a pure-integer
  * monotone transform of the true centroid distance WITHIN each group.
  *
  * Scale shape (100 TB): one narrow explode of the scan, a per-(group,
  * dim) partial-aggregated sum (map-side combine — (groups × dims)
  * rows, tiny), a broadcast join back, and a map-side-combining
  * bounded-heap top-k per group ([[graft.functions.TopK.perKeyTopKLong]]
  * — LONG scores, so the integer key never rides a lossy double cast;
  * no per-group window sort). Nothing quadratic, no driver state.
  * Overflow guard: |n·µ_j − S_j| ≤ 2·n·µmax_j, so Σ_j squares is
  * bounded by Σ_j (2·n·µmax_j)² — that bound is computed per group
  * from the OBSERVED per-dimension |µ| maxima (not an assumed unit
  * range: unnormalized embeddings with µ ~ 10⁵ would wrap long far
  * below any row-count cap), and a loud inline `raise_error` fires
  * when it could exceed 2⁶³ — or when a group outgrows `groupSizeCap`
  * — instead of silently wrapping (the adjRowBytesCap discipline).
  */
object Outliers {

  /** Top-k centroid outliers per label group.
    * Output: (label, rn, id, dist_key) with dist_key = Σ_j (n·µ_j −
    * S_j)² — n²-scaled squared distance, exact, comparable within a
    * group; ties broken by id.
    */
  def centroidOutliers(s: SparkSession, emb: DataFrame, k: Int,
      id: String = "id", vec: String = "vec", label: String = "label",
      groupSizeCap: Long = 150000L): DataFrame = {
    val m = emb
      .select(col(id), col(label), posexplode(col(vec)).as(Seq("j", "v")))
      .select(col(id), col(label), col("j"),
        round(col("v").cast("double") * 1000, 0).cast("long").as("mu"))
    val cs0 = m.groupBy(col(label), col("j"))
      .agg(sum("mu").as("s_j"), count(lit(1)).as("n"),
        max(abs(col("mu"))).as("mx"))
    // per-group worst-case key Σ_j (2·n·µmax_j)², evaluated in double
    // (a BOUND check — conservative is fine); the guard fires from the
    // observed µ magnitudes, so unnormalized embeddings can't slip a
    // wrapped key past a row-count-only cap
    val chk = cs0.groupBy(col(label))
      .agg(sum(pow(lit(2.0) * col("n") * col("mx"), 2)).as("__bound"),
        max("n").as("__nmax"))
    val cs = cs0.join(chk, Seq(label))
      // loud overflow guard: past either cap the integer key could wrap
      .withColumn("n",
        when(col("__nmax") > groupSizeCap,
          raise_error(concat(lit("centroidOutliers: group "),
            col(label).cast("string"),
            lit(s" exceeds groupSizeCap=$groupSizeCap — the exact integer " +
              "key would overflow; stratify or raise the cap only with a " +
              "re-derived bound"))))
        .when(col("__bound") > lit(9.0e18),
          raise_error(concat(lit("centroidOutliers: group "),
            col(label).cast("string"),
            lit(" worst-case key Σ_j (2·n·µmax_j)² exceeds Long.MaxValue " +
              "(unnormalized embeddings?) — the exact integer key would " +
              "overflow; normalize or rescale the vectors"))))
        .otherwise(col("n")))
      .select(col(label), col("j"), col("s_j"), col("n"))
    val diff = col("n") * col("mu") - col("s_j")
    val d = m.join(broadcast(cs), Seq(label, "j"))
      .groupBy(col(id), col(label))
      .agg(sum(diff * diff).as("dist_key"))
    // bounded-heap top-k with EXACT LONG scores (the window form sorts
    // each label's full group on one task — the single-key wall at the
    // realistic few-labels/many-rows audit shape; the double-cast TopK
    // would lose integer bits past 2⁵³)
    graft.functions.TopK.perKeyTopKLong(d, k, label, id, "dist_key")
      .select(col(label), col("rn"), col(id), col("dist_key"))
  }

  val all: ListMap[String, Q] = ListMap(
    // ---- q273: top-3 centroid outliers per embedding label — exact
    //      integer milli quantization + n-scaled centroid key, fully
    //      SQL-replayed (generate_subscripts/unnest expand the vector
    //      in lockstep; HUGEINT intermediates collapse to BIGINT). ----
    "q273_centroid_outliers" -> Q(
      (s, d) => centroidOutliers(s,
          Tables.embeddings(s, d).select(col("vec_id").as("id"),
            col("embedding").as("vec"), col("label")), 3)
        .orderBy("label", "rn"),
      Some("""WITH x AS (SELECT vec_id, label,
             |    generate_subscripts(embedding, 1) AS j,
             |    unnest(embedding) AS v
             |  FROM embeddings),
             |m AS (SELECT vec_id, label, j,
             |    CAST(round(CAST(v AS DOUBLE) * 1000) AS BIGINT) AS mu
             |  FROM x),
             |cs AS (SELECT label, j, CAST(sum(mu) AS BIGINT) AS s_j,
             |    CAST(count(*) AS BIGINT) AS n
             |  FROM m GROUP BY 1, 2),
             |d AS (SELECT m.vec_id, m.label,
             |    CAST(sum((cs.n * m.mu - cs.s_j) * (cs.n * m.mu - cs.s_j))
             |      AS BIGINT) AS dist_key
             |  FROM m JOIN cs ON m.label = cs.label AND m.j = cs.j
             |  GROUP BY 1, 2),
             |r AS (SELECT label, vec_id, dist_key,
             |    row_number() OVER (PARTITION BY label
             |      ORDER BY dist_key DESC, vec_id) AS rn
             |  FROM d)
             |SELECT label, CAST(rn AS INT) AS rn, vec_id AS id, dist_key
             |FROM r WHERE rn <= 3 ORDER BY label, rn""".stripMargin)))
}
