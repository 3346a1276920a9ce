package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.rel.RelQueries.Q
import graft.rel.Tables
import graft.io.{Bmp, Fseq, Gif, Jpeg, Png, Wav}

/** Multimodal IMAGE, VIDEO, and AUDIO-DSP column operators, completing
  * the decode / feature-extract / resize / frame-sample quartet next to
  * the audio decode path (q40/q40b, [[graft.io.Wav]]): opaque binary
  * blobs decoded through real strict parsers ([[graft.io.Bmp]],
  * [[graft.io.Fseq]], [[graft.io.Wav]]) at a per-partition boundary,
  * features extracted as narrow columns.
  *
  * Like q40, the blob fixtures are synthesized deterministically from
  * the documents table — pixel values are a closed-form function of
  * (doc_id, x, y[, frame]), which is exactly what makes a REAL decoder
  * DuckDB-checkable: the oracle recomputes every feature from the same
  * arithmetic with lateral range() joins, so a single flipped byte in
  * padding handling, bottom-up row order, or frame offsets goes
  * hash-red. The BT.601 luminance of a gray pixel (77v+150v+29v)>>8 =
  * v exactly, so the gray fixture round-trips the full 24-bit path
  * without quantization slack.
  *
  * Scale design: blobs never leave their partition — build, decode,
  * and feature extraction are one narrow map chain per entry; only the
  * fixed-width feature columns flow on. Frame sampling reads ONLY the
  * sampled frames' bytes (no full-video decode), the property that
  * matters when a frame-sample pass runs over 100 TB of video.
  */
object ImageOps {

  /** deterministic per-doc image geometry + pixels (the fixture contract
    * the oracle mirrors): W=5+id%12, H=4+id%9, v(x,y)=(id*31+y*7+x*13)%256
    */
  private[llm] def syntheticGray(id: Long): Bmp.Gray = {
    val w = (5 + id % 12).toInt
    val h = (4 + id % 9).toInt
    val px = Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      ((id * 31 + y * 7 + x * 13) % 256).toInt
    }
    Bmp.Gray(w, h, px)
  }

  /** image decode + feature extract + 4×4 nearest resize over BMP blobs */
  def imageFeatures(s: SparkSession, docs: DataFrame): DataFrame = {
    import s.implicits._
    val blobs = docs.select(col("doc_id")).as[Long]
      .map(id => (id, Bmp.build24(syntheticGray(id))))
      .toDF("doc_id", "img")
    blobs.as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition decode boundary (codec state would init here)
        it.map { case (id, bytes) =>
          val g = Bmp.parse(bytes)
          var sum = 0L; var max = 0
          g.pixels.foreach { v => sum += v; if (v > max) max = v }
          val rz = Bmp.resizeNearest(g, 4, 4)
          (id, g.width, g.height, g.width.toLong * g.height, sum, max,
            rz.pixels.foldLeft(0L)(_ + _))
        }
      }
      .toDF("doc_id", "width", "height", "n_pixels", "pix_sum", "pix_max", "rz4_sum")
      .orderBy("doc_id")
  }

  /** audio decode + DSP-style features over signed 16-bit WAV blobs:
    * zero-crossing count (sign transition, zero counted non-negative),
    * integer energy Σv², peak |v| — all exact integer arithmetic
    */
  def audioFeatures(s: SparkSession, docs: DataFrame): DataFrame = {
    import s.implicits._
    val blobs = docs.select(col("doc_id")).as[Long]
      .map { id =>
        val n = (50 + id % 37).toInt
        val samples = Array.tabulate(n)(i => ((id * 13 + i * 7) % 4001 - 2000).toShort)
        (id, graft.io.Wav.build16(16000, samples))
      }
      .toDF("doc_id", "wav")
    blobs.as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val p = graft.io.Wav.parse(bytes)
          var zc = 0L; var energy = 0L; var peak = 0
          var i = 0
          while (i < p.samples.length) {
            val v = p.samples(i)
            if (i > 0 && ((v < 0) != (p.samples(i - 1) < 0))) zc += 1
            energy += v.toLong * v
            val a = math.abs(v); if (a > peak) peak = a
            i += 1
          }
          (id, p.samples.length.toLong, zc, energy, peak)
        }
      }
      .toDF("doc_id", "n_samples", "zc_cnt", "energy", "peak_abs")
      .orderBy("doc_id")
  }

  /** STEREO audio decode over channel-interleaved 16-bit WAV blobs:
    * per-channel sum and peak |v| plus the frame-paired integer dot
    * product Σ l[i]·r[i] — the dot is what pins the DE-INTERLEAVING
    * (an off-by-one or channel swap changes the pairing, not just the
    * marginals). Left/right are distinct closed-form waveforms so a
    * swap flips l_sum/r_sum too.
    */
  def stereoFeatures(s: SparkSession, docs: DataFrame): DataFrame = {
    import s.implicits._
    val blobs = docs.select(col("doc_id")).as[Long]
      .map { id =>
        val n = (50 + id % 37).toInt
        val inter = new Array[Short](2 * n)
        var i = 0
        while (i < n) {
          inter(2 * i) = ((id * 13 + i * 7) % 4001 - 2000).toShort
          inter(2 * i + 1) = ((id * 19 + i * 11) % 4001 - 2000).toShort
          i += 1
        }
        (id, graft.io.Wav.build16(16000, 2, inter))
      }
      .toDF("doc_id", "wav")
    blobs.as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val p = graft.io.Wav.parse(bytes)
          require(p.channels == 2, s"doc $id: expected stereo, got ${p.channels}")
          val l = graft.io.Wav.channel(p, 0)
          val r = graft.io.Wav.channel(p, 1)
          var lSum = 0L; var rSum = 0L; var lPeak = 0; var rPeak = 0; var dot = 0L
          var i = 0
          while (i < l.length) {
            lSum += l(i); rSum += r(i)
            val la = math.abs(l(i)); if (la > lPeak) lPeak = la
            val ra = math.abs(r(i)); if (ra > rPeak) rPeak = ra
            dot += l(i).toLong * r(i)
            i += 1
          }
          (id, p.channels, l.length.toLong, lSum, rSum, lPeak, rPeak, dot)
        }
      }
      .toDF("doc_id", "channels", "n_frames", "l_sum", "r_sum",
        "l_peak_abs", "r_peak_abs", "lr_dot")
      .orderBy("doc_id")
  }

  /** frame-sample over FSEQ video blobs: every 3rd frame's bytes only */
  def frameSampleFeatures(s: SparkSession, docs: DataFrame): DataFrame = {
    import s.implicits._
    val w = 8; val h = 6
    val blobs = docs.select(col("doc_id")).as[Long]
      .map { id =>
        val nf = (4 + id % 7).toInt
        val frames = (0 until nf).map { f =>
          Array.tabulate(w * h) { i =>
            val x = i % w; val y = i / w
            ((id * 17 + f * 29 + y * 5 + x * 3) % 256).toByte
          }
        }
        (id, Fseq.build(w, h, frames))
      }
      .toDF("doc_id", "video")
    blobs.as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val v = Fseq.parse(bytes)
          val sampled = 0 until v.frames by 3
          var sum = 0L
          sampled.foreach { f => v.frame(f).foreach(b => sum += (b & 0xff)) }
          (id, v.frames, sampled.length, sum)
        }
      }
      .toDF("doc_id", "n_frames", "n_sampled", "sampled_sum")
      .orderBy("doc_id")
  }

  /** q93 fixture: docs with id ≡ 12 (mod 13) carry a PERTURBED COPY of
    * doc id-1's image (id-1 is never itself a copy, so sources are
    * always original patterns) — same geometry, same pixels, except
    * every 37th
    * pixel is brightened by +90 (mod 256): a localized edit that leaves
    * the aHash within a few bits, NOT a byte-identical blob. Pixels use
    * a SCRAMBLED function (multiply + double mod), not q58's linear
    * gradient — gradients are degenerate for an average-hash (half the
    * bits sit at the mean in the same pattern for every image), and the
    * point of the fixture is distinct images getting distinct hashes.
    * The oracle mirrors all of this arithmetic.
    */
  private[graft] def syntheticGrayNearDup(id: Long): Bmp.Gray = {
    val isCopy = id % 13 == 12
    val src = if (isCopy) id - 1 else id
    val w = (5 + src % 12).toInt
    val h = (4 + src % 9).toInt
    val px = Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      val base = ((src * 2654435761L + (y.toLong * w + x) * 40503L) % 509L % 256L).toInt
      val add = if (isCopy && (y * w + x) % 37 == 0) 90 else 0
      (base + add) % 256
    }
    Bmp.Gray(w, h, px)
  }

  /** PERCEPTUAL image near-dup — the multimodal dedup modality: decode
    * each blob through the REAL BMP parser, compute an 8×8 average-hash
    * (aHash: nearest-resize to 8×8, bit = cell ≥ mean — robust to
    * brightness shifts and resizes that break exact-byte dedup), then
    * find pairs by LSH BANDING the 64 bits into 4×16-bit bands (a
    * candidate shares ≥1 exact band — pigeonhole: any pair within
    * Hamming 3 is guaranteed a clean band) and verifying candidates
    * with the exact Hamming distance. Returns (ia, ib, hamming ≤
    * `maxHamming`) pairs.
    *
    * Scale shape: decode + hash is one narrow map (blobs never leave
    * their partition; 8 bytes flow on per image); the pair space is the
    * band-bucket join (4 shuffles of 8-byte rows), never n². The mean
    * comparison is integer-exact (64·v ≥ Σv), so the hash — and the
    * oracle's replay of it — has no float anywhere.
    */
  /** the shared 8×8 average-hash: (b0..b3) 16-bit bands of the 64-bit
    * aHash — one function so the BMP and PNG paths hash identically
    */
  private def aHashBands(g: Bmp.Gray): (Long, Long, Long, Long) = {
    val rz = Bmp.resizeNearest(g, 8, 8)
    var sum = 0L
    rz.pixels.foreach(sum += _)
    val bands = new Array[Long](4)
    var c = 0
    while (c < 64) {
      if (rz.pixels(c) * 64L >= sum) bands(c / 16) |= 1L << (c % 16)
      c += 1
    }
    (bands(0), bands(1), bands(2), bands(3))
  }

  def imagePerceptualDups(s: SparkSession, blobs: DataFrame, maxHamming: Int = 8,
      id: String = "doc_id", img: String = "img"): DataFrame = {
    import s.implicits._
    val hashed = blobs.select(col(id), col(img)).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (i, bytes) =>
          val (b0, b1, b2, b3) = aHashBands(Bmp.parse(bytes))
          (i, b0, b1, b2, b3)
        }
      }
      .toDF(id, "b0", "b1", "b2", "b3")
    bandPairs(hashed, id, maxHamming)
  }

  /** [[imagePerceptualDups]] over PNG blobs ([[graft.io.Png]] — real
    * Inflater + all-five-defilter decode), with a LENIENT boundary:
    * blobs the strict parser rejects are QUARANTINED (skipped and
    * countable by the caller via an anti-join on the output's id
    * domain), not silently hashed as garbage — the q77 decode-
    * quarantine contract applied to images. Hashing is [[aHashBands]],
    * so a PNG and a BMP of the same raster produce the identical hash.
    */
  def imagePerceptualDupsPng(s: SparkSession, blobs: DataFrame,
      maxHamming: Int = 8, id: String = "doc_id",
      img: String = "img"): DataFrame =
    lenientDups(s, blobs, Png.parse, maxHamming, id, img)

  /** [[imagePerceptualDupsPng]]'s GIF twin ([[graft.io.Gif]] — real
    * LZW decode), same lenient quarantine boundary and shared hash.
    */
  def imagePerceptualDupsGif(s: SparkSession, blobs: DataFrame,
      maxHamming: Int = 8, id: String = "doc_id",
      img: String = "img"): DataFrame =
    lenientDups(s, blobs, Gif.parse, maxHamming, id, img)

  /** [[imagePerceptualDupsPng]]'s JPEG twin ([[graft.io.Jpeg]] — real
    * baseline JFIF Huffman + IDCT decode; progressive/arithmetic/
    * corrupt streams quarantine), same lenient boundary and shared
    * hash. aHash is resize-invariant under pixel replication, so a
    * JPEG of the 8×-upsampled raster hashes identically to the BMP/
    * PNG/GIF of the source raster.
    */
  def imagePerceptualDupsJpeg(s: SparkSession, blobs: DataFrame,
      maxHamming: Int = 8, id: String = "doc_id",
      img: String = "img"): DataFrame =
    lenientDups(s, blobs, Jpeg.parse, maxHamming, id, img)

  private def lenientDups(s: SparkSession, blobs: DataFrame,
      decode: Array[Byte] => Bmp.Gray, maxHamming: Int,
      id: String, img: String): DataFrame = {
    import s.implicits._
    val hashed = blobs.select(col(id), col(img)).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (i, bytes) =>
          try {
            val (b0, b1, b2, b3) = aHashBands(decode(bytes))
            Some((i, b0, b1, b2, b3))
          } catch {
            case _: IllegalArgumentException => None // quarantined
          }
        }
      }
      .toDF(id, "b0", "b1", "b2", "b3")
    bandPairs(hashed, id, maxHamming)
  }

  /** q119 fixture: docs with id ≡ 7 (mod 11) carry a GAIN-PERTURBED
    * COPY of doc id-1's audio (id-1 is never itself a copy): same
    * 2080-sample signed-16-bit waveform except every 29th sample is
    * offset by +500 — a localized edit that nudges a frame energy or
    * two, NOT a byte-identical blob. Samples are a scrambled integer
    * function in [-12000, 12000] (headroom keeps the +500 clip-free)
    * whose STRIDE depends on src — a src-independent stride would make
    * every doc a phase shift of the same progression and correlate all
    * fingerprints (measured: 833 background pairs at ≤6 bits vs 19
    * with the per-src stride). Mirrored exactly by the oracle.
    */
  private[graft] def syntheticPcmNearDup(id: Long): Array[Short] = {
    val isCopy = id % 11 == 7
    val src = if (isCopy) id - 1 else id
    Array.tabulate(2080) { i =>
      val base = (src * 2654435761L + i.toLong * (69069L + src * 64L)) % 40009L % 24001L - 12000L
      val add = if (isCopy && i % 29 == 0) 500L else 0L
      (base + add).toShort
    }
  }

  /** shared LSH tail of the perceptual dedups: 64-bit fingerprints as
    * 4×16-bit bands (`id`, b0..b3) → band-bucket join → exact Hamming
    * verify ≤ maxHamming. Pigeonhole: any pair within Hamming 3 shares
    * a clean band and is GUARANTEED a candidate; beyond that the
    * banding is probabilistic (and the oracle replays it, so the two
    * engines miss identically).
    */
  private def bandPairs(hashed: DataFrame, id: String, maxHamming: Int): DataFrame = {
    val bandRows = hashed.select(col(id), col("b0"), col("b1"), col("b2"), col("b3"),
      explode(array(
        struct(lit(0).as("bi"), col("b0").as("bv")),
        struct(lit(1).as("bi"), col("b1").as("bv")),
        struct(lit(2).as("bi"), col("b2").as("bv")),
        struct(lit(3).as("bi"), col("b3").as("bv")))).as("band"))
      .select(col(id), col("b0"), col("b1"), col("b2"), col("b3"),
        col("band.bi").as("bi"), col("band.bv").as("bv"))
    val a = bandRows.select(col(id).as("ia"), col("b0").as("a0"), col("b1").as("a1"),
      col("b2").as("a2"), col("b3").as("a3"), col("bi"), col("bv"))
    val b = bandRows.select(col(id).as("ib"), col("b0").as("c0"), col("b1").as("c1"),
      col("b2").as("c2"), col("b3").as("c3"), col("bi"), col("bv"))
    a.join(b, Seq("bi", "bv")).filter(col("ia") < col("ib"))
      .select(col("ia"), col("ib"), col("a0"), col("a1"), col("a2"), col("a3"),
        col("c0"), col("c1"), col("c2"), col("c3"))
      .distinct() // a pair may share several bands
      .withColumn("hamming",
        bit_count(col("a0").bitwiseXOR(col("c0"))) +
          bit_count(col("a1").bitwiseXOR(col("c1"))) +
          bit_count(col("a2").bitwiseXOR(col("c2"))) +
          bit_count(col("a3").bitwiseXOR(col("c3"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("ia"), col("ib"), col("hamming").cast("long").as("hamming"))
  }

  /** PERCEPTUAL audio near-dup — the audio twin of
    * [[imagePerceptualDups]]: decode each blob through the REAL WAV
    * parser, fingerprint by ENERGY-DELTA SIGNS (the Haitsma-Kalker
    * robust-hash core, integer-exact here: 65 frames of 32 samples,
    * bit f = Σ|s| of frame f+1 > frame f — robust to uniform gain and
    * small local edits that break exact-byte dedup), then the same
    * 4×16-bit band join + exact Hamming verify as the image path.
    *
    * Scale shape: decode + fingerprint is one narrow map (blobs never
    * leave their partition; 32 bytes of bands flow on per clip); the
    * pair space is the band-bucket join, never n².
    */
  def audioFingerprintDups(s: SparkSession, blobs: DataFrame, maxHamming: Int = 6,
      id: String = "doc_id", wav: String = "audio"): DataFrame = {
    import s.implicits._
    val hashed = blobs.select(col(id), col(wav)).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (i, bytes) =>
          val p = Wav.parse(bytes)
          val nf = p.samples.length / 32
          val e = new Array[Long](nf)
          var k = 0
          while (k < nf * 32) { e(k / 32) += math.abs(p.samples(k)); k += 1 }
          val bands = new Array[Long](4)
          var f = 0
          val nb = math.min(64, math.max(nf - 1, 0))
          while (f < nb) {
            if (e(f + 1) > e(f)) bands(f / 16) |= 1L << (f % 16)
            f += 1
          }
          (i, bands(0), bands(1), bands(2), bands(3))
        }
      }
      .toDF(id, "b0", "b1", "b2", "b3")
    bandPairs(hashed, id, maxHamming)
  }

  /** the shared q347/q363 oracle: the q93 hash replay minus the
    * quarantined (corrupt) ids — format-independent, because PNG and
    * GIF decode to the identical raster
    */
  private val corruptNearDupOracle =
    """WITH base AS (SELECT doc_id,
             |    CASE WHEN doc_id % 13 = 12
             |         THEN doc_id - 1 ELSE doc_id END AS src,
             |    CASE WHEN doc_id % 13 = 12 THEN 1 ELSE 0 END AS cpy
             |  FROM documents WHERE doc_id % 13 != 0),
             |dims AS (SELECT doc_id, src, cpy,
             |    5 + src % 12 AS w, 4 + src % 9 AS h FROM base),
             |cells AS (SELECT d.doc_id, oy.oy * 8 + ox.ox AS idx,
             |    (((d.src*2654435761 + (((oy.oy*d.h)//8)*d.w + (ox.ox*d.w)//8)*40503)
             |        % 509) % 256
             |     + CASE WHEN d.cpy = 1
             |         AND (((oy.oy*d.h)//8)*d.w + (ox.ox*d.w)//8) % 37 = 0
             |       THEN 90 ELSE 0 END) % 256 AS v
             |  FROM dims d, range(8) ox(ox), range(8) oy(oy)),
             |tot AS (SELECT doc_id, sum(v) AS s FROM cells GROUP BY doc_id),
             |bits AS (SELECT c.doc_id, c.idx,
             |    CASE WHEN c.v * 64 >= t.s THEN 1 ELSE 0 END AS bit
             |  FROM cells c JOIN tot t USING (doc_id)),
             |bands AS (SELECT doc_id, idx // 16 AS bi,
             |    CAST(sum(bit * (1 << (idx % 16))) AS BIGINT) AS bv
             |  FROM bits GROUP BY doc_id, bi),
             |hx AS (SELECT doc_id,
             |    max(CASE WHEN bi = 0 THEN bv END) AS b0,
             |    max(CASE WHEN bi = 1 THEN bv END) AS b1,
             |    max(CASE WHEN bi = 2 THEN bv END) AS b2,
             |    max(CASE WHEN bi = 3 THEN bv END) AS b3
             |  FROM bands GROUP BY doc_id),
             |cand AS (SELECT DISTINCT a.doc_id AS ia, b.doc_id AS ib
             |  FROM bands a JOIN bands b
             |    ON a.bi = b.bi AND a.bv = b.bv AND a.doc_id < b.doc_id)
             |SELECT c.ia, c.ib,
             |  CAST(bit_count(xor(x.b0, y.b0)) + bit_count(xor(x.b1, y.b1)) +
             |       bit_count(xor(x.b2, y.b2)) + bit_count(xor(x.b3, y.b3)) AS BIGINT)
             |    AS hamming
             |FROM cand c JOIN hx x ON x.doc_id = c.ia JOIN hx y ON y.doc_id = c.ib
             |WHERE bit_count(xor(x.b0, y.b0)) + bit_count(xor(x.b1, y.b1)) +
             |      bit_count(xor(x.b2, y.b2)) + bit_count(xor(x.b3, y.b3)) <= 8
             |ORDER BY ia, ib""".stripMargin

  val all: ListMap[String, Q] = ListMap(
    // ---- perceptual image near-dup: real BMP decode → integer aHash →
    //      4×16-bit band join → exact Hamming verify. The fixture
    //      plants brightness-perturbed copies (not byte-identical); the
    //      oracle replays decode arithmetic, hash bits, banding AND
    //      Hamming with range() joins + xor/bit_count ----
    "q93_image_neardup" -> Q(
      (s, d) => {
        import s.implicits._
        val blobs = Tables.documents(s, d).select(col("doc_id")).as[Long]
          .map(id => (id, Bmp.build24(syntheticGrayNearDup(id))))
          .toDF("doc_id", "img")
        imagePerceptualDups(s, blobs).orderBy("ia", "ib")
      },
      Some("""WITH base AS (SELECT doc_id,
             |    CASE WHEN doc_id % 13 = 12
             |         THEN doc_id - 1 ELSE doc_id END AS src,
             |    CASE WHEN doc_id % 13 = 12 THEN 1 ELSE 0 END AS cpy
             |  FROM documents),
             |dims AS (SELECT doc_id, src, cpy,
             |    5 + src % 12 AS w, 4 + src % 9 AS h FROM base),
             |cells AS (SELECT d.doc_id, oy.oy * 8 + ox.ox AS idx,
             |    (((d.src*2654435761 + (((oy.oy*d.h)//8)*d.w + (ox.ox*d.w)//8)*40503)
             |        % 509) % 256
             |     + CASE WHEN d.cpy = 1
             |         AND (((oy.oy*d.h)//8)*d.w + (ox.ox*d.w)//8) % 37 = 0
             |       THEN 90 ELSE 0 END) % 256 AS v
             |  FROM dims d, range(8) ox(ox), range(8) oy(oy)),
             |tot AS (SELECT doc_id, sum(v) AS s FROM cells GROUP BY doc_id),
             |bits AS (SELECT c.doc_id, c.idx,
             |    CASE WHEN c.v * 64 >= t.s THEN 1 ELSE 0 END AS bit
             |  FROM cells c JOIN tot t USING (doc_id)),
             |bands AS (SELECT doc_id, idx // 16 AS bi,
             |    CAST(sum(bit * (1 << (idx % 16))) AS BIGINT) AS bv
             |  FROM bits GROUP BY doc_id, bi),
             |hx AS (SELECT doc_id,
             |    max(CASE WHEN bi = 0 THEN bv END) AS b0,
             |    max(CASE WHEN bi = 1 THEN bv END) AS b1,
             |    max(CASE WHEN bi = 2 THEN bv END) AS b2,
             |    max(CASE WHEN bi = 3 THEN bv END) AS b3
             |  FROM bands GROUP BY doc_id),
             |cand AS (SELECT DISTINCT a.doc_id AS ia, b.doc_id AS ib
             |  FROM bands a JOIN bands b
             |    ON a.bi = b.bi AND a.bv = b.bv AND a.doc_id < b.doc_id)
             |SELECT c.ia, c.ib,
             |  CAST(bit_count(xor(x.b0, y.b0)) + bit_count(xor(x.b1, y.b1)) +
             |       bit_count(xor(x.b2, y.b2)) + bit_count(xor(x.b3, y.b3)) AS BIGINT)
             |    AS hamming
             |FROM cand c JOIN hx x ON x.doc_id = c.ia JOIN hx y ON y.doc_id = c.ib
             |WHERE bit_count(xor(x.b0, y.b0)) + bit_count(xor(x.b1, y.b1)) +
             |      bit_count(xor(x.b2, y.b2)) + bit_count(xor(x.b3, y.b3)) <= 8
             |ORDER BY ia, ib""".stripMargin)),

    // ---- q347: the q93 near-dup machinery on PNG — the format real
    //      crawled corpora use. Same planted-copy fixture encoded
    //      through the real zlib PNG writer with the row filter
    //      CYCLING over all five types (every defilter branch runs on
    //      every image), every 13th blob corrupted (signature byte
    //      zeroed) and QUARANTINED by the lenient decode boundary. The
    //      PNG raster decodes to the identical grayscale, so the
    //      oracle is q93's hash replay minus the corrupt ids. ----
    "q347_png_neardup" -> Q(
      (s, d) => {
        import s.implicits._
        val blobs = Tables.documents(s, d).select(col("doc_id")).as[Long]
          .map { id =>
            val png = Png.buildGray(syntheticGrayNearDup(id), filterMode = -1)
            if (id % 13 == 0) png(0) = 0 // break the signature
            (id, png)
          }
          .toDF("doc_id", "img")
        imagePerceptualDupsPng(s, blobs).orderBy("ia", "ib")
      },
      Some(corruptNearDupOracle)),

    // ---- q363: the GIF twin — the same planted-copy fixture through
    //      the real LZW encoder/decoder, every 13th blob corrupted and
    //      quarantined; same raster, same hash, same oracle. ----
    "q363_gif_neardup" -> Q(
      (s, d) => {
        import s.implicits._
        val blobs = Tables.documents(s, d).select(col("doc_id")).as[Long]
          .map { id =>
            val gif = Gif.buildGray(syntheticGrayNearDup(id))
            if (id % 13 == 0) gif(0) = 'X'.toByte // break the signature
            (id, gif)
          }
          .toDF("doc_id", "img")
        imagePerceptualDupsGif(s, blobs).orderBy("ia", "ib")
      },
      Some(corruptNearDupOracle)),

    // ---- q406: the near-dup machinery on JPEG — the format real
    //      crawled corpora are overwhelmingly made of. The planted-copy
    //      fixture is 8×-UPSAMPLED (each pixel an 8×8 constant block)
    //      and encoded with the DC-exact quant table, making the lossy
    //      codec bit-exact by construction (Jpeg doc) while the full
    //      marker/Huffman/dequant/IDCT path runs; restart markers every
    //      4 MCUs exercise the DRI/RSTn path on every blob. Nearest
    //      aHash sampling of the upsampled raster picks the exact q93
    //      pixels, so the oracle is q93's hash replay minus the
    //      corrupt ids (every 13th blob loses its SOI and is
    //      quarantined by the lenient decode boundary). ----
    "q406_jpeg_neardup" -> Q(
      (s, d) => {
        import s.implicits._
        val blobs = Tables.documents(s, d).select(col("doc_id")).as[Long]
          .map { id =>
            val jpg = Jpeg.buildGray(
              Jpeg.upsample(syntheticGrayNearDup(id), 8),
              Jpeg.DcExactQuant, restartInterval = 4)
            if (id % 13 == 0) jpg(1) = 0 // break the SOI marker
            (id, jpg)
          }
          .toDF("doc_id", "img")
        imagePerceptualDupsJpeg(s, blobs).orderBy("ia", "ib")
      },
      Some(corruptNearDupOracle)),

    // ---- q422: CODEC QUARANTINE REPORT — the multimodal ingest
    //      health row: all five real decoders (BMP/PNG/GIF/JPEG/WAV)
    //      run over per-id fixture blobs with every 13th blob's magic
    //      broken; each format must decode every intact blob and
    //      quarantine every broken one (IllegalArgumentException —
    //      the strict-parser contract), so the counts are a pure
    //      function of the corrupt rule, which the oracle computes
    //      directly. One narrow pass; blobs never leave their
    //      partition. ----
    "q422_codec_quarantine_report" -> Q(
      (s, d) => {
        import s.implicits._
        val rows = Tables.documents(s, d).select(col("doc_id")).as[Long]
          .flatMap { id =>
            val bad = id % 13 == 0
            val g = syntheticGrayNearDup(id)
            def attempt(fmt: String, blob: Array[Byte],
                parse: Array[Byte] => Any): (String, Long) =
              (fmt, try { parse(blob); 1L }
              catch { case _: IllegalArgumentException => 0L })
            val bmp = Bmp.build24(g)
            if (bad) bmp(0) = 'X'.toByte
            val png = Png.buildGray(g, filterMode = -1)
            if (bad) png(0) = 0
            val gif = Gif.buildGray(g)
            if (bad) gif(0) = 'X'.toByte
            val jpg = Jpeg.buildGray(Jpeg.upsample(g, 8), Jpeg.DcExactQuant)
            if (bad) jpg(1) = 0
            val wav = Wav.build16(8000, syntheticPcmNearDup(id))
            if (bad) wav(0) = 'X'.toByte
            Seq(attempt("bmp", bmp, Bmp.parse),
              attempt("gif", gif, Gif.parse),
              attempt("jpeg", jpg, Jpeg.parse),
              attempt("png", png, Png.parse),
              attempt("wav", wav, Wav.parse))
          }
          .toDF("format", "decoded")
        rows.groupBy("format")
          .agg(count(lit(1)).as("n_blobs"),
            sum(col("decoded")).as("n_decoded"))
          .withColumn("n_quarantined", col("n_blobs") - col("n_decoded"))
          .orderBy("format")
      },
      Some("""WITH n AS (SELECT count(*) AS nb,
             |    sum(CASE WHEN doc_id % 13 = 0 THEN 1 ELSE 0 END) AS bad
             |  FROM documents)
             |SELECT f.format, CAST(n.nb AS BIGINT) AS n_blobs,
             |  CAST(n.nb - n.bad AS BIGINT) AS n_decoded,
             |  CAST(n.bad AS BIGINT) AS n_quarantined
             |FROM (VALUES ('bmp'), ('gif'), ('jpeg'), ('png'), ('wav'))
             |  f(format), n
             |ORDER BY f.format""".stripMargin)),

    // ---- perceptual AUDIO near-dup: real WAV decode → integer
    //      energy-delta fingerprint (65×32-sample frames, bit =
    //      next-frame energy greater) → 4×16-bit band join → exact
    //      Hamming verify. The fixture plants +500-offset copies every
    //      29th sample; the oracle replays waveform, frame energies,
    //      delta bits, banding AND Hamming ----
    "q119_audio_neardup" -> Q(
      (s, d) => {
        import s.implicits._
        val blobs = Tables.documents(s, d).select(col("doc_id")).as[Long]
          .map(id => (id, Wav.build16(8000, syntheticPcmNearDup(id))))
          .toDF("doc_id", "audio")
        audioFingerprintDups(s, blobs).orderBy("ia", "ib")
      },
      Some("""WITH base AS (SELECT doc_id,
             |    CASE WHEN doc_id % 11 = 7 THEN doc_id - 1 ELSE doc_id END AS src,
             |    CASE WHEN doc_id % 11 = 7 THEN 1 ELSE 0 END AS cpy
             |  FROM documents),
             |smp AS (SELECT b.doc_id, i.range AS i,
             |    (b.src*2654435761 + i.range*(69069 + b.src*64)) % 40009 % 24001 - 12000
             |      + CASE WHEN b.cpy = 1 AND i.range % 29 = 0 THEN 500 ELSE 0 END AS s
             |  FROM base b, range(2080) i),
             |en AS (SELECT doc_id, i // 32 AS f, sum(abs(s)) AS e
             |  FROM smp GROUP BY doc_id, f),
             |bits AS (SELECT a.doc_id, a.f AS bit,
             |    CASE WHEN b.e > a.e THEN 1 ELSE 0 END AS v
             |  FROM en a JOIN en b ON a.doc_id = b.doc_id AND b.f = a.f + 1
             |  WHERE a.f < 64),
             |bands AS (SELECT doc_id, bit // 16 AS bi,
             |    CAST(sum(v * (1 << (bit % 16))) AS BIGINT) AS bv
             |  FROM bits GROUP BY doc_id, bi),
             |hx AS (SELECT doc_id,
             |    max(CASE WHEN bi = 0 THEN bv END) AS b0,
             |    max(CASE WHEN bi = 1 THEN bv END) AS b1,
             |    max(CASE WHEN bi = 2 THEN bv END) AS b2,
             |    max(CASE WHEN bi = 3 THEN bv END) AS b3
             |  FROM bands GROUP BY doc_id),
             |cand AS (SELECT DISTINCT a.doc_id AS ia, b.doc_id AS ib
             |  FROM bands a JOIN bands b
             |    ON a.bi = b.bi AND a.bv = b.bv AND a.doc_id < b.doc_id)
             |SELECT c.ia, c.ib,
             |  CAST(bit_count(xor(x.b0, y.b0)) + bit_count(xor(x.b1, y.b1)) +
             |       bit_count(xor(x.b2, y.b2)) + bit_count(xor(x.b3, y.b3)) AS BIGINT)
             |    AS hamming
             |FROM cand c JOIN hx x ON x.doc_id = c.ia JOIN hx y ON y.doc_id = c.ib
             |WHERE bit_count(xor(x.b0, y.b0)) + bit_count(xor(x.b1, y.b1)) +
             |      bit_count(xor(x.b2, y.b2)) + bit_count(xor(x.b3, y.b3)) <= 6
             |ORDER BY ia, ib""".stripMargin)),

    // ---- image decode through the real BMP parser (stride padding,
    //      bottom-up rows, BT.601 luminance) + 4×4 nearest resize; the
    //      oracle recomputes pixel sums/extrema and the resize's exact
    //      floor-sampling arithmetic with lateral range() joins ----
    "q58_image_decode" -> Q(
      (s, d) => imageFeatures(s, Tables.documents(s, d)),
      Some("""WITH dims AS (
             |  SELECT doc_id, 5 + doc_id % 12 AS w, 4 + doc_id % 9 AS h FROM documents),
             |pix AS (
             |  -- duckdb 1.0 range() takes no correlated args: cross-join
             |  -- the max extent (w<=16, h<=12) and filter per doc
             |  SELECT d.doc_id,
             |         SUM((d.doc_id*31 + y.y*7 + x.x*13) % 256) AS pix_sum,
             |         MAX((d.doc_id*31 + y.y*7 + x.x*13) % 256) AS pix_max
             |  FROM dims d, range(16) x(x), range(12) y(y)
             |  WHERE x.x < d.w AND y.y < d.h
             |  GROUP BY d.doc_id),
             |rz AS (
             |  SELECT d.doc_id,
             |         SUM((d.doc_id*31 + (oy.oy*d.h//4)*7 + (ox.ox*d.w//4)*13) % 256) AS rz4_sum
             |  FROM dims d, range(4) ox(ox), range(4) oy(oy)
             |  GROUP BY d.doc_id)
             |SELECT d.doc_id, CAST(d.w AS INT) AS width, CAST(d.h AS INT) AS height,
             |       CAST(d.w * d.h AS BIGINT) AS n_pixels,
             |       CAST(p.pix_sum AS BIGINT) AS pix_sum,
             |       CAST(p.pix_max AS INT) AS pix_max,
             |       CAST(r.rz4_sum AS BIGINT) AS rz4_sum
             |FROM dims d JOIN pix p USING (doc_id) JOIN rz r USING (doc_id)
             |ORDER BY doc_id""".stripMargin)),

    // ---- audio feature extraction over SIGNED 16-bit PCM: zero
    //      crossings and integer energy — the fixture is a closed-form
    //      signed waveform (range -2000..2000, so sign transitions
    //      actually occur, unlike the non-negative codepoint samples of
    //      q40b), and every feature is integer arithmetic the oracle
    //      reproduces exactly ----
    "q62_audio_features" -> Q(
      (s, d) => audioFeatures(s, Tables.documents(s, d)),
      Some("""WITH dims AS (
             |  SELECT doc_id, 50 + doc_id % 37 AS n FROM documents),
             |smp AS (
             |  -- n <= 86; sample i of doc: (doc_id*13 + i*7) % 4001 - 2000
             |  SELECT d.doc_id, i.i,
             |         (d.doc_id*13 + i.i*7) % 4001 - 2000 AS v
             |  FROM dims d, range(86) i(i)
             |  WHERE i.i < d.n),
             |zc AS (
             |  -- crossing at i>0 when sign(v[i-1]) != sign(v[i]), with
             |  -- sign(x) = x < 0 (zero counts as non-negative)
             |  SELECT a.doc_id, count(*) AS zc_cnt
             |  FROM smp a JOIN smp b ON a.doc_id = b.doc_id AND b.i = a.i - 1
             |  WHERE (a.v < 0) != (b.v < 0)
             |  GROUP BY a.doc_id),
             |en AS (
             |  SELECT doc_id, CAST(sum(v*v) AS BIGINT) AS energy,
             |         max(abs(v)) AS peak_abs
             |  FROM smp GROUP BY doc_id)
             |SELECT d.doc_id, CAST(d.n AS BIGINT) AS n_samples,
             |       CAST(coalesce(z.zc_cnt, 0) AS BIGINT) AS zc_cnt,
             |       e.energy, CAST(e.peak_abs AS INT) AS peak_abs
             |FROM dims d JOIN en e USING (doc_id)
             |LEFT JOIN zc z ON d.doc_id = z.doc_id
             |ORDER BY d.doc_id""".stripMargin)),

    // ---- STEREO decode: two distinct closed-form waveforms interleaved
    //      as 2-channel 16-bit PCM; the frame-paired dot product pins
    //      the de-interleaving itself, the distinct marginals pin
    //      channel identity ----
    "q68_stereo_decode" -> Q(
      (s, d) => stereoFeatures(s, Tables.documents(s, d)),
      Some("""WITH dims AS (
             |  SELECT doc_id, 50 + doc_id % 37 AS n FROM documents),
             |smp AS (
             |  -- n <= 86; frame i: left (id*13+i*7)%4001-2000,
             |  --                   right (id*19+i*11)%4001-2000
             |  SELECT d.doc_id, i.i,
             |         (d.doc_id*13 + i.i*7) % 4001 - 2000 AS l,
             |         (d.doc_id*19 + i.i*11) % 4001 - 2000 AS r
             |  FROM dims d, range(86) i(i)
             |  WHERE i.i < d.n)
             |SELECT doc_id, 2 AS channels, CAST(count(*) AS BIGINT) AS n_frames,
             |       CAST(sum(l) AS BIGINT) AS l_sum, CAST(sum(r) AS BIGINT) AS r_sum,
             |       CAST(max(abs(l)) AS INT) AS l_peak_abs,
             |       CAST(max(abs(r)) AS INT) AS r_peak_abs,
             |       CAST(sum(l*r) AS BIGINT) AS lr_dot
             |FROM smp GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // ---- video frame-sample: every 3rd frame of an 8×6 gray FSEQ
    //      blob, summing only sampled frames' bytes — the oracle walks
    //      the same frames with range(0, nf, 3) ----
    "q59_frame_sample" -> Q(
      (s, d) => frameSampleFeatures(s, Tables.documents(s, d)),
      Some("""WITH dims AS (
             |  SELECT doc_id, 4 + doc_id % 7 AS nf FROM documents),
             |smp AS (
             |  -- nf <= 10; f % 3 = 0 selects the sampled frames
             |  SELECT d.doc_id,
             |         SUM((d.doc_id*17 + f.f*29 + y.y*5 + x.x*3) % 256) AS sampled_sum
             |  FROM dims d, range(10) f(f), range(8) x(x), range(6) y(y)
             |  WHERE f.f < d.nf AND f.f % 3 = 0
             |  GROUP BY d.doc_id)
             |SELECT d.doc_id, CAST(d.nf AS INT) AS n_frames,
             |       CAST((d.nf + 2) // 3 AS INT) AS n_sampled,
             |       CAST(s.sampled_sum AS BIGINT) AS sampled_sum
             |FROM dims d JOIN smp s USING (doc_id)
             |ORDER BY doc_id""".stripMargin)),
  )
}
