package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.rel.RelQueries.Q
import graft.rel.Tables
import graft.io.{Bmp, Fseq}

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

  val all: ListMap[String, Q] = ListMap(
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
