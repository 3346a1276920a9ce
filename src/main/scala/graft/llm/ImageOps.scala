package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.rel.RelQueries.Q
import graft.rel.Tables
import graft.io.{Bmp, Fseq}

/** Multimodal IMAGE and VIDEO column operators, completing the decode /
  * feature-extract / resize / frame-sample quartet next to the audio
  * path (q40, [[graft.io.Wav]]): opaque binary blobs decoded through
  * real strict parsers ([[graft.io.Bmp]], [[graft.io.Fseq]]) at a
  * per-partition boundary, features extracted as narrow columns.
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
