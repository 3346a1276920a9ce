package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.rel.RelQueries.Q
import graft.rel.Tables

/** IVF ANN index LIFECYCLE: train once, persist, serve probe batches
  * from the stored index without the corpus — the production shape of
  * [[IvfOps.ivfTopK]] (which trains per call, right for one-shot
  * queries, wrong for a serving path).
  *
  * Layout under `dir`:
  *   - `centroids/`   — (cell, centroid) parquet, codebook-sized
  *   - `assignments/` — (id, vec, cell) parquet **partitioned by cell**
  *
  * The partitioning is the point: a probe touches `nProbe` cell
  * directories and Spark's hive-style partition pruning keeps every
  * other cell's files UNREAD (`PartitionFilters` in the scan —
  * AnnIndexSpec pins it). At 10⁹ vectors the index is the big artifact;
  * serving cost scales with nProbe/cells of it, not with it.
  *
  * Determinism: training is [[IvfOps.trainCentroids]] (k-center seeded,
  * ordered folds), assignments store the ORIGINAL f32 vectors (parquet
  * round-trips them bit-exactly), and the probe re-ranks through the
  * same codegen'd cosine as ivfTopK — so probing a saved index is
  * BIT-IDENTICAL to ivfTopK on the same corpus (AnnIndexSpec), and
  * q65's pinned recall equals q47's.
  */
object AnnIndex {

  /** Train an IVF index over `emb` and persist it under `dir`. */
  def saveIvf(s: SparkSession, emb: DataFrame, dir: String,
      cells: Int = 16, iters: Int = 3, multiAssign: Int = 2,
      id: String = "id", vec: String = "vec"): Unit = {
    import s.implicits._
    val norm = IvfOps.normalized(s, emb, id, vec).cache()
    val cents = IvfOps.trainCentroids(s, norm, cells, iters)
    norm.unpersist()
    // one narrow pass: normalize per row for cell lookup, store the
    // original f32 vector for bit-identical re-rank at probe time
    IvfOps.assignRows(s, emb, cents, multiAssign, id, vec)
      .write.mode("overwrite").partitionBy("cell").parquet(s"$dir/assignments")
    cents.zipWithIndex.map { case (c, i) => (i, c) }.toSeq
      .toDF("cell", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/centroids")
  }

  private def readCentroids(s: SparkSession, dir: String): Array[Array[Double]] = {
    import s.implicits._
    s.read.parquet(s"$dir/centroids").as[(Int, Array[Double])]
      .collect().sortBy(_._1).map(_._2) // codebook-sized collect
  }

  /** Streaming index MAINTENANCE: assign arriving vectors against the
    * STORED centroids (no retrain) and append them to the
    * cell-partitioned assignments via foreachBatch. Delivery is
    * at-least-once — which is CORRECT here, because the probe path is
    * idempotent to duplicated assignment rows (bit-identical scored
    * copies collapse in the (qid, id) max; AnnIndexSpec pins it).
    * Centroid drift is the standard serving tradeoff: periodic
    * re-train + atomic swap, with appends covering the gap.
    */
  def appendIvfStream(s: SparkSession, stream: DataFrame, dir: String,
      checkpoint: String, multiAssign: Int = 2,
      id: String = "id", vec: String = "vec")
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val cents = readCentroids(s, dir)
    IvfOps.assignRows(s, stream, cents, multiAssign, id, vec)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode("append").partitionBy("cell")
          .parquet(s"$dir/assignments")
      }
      .option("checkpointLocation", checkpoint)
      .start()
  }

  /** Index MAINTENANCE: compact the appended assignment log. An
    * at-least-once append stream leaves bit-identical duplicate rows
    * and many small files; probes stay CORRECT through them (the
    * (qid, id) max collapses copies) but pay decode + dedup work per
    * probe. Compaction rewrites the assignments deduped by (id, cell)
    * — duplicates are identical, so content is unchanged and probes
    * are bit-identical before/after (AnnIndexSpec).
    *
    * The rewrite goes to a sibling temp dir, then swaps via FS rename —
    * not atomic against concurrent probes (HDFS rename is atomic,
    * object stores are not); a serving deployment compacts into a NEW
    * index dir and flips a pointer.
    */
  def compactIvf(s: SparkSession, dir: String): Unit = {
    val conf = s.sparkContext.hadoopConfiguration
    val cur = new org.apache.hadoop.fs.Path(s"$dir/assignments")
    val tmp = new org.apache.hadoop.fs.Path(s"$dir/assignments__compact")
    val fs = cur.getFileSystem(conf)
    if (fs.exists(tmp)) fs.delete(tmp, true)
    s.read.parquet(cur.toString)
      .dropDuplicates("id", "cell")
      .write.partitionBy("cell").parquet(tmp.toString)
    fs.delete(cur, true)
    require(fs.rename(tmp, cur), s"compaction swap failed for $cur")
  }

  /** the partition-pruned index scan for a probe-cell set (exposed so
    * the spec can assert `PartitionFilters` on exactly this plan)
    */
  private[graft] def prunedAssignments(s: SparkSession, dir: String,
      probeCells: Seq[Int]): DataFrame =
    s.read.parquet(s"$dir/assignments")
      .filter(col("cell").isin(probeCells: _*))

  /** Cosine top-k per query against a saved index — output identical to
    * [[IvfOps.ivfTopK]] with the same build parameters: (qid, rn, id,
    * cos, n_candidates).
    */
  def probeIvf(s: SparkSession, dir: String, queries: DataFrame, k: Int,
      nProbe: Int = 6, excludeSelfId: Boolean = true,
      id: String = "id", vec: String = "vec",
      qid: String = "qid", qvec: String = "qvec"): DataFrame = {
    import s.implicits._
    val cents = readCentroids(s, dir)
    val bc = s.sparkContext.broadcast(cents)
    // collected once: nProbe ints per query — no bigger than the
    // broadcast the candidate join ships anyway, and collecting (rather
    // than persist()ing for the two consumers) leaves nothing cached in
    // executor storage after the probe batch returns (a long-lived
    // serving session would otherwise accrue one cached plan per batch)
    val probeRows = IvfOps.normalized(s, queries, qid, qvec)
      .flatMap { case (q, v) =>
        IvfOps.nearestCells(bc.value, v, nProbe).map(c => (q, c))
      }
      .collect()
    val probes = probeRows.toSeq.toDF(qid, "cell")
    // the union of probe cells decides which index partitions exist in
    // the plan at all (≤ `cells` ints)
    val probeCells = probeRows.map(_._2).distinct.toSeq
    val idx = prunedAssignments(s, dir, probeCells)
    // score DURING the pruned scan: the probe list and query vectors
    // broadcast, the cosine evaluates in the same narrow pass that
    // reads the cell partitions — the INDEX VECTORS NEVER SHUFFLE
    // (an earlier formulation collected candidate ids, then joined the
    // id→vec store by id: at 1M vectors that row join cost 4× the
    // whole brute-force scan, AnnBench — the shuffle was the
    // bottleneck, not the compute the pruning saves)
    val scored = idx.join(broadcast(probes), "cell")
      .filter(if (excludeSelfId) col(id) =!= col(qid) else lit(true))
      .join(broadcast(queries.select(col(qid), col(qvec))), qid)
      .withColumn("cos",
        graft.functions.VecFunctions.vecCosine(s, col(qvec), col(vec)))
      .select(col(qid), col(id), col("cos"))
    // multi-assignment emits bit-identical (qid, id, cos) copies when a
    // query probes several of an id's cells — collapse them map-side
    // (max of identical doubles) so the shuffle carries deduped
    // candidates, not the cross product
    val dedup = scored.groupBy(col(qid), col(id)).agg(max(col("cos")).as("cos"))
    val nc = dedup.groupBy(qid).agg(count(lit(1)).as("n_candidates"))
    graft.functions.TopK.perKeyTopK(dedup, k, qid, id, "cos")
      .join(broadcast(nc), qid)
      .select(col(qid), col("rn"), col(id), col("cos"), col("n_candidates"))
      .orderBy(qid, "rn")
  }

  /** Persist an IVFADC index under `dir`: coarse `centroids/`, residual
    * PQ `codebooks/`, the encoded corpus `codes/` **partitioned by
    * cell** (4+subQ bytes of payload per vector — the artifact that
    * replaces the corpus in the scan), and `vectors/` (the id→vec store
    * only the top-`rerank` candidates hit). Probing it
    * ([[probeIvfPq]]) is bit-identical to [[IvfPqOps.ivfPqTopK]]: both
    * run [[IvfPqOps.probeEncoded]] on the same (deterministically
    * trained) artifacts.
    */
  def saveIvfPq(s: SparkSession, emb: DataFrame, dir: String,
      cells: Int = 16, coarseIters: Int = 3, multiAssign: Int = 2,
      subQ: Int = 8, codes: Int = 16, pqIters: Int = 3,
      id: String = "id", vec: String = "vec", opqIters: Int = 0): Unit = {
    import s.implicits._
    val (cents, books, rot, encoded) = IvfPqOps.trainEncode(
      s, emb, cells, coarseIters, multiAssign, subQ, codes, pqIters, id, vec,
      opqIters)
    // the OPQ rotation (if trained) is part of the index: codes only
    // decode in its space, so it persists next to the codebooks
    writeRotation(s, dir, rot)
    encoded.write.mode("overwrite").partitionBy("cell").parquet(s"$dir/codes")
    emb.select(col(id), col(vec)).write.mode("overwrite").parquet(s"$dir/vectors")
    cents.zipWithIndex.map { case (c, i) => (i, c) }.toSeq
      .toDF("cell", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/centroids")
    books.zipWithIndex.flatMap { case (book, qi) =>
      book.zipWithIndex.map { case (cent, code) => (qi, code, cent) }
    }.toSeq.toDF("subspace", "code", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/codebooks")
  }

  private def readCodebooks(s: SparkSession, dir: String): Array[Array[Array[Double]]] = {
    import s.implicits._
    s.read.parquet(s"$dir/codebooks")
      .as[(Int, Int, Array[Double])].collect()
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map(_._2.sortBy(_._2).map(_._3)).toArray // codebook-sized collect
  }

  /** existence check through the dir's own Hadoop FileSystem — a
    * java.io.File test is always false on HDFS/S3 and would silently
    * skip the rotation (unrotated queries scored against
    * rotated-residual codebooks: degraded recall, no error)
    */
  private def readRotation(s: SparkSession, dir: String): Option[Array[Array[Double]]] = {
    import s.implicits._
    val rotPath = new org.apache.hadoop.fs.Path(s"$dir/rotation")
    val rotFs = rotPath.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!rotFs.exists(rotPath)) None
    else Some(s.read.parquet(s"$dir/rotation").as[(Int, Array[Double])]
      .collect().sortBy(_._1).map(_._2))
  }

  /** write (opqIters > 0) or REMOVE (opqIters == 0) the `rotation/`
    * artifact — a rotation-less save into a dir that previously held a
    * rotated index must delete the stale rotation, or a later probe
    * would rotate queries against codes encoded unrotated
    */
  private def writeRotation(s: SparkSession, dir: String,
      rot: Option[Array[Array[Double]]]): Unit = {
    import s.implicits._
    rot match {
      case Some(r) =>
        r.zipWithIndex.map { case (row, i) => (i, row) }.toSeq
          .toDF("i", "row")
          .coalesce(1).write.mode("overwrite").parquet(s"$dir/rotation")
      case None =>
        val p = new org.apache.hadoop.fs.Path(s"$dir/rotation")
        val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (fs.exists(p)) fs.delete(p, true)
        ()
    }
  }

  /** Cosine top-k per query against a saved IVFADC index — bit-identical
    * to [[IvfPqOps.ivfPqTopK]] with the same build parameters, reading
    * only the probed cells' code partitions plus the re-rank joins.
    */
  def probeIvfPq(s: SparkSession, dir: String, queries: DataFrame, k: Int,
      nProbe: Int = 6, rerank: Int = 100, excludeSelfId: Boolean = true,
      maxProbeBatch: Int = 4096,
      id: String = "id", vec: String = "vec",
      qid: String = "qid", qvec: String = "qvec"): DataFrame = {
    val cents = readCentroids(s, dir)
    val books = readCodebooks(s, dir)
    val encoded = s.read.parquet(s"$dir/codes")
    val vectors = s.read.parquet(s"$dir/vectors")
    val rot = readRotation(s, dir)
    IvfPqOps.probeEncoded(s, cents, books, encoded, vectors, queries, k,
      nProbe, rerank, excludeSelfId, maxProbeBatch, id, vec, qid, qvec, rot)
  }

  /** Persist a FLAT PQ index under `dir`: `codebooks/`, the encoded
    * corpus `codes/` (subQ bytes of payload per vector — no coarse
    * partitioning: the flat-PQ ADC scan reads every code row by design,
    * that is the "vectors don't fit, codes do" trade), `vectors/` (the
    * id→vec store only the top-`rerank` candidates hit), and the OPQ
    * `rotation/` when `opqIters > 0` (trained exactly as
    * [[OpqOps.opqTopK]] trains it). Probing ([[probePq]]) is
    * bit-identical to [[PqOps.pqTopK]] / [[OpqOps.opqTopK]] with the
    * same parameters: both sides run [[PqOps.probeEncodedFlat]] on the
    * same deterministically trained artifacts.
    */
  def savePq(s: SparkSession, emb: DataFrame, dir: String,
      subQ: Int = 8, codes: Int = 16, iters: Int = 3, opqIters: Int = 0,
      id: String = "id", vec: String = "vec"): Unit = {
    import s.implicits._
    val rot =
      if (opqIters <= 0) None
      else {
        val sampleN = math.max(4 * codes, 256)
        val pts = OpqOps.orderedSample(s, emb, id, vec, sampleN)
        Some(OpqOps.trainRotation(pts, subQ, codes, opqIters))
      }
    val (books, encoded) =
      PqOps.trainEncodeFlat(s, emb, subQ, codes, iters, id, vec, rot)
    writeRotation(s, dir, rot)
    encoded.write.mode("overwrite").parquet(s"$dir/codes")
    emb.select(col(id), col(vec)).write.mode("overwrite").parquet(s"$dir/vectors")
    books.zipWithIndex.flatMap { case (book, qi) =>
      book.zipWithIndex.map { case (cent, code) => (qi, code, cent) }
    }.toSeq.toDF("subspace", "code", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/codebooks")
  }

  /** Cosine top-k per query against a saved flat-PQ index —
    * bit-identical to [[PqOps.pqTopK]] with the same build parameters.
    */
  def probePq(s: SparkSession, dir: String, queries: DataFrame, k: Int,
      rerank: Int = 100, excludeSelfId: Boolean = true,
      maxProbeBatch: Int = 4096,
      id: String = "id", vec: String = "vec",
      qid: String = "qid", qvec: String = "qvec"): DataFrame = {
    val books = readCodebooks(s, dir)
    val encoded = s.read.parquet(s"$dir/codes")
    val vectors = s.read.parquet(s"$dir/vectors")
    val rot = readRotation(s, dir)
    PqOps.probeEncodedFlat(s, books, encoded, vectors, queries, k,
      rerank, excludeSelfId, maxProbeBatch, id, vec, qid, qvec, rot)
  }

  /** one index build per (session, dataset): the q65 entries both serve
    * from it instead of re-training twice per run, and the work tree is
    * removed on JVM exit
    */
  private val built = scala.collection.concurrent.TrieMap[String, String]()

  private def indexDirFor(s: SparkSession, d: String): String =
    built.getOrElseUpdate(d, {
      val work = java.nio.file.Files.createTempDirectory("graft-q65")
      sys.addShutdownHook {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm))
          f.delete(); ()
        }
        rm(work.toFile)
      }
      val e = Tables.embeddings(s, d)
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      saveIvf(s, e, work.toString)
      work.toString
    })

  /** q65 driver shape: serve the q47 probe batch from the saved index */
  private def indexTop5(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val q = e.filter(col("id") < 8)
      .select(col("id").as("qid"), col("vec").as("qvec"))
    probeIvf(s, indexDirFor(s, d), q, k = 5)
      .select(col("qid"), col("rn"), col("id").as("nn_id"), col("cos"),
        col("n_candidates"))
  }

  /** one flat-PQ index build per (session, dataset) — the q84 entries
    * both serve from it
    */
  private val builtPq = scala.collection.concurrent.TrieMap[String, String]()

  private def pqIndexDirFor(s: SparkSession, d: String): String =
    builtPq.getOrElseUpdate(d, {
      val work = java.nio.file.Files.createTempDirectory("graft-q84")
      sys.addShutdownHook {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm))
          f.delete(); ()
        }
        rm(work.toFile)
      }
      val e = Tables.embeddings(s, d)
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      savePq(s, e, work.toString)
      work.toString
    })

  /** q84 driver shape: serve the q55 probe batch from the saved index */
  private def pqIndexTop5(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val q = e.filter(col("id") < 8)
      .select(col("id").as("qid"), col("vec").as("qvec"))
    probePq(s, pqIndexDirFor(s, d), q, k = 5)
      .select(col("qid"), col("rn"), col("id").as("nn_id"), col("cos"),
        col("n_candidates"))
  }

  val all: ListMap[String, Q] = ListMap(
    // ---- IVF index lifecycle: persist partitioned-by-cell, probe via
    //      partition-pruned scans ----
    "q65_ivf_index_ann" -> Q((s, d) => AnnPin.pinnable(s, d, indexTop5(s, d), "q65_ivf_index_ann", guard = false),
      Some("""SELECT qid, rn, nn_id, cos_milli, n_candidates FROM (VALUES
             |  (0, 1, 365, 370, 316), (0, 2, 334, 363, 316),
             |  (0, 3, 423, 297, 316), (0, 4, 190, 282, 316),
             |  (0, 5, 464, 277, 316), (1, 1, 386, 371, 310),
             |  (1, 2, 27, 348, 310), (1, 3, 195, 323, 310),
             |  (1, 4, 64, 316, 310), (1, 5, 124, 303, 310),
             |  (2, 1, 117, 318, 284), (2, 2, 450, 266, 284),
             |  (2, 3, 145, 263, 284), (2, 4, 188, 263, 284),
             |  (2, 5, 320, 255, 284), (3, 1, 130, 400, 296),
             |  (3, 2, 343, 308, 296), (3, 3, 174, 304, 296),
             |  (3, 4, 231, 299, 296), (3, 5, 207, 292, 296),
             |  (4, 1, 114, 399, 313), (4, 2, 496, 341, 313),
             |  (4, 3, 408, 323, 313), (4, 4, 280, 280, 313),
             |  (4, 5, 249, 280, 313), (5, 1, 404, 328, 301),
             |  (5, 2, 419, 319, 301), (5, 3, 157, 311, 301),
             |  (5, 4, 33, 311, 301), (5, 5, 359, 306, 301),
             |  (6, 1, 350, 325, 294), (6, 2, 430, 323, 294),
             |  (6, 3, 145, 298, 294), (6, 4, 437, 283, 294),
             |  (6, 5, 386, 275, 294), (7, 1, 340, 493, 320),
             |  (7, 2, 425, 408, 320), (7, 3, 209, 394, 320),
             |  (7, 4, 334, 357, 320), (7, 5, 381, 345, 320))
             |  AS t(qid, rn, nn_id, cos_milli, n_candidates)
             |ORDER BY qid, rn""".stripMargin)),

    // ---- recall vs exact top-5: probing the SAVED index is
    //      bit-identical to q47's train-and-probe (same codebook, same
    //      candidates, same cosine), so the pinned values equal
    //      q47_ivf_recall's ----
    "q65_ivf_index_recall" -> Q(
      (s, d) => IvfOps.recallVsExact(s, d,
        indexTop5(s, d).select(col("qid"), col("nn_id").as("vec_id"))),
      Some(IvfOps.ivfRecallOracle)),

    // ---- flat-PQ index lifecycle: persist codebooks + codes + vectors,
    //      probe via the same ADC scan train-and-probe runs ----
    "q84_pq_index_ann" -> Q((s, d) => AnnPin.pinnable(s, d, pqIndexTop5(s, d), "q84_pq_index_ann", guard = false),
      Some("""SELECT qid, rn, nn_id, cos_milli, n_candidates FROM (VALUES
             |  (0, 1, 365, 370, 100), (0, 2, 334, 363, 100),
             |  (0, 3, 387, 331, 100), (0, 4, 423, 297, 100),
             |  (0, 5, 73, 295, 100), (1, 1, 386, 371, 100),
             |  (1, 2, 27, 348, 100), (1, 3, 407, 327, 100),
             |  (1, 4, 195, 323, 100), (1, 5, 64, 316, 100),
             |  (2, 1, 117, 318, 100), (2, 2, 450, 266, 100),
             |  (2, 3, 188, 263, 100), (2, 4, 320, 255, 100),
             |  (2, 5, 418, 254, 100), (3, 1, 130, 400, 100),
             |  (3, 2, 149, 330, 100), (3, 3, 343, 308, 100),
             |  (3, 4, 174, 304, 100), (3, 5, 231, 299, 100),
             |  (4, 1, 114, 399, 100), (4, 2, 496, 341, 100),
             |  (4, 3, 482, 314, 100), (4, 4, 280, 280, 100),
             |  (4, 5, 249, 280, 100), (5, 1, 404, 328, 100),
             |  (5, 2, 419, 319, 100), (5, 3, 157, 311, 100),
             |  (5, 4, 33, 311, 100), (5, 5, 359, 306, 100),
             |  (6, 1, 430, 323, 100), (6, 2, 145, 298, 100),
             |  (6, 3, 437, 283, 100), (6, 4, 395, 259, 100),
             |  (6, 5, 214, 257, 100), (7, 1, 340, 493, 100),
             |  (7, 2, 425, 408, 100), (7, 3, 209, 394, 100),
             |  (7, 4, 334, 357, 100), (7, 5, 381, 345, 100))
             |  AS t(qid, rn, nn_id, cos_milli, n_candidates)
             |ORDER BY qid, rn""".stripMargin)),

    // ---- recall vs exact top-5: probing the SAVED flat-PQ index is
    //      bit-identical to q55's train-and-probe (same deterministic
    //      sample/k-center/Lloyd artifacts, same ADC scan, same
    //      re-rank), so the pinned values equal q55_pq_recall's ----
    "q84_pq_index_recall" -> Q(
      (s, d) => {
        val approx = pqIndexTop5(s, d).select(col("qid"), col("nn_id").as("vec_id"))
        SketchOps.exactTop5(s, d)
          .join(approx.withColumn("hit", lit(1)), Seq("qid", "vec_id"), "left")
          .groupBy("qid")
          .agg(sum(coalesce(col("hit"), lit(0))).as("n_hits"))
          .select(col("qid"), col("n_hits"),
            (col("n_hits").cast("double") / 5).as("recall_at_5"))
          .orderBy("qid")
      },
      Some("""SELECT qid, n_hits, CAST(recall AS DOUBLE) AS recall_at_5
             |FROM (VALUES (0, 5, 1.0), (1, 5, 1.0), (2, 4, 0.8), (3, 5, 1.0),
             |  (4, 4, 0.8), (5, 5, 1.0), (6, 3, 0.6), (7, 5, 1.0))
             |  AS t(qid, n_hits, recall)
             |ORDER BY qid""".stripMargin)),
  )
}
