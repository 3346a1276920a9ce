package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.graph.Triangles

/** Measured demo for the q188 rewrite ([[graft.graph.Triangles
  * .edgeTriangleCountsOf]]): per-edge common-neighbor counts via the
  * √(2m)-bounded oriented intersection vs the naive formulation that
  * collects FULL undirected neighborhoods and joins them onto every
  * edge. The naive path's adjacency rows are bounded only by d_max —
  * on a hub graph the hub's row is O(rim) and every incident edge
  * drags the whole row through the join — while the oriented path's
  * rows obey the d⁺ ≤ √(2m) theorem regardless of skew. Outputs are
  * asserted identical BEFORE timing; shuffle WRITE bytes are the
  * number that transfers to cluster scale (local wall under-sells
  * hot-row shuffles). Broadcasts forced off, same rationale as
  * TriangleBench. Run: sbt "runMain graft.examples.EmbeddednessBench [rimSize]"
  */
object EmbeddednessBench {
  def main(args: Array[String]): Unit = {
    val rim = args.headOption.map(_.toInt).getOrElse(20000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // hub 0 — rim 1..rim; ring i—(i+1); chords (same graph as
    // TriangleBench: the hub is every real graph's worst node)
    val spokes = spark.range(1, rim + 1).select(lit(0L).as("a"), col("id").as("b"))
    val ring = spark.range(1, rim.toLong).select(col("id").as("a"), (col("id") + 1).as("b"))
    val chords = spark.range(1, rim + 1).select(col("id").as("a"),
        (pmod(col("id") * 2654435761L, lit(rim.toLong)) + 1L).as("b"))
      .filter(col("a") =!= col("b"))
    val und = Triangles.canonicalEdges(
      spokes.unionAll(ring).unionAll(chords)).cache()
    und.count()

    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        shuffleBytes.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })
    def settle(): Long = { Thread.sleep(1500); shuffleBytes.get() }
    def time[T](f: => T): (T, Double, Long) = {
      val b0 = settle()
      val t0 = System.nanoTime(); val r = f
      val dt = (System.nanoTime() - t0) / 1e9
      (r, dt, settle() - b0)
    }

    // --- oriented path (the operator) ---
    val (oriented, tOriented, bOriented) = time {
      Triangles.edgeTriangleCountsOf(spark, und)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    }

    // --- naive path: FULL undirected neighborhoods joined per edge ---
    val (naive, tNaive, bNaive) = time {
      val ed = und.select(col("a").as("u"), col("b").as("v"))
        .unionAll(und.select(col("b").as("u"), col("a").as("v")))
      val adj = ed.groupBy(col("u").as("n")).agg(collect_list(col("v")).as("nb"))
      und
        .join(adj.select(col("n").as("a"), col("nb").as("na_")), "a")
        .join(adj.select(col("n").as("b"), col("nb").as("nb_")), "b")
        .select(col("a"), col("b"),
          size(array_intersect(col("na_"), col("nb_"))).cast("long").as("cn"))
        .filter(col("cn") > 0)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    }

    require(oriented == naive,
      s"per-edge counts differ: ${oriented.size} vs ${naive.size} entries")

    // the naive path's worst row: the hub's full neighborhood
    val dmax = und.select(explode(array(col("a"), col("b"))).as("x"))
      .groupBy("x").agg(count(lit(1)).as("d"))
      .agg(max("d")).head.getLong(0)
    val m = und.count()
    val json = f"""{"rim": $rim, "edges": $m, "d_max": $dmax, """ +
      f""""sqrt2m_bound": ${math.ceil(math.sqrt(2.0 * m)).toLong}, """ +
      f""""edges_in_triangles": ${oriented.size}, """ +
      f""""oriented_sec": $tOriented%.2f, "naive_sec": $tNaive%.2f, """ +
      f""""oriented_shuffle_bytes": $bOriented, "naive_shuffle_bytes": $bNaive, """ +
      f""""shuffle_cut": ${bNaive.toDouble / math.max(bOriented, 1L)}%.1f, """ +
      f""""speedup": ${tNaive / tOriented}%.2f}"""
    println(s"EMBEDDEDNESSBENCH $json")
    spark.stop()
  }
}
