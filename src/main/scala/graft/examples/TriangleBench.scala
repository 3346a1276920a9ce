package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.graph.Triangles

/** Measured demo for [[graft.graph.Triangles]]: the degree-oriented
  * wedge enumeration vs the naive center-join on a hub graph. The
  * orientation claim is structural — a degree-D hub generates C(D,2)
  * wedge candidates naively but ZERO once its edges all point into it
  * — and this bench measures it: wedge rows actually enumerated, plus
  * wall time, with the global triangle count asserted equal first.
  *
  * Graph: one hub linked to every rim node, rim ring edges (every
  * (hub, i, i+1) closes a triangle), plus pseudo-random chords. Real
  * graphs are power-law; the hub is every real graph's worst node.
  * Caveat recorded with the numbers: local wall under-sells the cut —
  * at cluster scale the naive hub wedges are a single-key shuffle
  * explosion (the q34-style hot key), not just wasted CPU.
  * Run: sbt "runMain graft.examples.TriangleBench [rimSize]"
  */
object TriangleBench {
  def main(args: Array[String]): Unit = {
    val rim = args.headOption.map(_.toInt).getOrElse(20000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // broadcast OFF (both planners): at bench size every join side
      // fits a local broadcast and writes ~zero shuffle bytes, hiding
      // exactly the volume this bench exists to measure — at cluster
      // scale the edge tables exceed any broadcast threshold and the
      // joins shuffle, so force the shuffle plan here
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // hub 0 — rim 1..rim; ring i—(i+1); chords i—(i*2654435761 mod rim)+1
    val spokes = spark.range(1, rim + 1).select(lit(0L).as("a"), col("id").as("b"))
    val ring = spark.range(1, rim.toLong).select(col("id").as("a"), (col("id") + 1).as("b"))
    val chords = spark.range(1, rim + 1).select(col("id").as("a"),
        (pmod(col("id") * 2654435761L, lit(rim.toLong)) + 1L).as("b"))
      .filter(col("a") =!= col("b"))
    val edges = spokes.unionAll(ring).unionAll(chords)
    val und = edges
      .select(least(col("a"), col("b")).as("a"), greatest(col("a"), col("b")).as("b"))
      .filter(col("a") =!= col("b")).distinct().cache()
    und.count()

    // shuffle WRITE bytes per phase via a stage listener — the number
    // that transfers to cluster scale (local wall under-sells hot-key
    // shuffles). Stage events are async: settle before reading deltas.
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

    // --- oriented path (the operator: adjacency-replication join +
    //     neighborhood intersection; worst-case byte volume Σd⁺²) ---
    val ((orientedTotal, orientedWedges), tOriented, bOriented) = time {
      val counts = Triangles.triangleCounts(spark, und)
      val total = counts.agg(sum("n_tri")).head.getLong(0) / 3
      // wedge volume of the oriented enumeration, re-derived
      val deg = und.select(explode(array(col("a"), col("b"))).as("x"))
        .groupBy("x").agg(count(lit(1)).as("d"))
      val ok = und
        .join(deg.withColumnRenamed("x", "a").withColumnRenamed("d", "da"), "a")
        .join(deg.withColumnRenamed("x", "b").withColumnRenamed("d", "db"), "b")
        .select((col("da") * (1L << 32) + col("a")).as("oka"),
          (col("db") * (1L << 32) + col("b")).as("okb"))
      val ori = ok.select(least(col("oka"), col("okb")).as("u"),
        greatest(col("oka"), col("okb")).as("v"))
      val w = ori.as("e1").join(ori.as("e2"),
        col("e1.u") === col("e2.u") && col("e1.v") < col("e2.v")).count()
      (total, w)
    }

    // --- naive path: wedges from every center, triangles / 3 ---
    val ((naiveTotal, naiveWedges), tNaive, bNaive) = time {
      val both = und.unionAll(und.select(col("b").as("a"), col("a").as("b")))
        .select(col("a").as("u"), col("b").as("v")) // u = center? no: path a-center, center-c
      val wedges = both.as("e1").join(both.as("e2"),
          col("e1.v") === col("e2.u") && col("e1.u") < col("e2.v"))
        .select(col("e1.u").as("x"), col("e1.v").as("c"), col("e2.v").as("z"))
      val nW = wedges.count()
      val tri = wedges.join(und, col("x") === col("a") && col("z") === col("b")).count()
      (tri / 3, nW)
    }

    require(orientedTotal == naiveTotal,
      s"triangle counts differ: oriented=$orientedTotal naive=$naiveTotal")

    val json = f"""{"rim": $rim, "edges": ${und.count()}, """ +
      f""""triangles": $orientedTotal, """ +
      f""""oriented_wedges": $orientedWedges, "naive_wedges": $naiveWedges, """ +
      f""""wedge_cut": ${naiveWedges.toDouble / orientedWedges}%.1f, """ +
      f""""oriented_sec": $tOriented%.2f, "naive_sec": $tNaive%.2f, """ +
      f""""oriented_shuffle_bytes": $bOriented, "naive_shuffle_bytes": $bNaive, """ +
      f""""shuffle_cut": ${bNaive.toDouble / math.max(bOriented, 1L)}%.1f, """ +
      f""""speedup": ${tNaive / tOriented}%.2f}"""
    println(s"TRIANGLEBENCH $json")
    spark.stop()
  }
}
