package graft

import org.apache.spark.sql.functions._
import graft.llm.Pca

/** PCA fit/project ([[graft.llm.Pca]]). Pins: component orthonormality,
  * recovery of a planted dominant direction, projection variance ==
  * eigenvalues (descending) when the sample is the full dataset,
  * byte-stable refits, and the explained-variance accounting.
  */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  /** n points: x = s·dir + small isotropic noise, deterministic */
  private def planted(n: Int, d: Int): (Seq[(Long, Seq[Float])], Array[Double]) = {
    val r = new scala.util.Random(109)
    val dir = Array.fill(d)(r.nextGaussian())
    val nrm = math.sqrt(dir.map(x => x * x).sum)
    dir.indices.foreach(i => dir(i) /= nrm)
    val pts = (0L until n.toLong).map { i =>
      val s = r.nextGaussian() * 5.0
      (i, Seq.tabulate(d)(j => (s * dir(j) + 0.1 * r.nextGaussian()).toFloat))
    }
    (pts, dir)
  }

  test("orthonormal components; planted direction recovered; variances descend") {
    val (pts, dir) = planted(400, 12)
    val df = pts.toDF("vec_id", "embedding")
    val m = Pca.fitPca(spark, df, p = 4)
    for (a <- m.comps.indices; b <- a until m.comps.length) {
      val dot = m.comps(a).indices.map(i => m.comps(a)(i) * m.comps(b)(i)).sum
      val exp = if (a == b) 1.0 else 0.0
      assert(math.abs(dot - exp) < 1e-9, s"comp ($a,$b) dot = $dot")
    }
    val cos = math.abs(m.comps(0).indices.map(i => m.comps(0)(i) * dir(i)).sum)
    assert(cos > 0.99, s"pc0 should align with the planted direction: |cos|=$cos")
    assert(m.eigvals.sliding(2).forall(w => w(0) >= w(1) - 1e-12),
      s"eigenvalues must descend: ${m.eigvals.toSeq}")
    assert(m.eigvals(0) > 10 * m.eigvals(1),
      "the planted direction should dominate the spectrum")
  }

  test("projection variances equal the eigenvalues when sample = full data") {
    val (pts, _) = planted(300, 8)
    val df = pts.toDF("vec_id", "embedding")
    val m = Pca.fitPca(spark, df, p = 3, sampleCap = 1000)
    val projs = Pca.projectPca(spark, df, m)
      .select(col("proj")).as[Seq[Double]].collect()
    for (j <- 0 until 3) {
      val xs = projs.map(_(j))
      val mean = xs.sum / xs.length
      val v = xs.map(x => (x - mean) * (x - mean)).sum / xs.length
      assert(math.abs(v - m.eigvals(j)) < 1e-9 * (1.0 + m.eigvals(j)),
        s"var(pc$j)=$v vs eigval ${m.eigvals(j)}")
    }
    val explained = m.eigvals.sum / m.varTotal
    assert(explained > 0.9 && explained <= 1.0 + 1e-12,
      s"3 components should explain the planted data: $explained")
  }

  test("pcaTopK: high recall vs exact kNN on clustered data at 4x reduction") {
    val r = new scala.util.Random(111)
    val d = 32
    val centers = Array.fill(10)(Array.fill(d)(r.nextGaussian() * 3.0))
    val pts = (0L until 300L).map { i =>
      val c = centers((i % 10).toInt)
      (i, Seq.tabulate(d)(j => (c(j) + 0.3 * r.nextGaussian()).toFloat))
    }
    val df = pts.toDF("vec_id", "embedding")
    val q = df.filter(col("vec_id") < 6)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val exact = graft.llm.Ann.cosineTopK(spark, df, q, 5,
        id = "vec_id", vec = "embedding")
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    val approx = graft.llm.Pca.pcaTopK(spark, df, q, k = 5, p = 8)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall@5 = $recall")
  }

  test("refit is byte-stable") {
    val (pts, _) = planted(200, 6)
    val df = pts.toDF("vec_id", "embedding")
    val m1 = Pca.fitPca(spark, df, p = 6)
    val m2 = Pca.fitPca(spark, df.repartition(7), p = 6)
    assert(m1.mean.toSeq == m2.mean.toSeq)
    assert(m1.comps.map(_.toSeq).toSeq == m2.comps.map(_.toSeq).toSeq)
    assert(m1.eigvals.toSeq == m2.eigvals.toSeq)
  }
}
