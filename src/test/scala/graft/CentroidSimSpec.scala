package graft

import org.apache.spark.sql.functions._

/** q150's centroid-similarity matrix on constructed label clusters
  * with analytic cosines. Vectors are padded to the entry's d=64.
  */
class CentroidSimSpec extends SparkSpec {

  test("aligned, orthogonal, and opposed centroids score 1, 0, -1") {
    val s = spark
    import s.implicits._
    val work = java.nio.file.Files.createTempDirectory("centsim").toString
    def vec(axis: Int, sign: Float): Seq[Float] =
      Seq.tabulate(64)(i => if (i == axis) sign else 0.0f)
    // label 0: +x (two copies); label 1: +x scaled (cos 1 vs 0);
    // label 2: +y (cos 0); label 3: -x (cos -1 vs 0/1)
    val rows = Seq(
      (1L, vec(0, 1f), 0), (2L, vec(0, 1f), 0),
      (3L, vec(0, 4f), 1),
      (4L, vec(1, 2f), 2),
      (5L, vec(0, -3f), 3))
    rows.toDF("vec_id", "embedding", "label")
      .select(col("vec_id"), col("embedding"), col("label").cast("int"))
      .write.mode("overwrite").parquet(s"$work/embeddings.parquet")
    val got = graft.SparkEntry.queries("q150_centroid_sim")(s, work)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(got((0, 1)) == 1.0)
    assert(got((0, 2)) == 0.0)
    assert(got((0, 3)) == -1.0)
    assert(got((1, 3)) == -1.0)
    assert(got.size == 6)
  }
}
