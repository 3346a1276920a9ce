package graft

import org.apache.spark.sql.functions._

/** The q134 sketch algebra, pinned on constructed corpora where the
  * expected estimates are analytic: below k the sketches are the hash
  * sets themselves, so union and intersection estimates are EXACT.
  */
class KmvSetopsSpec extends SparkSpec {

  private def run(docs: Seq[(String, String)]): Map[(String, String), (Int, Double, Long, Double, Long)] = {
    val s = spark
    import s.implicits._
    val df = docs.toDF("source", "text")
    val fn = graft.SparkEntry.queries("q134_kmv_setops")
    // route through a temp dir shaped like a fixture: write documents
    val work = java.nio.file.Files.createTempDirectory("kmvsetops").toString
    df.select(lit(1L).as("doc_id"), col("text"), lit("en").as("lang"),
        col("source"), length(col("text")).cast("long").as("n_chars"))
      .write.mode("overwrite").parquet(s"$work/documents.parquet")
    fn(s, work).collect().map(r =>
      (r.getString(0), r.getString(1)) ->
        (r.getInt(2), r.getDouble(3), r.getLong(4), r.getDouble(5), r.getLong(6))
    ).toMap
  }

  test("below-k sketches make union and intersection exact") {
    // source A: tokens {a b c d}, source B: {c d e} — union 5, inter 2
    val got = run(Seq(("A", "a b c d"), ("B", "c d e")))
    val (ku, unionEst, rho, interEst, exactInter) = got(("A", "B"))
    assert(ku == 5 && unionEst == 5.0)
    assert(rho == 2L && interEst == 2.0)
    assert(exactInter == 2L)
  }

  test("disjoint sources estimate zero intersection") {
    val got = run(Seq(("A", "a b c"), ("B", "x y z")))
    val (ku, unionEst, rho, interEst, exactInter) = got(("A", "B"))
    assert(ku == 6 && unionEst == 6.0 && rho == 0L && interEst == 0.0 && exactInter == 0L)
  }

  test("identical sources estimate full overlap for every pair") {
    val got = run(Seq(("A", "t u v w"), ("B", "t u v w"), ("C", "t u v w")))
    for (((_, _), (ku, unionEst, rho, interEst, exactInter)) <- got) {
      assert(ku == 4 && unionEst == 4.0 && rho == 4L && interEst == 4.0 && exactInter == 4L)
    }
    assert(got.size == 3) // AB, AC, BC
  }
}
