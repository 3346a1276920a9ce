package graft

import org.apache.spark.sql.functions._
import graft.functions.VecFunctions

/** The plain-SQL surface: graft functions must resolve through the
  * `spark.sql.extensions=graft.functions.GraftExtensions` config alone
  * (no programmatic register), and the SQL text path must be
  * bit-identical to the DataFrame path.
  */
class SqlSurfaceSpec extends SparkSpec {

  test("vec functions resolve via spark.sql.extensions on a fresh session") {
    // newSession() rebuilds SessionState from the session's injected
    // extensions — programmatic registers from sibling suites don't leak
    // into it, so this passes only if the config-loaded extension works
    val fresh = spark.newSession()
    val d = fresh.sql(
      "SELECT vec_dot(array(cast(1.0 as float), cast(2.0 as float)), " +
        "array(cast(3.0 as float), cast(4.0 as float))) AS d").head.getDouble(0)
    assert(d == 11.0)
    val c = fresh.sql(
      "SELECT vec_cosine(array(cast(3.0 as float), cast(0.0 as float)), " +
        "array(cast(0.0 as float), cast(5.0 as float))) AS c").head.getDouble(0)
    assert(c == 0.0)
  }

  test("vec_cosine SQL equals the DataFrame vecCosine bit-for-bit") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    Seq.fill(100)((
      Array.fill(16)(rnd.nextFloat() * 2 - 1),
      Array.fill(16)(rnd.nextFloat() * 2 - 1))).toDF("a", "b")
      .createOrReplaceTempView("vec_pairs")
    val viaSql = spark.sql("SELECT vec_cosine(a, b) AS c FROM vec_pairs")
      .collect().map(_.getDouble(0))
    val viaDf = spark.table("vec_pairs")
      .select(VecFunctions.vecCosine(spark, col("a"), col("b")).as("c"))
      .collect().map(_.getDouble(0))
    assert(viaSql.toSeq == viaDf.toSeq)
  }

  test("q50_sql_ann matches the DataFrame q37 shape on overlapping queries") {
    // q50 covers qids 3..5, q37 covers 0..2 — rerun q50's SQL semantics
    // through Ann.cosineTopK (DataFrame path) and compare exactly
    val d = "/root/testdata/sf0.001"
    val sqlRows = graft.rel.SqlSurface.all("q50_sql_ann").fn(spark, d).collect()
    val e = graft.rel.Tables.embeddings(spark, d)
    val dfRows = graft.llm.Ann.cosineTopK(spark,
        e.select(col("vec_id").as("id"), col("embedding").as("vec")),
        e.filter(col("vec_id").between(3, 5))
          .select(col("vec_id").as("qid"), col("embedding").as("qvec")),
        k = 5, id = "id", vec = "vec")
      .select(col("qid"), col("rn"), col("id").as("vec_id"), col("cos"))
      .collect()
    assert(sqlRows.length == dfRows.length && sqlRows.length == 15)
    sqlRows.zip(dfRows).foreach { case (a, b) =>
      assert(a.getLong(0) == b.getLong(0) && a.getInt(1) == b.getInt(1) &&
        a.getLong(2) == b.getLong(2) && a.getDouble(3) == b.getDouble(3),
        s"mismatch: $a vs $b")
    }
  }
}
