package graft

import org.apache.spark.sql.DataFrame
import graft.graph.Modularity

class ModularitySpec extends SparkSpec {

  private def df2(rows: Seq[(Long, Long)]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("a", "b")
  }

  private def lab(rows: Seq[(Long, String)]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("node", "community")
  }

  test("one community over everything scores exactly 0") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L))
    val labels = (1L to 4L).map(i => (i, "all"))
    val got = Modularity.modularity(spark, df2(edges), lab(labels)).collect()
    assert(got.length == 1 && got.head.getDouble(5) == 0.0)
  }

  test("two cliques with a bridge: the textbook high-modularity split") {
    // K3 + K3 joined by one bridge edge: m = 7
    // per clique: e_c = 3, d_c = 7 -> contrib (4*7*3 - 49)/196 = 35/196
    // Q = 2 * 35/196 = 0.357142857...
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L),
      (4L, 5L), (5L, 6L), (6L, 4L), (3L, 4L))
    val labels = Seq((1L, "x"), (2L, "x"), (3L, "x"),
      (4L, "y"), (5L, "y"), (6L, "y"))
    val got = Modularity.modularity(spark, df2(edges), lab(labels)).collect()
    assert(got.length == 2)
    assert(got.forall(_.getDouble(5) == BigDecimal(70.0 / 196.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    assert(got.forall(r => r.getLong(2) == 3L && r.getLong(3) == 7L))
  }

  test("an anti-community split goes negative") {
    // perfect bipartite matching split across the parts: every edge
    // crosses -> e_c = 0 both sides
    val edges = Seq((1L, 4L), (2L, 5L), (3L, 6L))
    val labels = Seq((1L, "l"), (2L, "l"), (3L, "l"),
      (4L, "r"), (5L, "r"), (6L, "r"))
    val got = Modularity.modularity(spark, df2(edges), lab(labels)).collect()
    assert(got.forall(_.getDouble(5) < 0.0))
  }

  test("an edge endpoint missing from labels raises loudly") {
    val e = intercept[Exception](Modularity.modularity(spark,
      df2(Seq((1L, 2L))), lab(Seq((1L, "x")))).collect())
    assert(e.getMessage != null && e.getMessage.contains("missing from labels"),
      e.getMessage)
  }
}
