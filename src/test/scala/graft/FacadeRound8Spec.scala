package graft

import org.apache.spark.sql.functions._
import graft.rel.{AsofJoin, Tables}

/** Facade parity for the driver-round-8 operators, plus the
  * asofTolerance unit contract (stale matches null out; in-tolerance
  * matches equal the base as-of).
  */
class FacadeRound8Spec extends SparkSpec {
  private val d = "/root/testdata/sf0.01"

  test("Graft facade delegates agree with the oracle-checked kernels") {
    val s = spark
    // weightedMedian via the facade == the q173 entry's core
    val li = Tables.lineitem(s, d).select(col("l_returnflag").as("flag"),
      round(col("l_extendedprice") * 100, 0).cast("long").as("cents"),
      col("l_quantity").cast("long").as("qty"))
    val viaFacade = Graft.weightedMedian(li, "flag", "cents", "qty")
      .orderBy("flag").collect().map(_.toSeq).toSeq
    val viaEntry = graft.rel.Summary.all("q173_weighted_median").fn(s, d)
      .collect().map(_.toSeq).toSeq
    assert(viaFacade == viaEntry)

    // degreeAssortativity via the facade == the q168 entry
    val liE = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_partkey"))
    val edges = liE.as("x").join(liE.as("y"),
        col("x.l_orderkey") === col("y.l_orderkey") &&
          col("x.l_partkey") < col("y.l_partkey"))
      .select(col("x.l_partkey").as("a"), col("y.l_partkey").as("b"))
    val gotA = Graft.degreeAssortativity(s, edges).collect()(0)
    val wantA = graft.graph.Assortativity.all("q168_assortativity").fn(s, d)
      .collect()(0)
    assert(gotA.getLong(0) == wantA.getLong(0) &&
      gotA.getDouble(1) == wantA.getDouble(1))
  }

  test("asofTolerance: stale matches null out, fresh matches equal plain asof") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, 100L, "p1"), (1L, 250L, "p2")).toDF("k", "ts", "tag")
    val right = Seq((1L, 90L, "t_old"), (1L, 240L, "t_new")).toDF("k", "ts", "v")
    // plain as-of: both purchases match their latest prior touch
    val plain = AsofJoin.asof(left, right, "k", "ts", Map("v" -> "v"))
      .collect().map(r => r.getString(2) -> r.getString(3)).toMap
    assert(plain == Map("p1" -> "t_old", "p2" -> "t_new"))
    // tolerance 15 micros: p1's match (gap 10) survives, p2's (gap 10)
    // survives; tolerance 5: both null
    val tol15 = AsofJoin.asofTolerance(left, right, "k", "ts",
        Map("v" -> "v"), toleranceMicros = 15L)
      .collect().map(r => r.getString(2) -> Option(r.getString(3))).toMap
    assert(tol15 == Map("p1" -> Some("t_old"), "p2" -> Some("t_new")))
    val tol5 = AsofJoin.asofTolerance(left, right, "k", "ts",
        Map("v" -> "v"), toleranceMicros = 5L)
      .collect().map(r => r.getString(2) -> Option(r.getString(3))).toMap
    assert(tol5 == Map("p1" -> None, "p2" -> None))
  }
}
