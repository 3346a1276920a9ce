package graft

import org.apache.spark.sql.functions._
import graft.functions.VecFunctions

/** The native vec_dot expression: parity with the interpreted
  * higher-order-function fold, null/length-mismatch behavior, and codegen
  * participation.
  */
class VecExpressionsSpec extends SparkSpec {

  test("vec_dot equals the aggregate/zip_with fold bit-for-bit") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(5)
    val rows = Seq.fill(200)((
      Array.fill(64)(rnd.nextFloat() * 2 - 1),
      Array.fill(64)(rnd.nextFloat() * 2 - 1)))
    val df = rows.toDF("a", "b")
    val hof = aggregate(zip_with(col("a"), col("b"),
      (x, y) => x.cast("double") * y.cast("double")), lit(0.0), (acc, x) => acc + x)
    val out = df.select(
        VecFunctions.vecDot(spark, col("a"), col("b")).as("native"), hof.as("ref"))
      .collect()
    assert(out.forall(r => r.getDouble(0) == r.getDouble(1)))
  }

  test("vec_dot handles nulls and length mismatch") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(2.0f, 3.0f)), // length mismatch: common prefix
    ).toDF("a", "b")
    val r = df.select(VecFunctions.vecDot(spark, col("a"), col("b"))).head.getDouble(0)
    assert(r == 1.0 * 2 + 2.0 * 3)
    val withNull = df.select(VecFunctions.vecDot(spark, lit(null).cast("array<float>"), col("b")))
    assert(withNull.head.isNullAt(0)) // null array -> null result
  }

  test("vec_dot runs inside whole-stage codegen") {
    val s = spark
    import s.implicits._
    // non-literal input (range-derived) so the expression can't be
    // constant-folded away at plan time
    val df = spark.range(4)
      .select(array(col("id").cast("float"), lit(2.0f)).as("a"),
        array(lit(3.0f), col("id").cast("float")).as("b"))
      .select(col("a"), col("b"), VecFunctions.vecDot(spark, col("a"), col("b")).as("d"))
    // the "*(n)" prefix marks operators inside a WholeStageCodegen stage;
    // vec_dot's Project must carry it (no CodegenFallback row)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project") && plan.contains("vec_dot"),
      s"vec_dot not inside whole-stage codegen:\n$plan")
    val rows = df.orderBy("d").collect()
    assert(rows.map(_.getDouble(2)).toSeq == Seq(0.0, 5.0, 10.0, 15.0))
  }

  test("vec_dot is registered as a SQL function") {
    VecFunctions.register(spark)
    val r = spark.sql(
      "SELECT vec_dot(array(cast(1.0 as float), cast(2.0 as float)), " +
        "array(cast(3.0 as float), cast(4.0 as float))) AS d").head.getDouble(0)
    assert(r == 11.0)
  }
}
