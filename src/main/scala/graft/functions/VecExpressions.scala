package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}
import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}

/** Native Catalyst expression for the ANN hot path: sequential float32 →
  * float64 dot product over two `array<float>` columns, with full
  * whole-stage-codegen support (`doGenCode`). Chosen over a Scala UDF
  * (serialization boundary, boxing) and over `aggregate(zip_with(...))`
  * (interpreted higher-order functions, per-element lambda dispatch) —
  * the preference order for extending Spark when built-ins can't express
  * the kernel efficiently.
  *
  * Semantics exactly match the fold the oracles use: s = Σ (double)a(i) *
  * (double)b(i) in ascending index order — bit-identical to DuckDB's
  * list_dot_product over DOUBLE[] casts (verified empirically). Null
  * elements contribute 0; length mismatch uses the common prefix.
  */
final case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vec_dot expects (array<float>, array<float>), got " +
            s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
    }
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      }
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): FloatVecDot =
    copy(left = l, right = r)
}

/** Registration: either via `spark.sql.extensions=graft.functions.GraftExtensions`
  * or programmatically with [[VecFunctions.register]]. Column helpers wrap
  * the registered function so DataFrame code stays declarative. Every
  * session builder in this repo (Verify/Bench/probes/SparkSpec) sets the
  * extensions config, so `spark.sql("... vec_cosine(a, b) ...")` works for
  * plain-SQL users with no Scala import — the q50 driver entry runs on
  * that surface end to end.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(VecFunctions.vecDotDescriptor)
    ext.injectFunction(VecFunctions.vecCosineDescriptor)
    ext.injectFunction(ZValue.descriptor)
    ext.injectFunction(TextNorm.descriptor)
    // MV query rewrite + FK join elimination (both no-ops until
    // something is registered; see graft.plans.{MvRegistry, FkRegistry})
    ext.injectOptimizerRule(session => new graft.plans.MvRewriteRule(session))
    ext.injectOptimizerRule(session => new graft.plans.FkJoinEliminationRule(session))
  }
}

object VecFunctions {
  private[functions] val vecDotDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("vec_dot"),
    new ExpressionInfo(classOf[FloatVecDot].getName, "vec_dot"),
    (children: Seq[Expression]) => FloatVecDot(children(0), children(1)))

  /** `vec_cosine(a, b)` as a SQL macro: expands to the exact expression
    * tree [[vecCosine]] builds — d/(sqrt(na)*sqrt(nb)) over three
    * codegen'd vec_dot kernels — so SQL-surface results are bit-identical
    * to the DataFrame path and to the DuckDB oracles.
    */
  private[functions] val vecCosineDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("vec_cosine"),
    new ExpressionInfo(classOf[FloatVecDot].getName, "vec_cosine"),
    (children: Seq[Expression]) => {
      import org.apache.spark.sql.catalyst.expressions.{Divide, Multiply, Sqrt}
      val (a, b) = (children(0), children(1))
      Divide(FloatVecDot(a, b),
        Multiply(Sqrt(FloatVecDot(a, a)), Sqrt(FloatVecDot(b, b))))
    })

  /** Idempotently register the vec functions in an existing session. */
  def register(spark: SparkSession): Unit = {
    val registry: FunctionRegistry = spark.sessionState.functionRegistry
    Seq(vecDotDescriptor, vecCosineDescriptor).foreach { case (id, info, builder) =>
      if (!registry.functionExists(id)) registry.registerFunction(id, info, builder)
    }
  }

  /** Codegen'd f64 dot product over two array<float> columns. */
  def vecDot(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("vec_dot", a, b)
  }

  /** Cosine similarity from three vec_dot calls — the exact expression
    * shape the DuckDB oracles use: d / (sqrt(na) * sqrt(nb)).
    */
  def vecCosine(spark: SparkSession, a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions.sqrt
    vecDot(spark, a, b) / (sqrt(vecDot(spark, a, a)) * sqrt(vecDot(spark, b, b)))
  }
}
