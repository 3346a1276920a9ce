package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.sql.{Column, SparkSession}

/** Z-order (Morton) curve value for two-dimensional data clustering:
  * interleaves the low 31 bits of two non-negative longs (a→even bits,
  * b→odd bits) into one 62-bit key, so sorting by it clusters rows that
  * are close in BOTH dimensions. Written parquet then carries tight
  * per-row-group min/max on both columns, and a rectangle predicate
  * (k1 range AND k2 range) prunes row groups on both axes — the data-
  * layout lever for 100 TB scans, where an unsorted table reads
  * everything and a one-column sort only prunes one axis.
  *
  * Fails loud on values outside [0, 2³¹) — silently masking high bits
  * would interleave garbage and quietly destroy the clustering.
  */
final case class ZValue(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (a, b) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"z_value expects (bigint, bigint), got (${a.catalogString}, ${b.catalogString})")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "z_value"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ZValue.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.ZValue.interleave($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ZValue {

  /** bit-interleave: a's bit i → result bit 2i, b's bit i → 2i+1 */
  def interleave(a: Long, b: Long): Long = {
    if (a < 0 || a >= (1L << 31) || b < 0 || b >= (1L << 31))
      throw new IllegalArgumentException(
        s"z_value inputs must be in [0, 2^31), got ($a, $b)")
    spread(a) | (spread(b) << 1)
  }

  /** spread the low 31 bits of v to the even bit positions (the classic
    * parallel-prefix Morton spread, public-domain bit trick)
    */
  private def spread(v: Long): Long = {
    var x = v & 0x7fffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8)) & 0x00ff00ff00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  private[functions] val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("z_value"),
    new ExpressionInfo(classOf[ZValue].getName, "z_value"),
    (children: Seq[Expression]) => ZValue(children(0), children(1)))

  /** Idempotently register z_value in an existing session. */
  def register(spark: SparkSession): Unit = {
    val registry: FunctionRegistry = spark.sessionState.functionRegistry
    val (id, info, builder) = descriptor
    if (!registry.functionExists(id)) registry.registerFunction(id, info, builder)
  }

  /** Codegen'd z-order key over two non-negative bigint columns. */
  def zValue(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("z_value", a, b)
  }
}
