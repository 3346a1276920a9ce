package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Codegen'd membership probe against a TORRENT-BROADCAST
  * [[org.apache.spark.util.sketch.BloomFilter]] — the runtime-filter
  * primitive behind [[graft.rel.BloomJoin]]. The filter object ships
  * once per executor via the broadcast (never embedded in the plan or
  * per-task closures — at 10⁸ build keys the filter is tens of MB, and
  * a plan literal would ship with every task), and the generated code
  * probes it with zero boxing.
  *
  * Supports the join-key types the relational surface uses: LONG
  * (mightContainLong) and STRING (mightContainBinary over the UTF-8
  * bytes — exactly what BloomFilter.putString hashes, so probes match
  * a filter built from the same string column).
  */
final case class BloomMightContain(child: Expression, bf: Broadcast[BloomFilter])
    extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType | StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bloom_might_contain expects bigint or string key, got ${t.catalogString}")
    }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override protected def nullSafeEval(key: Any): Any = child.dataType match {
    case LongType => bf.value.mightContainLong(key.asInstanceOf[Long])
    case StringType =>
      bf.value.mightContainBinary(key.asInstanceOf[UTF8String].getBytes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bfRef = ctx.addReferenceObj("bf", bf, classOf[Broadcast[_]].getName)
    val probe = child.dataType match {
      case LongType => (k: String) =>
        s"((org.apache.spark.util.sketch.BloomFilter)$bfRef.value()).mightContainLong($k)"
      case StringType => (k: String) =>
        s"((org.apache.spark.util.sketch.BloomFilter)$bfRef.value()).mightContainBinary($k.getBytes())"
    }
    nullSafeCodeGen(ctx, ev, k => s"${ev.value} = ${probe(k)};")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
