package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.unsafe.types.UTF8String

/** UNICODE TEXT NORMALIZATION — the first stage of C4/CCNet-class
  * curation pipelines, as a native Catalyst expression so it rides
  * whole-stage codegen instead of a UDF serialization boundary:
  *
  *   NFKC (compatibility compose: ligatures ﬁ→fi, fullwidth Ｔ→T,
  *   circled ①→1, NBSP→space, combining marks composed)
  *   → locale-free lowercase (Locale.ROOT — the casefold rung)
  *   → strip format chars (Cf: zero-width space/joiners, BOM, soft
  *     hyphen, directional marks) and NON-whitespace control chars
  *     (controls that are JAVA whitespace -- tab, LF, CR, U+000B,
  *     U+000C, U+001C-U+001F -- route through the collapse rung
  *     instead, so they act as token boundaries rather than deleting
  *     into a token merge)
  *
  * NOTE the collapse set is Character.isWhitespace, which is WIDER
  * than the regex '\s' of either oracle engine (RE2/DuckDB '\s'
  * excludes U+000B and U+001C-U+001F; Java '\s' excludes
  * U+001C-U+001F), so the corpus-replay oracle equivalence holds only
  * for text free of those code points — their behavior is therefore
  * pinned by a dedicated q407 VALUES fixture row, not by the replay.
  *
  * The transform is IDEMPOTENT (spec-pinned) and the identity on
  * already-clean ASCII text modulo lower/collapse/trim — which is what
  * lets the DuckDB oracle replay it over an ASCII corpus as
  * trim(regexp_replace(lower(text), '\s+', ' ', 'g')) while the
  * non-ASCII behavior pins against VALUES literals (DuckDB has no
  * NFKC).
  *
  * The heavy lifting is `java.text.Normalizer` (public JVM) in ONE
  * static call per row; doGenCode emits that call inline, so the
  * expression stays inside the generated stage (no boxing, no closure
  * serialization — the vec_dot precedent in [[FloatVecDot]]).
  */
object TextNorm {

  /** the per-row kernel; also called directly by fixture generators */
  def normalize(s: String): String = {
    val nfkc = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFKC)
    val folded = nfkc.toLowerCase(java.util.Locale.ROOT)
    val sb = new java.lang.StringBuilder(folded.length)
    var pendingSpace = false
    var started = false
    var i = 0
    while (i < folded.length) {
      val cp = folded.codePointAt(i)
      i += Character.charCount(cp)
      val t = Character.getType(cp)
      // controls that are JAVA whitespace (tab/LF/CR and also
      // vertical tab U+000B, form feed U+000C, U+001C-U+001F) route
      // through the collapse branch below -- deleting them would
      // merge adjacent tokens ("a\\fb" -> "ab" instead of "a b").
      // U+000B/U+001C-U+001F are NOT '\s' in RE2/DuckDB (see header
      // note): their collapse behavior is pinned by the q407 VALUES
      // fixture, not by the oracle's regex replay.
      val isCtl = t == Character.CONTROL && !Character.isWhitespace(cp)
      if (t != Character.FORMAT && !isCtl) {
        if (Character.isWhitespace(cp)) pendingSpace = started
        else {
          if (pendingSpace) { sb.append(' '); pendingSpace = false }
          sb.appendCodePoint(cp)
          started = true
        }
      }
    }
    sb.toString
  }

  /** kernel at the UTF8String boundary — the single call codegen emits */
  def normalizeUtf8(s: UTF8String): UTF8String =
    UTF8String.fromString(normalize(s.toString))

  private[functions] val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("text_nfkc"),
    new ExpressionInfo(classOf[NfkcNormalize].getName, "text_nfkc"),
    (children: Seq[Expression]) => NfkcNormalize(children.head))

  /** Idempotently register `text_nfkc` in an existing session. */
  def register(spark: SparkSession): Unit = {
    val registry: FunctionRegistry = spark.sessionState.functionRegistry
    val (id, info, builder) = descriptor
    if (!registry.functionExists(id)) registry.registerFunction(id, info, builder)
  }

  /** Column surface: NFKC + casefold + strip + collapse. */
  def normalizeText(spark: SparkSession, c: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("text_nfkc", c)
  }
}

final case class NfkcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"text_nfkc expects string, got ${other.catalogString}")
    }

  override def dataType: DataType = StringType
  override def prettyName: String = "text_nfkc"

  override protected def nullSafeEval(input: Any): Any =
    TextNorm.normalizeUtf8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextNorm.normalizeUtf8($c)")

  override protected def withNewChildInternal(newChild: Expression): NfkcNormalize =
    copy(child = newChild)
}
