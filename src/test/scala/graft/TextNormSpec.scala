package graft

import org.apache.spark.sql.functions._
import graft.functions.TextNorm

/** Unicode normalization rung (functions/TextNormExpressions.scala):
  * NFKC compatibility folds, casefold, format/control strip,
  * whitespace collapse — pinned non-ASCII cases, idempotence, the
  * ASCII reduction the q407 corpus oracle relies on, and the
  * expression surface (nulls, codegen stage).
  */
class TextNormSpec extends SparkSpec {

  private val cases = Seq(
    // NFKC identity content: just casefold + collapse
    "Café  du   MONDE" -> "café du monde",
    // ligature + fullwidth compatibility folds
    "ﬁne ＴＥＸＴ" -> "fine text",
    // zero-width space and soft hyphen are FORMAT chars: stripped
    "a​b c­def" -> "ab cdef",
    // BOM (Cf) and BEL (Cc) stripped; tab is whitespace, collapsed
    "﻿BOMbell\tTAB  x" -> "bombell tab x",
    // NBSP -> space, circled digit + superscript folds, NFC compose
    "nb sp ①² étude" -> "nb sp 12 étude",
    // pure ASCII: lowercase + collapse + trim
    "  MiXeD   Case\r\n\r\nlines  " -> "mixed case lines",
    // whitespace CONTROLS (form feed U+000C, vertical tab U+000B) are
    // token boundaries like the oracle's '\s+' — NOT stripped (the
    // r13 advisory: stripping them would merge adjacent tokens)
    "a\fb c\u000Bd" -> "a b c d")

  test("pinned unicode folds (the q407 VALUES fixture)") {
    cases.foreach { case (in, want) =>
      assert(TextNorm.normalize(in) == want, s"for ${in.getBytes("UTF-8").toSeq}")
    }
  }

  test("idempotent: normalize(normalize(x)) == normalize(x)") {
    cases.foreach { case (in, _) =>
      val once = TextNorm.normalize(in)
      assert(TextNorm.normalize(once) == once)
    }
  }

  test("reduces to lower+collapse+trim on ASCII (the corpus-replay property)") {
    val ascii = Seq("Hello,   World!", "a\tb\nc", "  x  ", "one two")
    ascii.foreach { a =>
      val want = a.toLowerCase.trim.replaceAll("\\s+", " ")
      assert(TextNorm.normalize(a) == want, s"'$a'")
    }
  }

  test("expression surface: nulls pass through, codegen stage holds it") {
    val s = spark
    import s.implicits._
    val nulls = Seq(Some("ﬁne ＴＥＸＴ"), None).toDF("raw")
      .select(TextNorm.normalizeText(s, col("raw")).as("norm"))
    assert(nulls.collect().map(r => Option(r.getString(0))).toSeq ==
      Seq(Some("fine text"), None))
    // the expression must not break whole-stage codegen (a local Seq
    // gets constant-folded to LocalTableScan, so drive it from range)
    val df = s.range(2).select(TextNorm.normalizeText(s,
      concat(lit("Ａ  x"), col("id").cast("string"))).as("norm"))
    assert(df.collect().map(_.getString(0)).toSeq == Seq("a x0", "a x1"))
    // "*(1)" is the codegen-stage marker in the compact plan string: the
    // Project carrying text_nfkc must sit INSIDE a codegen stage
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project") && plan.contains("text_nfkc"), plan)
  }

  test("SQL surface: text_nfkc registered via GraftExtensions") {
    val got = spark.sql("SELECT text_nfkc('ＡＢ  ﬁt') AS n").collect()(0).getString(0)
    assert(got == "ab fit")
  }
}
