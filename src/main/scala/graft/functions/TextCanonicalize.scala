package graft.functions

import java.util.Locale

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Text canonicalization for content-level dedup (SURVEY.md §2.11 — no
  * reference analog): the normalization pass every dedup pipeline runs
  * BEFORE hashing, so that trivially-variant spellings of the same
  * content (whitespace runs, case, combining-character encodings) land on
  * the same content key. Rules, in order:
  *
  *   1. whitespace runs (space, \t, \n, \r, \f, \u000B) collapse to one
  *      space; leading/trailing whitespace drops
  *   2. Unicode NFC normalization (composed forms — "e" + COMBINING ACUTE
  *      becomes "é", so byte-different encodings of the same text unify)
  *   3. lowercase in the ROOT locale
  *
  * Deliberately NOT here: punctuation stripping, accent folding, NFKC
  * compatibility mapping — those merge genuinely different content and
  * belong to similarity (MinHash/SimHash) stages, not exact-key
  * canonicalization.
  *
  * Oracle caveat (documented, not load-bearing on the test corpus): for
  * a handful of exotic case mappings (e.g. dotted capital İ) Java's
  * toLowerCase and utf8proc-based engines differ; the corpus gate runs
  * on ASCII where all engines agree.
  */
object TextFunctions {

  private def isCollapsible(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f' || c == '\u000B'

  /** Static entry for both `eval` and generated code. Null in/out; never
    * null on non-null input (canonicalization is total on strings).
    */
  def canonicalize(u: UTF8String): UTF8String = {
    if (u == null) return null
    val s = u.toString
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    var pendingSpace = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (isCollapsible(c)) { if (sb.length > 0) pendingSpace = true }
      else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(c)
      }
      i += 1
    }
    val collapsed = sb.toString
    val nfc = java.text.Normalizer.normalize(collapsed, java.text.Normalizer.Form.NFC)
    UTF8String.fromString(nfc.toLowerCase(Locale.ROOT))
  }
}

/** Codegen'd text-canonicalization expression (`text_canonicalize`). */
case class TextCanonicalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"text_canonicalize requires STRING, got ${other.simpleString}")
  }
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "text_canonicalize"

  override def nullSafeEval(input: Any): Any =
    TextFunctions.canonicalize(input.asInstanceOf[UTF8String])

  // one static call per row, inside WholeStageCodegen
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextFunctions.canonicalize($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
