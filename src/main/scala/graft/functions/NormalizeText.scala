package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.rmbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Canonical text normalization — the pass every CCNet/C4-style corpus
  * runs BEFORE dedup so that byte-level variants of the same content
  * (composed vs decomposed accents, case, ragged whitespace) collapse
  * to one surface form and hash/shingle dedup stops missing them:
  *
  *   1. Unicode NFC (canonical composition — é as U+00E9 and as
  *      e+U+0301 become the same bytes),
  *   2. locale-independent lowercase (`Locale.ROOT` full case mapping),
  *   3. ASCII-whitespace runs (space, \t, \n, U+000B, \f, \r) collapse
  *      to one space, leading/trailing runs trim away.
  *
  * Exactly this op order is restated by the q_normalize_text oracle
  * (`NFC_NORMALIZE` → `LOWER` → regexp collapse), with the documented
  * parity precondition that oracle corpora are ASCII-only — JDK and
  * utf8proc agree on NFC by the Unicode standard, but FULL case
  * mappings of a handful of exotic code points (dotted İ, final sigma)
  * may differ between engines; NativeExpressionsSpec carries the
  * non-ASCII contract against scalar references instead.
  *
  * Pure per-row work — the 100 TB shape: one codegen pass, no shuffle,
  * stream-safe, idempotent (normalize ∘ normalize = normalize). */
case class NormalizeText(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got $t")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "rm_normalize_text"

  override protected def nullSafeEval(input: Any): Any =
    NormalizeText.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NormalizeText$$.MODULE$$.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
}

object NormalizeText {

  private def isAsciiSpace(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  def compute(text: UTF8String): UTF8String = {
    val nfc = java.text.Normalizer
      .normalize(text.toString, java.text.Normalizer.Form.NFC)
    val lower = nfc.toLowerCase(java.util.Locale.ROOT)
    val sb = new java.lang.StringBuilder(lower.length)
    var pendingSpace = false
    var started = false
    var i = 0
    while (i < lower.length) {
      val c = lower.charAt(i)
      if (isAsciiSpace(c)) {
        if (started) pendingSpace = true
      } else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(c)
        started = true
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** Column form: NFC + casefold + whitespace-collapsed text. */
  def normalize(text: Column): Column =
    Bridge.column(NormalizeText(Bridge.expression(text)))
}
