package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.rmbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Within-document repeated-chunk scrub — the REMOVAL form of the
  * Gopher/MassiveText repetition rules (Rae et al. 2021 §A1.2): chop
  * the word stream into fixed `w`-word non-overlapping chunks, keep
  * only the FIRST occurrence of each chunk's content, and rebuild the
  * text. Catches the template/boilerplate self-repetition inside a
  * single document that corpus-level span dedup (cross-document) never
  * looks at.
  *
  * Pure per-row work — the 100 TB shape: one codegen pass, the seen-set
  * is document-local (bounded by the doc's own chunk count), no
  * shuffle, stream-safe. The final partial chunk participates like any
  * other (its shorter content only matches an equally short chunk). */
case class SelfDedupChunks(child: Expression, w: Int)
    extends UnaryExpression {

  require(w > 0, "chunk width must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got $t")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "rm_self_dedup_chunks"

  override protected def nullSafeEval(input: Any): Any =
    SelfDedupChunks.compute(input.asInstanceOf[UTF8String], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SelfDedupChunks$$.MODULE$$.compute($c, $w)")

  override protected def withNewChildInternal(newChild: Expression): SelfDedupChunks =
    copy(child = newChild)
}

object SelfDedupChunks {

  def compute(text: UTF8String, w: Int): UTF8String = {
    val toks = text.toString.split(" ", -1)
    val seen = new java.util.HashSet[String]()
    val sb = new java.lang.StringBuilder
    var first = true
    var i = 0
    while (i < toks.length) {
      val end = math.min(i + w, toks.length)
      val cb = new java.lang.StringBuilder
      var j = i
      while (j < end) {
        if (j > i) cb.append(' ')
        cb.append(toks(j))
        j += 1
      }
      val chunk = cb.toString
      if (seen.add(chunk)) {
        if (!first) sb.append(' ')
        sb.append(chunk)
        first = false
      }
      i += w
    }
    UTF8String.fromString(sb.toString)
  }

  /** Column form: text with repeated `w`-word chunks scrubbed. */
  def dedup(text: Column, w: Int): Column =
    Bridge.column(SelfDedupChunks(Bridge.expression(text), w))
}
