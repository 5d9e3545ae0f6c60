package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.rmbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Character-distribution entropy of a text column in FIXED POINT — the
  * Shannon score a quality filter uses to catch low-entropy junk
  * (repeated characters, padding, binary-ish noise) that length and
  * word-ratio rules miss.
  *
  * The returned integer is `−Σ_c n_c · FLOOR(LN(n_c / N) · 1e6)` over
  * the text's code-point histogram (N = total code points; 0 for empty
  * text). Each log is per-value double math and the outer sum is exact
  * integer arithmetic, so the value is deterministic under any
  * accumulation order AND restates exactly in DuckDB — the NB/DSIR
  * fixed-point-log oracle recipe. Entropy in nats ≈ fx / (1e6 · N).
  * One codegen pass per row, histogram local to the row — shuffle-free
  * and stream-safe. */
case class CharEntropyFx(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "rm_char_entropy_fx"

  override protected def nullSafeEval(input: Any): Any =
    CharEntropyFx.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CharEntropyFx$$.MODULE$$.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): CharEntropyFx =
    copy(child = newChild)
}

object CharEntropyFx {

  def compute(text: UTF8String): Long = {
    val s = text.toString
    if (s.isEmpty) return 0L
    val counts = new java.util.HashMap[Integer, Array[Long]]()
    var n = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val slot = counts.get(cp)
      if (slot == null) counts.put(cp, Array(1L)) else slot(0) += 1
      n += 1
      i += Character.charCount(cp)
    }
    var fx = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()(0)
      fx += c * math.floor(math.log(c.toDouble / n) * 1e6).toLong
    }
    -fx
  }

  /** Column form: fixed-point char entropy (see class doc). */
  def entFx(text: Column): Column =
    Bridge.column(CharEntropyFx(Bridge.expression(text)))
}
