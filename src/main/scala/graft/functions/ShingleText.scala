package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.rmbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression producing the word-n-gram shingle STRINGS of
  * a text column in one pass — the textual sibling of [[ShingleHashes]],
  * for operators whose downstream key must be the gram itself (repetition
  * quality stats, corpus boilerplate detection) rather than a hash.
  *
  * `distinct = false` keeps every occurrence in order (term-frequency
  * shapes); `distinct = true` keeps first occurrences only (set shapes) —
  * both in the same single tokenize-window loop, inside whole-stage
  * codegen. Replaces a posexplode + per-document `lead` window pair, which
  * costs a full shuffle+sort on the document id before any aggregation;
  * exploding this array is a narrow map over the scan.
  *
  * Parity contract: tokens are `split(text, " ")` (Java split, limit -1,
  * same as the oracle's string_split) and grams are space-joined — the
  * same strings DuckDB's `a[i+1] || ' ' || a[i+2] …` restatement builds.
  * Fewer than n tokens ⇒ empty array.
  */
case class ShingleText(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression {

  require(n > 0, "shingle size must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires string input, got $t")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "rm_shingle_text"

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      ShingleText.compute(input.asInstanceOf[UTF8String], n, distinct)
        .asInstanceOf[Array[Any]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  (Object[]) graft.functions.ShingleText$$.MODULE$$.compute($c, $n, $distinct));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ShingleText =
    copy(child = newChild)
}

object ShingleText {

  /** One pass: split on single spaces, slide the n-window, join with a
    * space; optionally keep first occurrences only. Called from
    * interpreted eval and generated code. */
  def compute(text: UTF8String, n: Int, distinct: Boolean): Array[UTF8String] = {
    val toks = text.toString.split(" ", -1)
    if (toks.length < n) return Array.empty[UTF8String]
    val count = toks.length - n + 1
    val seen = if (distinct) new java.util.HashSet[String](count * 2) else null
    val out = new Array[UTF8String](count)
    var m = 0
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < count) {
      sb.setLength(0)
      sb.append(toks(i))
      var j = 1
      while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
      val s = sb.toString
      if (!distinct || seen.add(s)) { out(m) = UTF8String.fromString(s); m += 1 }
      i += 1
    }
    if (m == count) out else java.util.Arrays.copyOf(out, m)
  }

  /** Column form: word-n-gram strings of a text column. */
  def shingleText(text: Column, n: Int, distinct: Boolean = false): Column =
    Bridge.column(ShingleText(Bridge.expression(text), n, distinct))
}
