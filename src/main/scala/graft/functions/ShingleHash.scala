package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData, XxHash64Function}
import org.apache.spark.sql.rmbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression computing the DISTINCT word-n-gram shingle
  * hashes of a text column in one pass.
  *
  * The Column-combinator formulation —
  * `array_distinct(transform(sequence(0, size-n), i -> concat_ws(" ",
  * element_at...)))` then `transform(_, s -> xxhash64(s))` — runs as
  * interpreted higher-order lambdas with per-element expression dispatch
  * and materializes every shingle string twice; round-1/2 benchmarking
  * showed it dominating both the exact-Jaccard and MinHash dedup queries.
  * This expression tokenizes, windows, hashes, and dedupes in a single
  * JIT-compiled loop that participates in whole-stage codegen.
  *
  * Hash parity contract: tokens come from the same semantics as Spark's
  * `split(text, " ")` (Java regex split, limit -1) and each shingle hash is
  * `xxhash64` (seed 42) over the space-joined shingle string — bit-identical
  * to the Column formulation it replaces, so LSH candidates and the exact
  * intersection counts are unchanged. Fewer than n tokens ⇒ empty array
  * (reference shingling of its dedup pipeline; Dedup.shingles guard).
  */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression {

  require(n > 0, "shingle size must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires string input, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "rm_shingle_hashes"

  override protected def nullSafeEval(input: Any): Any =
    UnsafeArrayData.fromPrimitiveArray(
      ShingleHashes.compute(input.asInstanceOf[UTF8String], n))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray(graft.functions.ShingleHashes$$.MODULE$$.compute($c, $n));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {

  /** One pass: split on single spaces (split(text, " ") semantics), slide
    * the n-window, hash each joined shingle with xxhash64(seed=42), keep
    * first occurrences. Called from interpreted eval and generated code. */
  def compute(text: UTF8String, n: Int): Array[Long] = {
    // limit -1 keeps trailing empty tokens — Spark's split(), not String.split
    val toks = text.toString.split(" ", -1)
    if (toks.length < n) return Array.emptyLongArray
    val count = toks.length - n + 1
    val seen = new java.util.HashSet[java.lang.Long](count * 2)
    val out = new Array[Long](count)
    var m = 0
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < count) {
      sb.setLength(0)
      sb.append(toks(i))
      var j = 1
      while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
      val h = XxHash64Function.hash(
        UTF8String.fromString(sb.toString), StringType, 42L)
      if (seen.add(h)) { out(m) = h; m += 1 }
      i += 1
    }
    if (m == count) out else java.util.Arrays.copyOf(out, m)
  }

  /** Column form: distinct shingle hashes of a text column. */
  def shingleHashes(text: Column, n: Int): Column =
    Bridge.column(ShingleHashes(Bridge.expression(text), n))
}
