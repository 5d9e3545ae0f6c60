package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.rmbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, the MOSS
  * algorithm) in ONE in-row pass: hash every word n-gram, slide a window
  * of `w` consecutive gram positions, keep each window's minimum hash —
  * the fingerprint SET is robust to insertions/deletions (any shared
  * substring of ≥ w+n−1 tokens guarantees a shared fingerprint) while
  * ~w× smaller than the full gram-hash set, which is exactly what a
  * corpus-scale fingerprint index wants to store.
  *
  * Distinct fingerprints returned sorted ascending. Documents with fewer
  * than n tokens produce an empty set; documents with fewer than w grams
  * get one window covering all of them (every document with at least one
  * gram has at least one fingerprint, the MOSS guarantee).
  *
  * Gram hash = the first 15 hex chars of md5 parsed base-16 (60 bits) —
  * the same oracle-restatable hash as [[Md5SimHash]], so the whole
  * operator (grams → hashes → window minima → distinct) restates in SQL
  * window functions for the DuckDB correctness gate. The sliding minimum
  * runs on a monotonic deque: O(grams) total, not O(grams·w).
  */
case class WinnowFingerprints(child: Expression, n: Int, w: Int)
    extends UnaryExpression {

  require(n > 0, "gram size must be positive")
  require(w > 0, "window size must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires string input, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "rm_winnow_fingerprints"

  override protected def nullSafeEval(input: Any): Any =
    UnsafeArrayData.fromPrimitiveArray(
      WinnowFingerprints.compute(input.asInstanceOf[UTF8String], n, w))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray(graft.functions.WinnowFingerprints$$.MODULE$$.compute(
         |    $c, $n, $w));
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

object WinnowFingerprints {

  def compute(text: UTF8String, n: Int, w: Int): Array[Long] = {
    val toks = text.toString.split(" ", -1)
    if (toks.length < n) return Array.emptyLongArray
    val count = toks.length - n + 1
    val md = java.security.MessageDigest.getInstance("MD5")
    val hashes = new Array[Long](count)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < count) {
      sb.setLength(0)
      sb.append(toks(i))
      var j = 1
      while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
      hashes(i) = Md5SimHash.md5Hash60(sb.toString, md)
      i += 1
    }
    val windows = math.max(1, count - w + 1)
    val span = math.min(w, count) // a short document gets one full-cover window
    // monotonic deque of indices: front always holds the window minimum
    val deque = new Array[Int](count)
    var head = 0; var tail = 0 // [head, tail)
    val out = new java.util.TreeSet[java.lang.Long]()
    i = 0
    while (i < count) {
      while (tail > head && hashes(deque(tail - 1)) >= hashes(i)) tail -= 1
      deque(tail) = i; tail += 1
      if (deque(head) <= i - span) head += 1
      if (i >= span - 1 && i - span + 1 < windows) out.add(hashes(deque(head)))
      i += 1
    }
    val res = new Array[Long](out.size)
    val it = out.iterator()
    i = 0
    while (it.hasNext) { res(i) = it.next(); i += 1 }
    res
  }

  /** Column form: sorted distinct fingerprint array. */
  def winnowFingerprints(text: Column, n: Int, w: Int): Column =
    Bridge.column(WinnowFingerprints(Bridge.expression(text), n, w))
}
