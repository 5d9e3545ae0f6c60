package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.rmbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document md5-based SimHash signature in one narrow pass.
  *
  * The aggregate formulation explodes tokens and shuffles a 60-column
  * bit-sum aggregate per document; but every token of a document lives in
  * its own row, so the whole signature is a per-row computation — no
  * explode, no shuffle, stays inside whole-stage codegen. Bit-identical
  * to the SQL the oracle runs: tokens from `split(text, " ")` semantics,
  * token hash = the first 15 hex chars of md5 parsed base-16 (60 bits),
  * bit b of the signature set when the ±1 sum over token-hash bit b is
  * positive (operators/Dedup.simhashAgg and its DuckDB mirror).
  */
case class Md5SimHash(child: Expression, bits: Int)
    extends UnaryExpression {

  require(bits > 0 && bits <= 60, "15 md5 hex chars = 60 hash bits available")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires string input, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "rm_md5_simhash"

  override protected def nullSafeEval(input: Any): Any =
    Md5SimHash.compute(input.asInstanceOf[UTF8String], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Md5SimHash$$.MODULE$$.compute($c, $bits);")

  override protected def withNewChildInternal(newChild: Expression): Md5SimHash =
    copy(child = newChild)
}

object Md5SimHash {

  /** The first 15 hex chars of md5(s) parsed base-16 (60 bits) — the
    * oracle-restatable hash shared with [[WinnowFingerprints]]:
    * `('0x' || SUBSTR(MD5(s), 1, 15))::BIGINT` in DuckDB. */
  private[functions] def md5Hash60(s: String,
      md: java.security.MessageDigest): Long = {
    md.reset()
    val digest = md.digest(s.getBytes(StandardCharsets.UTF_8))
    // first 15 hex chars = the top 7.5 bytes, big-endian
    var th = 0L
    var b = 0
    while (b < 7) { th = (th << 8) | (digest(b) & 0xffL); b += 1 }
    (th << 4) | ((digest(7) & 0xf0L) >> 4)
  }

  def compute(text: UTF8String, bits: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val toks = text.toString.split(" ", -1) // split(text, " ") semantics
    val sums = new Array[Int](bits)
    var i = 0
    while (i < toks.length) {
      val th = md5Hash60(toks(i), md)
      var bit = 0
      while (bit < bits) {
        if (((th >> bit) & 1L) == 1L) sums(bit) += 1 else sums(bit) -= 1
        bit += 1
      }
      i += 1
    }
    var sig = 0L
    var bit = 0
    while (bit < bits) {
      if (sums(bit) > 0) sig |= (1L << bit)
      bit += 1
    }
    sig
  }

  /** Column form: the `bits`-bit signature of a text column. */
  def simhash(text: Column, bits: Int): Column =
    Bridge.column(Md5SimHash(Bridge.expression(text), bits))
}
