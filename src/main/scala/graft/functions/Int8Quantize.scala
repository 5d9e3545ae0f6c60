package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.rmbridge.Bridge
import org.apache.spark.sql.types._

/** Symmetric int8 quantization of one vector in TWO in-row passes:
  * `struct(scale, q, csv, dq)` with scale = 127 / max|x| (0.0 for the
  * zero vector), qᵢ = floor(xᵢ·scale + 0.5) ∈ [-127, 127], csv the
  * comma-joined component string (the bit-stable form the driver's hash
  * comparator needs — emitted here because an `array_join(transform(...))`
  * wrapper is a higher-order function and would knock the whole
  * projection out of whole-stage codegen), dq the round-tripped
  * dequantized vector qᵢ/scale (what a quantized-index search scores
  * against — emitted here because composing a `transform` lambda with
  * this expression would re-evaluate the whole quantization per ELEMENT,
  * the O(d²) interpreted-HOF trap this expression exists to avoid), and
  * bin the components packed one signed byte each — the PERSISTED index
  * form: a parquet `binary` column is genuinely ¼ the bytes of the float
  * vector, where an `array<long>` of the same values is not
  * ([[Int8Dequantize]] is the matching native read path).
  *
  * Replaces the Column-HOF formulation in [[graft.operators.Quantize]],
  * whose interpreted `transform` lambda re-evaluated the whole
  * max-abs sub-expression per ELEMENT — O(d²) per row, and quantization
  * is an index-build pass over the full corpus, exactly where a 100 TB
  * pipeline pays d=1024+ per row. This expression is O(d) (one max-abs
  * pass, one scale pass), codegen'd, and bit-identical to the lambda
  * form: same abs/max/division/floor double ops in the same order.
  *
  * floor(x·scale + 0.5) rather than round(): half-away vs half-even
  * round() semantics differ between Java, C, and SQL dialects, while
  * floor(+0.5) is identical in every engine; with scale = 127/max|x| the
  * extremes land exactly on ±127, so no clamp is needed.
  *
  * Inputs are assumed FINITE (the embeddings contract, enforced upstream
  * by IVF training's finite filter): a NaN coordinate would make the
  * max-abs comparison silently skip it here while Spark's array_max
  * (NaN-greatest ordering) would poison the scale — don't feed either
  * form non-finite vectors and expect agreement.
  */
case class Int8Quantize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double> input, got $t")
  }

  override def dataType: DataType = Int8Quantize.schema
  override def prettyName: String = "rm_int8_quantize"

  override protected def nullSafeEval(input: Any): Any =
    Int8Quantize.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Int8Quantize$$.MODULE$$.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Int8Quantize =
    copy(child = newChild)
}

object Int8Quantize {

  val schema: StructType = StructType(Seq(
    StructField("scale", DoubleType, nullable = false),
    StructField("q", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("csv", StringType, nullable = false),
    StructField("dq", ArrayType(DoubleType, containsNull = false), nullable = false),
    StructField("bin", BinaryType, nullable = false)))

  def compute(vec: ArrayData): InternalRow = {
    val n = vec.numElements()
    var ma = 0.0
    var i = 0
    while (i < n) {
      val a = math.abs(vec.getDouble(i))
      if (a > ma) ma = a
      i += 1
    }
    val scale = if (ma == 0.0) 0.0 else 127.0 / ma
    val out = new Array[Long](n)
    val dq = new Array[Double](n)
    val bin = new Array[Byte](n)
    val sb = new java.lang.StringBuilder(n * 5)
    i = 0
    while (i < n) {
      out(i) = math.floor(vec.getDouble(i) * scale + 0.5).toLong
      // the zero vector round-trips to itself (scale 0 means every q is 0)
      dq(i) = if (scale == 0.0) 0.0 else out(i).toDouble / scale
      bin(i) = out(i).toByte // in [-127, 127] by construction
      if (i > 0) sb.append(',')
      sb.append(out(i))
      i += 1
    }
    new GenericInternalRow(Array[Any](
      scale,
      UnsafeArrayData.fromPrimitiveArray(out),
      org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString),
      UnsafeArrayData.fromPrimitiveArray(dq),
      bin))
  }

  /** Column form: `struct(scale double, q array<long>, csv string,
    * dq array<double>, bin binary)`. */
  def int8Quantize(vec: Column): Column =
    Bridge.column(Int8Quantize(Bridge.expression(vec)))
}

/** The read path of a byte-packed int8 index: binary components (one
  * signed byte each, [[Int8Quantize]]'s `bin` field) + scale back to the
  * dequantized double vector — one O(d) codegen'd pass per row, the same
  * division the `dq` field performs at write time, so a search served
  * from the persisted index scores bit-identically to one served from
  * the in-flight quantization. */
case class Int8Dequantize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (BinaryType, DoubleType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (binary, double) inputs, got $l / $r")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "rm_int8_dequantize"

  override protected def nullSafeEval(bin: Any, scale: Any): Any =
    UnsafeArrayData.fromPrimitiveArray(
      Int8Dequantize.compute(bin.asInstanceOf[Array[Byte]], scale.asInstanceOf[Double]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, s) =>
      s"""${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray(graft.functions.Int8Dequantize$$.MODULE$$.compute($b, $s));
       """.stripMargin)

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression)
      : Int8Dequantize = copy(left = newLeft, right = newRight)
}

object Int8Dequantize {

  def compute(bin: Array[Byte], scale: Double): Array[Double] = {
    val out = new Array[Double](bin.length)
    var i = 0
    while (i < bin.length) {
      // zero vector (scale 0) round-trips to zeros, matching the write side
      out(i) = if (scale == 0.0) 0.0 else bin(i).toDouble / scale
      i += 1
    }
    out
  }

  /** Column form. */
  def int8Dequantize(bin: Column, scale: Column): Column =
    Bridge.column(Int8Dequantize(Bridge.expression(bin), Bridge.expression(scale)))
}
