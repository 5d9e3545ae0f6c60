package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Symmetric int8 vector quantization — the standard embedding-index
  * compression (FAISS SQ8 shape): per-vector scale = 127 / max|x|, each
  * component floor(x·scale + 0.5) ∈ [-127, 127]. 4× smaller than float32
  * with ~0.1% cosine error on unit-norm embeddings; at corpus scale the
  * win is I/O — a 100 TB float index becomes 25 TB.
  *
  * floor(x + 0.5) is used instead of round() because its semantics are
  * identical in every engine (round() half-away vs half-even differs
  * between Java, C, and SQL dialects); with scale = 127/max|x| the
  * extremes land exactly on ±127, so no clamp is needed.
  *
  * Column-combinator HOFs (narrow, no shuffle). The scale sub-expression
  * is re-evaluated per element by the interpreted lambda (O(d²) per row) —
  * fine for the occasional index-build pass; a hot path would move the
  * loop into a native expression like the graft.functions family.
  */
object Quantize {

  private def asDouble(c: Column): Column = c.cast(ArrayType(DoubleType))

  /** Per-vector max-abs. */
  def maxAbs(vec: Column): Column =
    array_max(transform(asDouble(vec), x => abs(x)))

  /** 127 / max|x| (0.0 for the zero vector). */
  def int8Scale(vec: Column): Column = {
    val ma = maxAbs(vec)
    when(ma === 0.0, lit(0.0)).otherwise(lit(127.0) / ma)
  }

  /** Quantized components as a long array. */
  def int8(vec: Column): Column = {
    val scale = int8Scale(vec)
    transform(asDouble(vec), x => floor(x * scale + lit(0.5)).cast(LongType))
  }

  /** Comma-joined string form (array columns do not survive the driver's
    * hash comparator; the CSV string is bit-stable). */
  def int8Csv(vec: Column): Column =
    array_join(transform(int8(vec), q => q.cast(StringType)), ",")

  /** Dequantized vector (for error measurement / reranking). */
  def dequantize(q: Column, scale: Column): Column =
    transform(q, v => v.cast(DoubleType) / scale)
}
