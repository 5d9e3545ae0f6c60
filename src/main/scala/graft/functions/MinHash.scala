package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.rmbridge.Bridge
import org.apache.spark.sql.types._

/** Native Catalyst expression computing a k-permutation MinHash signature
  * from a precomputed shingle-hash array in ONE tight pass.
  *
  * The Column-combinator formulation
  * (`transform(sequence(0,k-1), i -> array_min(transform(shh, h -> hash)))`)
  * runs as interpreted higher-order lambdas — O(k·shingles) Catalyst
  * `eval` calls per row, which round-1 benchmarking showed dominating the
  * whole dedup query (≈23% of total bench time). This expression performs
  * the same O(k·shingles) work as a JIT-compiled primitive loop with no
  * per-element expression dispatch, and participates in whole-stage
  * codegen.
  *
  * Permutations are splitmix64 finalizations of (hash XOR seed_i) — fully
  * deterministic, independent across i, and overflow-free under ANSI mode
  * (plain Java long arithmetic, not Catalyst operators). The MinHash
  * correctness contract (same hash family across all docs in a query) is
  * all LSH banding needs; the driver oracle checks the recovered PAIRS
  * against exact Jaccard, not the hash values.
  *
  * Semantics reproduced from the reference's minhash stage of its dedup
  * pipeline; empty shingle arrays yield all-Long.MaxValue signatures (such
  * docs collide only with other empty docs and are eliminated by the exact
  * verification join, which has no shingles to match).
  */
case class MinHashSignature(child: Expression, k: Int)
    extends UnaryExpression {

  require(k > 0 && k <= MinHashSignature.maxK, s"k must be in [1, ${MinHashSignature.maxK}]")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> input, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "rm_minhash_signature"

  override protected def nullSafeEval(input: Any): Any =
    UnsafeArrayData.fromPrimitiveArray(
      MinHashSignature.compute(input.asInstanceOf[ArrayData], k))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      // one static call into the JIT-compiled primitive loop — no
      // per-element Catalyst dispatch, still inside whole-stage codegen
      s"""
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray(graft.functions.MinHashSignature$$.MODULE$$.compute($c, $k));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashSignature {

  val maxK = 1024

  /** Per-permutation seeds: splitmix64 stream — fixed, deterministic. */
  private val seeds: Array[Long] = {
    val s = new Array[Long](maxK)
    var i = 0
    while (i < maxK) { s(i) = mix(0x9E3779B97F4A7C15L * (i + 1)); i += 1 }
    s
  }

  @inline private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** The k-min pass: for each of the k permutations, the min permuted hash
    * over the array. Called from both interpreted eval and generated code. */
  def compute(hashes: ArrayData, k: Int): Array[Long] = {
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val n = hashes.numElements()
    var j = 0
    while (j < n) {
      val h = hashes.getLong(j)
      var i = 0
      while (i < k) {
        val x = mix(h ^ seeds(i))
        if (x < mins(i)) mins(i) = x
        i += 1
      }
      j += 1
    }
    mins
  }

  /** Column form: signature of a (non-null-element) long-hash array. */
  def signature(shingleHashes: Column, k: Int): Column =
    Bridge.column(MinHashSignature(Bridge.expression(shingleHashes), k))
}

/** LSH band keys of a MinHash signature: the signature split into `bands`
  * runs of `rowsPerBand` values, each run mixed (with its band index) into
  * one long key. Docs sharing any band key are candidate pairs.
  *
  * Band keys are INTERNAL join keys — never oracle-compared — so any
  * deterministic mix works; what matters is that equal band slices map to
  * equal keys, collisions are ~2⁻⁶⁴, and the whole candidates projection
  * (shingles → signature → band keys) stays one codegen'd pass with no
  * cache barriers (the Column-combinator band lambda re-inlined the
  * signature per band — the round-1/2 HOF gotcha this family eliminates).
  */
case class MinHashBandKeys(child: Expression, bands: Int, rowsPerBand: Int)
    extends UnaryExpression {

  require(bands > 0 && rowsPerBand > 0)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> input, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "rm_minhash_band_keys"

  override protected def nullSafeEval(input: Any): Any =
    UnsafeArrayData.fromPrimitiveArray(
      MinHashBandKeys.compute(input.asInstanceOf[ArrayData], bands, rowsPerBand))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray(graft.functions.MinHashBandKeys$$.MODULE$$.compute(
         |    $c, $bands, $rowsPerBand));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashBandKeys =
    copy(child = newChild)
}

object MinHashBandKeys {

  @inline private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  def compute(sig: ArrayData, bands: Int, rowsPerBand: Int): Array[Long] = {
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = mix(b.toLong)
      var r = 0
      while (r < rowsPerBand) {
        val idx = b * rowsPerBand + r
        h = mix(h ^ (if (idx < sig.numElements()) sig.getLong(idx) else 0L))
        r += 1
      }
      out(b) = h
      b += 1
    }
    out
  }

  /** Column form: the band-key array of a signature column. */
  def bandKeys(signature: Column, bands: Int, rowsPerBand: Int): Column =
    Bridge.column(MinHashBandKeys(Bridge.expression(signature), bands, rowsPerBand))
}
