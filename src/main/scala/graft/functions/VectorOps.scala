package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.rmbridge.Bridge
import org.apache.spark.sql.types._

/** Native vector math for the similarity operators.
  *
  * The Column formulation (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`)
  * evaluates as interpreted higher-order lambdas — one Catalyst dispatch
  * per element per pair, which dominates both ANN queries (a cosine is
  * three folds; a 16-table×4-plane bucket set is 64 projections). These
  * expressions run the same index-ascending accumulation as a JIT loop,
  * so every double is produced in the same order and the results are
  * bit-identical to the fold form (and to the DuckDB oracle's
  * left-associated sums / LIST_COSINE_SIMILARITY).
  */
object VectorOps {

  /** cosine(a, b) = Σaᵢbᵢ / (√Σaᵢ² · √Σbᵢ²), all three sums accumulated
    * left-to-right. */
  def cosineSimilarity(a: Column, b: Column): Column =
    Bridge.column(CosineSimilarity(Bridge.expression(a), Bridge.expression(b)))

  /** All `tables` hyperplane buckets of a vector in one pass. */
  def hyperplaneBuckets(vec: Column, planes: Int, tables: Int): Column =
    Bridge.column(HyperplaneBuckets(Bridge.expression(vec), planes, tables))

  /** x / √(Σx²), the norm accumulated left-to-right (bit-identical to the
    * `transform`/`aggregate` formulation and the oracle's spelled-out
    * chain). */
  def l2Normalize(vec: Column): Column =
    Bridge.column(L2Normalize(Bridge.expression(vec)))

  /** The `n` nearest centroid indices by squared L2, nearest first, ties
    * to the lower index — one pass over all centroids per row. */
  def nearestClusters(vec: Column, cents: Seq[Seq[Double]], n: Int): Column =
    Bridge.column(NearestClusters(Bridge.expression(vec),
      cents.map(_.toArray).toArray, n))

  /** The squared L2 distance to the NEAREST centroid — the per-vector
    * outlier score. Same per-centroid accumulation order as
    * [[NearestClusters]] (and so as the k-means training loop and the
    * oracle's spelled-out chains); the min across centroids is a value,
    * not a fold, so it is order-independent. */
  def nearestClusterDist(vec: Column, cents: Seq[Seq[Double]]): Column =
    Bridge.column(NearestClusterDist(Bridge.expression(vec),
      cents.map(_.toArray).toArray))
}

case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> inputs, got $l / $r")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "rm_cosine_similarity"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    CosineSimilarity.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.CosineSimilarity$$.MODULE$$.compute($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression)
      : CosineSimilarity = copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  def compute(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i); val y = b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }
}

/** The `tables` LSH bucket longs of one vector: bucket t ORs the sign bits
  * of `planes` projections onto deterministic ±1 hyperplanes (splitmix64 of
  * (plane, dim) — [[graft.operators.Similarity.planeWeight]]'s formula,
  * duplicated here as the single hot-loop copy). */
case class HyperplaneBuckets(child: Expression, planes: Int, tables: Int)
    extends UnaryExpression {

  require(planes > 0 && planes <= 63 && tables > 0)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double> input, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "rm_hyperplane_buckets"

  override protected def nullSafeEval(input: Any): Any =
    UnsafeArrayData.fromPrimitiveArray(
      HyperplaneBuckets.compute(input.asInstanceOf[ArrayData], planes, tables))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray(graft.functions.HyperplaneBuckets$$.MODULE$$.compute(
         |    $c, $planes, $tables));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBuckets =
    copy(child = newChild)
}

case class L2Normalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double> input, got $t")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "rm_l2_normalize"

  override protected def nullSafeEval(input: Any): Any =
    UnsafeArrayData.fromPrimitiveArray(
      L2Normalize.compute(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray(graft.functions.L2Normalize$$.MODULE$$.compute($c));
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): L2Normalize =
    copy(child = newChild)
}

object L2Normalize {
  def compute(vec: ArrayData): Array[Double] = {
    val n = vec.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { val x = vec.getDouble(i); s += x * x; i += 1 }
    val nrm = math.sqrt(s)
    val out = new Array[Double](n)
    i = 0
    while (i < n) { out(i) = vec.getDouble(i) / nrm; i += 1 }
    out
  }
}

/** The `n` nearest of the baked-in centroids by squared L2 (accumulated
  * index-ascending, like the oracle's spelled-out chain), nearest first,
  * ties broken toward the lower centroid index — the IVF probe list. */
case class NearestClusters(child: Expression, cents: Array[Array[Double]], n: Int)
    extends UnaryExpression {

  require(n > 0 && n <= cents.length)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double> input, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "rm_nearest_clusters"

  override protected def nullSafeEval(input: Any): Any =
    UnsafeArrayData.fromPrimitiveArray(
      NearestClusters.compute(input.asInstanceOf[ArrayData], cents, n))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("cents", cents, "double[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray(graft.functions.NearestClusters$$.MODULE$$.compute(
         |    $c, $centsRef, $n));
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): NearestClusters =
    copy(child = newChild)
}

case class NearestClusterDist(child: Expression, cents: Array[Array[Double]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double> input, got $t")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "rm_nearest_cluster_dist"

  override protected def nullSafeEval(input: Any): Any =
    NearestClusterDist.compute(input.asInstanceOf[ArrayData], cents)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("cents", cents, "double[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.NearestClusterDist$$.MODULE$$.compute(
         |  $c, $centsRef);
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): NearestClusterDist =
    copy(child = newChild)
}

object NearestClusterDist {
  def compute(vec: ArrayData, cents: Array[Array[Double]]): Double =
    compute(vec.toDoubleArray(), cents)

  /** Identical per-centroid accumulation to [[NearestClusters.compute]];
    * the cross-centroid MIN is order-independent by value. */
  def compute(vec: Array[Double], cents: Array[Array[Double]]): Double = {
    var best = Double.PositiveInfinity
    var c = 0
    while (c < cents.length) {
      val cent = cents(c)
      val dims = math.min(vec.length, cent.length)
      var s = 0.0
      var d = 0
      while (d < dims) {
        val diff = vec(d) - cent(d)
        s += diff * diff
        d += 1
      }
      if (s < best) best = s
      c += 1
    }
    best
  }
}

object NearestClusters {
  def compute(vec: ArrayData, cents: Array[Array[Double]], n: Int): Array[Long] =
    compute(vec.toDoubleArray(), cents, n)

  /** Same loop for driver-side k-means training (identical accumulation
    * order, so training and the baked-in plan agree exactly). */
  def compute(vec: Array[Double], cents: Array[Array[Double]], n: Int): Array[Long] = {
    val k = cents.length
    val dists = new Array[Double](k)
    var c = 0
    while (c < k) {
      val cent = cents(c)
      val dims = math.min(vec.length, cent.length)
      var s = 0.0
      var d = 0
      while (d < dims) {
        val diff = vec(d) - cent(d)
        s += diff * diff
        d += 1
      }
      dists(c) = s
      c += 1
    }
    // selection of the n smallest (dist, index) — k is tiny (nlist)
    val order = Array.range(0, k).sortBy(i => (dists(i), i))
    order.take(n).map(_.toLong)
  }
}

object HyperplaneBuckets {

  private def planeWeight(plane: Int, dim: Int): Double = {
    var z = plane.toLong * 0x9E3779B97F4A7C15L + dim.toLong * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    if ((z & 1L) == 1L) 1.0 else -1.0
  }

  def compute(vec: ArrayData, planes: Int, tables: Int): Array[Long] = {
    val dims = vec.numElements()
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var p = 0
      while (p < planes) {
        val plane = t * planes + p
        var proj = 0.0
        var d = 0
        while (d < dims) {
          proj += vec.getDouble(d) * planeWeight(plane, d)
          d += 1
        }
        if (proj > 0) bucket |= (1L << p)
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    out
  }
}
