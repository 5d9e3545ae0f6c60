package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.rmbridge.Bridge
import org.apache.spark.sql.types._

/** First-occurrence-wins dedup of `values` by parallel stringified `keys`,
  * in one linear pass with a hash set.
  *
  * The Column formulation (filter-inside-filter over a decorated array) is
  * O(n²) per array in interpreted HOF evals; this runs once per row with
  * one set probe per element. Null keys are always kept — matching the
  * combinator form, where a null-keyed element never equals any other key
  * (SQL null comparison) and therefore always survives.
  */
case class DistinctByKey(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(_, _), ArrayType(StringType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array, array<string>) inputs, got $l / $r")
  }
  override def dataType: DataType = left.dataType
  override def prettyName: String = "rm_distinct_by_key"

  private lazy val elementType = left.dataType.asInstanceOf[ArrayType].elementType

  override protected def nullSafeEval(v: Any, k: Any): Any = {
    val values = v.asInstanceOf[ArrayData]
    val keys = k.asInstanceOf[ArrayData]
    val n = values.numElements()
    val seen = new java.util.HashSet[String](n * 2)
    val out = new scala.collection.mutable.ArrayBuffer[Any](n)
    var i = 0
    while (i < n) {
      val keep =
        if (i >= keys.numElements() || keys.isNullAt(i)) true // null key: always kept
        else seen.add(keys.getUTF8String(i).toString)
      if (keep) out += (if (values.isNullAt(i)) null else values.get(i, elementType))
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression)
      : DistinctByKey = copy(left = newLeft, right = newRight)
}

object DistinctByKey {
  def distinctBy(values: Column, keys: Column): Column =
    Bridge.column(DistinctByKey(Bridge.expression(values), Bridge.expression(keys)))
}
