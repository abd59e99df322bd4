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
  * Semantics match the HOF version exactly: for equal-length arrays with no
  * null elements the accumulation is left-to-right in index order with
  * double precision (bit-identical, so DuckDB oracles comparing
  * `round(cosine, 4)` are unaffected); mismatched lengths or a null element
  * yield NULL (as `zip_with` padding / null propagation did) instead of a
  * silently-wrong finite score.
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

  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (CosineSim.invalid(a, b)) null
    else if (isFloat(left) && isFloat(right)) CosineSim.computeF(a, b)
    else CosineSim.computeD(a, b)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (isFloat(left) && isFloat(right)) "computeF" else "computeD"
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""if (graft.functions.CosineSim.invalid($a, $b)) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.CosineSim.$fn($a, $b);
         |}""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object CosineSim {

  /** NULL-result guard: mismatched lengths or any null element (unsafe
    * getFloat/getDouble would read the zeroed slot without consulting the
    * null bitmap — a silently-wrong score instead of a detectable NULL).
    */
  def invalid(a: ArrayData, b: ArrayData): Boolean = {
    val n = a.numElements()
    if (n != b.numElements()) return true
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return true
      i += 1
    }
    false
  }

  /** Float-array cosine: dot and both norms in one scan. Callers must
    * have passed the [[invalid]] guard (equal lengths, no null elements).
    */
  def computeF(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var dot = 0.0; var qq = 0.0; var vv = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; qq += x * x; vv += y * y
      i += 1
    }
    dot / (math.sqrt(qq) * math.sqrt(vv))
  }

  /** Double-array variant (same semantics). */
  def computeD(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var dot = 0.0; var qq = 0.0; var vv = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y; qq += x * x; vv += y * y
      i += 1
    }
    dot / (math.sqrt(qq) * math.sqrt(vv))
  }

  def apply(a: Column, b: Column): Column =
    GraftColumnBridge.column(CosineSim(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
