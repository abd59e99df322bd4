package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Order-preserving DOUBLE↔BIGINT bijection (IEEE-754 bit twiddle):
  * `sortable_bits(x)` maps a double to a signed long whose `<` order is
  * EXACTLY the double's `<` order (sign bit untouched for positives,
  * magnitude bits complemented for negatives, so -0.0 sorts just below
  * +0.0 and ±Inf land at the extremes). `sortable_bits_double` inverts it
  * losslessly.
  *
  * Purpose: feed FLOAT scores through the integer-only [[TopKBy]]
  * bounded-heap aggregate WITHOUT changing the ranking a
  * `row_number() OVER (ORDER BY score DESC)` window (and hence a DuckDB
  * oracle ranking the raw doubles) would produce — a micro-unit
  * `round(x*1e6)` surrogate can collide where the doubles differ and
  * silently permute ties. This encoding is collision-free by
  * construction, so `top_k_by(sortable_bits(score), id, k)` is
  * plan-for-plan substitutable for the window top-k on doubles.
  *
  * NaN caveat: `Double.doubleToLongBits` canonicalizes every NaN to one
  * bit pattern that encodes above +Inf — matching SQL's NULLS-free
  * "NaN largest" sort order; callers here never produce NaN.
  */
case class DoubleSortableBits(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "sortable_bits"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sortable_bits requires DOUBLE, got ${child.dataType.simpleString}")

  override def nullSafeEval(x: Any): Any =
    SortableBits.toSortable(x.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SortableBits.toSortable($c)")

  override protected def withNewChildInternal(newChild: Expression): DoubleSortableBits =
    copy(child = newChild)
}

/** Inverse of [[DoubleSortableBits]] — recovers the exact original double. */
case class SortableBitsDouble(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "sortable_bits_double"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sortable_bits_double requires BIGINT, got ${child.dataType.simpleString}")

  override def nullSafeEval(x: Any): Any =
    SortableBits.fromSortable(x.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SortableBits.fromSortable($c)")

  override protected def withNewChildInternal(newChild: Expression): SortableBitsDouble =
    copy(child = newChild)
}

object SortableBits {
  /** Positive doubles keep their bits (already ascending as signed longs);
    * negative doubles complement the 63 magnitude bits, reversing their
    * bit order to match numeric order while staying in the negative-long
    * range.
    */
  def toSortable(d: Double): Long = {
    val b = java.lang.Double.doubleToLongBits(d)
    if (b >= 0L) b else b ^ 0x7fffffffffffffffL
  }

  def fromSortable(s: Long): Double = {
    val b = if (s >= 0L) s else s ^ 0x7fffffffffffffffL
    java.lang.Double.longBitsToDouble(b)
  }

  def apply(c: Column): Column =
    GraftColumnBridge.column(DoubleSortableBits(GraftColumnBridge.expression(c)))

  def invert(c: Column): Column =
    GraftColumnBridge.column(SortableBitsDouble(GraftColumnBridge.expression(c)))
}
