package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Intersection SIZE of two SORTED long arrays as a native Catalyst
  * expression — the same codegen'd merge scan as [[JaccardSorted]] but
  * returning the raw count, for similarity metrics that are not Jaccard
  * (the clone detector's overlap |A∩B| ≥ θ·max(|A|,|B|) needs the count
  * with integer arithmetic, not a float ratio). On sorted-distinct
  * arrays this is set intersection; on sorted arrays with duplicates
  * the i++/j++-on-match merge yields multiset intersection
  * Σ min(count_a, count_b) — both callers rely on the former via
  * per-doc-distinct element hashes.
  */
case class IntersectSorted(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "intersect_sorted"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    IntersectSorted.compute(a, b)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.IntersectSorted.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntersectSorted =
    copy(left = newLeft, right = newRight)
}

object IntersectSorted {
  /** Merge scan; arrays must be sorted ascending. */
  def compute(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0; var j = 0; var inter = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter
  }

  def apply(a: Column, b: Column): Column =
    GraftColumnBridge.column(IntersectSorted(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}

/** Intersection SIZE of two sorted arrays of 128-bit elements, each
  * flattened as consecutive (hi, lo) long pairs and sorted by UNSIGNED
  * (hi, lo) — the collision-free twin of [[IntersectSorted]] for
  * full-width digests (md5 = two longs). The fork detector's verify
  * stage uses this so a 64-bit hash collision between distinct file
  * digests can never inflate the overlap count; elements still ride the
  * shuffle as packed longs (16 bytes/digest), never as hex strings.
  */
case class IntersectSortedPairs(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "intersect_sorted_pairs"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    IntersectSortedPairs.compute(a, b)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.IntersectSortedPairs.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntersectSortedPairs =
    copy(left = newLeft, right = newRight)
}

object IntersectSortedPairs {
  /** Merge scan over (hi, lo) pairs; arrays must have even length and be
    * sorted ascending by unsigned (hi, lo).
    */
  def compute(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0; var j = 0; var inter = 0L
    while (i < na && j < nb) {
      var c = java.lang.Long.compareUnsigned(a.getLong(i), b.getLong(j))
      if (c == 0)
        c = java.lang.Long.compareUnsigned(a.getLong(i + 1), b.getLong(j + 1))
      if (c == 0) { inter += 1; i += 2; j += 2 }
      else if (c < 0) i += 2
      else j += 2
    }
    inter
  }

  def apply(a: Column, b: Column): Column =
    GraftColumnBridge.column(IntersectSortedPairs(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
