package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.TernaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded-heap top-k as a native Catalyst aggregate:
  * `top_k_by(score, id, k)` → the k (score, id) pairs with the largest
  * score (ties → smallest id), ordered best-first.
  *
  * This is the engine's answer to every "top-k per group" (champion
  * selection T1, capping T2, SURVEY.md §2.6): a `row_number() OVER
  * (PARTITION BY g ORDER BY …) <= k` plan shuffles and SORTS every
  * candidate row of every group through a WindowExec; this aggregate is
  * map-side combinable (ObjectHashAggregate partial), so each input
  * partition forwards at most k rows per group and nothing is ever
  * globally sorted — at 10^9 candidates per hot group the window plan
  * funnels one task while this one stays O(k) per (partition, group).
  * Reference semantics: top-k champion selection keeps the matching
  * shape in src/index/similarity_detection.c:136-217 (k best candidate
  * segments by shared-feature count).
  *
  * Determinism: ordering is total on (score DESC, id ASC), so results
  * are partition-order independent — the aggregate is oracle-safe
  * (DuckDB replays it as a window rank). Need a descending id tie-break
  * (the reference's FIFO-newest rule)? Negate the id at the call site.
  *
  * NULL semantics: rows where score OR id is NULL are SKIPPED (standard
  * aggregate-function null handling, like max/sum), which DIVERGES from
  * the `row_number() OVER (ORDER BY score DESC)` pattern this replaces —
  * a window ranks NULL-score rows (NULLS LAST in Spark, so they can
  * still surface when a group has fewer than k non-null rows). SQL
  * callers of the registered `top_k_by` who need window parity on
  * nullable scores must coalesce NULLs to a sentinel (e.g.
  * Long.MinValue) at the call site; all engine call sites feed non-null
  * columns.
  *
  * Buffer is two primitive long arrays forming a worst-at-root binary
  * heap; serialization is a flat ByteBuffer — no boxing, no Scala
  * collections on the hot path.
  */
case class TopKBy(
    first: Expression,  // score: long
    second: Expression, // id: long
    third: Expression,  // k: foldable int > 0
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKHeap] with TernaryLike[Expression] {

  private lazy val k: Int = third.eval().asInstanceOf[Int]

  override def checkInputDataTypes(): TypeCheckResult = {
    if (first.dataType != LongType || second.dataType != LongType) {
      TypeCheckResult.TypeCheckFailure(
        s"top_k_by(score, id, k) needs two BIGINT children, got " +
          s"(${first.dataType.simpleString}, ${second.dataType.simpleString})")
    } else if (!third.foldable || third.dataType != IntegerType) {
      TypeCheckResult.TypeCheckFailure("top_k_by k must be a literal INT")
    } else if (third.eval() == null || third.eval().asInstanceOf[Int] <= 0 ||
        third.eval().asInstanceOf[Int] > TopKBy.maxK) {
      TypeCheckResult.TypeCheckFailure(
        s"top_k_by k must be in [1, ${TopKBy.maxK}]")
    } else TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = TopKBy.resultType
  override def nullable: Boolean = false
  override def prettyName: String = "top_k_by"

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

  override def update(buffer: TopKHeap, input: InternalRow): TopKHeap = {
    val s = first.eval(input)
    val i = second.eval(input)
    if (s != null && i != null) {
      buffer.add(s.asInstanceOf[Long], i.asInstanceOf[Long])
    }
    buffer
  }

  override def merge(buffer: TopKHeap, other: TopKHeap): TopKHeap = {
    var j = 0
    while (j < other.size) { buffer.add(other.scores(j), other.ids(j)); j += 1 }
    buffer
  }

  override def eval(buffer: TopKHeap): Any = {
    val (ss, ii) = buffer.sortedBestFirst()
    val out = new Array[Any](ss.length)
    var j = 0
    while (j < ss.length) {
      out(j) = InternalRow(ss(j), ii(j))
      j += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buffer: TopKHeap): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 16 * buffer.size)
    bb.putInt(buffer.k).putInt(buffer.size)
    var j = 0
    while (j < buffer.size) {
      bb.putLong(buffer.scores(j)).putLong(buffer.ids(j)); j += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKHeap = {
    val bb = ByteBuffer.wrap(bytes)
    val heap = new TopKHeap(bb.getInt())
    val n = bb.getInt()
    var j = 0
    // stored entries are already heap-shaped for the same k; re-adding
    // keeps the invariant without assuming layout
    while (j < n) { heap.add(bb.getLong(), bb.getLong()); j += 1 }
    heap
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKBy =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKBy =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): TopKBy =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object TopKBy {
  /** Backstop against a runaway literal — per-group state is 16·k bytes. */
  val maxK: Int = 1 << 20

  val resultType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", LongType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)

  /** `top_k_by(score, id, k)` as a Column (array<struct<score,id>>,
    * best-first). Explode with posexplode for 1-based ranks.
    */
  def apply(score: Column, id: Column, k: Int): Column =
    GraftColumnBridge.column(
      TopKBy(
        GraftColumnBridge.expression(score),
        GraftColumnBridge.expression(id),
        Literal(k)).toAggregateExpression())
}

/** Bounded worst-at-root binary heap over (score, id) with total order
  * "better" = (score larger | equal score, id smaller). Root is the
  * WORST kept entry so a better arrival replaces it in O(log k).
  */
final class TopKHeap(val k: Int) {
  val scores = new Array[Long](k)
  val ids = new Array[Long](k)
  var size = 0

  // a strictly worse than b
  @inline private def worse(sa: Long, ia: Long, sb: Long, ib: Long): Boolean =
    sa < sb || (sa == sb && ia > ib)

  def add(s: Long, i: Long): Unit = {
    if (size < k) {
      var c = size
      scores(c) = s; ids(c) = i; size += 1
      while (c > 0) { // sift up: parent must be no better than child? root=worst ⇒ parent worse-or-equal
        val p = (c - 1) >> 1
        if (worse(scores(c), ids(c), scores(p), ids(p))) {
          val ts = scores(c); val ti = ids(c)
          scores(c) = scores(p); ids(c) = ids(p)
          scores(p) = ts; ids(p) = ti
          c = p
        } else return
      }
    } else if (worse(scores(0), ids(0), s, i)) { // beats the current worst
      scores(0) = s; ids(0) = i
      var c = 0
      while (true) {
        val l = 2 * c + 1
        val r = l + 1
        var w = c // find the worst among c and children → move it up
        if (l < size && worse(scores(l), ids(l), scores(w), ids(w))) w = l
        if (r < size && worse(scores(r), ids(r), scores(w), ids(w))) w = r
        if (w == c) return
        val ts = scores(c); val ti = ids(c)
        scores(c) = scores(w); ids(c) = ids(w)
        scores(w) = ts; ids(w) = ti
        c = w
      }
    }
  }

  /** Kept entries ordered best-first: (score DESC, id ASC). */
  def sortedBestFirst(): (Array[Long], Array[Long]) = {
    val idx = Array.range(0, size).sortWith { (a, b) =>
      scores(a) > scores(b) || (scores(a) == scores(b) && ids(a) < ids(b))
    }
    (idx.map(scores), idx.map(ids))
  }
}
