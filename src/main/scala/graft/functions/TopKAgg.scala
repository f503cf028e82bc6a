package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Bounded top-k as a native Catalyst aggregate — the (b)-tier custom
  * operator mechanism (SURVEY §7.3) applied to an AGGREGATE rather
  * than a scalar: `graft_topk(v, k)` keeps the k largest BIGINTs per
  * group in a primitive min-heap and returns them sorted descending.
  *
  * Why not `sort + limit` or a rank window: both materialize/sort the
  * full group. The heap is O(n log k) time and O(k) state, partial
  * aggregation applies (each task heaps its slice, merge folds heaps —
  * commutative and associative, so the result is partitioning-
  * independent for the value MULTISET it returns), and only k longs
  * per group cross the shuffle. At 100 TB per-group top-k via window
  * rank shuffles every row; this ships k values per group per task.
  *
  * Determinism: equal values are indistinguishable, so the returned
  * multiset (and its descending sort) is exact regardless of which
  * physically-equal rows the heap retained.
  */
case class TopKAgg(
    child: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKAgg.Heap] {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()

  override def children: Seq[Expression] = Seq(child, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_topk"

  override def checkInputDataTypes(): TypeCheckResult = {
    if (child.dataType != LongType || kExpr.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (bigint, int) arguments, got " +
          s"${child.dataType.catalogString}, ${kExpr.dataType.catalogString}")
    else if (!kExpr.foldable)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires a literal k")
    else if (kExpr.eval() == null ||
      kExpr.eval().asInstanceOf[Number].intValue() <= 0)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires k > 0")
    else if (kExpr.eval().asInstanceOf[Number].intValue() > TopKAgg.maxK)
      // every group buffer eagerly allocates Array[Long](k) — an
      // unbounded k turns a typo into a multi-GB per-group allocation
      // at execution time; reject it at analysis time instead
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires k <= ${TopKAgg.maxK}")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def createAggregationBuffer(): TopKAgg.Heap = new TopKAgg.Heap(k)

  override def update(h: TopKAgg.Heap, input: InternalRow): TopKAgg.Heap = {
    val v = child.eval(input)
    if (v != null) h.offer(v.asInstanceOf[Long])
    h
  }

  override def merge(a: TopKAgg.Heap, b: TopKAgg.Heap): TopKAgg.Heap = {
    var i = 0
    while (i < b.size) { a.offer(b.values(i)); i += 1 }
    a
  }

  override def eval(h: TopKAgg.Heap): Any =
    new GenericArrayData(h.sortedDesc)

  override def serialize(h: TopKAgg.Heap): Array[Byte] = {
    val buf = ByteBuffer.allocate(4 + 8 * h.size)
    buf.putInt(h.size)
    var i = 0
    while (i < h.size) { buf.putLong(h.values(i)); i += 1 }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKAgg.Heap = {
    val buf = ByteBuffer.wrap(bytes)
    val n = buf.getInt
    val h = new TopKAgg.Heap(k)
    var i = 0
    while (i < n) { h.offer(buf.getLong); i += 1 }
    h
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), kExpr = newChildren(1))
}

object TopKAgg {
  /** Analysis-time ceiling on k: 2^20 longs = 8 MB per group buffer —
    * far above any sane top-k, far below an executor-killing size. */
  val maxK: Int = 1 << 20

  /** Primitive bounded min-heap: root is the SMALLEST retained value,
    * so a new candidate either beats the root (replace + sift down) or
    * is discarded in O(1). No boxing, O(k) memory. */
  final class Heap(k: Int) {
    val values = new Array[Long](k)
    var size = 0

    def offer(v: Long): Unit =
      if (size < k) {
        // grow phase: append then sift up
        var i = size
        values(i) = v
        size += 1
        while (i > 0 && values((i - 1) / 2) > values(i)) {
          val p = (i - 1) / 2
          val t = values(p); values(p) = values(i); values(i) = t
          i = p
        }
      } else if (v > values(0)) {
        // replace the minimum and restore the heap
        values(0) = v
        var i = 0
        var done = false
        while (!done) {
          val l = 2 * i + 1
          val r = 2 * i + 2
          var m = i
          if (l < size && values(l) < values(m)) m = l
          if (r < size && values(r) < values(m)) m = r
          if (m == i) done = true
          else {
            val t = values(m); values(m) = values(i); values(i) = t
            i = m
          }
        }
      }

    def sortedDesc: Array[Long] = {
      val out = java.util.Arrays.copyOf(values, size)
      java.util.Arrays.sort(out)
      // reverse in place: Arrays.sort is ascending
      var i = 0
      var j = out.length - 1
      while (i < j) {
        val t = out(i); out(i) = out(j); out(j) = t
        i += 1; j -= 1
      }
      out
    }
  }
}
