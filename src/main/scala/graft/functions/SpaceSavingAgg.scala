package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Misra–Gries frequent-items summary as a native Catalyst aggregate —
  * `graft_heavyhitters(key_bigint, k)` (Misra & Gries 1982; the
  * SpaceSaving/MG family): at most k counters; a key beyond capacity
  * decrements EVERY counter (each decrement "spends" k+1 stream items,
  * which is where the error bound comes from). Returns
  * `array<struct<key bigint, cnt bigint>>` sorted by (cnt desc,
  * key asc).
  *
  * MG is chosen over plain SpaceSaving for ONE load-bearing reason:
  * its merge has a PROVEN arbitrary-merge-tree guarantee (Agarwal,
  * Cormode, Huang, Phillips, Wei, Yi 2012, "Mergeable summaries":
  * sum counters, subtract the (k+1)-th largest combined value from
  * all, drop non-positives), under which, for any partitioning and
  * any merge order,
  *   true(x) − n/(k+1)  ≤  cnt(x)  ≤  true(x)
  * and therefore every key with true count > n/(k+1) is RETAINED.
  * Plain SpaceSaving's retention under hierarchical merges has no such
  * clean bound — and this engine's oracle gate demands flags that are
  * theorems under ANY task layout (the driver's core count differs
  * from the builder's), not artifacts of one shuffle tree.
  *
  * The counter VALUES still depend on arrival order; only the bounds
  * above are order-free. Audit queries therefore report exact counts
  * plus bound-validity flags (`text_heavyhitters_audit`), never raw
  * counters.
  *
  * Scale shape: partial aggregation applies — each task summarizes its
  * slice in O(k) state, k structs per group cross the shuffle, and a
  * 100 TB stream never sorts or re-shuffles raw keys. Contrast
  * [[graft.ops.Sketches]]' CMS, which answers point queries over a
  * FIXED candidate list: this aggregate DISCOVERS the candidates;
  * production pipelines run exactly that pair.
  */
case class SpaceSavingAgg(
    child: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[SpaceSavingAgg.Summary] {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()

  override def children: Seq[Expression] = Seq(child, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("key", LongType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_heavyhitters"

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
    else if (kExpr.eval().asInstanceOf[Number].intValue() >
      SpaceSavingAgg.maxK)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires k <= ${SpaceSavingAgg.maxK}")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def createAggregationBuffer(): SpaceSavingAgg.Summary =
    new SpaceSavingAgg.Summary(k)

  override def update(s: SpaceSavingAgg.Summary,
                      input: InternalRow): SpaceSavingAgg.Summary = {
    val v = child.eval(input)
    if (v != null) s.offer(v.asInstanceOf[Long])
    s
  }

  override def merge(a: SpaceSavingAgg.Summary,
                     b: SpaceSavingAgg.Summary): SpaceSavingAgg.Summary =
    a.mergeWith(b)

  override def eval(s: SpaceSavingAgg.Summary): Any =
    new GenericArrayData(s.entriesSorted.toSeq.map(e =>
      InternalRow(e._1, e._2)))

  override def serialize(s: SpaceSavingAgg.Summary): Array[Byte] = {
    val es = s.entriesSorted
    val buf = ByteBuffer.allocate(4 + 16 * es.length)
    buf.putInt(es.length)
    es.foreach { e => buf.putLong(e._1); buf.putLong(e._2) }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): SpaceSavingAgg.Summary = {
    val buf = ByteBuffer.wrap(bytes)
    val n = buf.getInt
    val s = new SpaceSavingAgg.Summary(k)
    var i = 0
    while (i < n) {
      s.put(buf.getLong, buf.getLong)
      i += 1
    }
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SpaceSavingAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SpaceSavingAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), kExpr = newChildren(1))
}

object SpaceSavingAgg {
  /** 4096 structs = 64 KB per group buffer — generous for discovery,
    * bounded against typo-sized k. */
  val maxK: Int = 4096

  /** Counter table: key → cnt. The decrement-all step is O(k) but
    * amortized O(1) per stream item (each decrement retires k+1
    * increments); merge-reduce is O(k log k) on ≤ 2k entries. */
  final class Summary(k: Int) {
    private val map = new java.util.HashMap[java.lang.Long, Array[Long]]()

    def size: Int = map.size

    def offer(key: Long): Unit = {
      val boxed = java.lang.Long.valueOf(key)
      val cur = map.get(boxed)
      if (cur != null) cur(0) += 1
      else if (map.size < k) map.put(boxed, Array(1L))
      else {
        // decrement all; remove exhausted counters
        val it = map.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          e.getValue()(0) -= 1
          if (e.getValue()(0) == 0) it.remove()
        }
      }
    }

    /** Raw insert for deserialize (no decrement logic). */
    def put(key: Long, cnt: Long): Unit =
      map.put(java.lang.Long.valueOf(key), Array(cnt))

    /** Mergeable-summaries reduction: sum counters, subtract the
      * (k+1)-th largest combined value from every counter, drop
      * non-positives — provably preserves the n/(k+1) error bound
      * under any merge tree. */
    def mergeWith(other: Summary): Summary = {
      val it = other.map.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val cur = map.get(e.getKey)
        if (cur != null) cur(0) += e.getValue()(0)
        else map.put(e.getKey, Array(e.getValue()(0)))
      }
      if (map.size > k) {
        val counts = new Array[Long](map.size)
        var i = 0
        val it2 = map.values().iterator()
        while (it2.hasNext) { counts(i) = it2.next()(0); i += 1 }
        java.util.Arrays.sort(counts)
        val sub = counts(counts.length - (k + 1)) // (k+1)-th largest
        val it3 = map.entrySet().iterator()
        while (it3.hasNext) {
          val e = it3.next()
          e.getValue()(0) -= sub
          if (e.getValue()(0) <= 0) it3.remove()
        }
      }
      this
    }

    /** (key, cnt) sorted by cnt desc then key asc. */
    def entriesSorted: Array[(Long, Long)] = {
      val out = new Array[(Long, Long)](map.size)
      val it = map.entrySet().iterator()
      var i = 0
      while (it.hasNext) {
        val e = it.next()
        out(i) = (e.getKey.longValue, e.getValue()(0))
        i += 1
      }
      scala.util.Sorting.stableSort(out,
        (a: (Long, Long), b: (Long, Long)) =>
          a._2 > b._2 || (a._2 == b._2 && a._1 < b._1))
      out
    }
  }
}
