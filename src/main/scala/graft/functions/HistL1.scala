package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** L1 distance between two strings' code-point histograms — the
  * classic COUNTING FILTER lower bound for edit distance: one edit
  * operation (insert/delete/substitute) changes the symbol counts by
  * at most 2 in L1, so `ed(a,b) ≥ hist_l1(a,b) / 2` and
  * `hist_l1 > 2·d` refutes a candidate pair without running the
  * O(d·min|s|) banded verify. Code points are bucketed mod 257;
  * merging buckets only LOWERS the L1, so the bound (and the filter's
  * losslessness) survives any alphabet — ASCII maps injectively.
  * One pass per string, one fixed 257-int array, no allocation
  * proportional to input: ~|a|+|b| work versus the verify's
  * ~(2d+1)·min|s| cell updates, which is what makes it worth running
  * on every candidate. */
case class HistL1(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType == StringType)
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two string arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hist_l1"

  override def nullSafeEval(a: Any, b: Any): Any =
    HistL1.compute(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.HistL1.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object HistL1 {
  private val Buckets = 257 // prime > 256: ASCII stays injective

  def compute(a: UTF8String, b: UTF8String): Long = {
    val h = new Array[Int](Buckets)
    val sa = a.toString
    var i = 0
    while (i < sa.length) {
      val cp = sa.codePointAt(i)
      h(cp % Buckets) += 1
      i += Character.charCount(cp)
    }
    val sb = b.toString
    var j = 0
    while (j < sb.length) {
      val cp = sb.codePointAt(j)
      h(cp % Buckets) -= 1
      j += Character.charCount(cp)
    }
    var s = 0L
    var k = 0
    while (k < Buckets) { s += math.abs(h(k)); k += 1 }
    s
  }
}
