package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunk boundaries — the rolling-hash cut-point
  * detector of CDC deduplication (LBFS/rsync lineage): a boundary falls
  * after code-point position i (1-based, i ≥ [[CdcBoundaries.Window]])
  * whenever the polynomial hash of the last 8 code points,
  * h(i) = Σ_{j=0..7} cp_{i−7+j} · 31^{7−j}, satisfies h ≡ 0 (mod 64).
  * Because the cut decision depends only on local CONTENT, an insertion
  * or deletion shifts at most the chunks around the edit — byte-offset
  * chunking would shift every subsequent chunk, defeating dedup.
  *
  * This is the custom-Expression tier for a reason: the SQL
  * formulation re-hashes an 8-char window per position (8·n substr
  * calls, each O(position) on UTF8String — quadratic per document),
  * while this loop maintains the hash incrementally over one code-point
  * scan: O(n), constant code size, inside whole-stage codegen. The
  * DuckDB oracle runs the unrolled-SQL form; both compute the identical
  * integer hash, so the cut points agree exactly.
  */
case class CdcBoundariesExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${t.catalogString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_cdc_boundaries"

  override def nullSafeEval(s: Any): Any =
    CdcBoundaries.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CdcBoundaries.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CdcBoundaries {
  val Window = 8
  val Modulus = 64
  private val Pow7 = 27512614111L // 31^7

  /** One-pass rolling boundary scan; positions are 1-based code-point
    * indices of each window END (code points, not UTF-16 units, so the
    * positions line up with SQL substr/length character semantics). */
  def compute(s: UTF8String): ArrayData = {
    val str = s.toString
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    val win = new Array[Long](Window)
    var h = 0L
    var charIdx = 0
    var cpIdx = 0
    while (charIdx < str.length) {
      val cp = str.codePointAt(charIdx)
      charIdx += Character.charCount(cp)
      cpIdx += 1
      val slot = (cpIdx - 1) % Window
      h = if (cpIdx <= Window) h * 31 + cp
          else (h - win(slot) * Pow7) * 31 + cp
      win(slot) = cp
      if (cpIdx >= Window && h % Modulus == 0) out += cpIdx
    }
    new GenericArrayData(out.toArray)
  }
}
