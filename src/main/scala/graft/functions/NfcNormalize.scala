package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen `Expression` — the
  * canonical-composition pass every text corpus needs before hashing or
  * dedup (a decomposed "é" and a composed "é" must fingerprint
  * identically), which Spark has no built-in for.
  *
  * Two tiers keep the hot path cheap:
  *   - `Normalizer.isNormalized` first: for already-NFC text (all ASCII,
  *     most web corpora) the input `UTF8String` is returned as-is — no
  *     second allocation, no re-encode;
  *   - only genuinely decomposed strings pay the `Normalizer.normalize`
  *     composition walk and UTF-8 re-encode.
  *
  * The expression stays inside whole-stage codegen (the generated code
  * calls the same two `java.text.Normalizer` statics), so a projection
  * using it fuses with the surrounding operators like any built-in.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) input
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      s"""
         |final String $s = $c.toString();
         |${ev.value} = java.text.Normalizer.isNormalized(
         |    $s, java.text.Normalizer.Form.NFC)
         |  ? $c
         |  : org.apache.spark.unsafe.types.UTF8String.fromString(
         |      java.text.Normalizer.normalize($s, java.text.Normalizer.Form.NFC));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
