package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{AggregateFunction, BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

/** SQL-addressable V2 functions served by [[GraftCatalog]]'s
  * FunctionCatalog surface — the read-side catalog story's missing
  * tier: after `spark.sql.catalog.glc=GraftCatalog`, plain SQL can
  * call `glc.fns.hardsig(x)` and `glc.fns.ssq(x)` with no session
  * registration, exactly how a shared deployment distributes UDFs
  * (the function DEFINITION travels with the catalog, not with each
  * notebook).
  *
  * Two deliberate mechanism demos:
  *   - [[HardSigmoid]] is a ScalarFunction with the MAGIC METHOD
  *     (`invoke(Long): Long`): Spark resolves it reflectively and
  *     plans a direct Invoke over the primitive — no InternalRow
  *     boxing in the hot path (the codegen-friendly form);
  *     `produceResult` stays as the specified fallback.
  *   - [[SumOfSquares]] is a V2 AggregateFunction (update/merge/
  *     produceResult over a Serializable state) — the catalog-served
  *     counterpart of the session-registered TypedImperativeAggregate
  *     tier ([[graft.functions.SpaceSavingAgg]]); its merge is
  *     associative-commutative, so any partial-aggregation layout
  *     yields the same BIGINT.
  */
object GraftFunctions {

  /** clamp(5e5 + x DIV 1024, 0, 1e6) — the trainer's hard sigmoid as
    * a catalog function (exact integer, so DuckDB oracles replay it
    * as plain arithmetic text). */
  object HardSigmoid extends UnboundFunction {
    override def name: String = "hardsig"
    override def description: String =
      "hardsig(x BIGINT): BIGINT — clamp(500000 + x DIV 1024, 0, 1000000)"
    override def bind(inputType: StructType): BoundFunction = {
      if (inputType.fields.length != 1 ||
          inputType.fields(0).dataType != LongType)
        throw new UnsupportedOperationException(
          s"hardsig expects one BIGINT argument, got $inputType")
      new HardSigBound
    }
  }

  /** Named public class, NOT an anonymous one: the magic method is
    * resolved via `Class.getMethod("invoke", long)` on the executor,
    * and a Scala anonymous subclass failed that lookup at runtime
    * ("Couldn't find method invoke with arguments (long)") — the
    * named class's plain public method resolves on both sides. */
  final class HardSigBound extends ScalarFunction[java.lang.Long] {
    override def inputTypes(): Array[DataType] = Array(LongType)
    override def resultType(): DataType = LongType
    override def name(): String = "hardsig"
    override def canonicalName(): String = "graft.fns.hardsig"
    override def isDeterministic: Boolean = true
    // magic method: resolved reflectively, invoked on primitives
    def invoke(x: Long): Long =
      math.min(1000000L, math.max(0L, 500000L + x / 1024L))
    override def produceResult(input: InternalRow): java.lang.Long =
      invoke(input.getLong(0))
  }

  /** Exact BIGINT sum of squares, null-skipping. */
  object SumOfSquares extends UnboundFunction {
    override def name: String = "ssq"
    override def description: String =
      "ssq(x BIGINT): BIGINT — exact sum of x*x over the group"
    override def bind(inputType: StructType): BoundFunction = {
      if (inputType.fields.length != 1 ||
          inputType.fields(0).dataType != LongType)
        throw new UnsupportedOperationException(
          s"ssq expects one BIGINT argument, got $inputType")
      new AggregateFunction[java.lang.Long, java.lang.Long] {
        override def inputTypes(): Array[DataType] = Array(LongType)
        override def resultType(): DataType = LongType
        override def name(): String = "ssq"
        override def canonicalName(): String = "graft.fns.ssq"
        override def isDeterministic: Boolean = true
        override def newAggregationState(): java.lang.Long = 0L
        override def update(state: java.lang.Long,
            input: InternalRow): java.lang.Long =
          if (input.isNullAt(0)) state
          else state + { val x = input.getLong(0); x * x }
        override def merge(a: java.lang.Long,
            b: java.lang.Long): java.lang.Long = a + b
        override def produceResult(state: java.lang.Long): java.lang.Long =
          state
      }
    }
  }

  /** The `fns` namespace's registry. */
  val all: Map[String, UnboundFunction] =
    Map("hardsig" -> HardSigmoid, "ssq" -> SumOfSquares)
}
