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

  // ---- partition-transform functions (EMPTY namespace) ----
  //
  // Spark's storage-partitioned-join machinery resolves a
  // scan-reported bucket/days Transform by calling
  // loadFunction(Identifier(Array(), "bucket"|"days")) on the TABLE's
  // function catalog (V2ExpressionUtils.loadV2FunctionOpt) and
  // compares both scans' BoundFunctions by canonicalName — these two
  // definitions are what makes bucket/days-partitioned ledger scans
  // SPJ-compatible. Their semantics MUST equal the write-side
  // transforms (LedgerSink.bucketValue / dayValue): Spark may evaluate
  // them when pushing partition values across a partially-matching
  // join.

  object BucketTransformFn extends UnboundFunction {
    override def name: String = "bucket"
    override def description: String =
      "bucket(n INT, key BIGINT|INT): INT — floorMod(key, n)"
    override def bind(inputType: StructType): BoundFunction = {
      if (inputType.fields.length != 2 ||
          inputType.fields(0).dataType != IntegerType ||
          !Seq(LongType, IntegerType).contains(inputType.fields(1).dataType))
        throw new UnsupportedOperationException(
          s"bucket expects (INT, BIGINT|INT), got $inputType")
      new BucketBound(inputType.fields(1).dataType == LongType)
    }
  }

  final class BucketBound(keyIsLong: Boolean)
      extends ScalarFunction[java.lang.Integer] {
    override def inputTypes(): Array[DataType] =
      Array(IntegerType, if (keyIsLong) LongType else IntegerType)
    override def resultType(): DataType = IntegerType
    override def name(): String = "bucket"
    override def canonicalName(): String = "graft.bucket"
    override def isDeterministic: Boolean = true
    override def isResultNullable: Boolean = true
    override def produceResult(input: InternalRow): java.lang.Integer =
      if (input.isNullAt(1)) null
      else LedgerSink.bucketValue(
        if (keyIsLong) input.getLong(1) else input.getInt(1).toLong,
        input.getInt(0))
  }

  object DaysTransformFn extends UnboundFunction {
    override def name: String = "days"
    override def description: String =
      "days(ts BIGINT|INT): INT — floorDiv(epoch millis, 86400000)"
    override def bind(inputType: StructType): BoundFunction = {
      if (inputType.fields.length != 1 ||
          !Seq(LongType, IntegerType).contains(inputType.fields(0).dataType))
        throw new UnsupportedOperationException(
          s"days expects one BIGINT|INT epoch-millis argument, got $inputType")
      new DaysBound(inputType.fields(0).dataType == LongType)
    }
  }

  final class DaysBound(keyIsLong: Boolean)
      extends ScalarFunction[java.lang.Integer] {
    override def inputTypes(): Array[DataType] =
      Array(if (keyIsLong) LongType else IntegerType)
    override def resultType(): DataType = IntegerType
    override def name(): String = "days"
    override def canonicalName(): String = "graft.days"
    override def isDeterministic: Boolean = true
    override def isResultNullable: Boolean = true
    override def produceResult(input: InternalRow): java.lang.Integer =
      if (input.isNullAt(0)) null
      else LedgerSink.dayValue(
        if (keyIsLong) input.getLong(0) else input.getInt(0).toLong)
  }

  /** The empty-namespace registry (transform resolution). */
  val transforms: Map[String, UnboundFunction] =
    Map("bucket" -> BucketTransformFn, "days" -> DaysTransformFn)
}
