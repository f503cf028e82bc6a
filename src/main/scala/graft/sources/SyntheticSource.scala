package graft.sources

import java.util.OptionalLong

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expressions, Literal, NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
import org.apache.spark.sql.vectorized.ColumnarBatch
import org.apache.spark.unsafe.types.UTF8String

/** A complete DataSourceV2 connector: the engine's fourth Catalyst
  * extension tier (native expression → native aggregate → optimizer
  * rule / custom operator → CONNECTOR), exercising the read-side
  * contracts a 100 TB table format lives or dies by:
  *
  *   - `TableProvider` / `SupportsRead` / `Batch` — the full v2 read
  *     path, no V1 fallback;
  *   - `SupportsPushDownRequiredColumns` — column pruning reaches the
  *     reader: unrequested columns are never even computed (the
  *     generator closure per field is selected at plan time);
  *   - `SupportsPushDownFilters` — `id` range predicates clamp the
  *     generated interval at PLANNING time, so filter pushdown becomes
  *     real partition pruning: `planInputPartitions` emits only slices
  *     intersecting the clamped range (an `id >= hi` contradiction
  *     plans ZERO partitions). The accepted range shapes are captured
  *     exactly by the clamp and declared fully handled; anything else
  *     is a residual Spark evaluates above the scan;
  *   - `SupportsReportStatistics` — post-pushdown row/byte estimates,
  *     so the optimizer can broadcast a well-filtered scan;
  *   - `SupportsRuntimeV2Filtering` — dynamic partition pruning
  *     narrows the planned range to the join build side's observed
  *     keys at runtime;
  *   - `SupportsPushDownAggregates` — COUNT/MIN(id)/MAX(id) answered
  *     from range arithmetic, never enumerating a row;
  *   - `SupportsPushDownLimit` / `SupportsPushDownTopN` — LIMIT and
  *     ORDER BY id LIMIT become exact range clamps;
  *   - columnar reads (`ColumnarBatch`, 4096-row vectors) by default,
  *     with the row reader selectable for the equivalence spec;
  *   - `MicroBatchStream` + `SupportsAdmissionControl` +
  *     `SupportsTriggerAvailableNow` — the same ledger as a bounded,
  *     exactly-replayable rate-limited stream.
  *
  * The table itself is a deterministic synthetic ledger (seeded LCG
  * over the row id) — every column is exact 64-bit integer arithmetic
  * that DuckDB reproduces bit-for-bit from `range(lo, hi)`, which is
  * what lets a connector, of all things, be oracle-gated:
  *
  *   id       BIGINT   row id in [0, rows)
  *   value    BIGINT   (id * 1103515245 + 12345) % 2^31   (LCG step)
  *   cents    BIGINT   value % 9973                        (prime mod)
  *   category STRING   'c' || (value % 23)
  *
  * (At `rows` ≤ ~8·10^9 the multiply stays within Long — the fixture
  * uses 10^6. An industrial source would widen to 128-bit or split
  * the id; the overflow bound is documented rather than silently
  * wrapped.)
  *
  * Reference tie-in: the reference's ingestion tier is fixed-format
  * S3 CSV (`glue_jobs/01_ingest_sales.py:14-23` spark.read.csv with
  * explicit schema); this connector is the same contract — "a table
  * the engine can scan" — expressed against the v2 API that lets the
  * engine prune and prune EARLY instead of reading whole objects.
  *
  * Options: `rows` (table size, default 1e6), `slices` (max planned
  * partitions, default 32).
  */
class SyntheticSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SyntheticSource.schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val rows = Option(properties.get("rows")).map(_.toLong).getOrElse(1000000L)
    val slices = Option(properties.get("slices")).map(_.toInt).getOrElse(32)
    // vectorized by default, like the built-in parquet reader; the
    // row path stays selectable for the equivalence spec
    val columnar = Option(properties.get("columnar")).forall(_.toBoolean)
    new SyntheticTable(rows, slices, columnar)
  }

  override def supportsExternalMetadata(): Boolean = false
}

object SyntheticSource {

  import org.apache.spark.sql.{DataFrame, SparkSession}

  /** The connector's oracle-gated proof query: scan through the full
    * v2 path with an id-range predicate (clamps the planned range —
    * SyntheticSourceSpec pins the pruning) and aggregate per category.
    * Every measure is exact integer arithmetic, so the hash gate holds
    * bit-for-bit against DuckDB regenerating the same LCG from
    * `range()`. The `sfDir` is unused — the table is the source itself. */
  def syntheticAgg(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.read.format(classOf[SyntheticSource].getName)
      .option("rows", "1000000").option("slices", "64").load()
      .where(col("id") >= 250000L && col("id") < 750000L)
      .groupBy(col("category"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value")).as("sum_value"),
        sum(col("cents")).as("sum_cents"),
        min(col("id")).as("min_id"),
        max(col("id")).as("max_id"))
      .orderBy("category")
  }

  /** Runtime-pruning proof query: the ledger joined to a SELECTIVE
    * dimension (5 of 25 nations), keys spread across the full id
    * range. Dynamic partition pruning hands the scan the build side's
    * observed keys at runtime ([[SyntheticScan.filter]]); the spec
    * pins that the scan then plans a narrowed partition set, while
    * THIS gate pins that the answer is the answer either way. At
    * 100 TB this contract is the difference between scanning the
    * whole fact table and scanning the slice the dimension names. */
  def runtimePrunedJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val dim = graft.io.Tables.nation(spark, sfDir)
      .filter(col("n_regionkey") === 2)
      .selectExpr("CAST(n_nationkey AS BIGINT) * 37337 + 11 AS id", "n_name")
    val fact = spark.read.format(classOf[SyntheticSource].getName)
      .option("rows", "1000000").option("slices", "64").load()
    fact.join(dim, "id")
      .selectExpr("n_name", "id", "value", "cents")
      .orderBy("n_name")
  }

  /** DuckDB derives the joined rows arithmetically: every spread key
    * lands inside [0, 1e6), so the expected relation is the dimension
    * with the LCG columns recomputed from the key. */
  val runtimePrunedJoinOracle: String =
    """WITH dim AS (
         SELECT n_name, CAST(n_nationkey AS BIGINT) * 37337 + 11 AS id
         FROM nation WHERE n_regionkey = 2)
       SELECT n_name, id,
         (id * 1103515245 + 12345) % 2147483648 AS value,
         ((id * 1103515245 + 12345) % 2147483648) % 9973 AS cents
       FROM dim ORDER BY n_name"""

  /** Aggregate-pushdown proof query: COUNT/MIN(id)/MAX(id) under an
    * id-range filter are answered from the clamp arithmetic without
    * enumerating a single row (SyntheticSourceSpec pins the
    * PushedAggregates plan); the gate pins the VALUES against DuckDB
    * actually aggregating the regenerated range. */
  def aggPushdownAudit(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.read.format(classOf[SyntheticSource].getName)
      .option("rows", "1000000").option("slices", "64").load()
      .where(col("id") >= 123456L && col("id") <= 876543L)
      .agg(count(lit(1)).as("n"),
        min(col("id")).as("min_id"),
        max(col("id")).as("max_id"))
  }

  val aggPushdownAuditOracle: String =
    """SELECT count(*) AS n, min(id) AS min_id, max(id) AS max_id
       FROM range(0, 1000000) t(id)
       WHERE id >= 123456 AND id <= 876543"""

  /** DuckDB regenerates the ledger from `range()` with the same LCG. */
  val syntheticAggOracle: String =
    """SELECT 'c' || CAST(v % 23 AS VARCHAR) AS category,
         count(*) AS n,
         CAST(sum(v) AS BIGINT) AS sum_value,
         CAST(sum(v % 9973) AS BIGINT) AS sum_cents,
         min(id) AS min_id,
         max(id) AS max_id
       FROM (SELECT id, (id * 1103515245 + 12345) % 2147483648 AS v
             FROM range(250000, 750000) t(id))
       GROUP BY 1 ORDER BY 1"""

  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("value", LongType, nullable = false),
    StructField("cents", LongType, nullable = false),
    StructField("category", StringType, nullable = false)))

  /** The LCG step — the single definition both the reader and the
    * spec's in-JVM oracle share. */
  def lcg(id: Long): Long = (id * 1103515245L + 12345L) % 2147483648L

  /** Per-field generator, as exact integer arithmetic. */
  def fieldValue(name: String, id: Long): Any = name match {
    case "id" => id
    case "value" => lcg(id)
    case "cents" => lcg(id) % 9973L
    case "category" => UTF8String.fromString("c" + (lcg(id) % 23L))
    case other => throw new IllegalArgumentException(s"no column $other")
  }
}

private[sources] class SyntheticTable(rows: Long, slices: Int,
    columnar: Boolean = true)
    extends Table with SupportsRead {
  override def name(): String = s"synthetic($rows)"
  override def schema(): StructType = SyntheticSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(
      TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val maxPerBatch =
      Option(options.get("maxRowsPerBatch")).map(_.toLong).getOrElse(0L)
    new SyntheticScanBuilder(rows, slices, columnar, maxPerBatch)
  }
}

private[sources] class SyntheticScanBuilder(rows: Long, slices: Int,
    columnar: Boolean = true, maxPerBatch: Long = 0L)
    extends ScanBuilder
    with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates
    with SupportsPushDownLimit
    with SupportsPushDownTopN {

  import org.apache.spark.sql.connector.expressions.aggregate._
  import org.apache.spark.sql.connector.expressions.{SortDirection, SortOrder}

  private var lo: Long = 0L
  private var hi: Long = rows // exclusive
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = SyntheticSource.schema
  private var aggs: Option[Array[AggregateFunc]] = None

  /** LIMIT n: the generator enumerates ids in order within each slice,
    * so the first n rows of the table are exactly [lo, lo+n) — the
    * limit becomes a range clamp, FULLY pushed (Spark keeps its own
    * limit above anyway, which is why isPartiallyPushed=false is safe
    * either way; we report full). Only sound because no residual
    * filter can precede it: Spark only offers limit pushdown when the
    * scan has no residual filters, and our accepted shapes clamp
    * exactly. */
  override def pushLimit(limit: Int): Boolean = aggs.isEmpty && {
    hi = math.min(hi, lo + limit)
    true
  }

  /** ORDER BY id [ASC|DESC] LIMIT n: ascending top-n is [lo, lo+n),
    * descending is [hi−n, hi) — both exact range clamps because id is
    * the generation order. Any other sort key is refused (the
    * generator's order proves nothing about value/category order).
    * Partially pushed: Spark still sorts the ≤ n surviving rows, so
    * the contract only requires the scan to RETAIN the top-n set, not
    * emit it sorted. */
  override def pushTopN(orders: Array[SortOrder], limit: Int): Boolean = {
    val byId = orders.length == 1 && (orders.head.expression() match {
      case r: NamedReference => r.fieldNames().sameElements(Array("id"))
      case _ => false
    })
    if (!byId || aggs.nonEmpty) return false
    if (orders.head.direction() == SortDirection.ASCENDING)
      hi = math.min(hi, lo + limit)
    else
      lo = math.max(lo, hi - limit)
    true
  }

  override def isPartiallyPushed(): Boolean = true

  /** COUNT(*)/MIN(id)/MAX(id) are answerable from the clamped range
    * arithmetic alone — the connector analogue of answering from
    * parquet footer statistics. Complete pushdown: Spark plans NO
    * aggregate above the scan, so acceptance is all-or-nothing (one
    * unanswerable aggregate refuses the whole set — the same sharp
    * edge the parquet footer contract documents) and only sound when
    * every pushed filter was fully translated to the range clamp
    * (an untranslated residual would need per-row evaluation the
    * aggregate path never does). */
  override def supportCompletePushDown(aggregation: Aggregation): Boolean =
    aggregation.groupByExpressions().isEmpty &&
      allFiltersClamped &&
      aggregation.aggregateExpressions().forall {
        case _: CountStar => true
        case m: Min => isIdRef(m.column())
        case m: Max => isIdRef(m.column())
        case _ => false
      }

  override def pushAggregation(aggregation: Aggregation): Boolean =
    supportCompletePushDown(aggregation) && {
      aggs = Some(aggregation.aggregateExpressions())
      true
    }

  private def isIdRef(e: org.apache.spark.sql.connector.expressions.Expression): Boolean =
    e match {
      case r: NamedReference => r.fieldNames().sameElements(Array("id"))
      case _ => false
    }

  private var allFiltersClamped = true

  /** Clamp [lo, hi) by id-range predicates. The five accepted shapes
    * are captured EXACTLY by the range (the reader generates precisely
    * the ids in [lo, hi)), so they are declared fully handled — which
    * is also what lets complete aggregate pushdown engage: Spark only
    * pushes aggregates beneath a scan with no residual Filter.
    * Anything unrecognized is returned as a residual for Spark to
    * evaluate. The losslessness spec pins both halves. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val accepted = ArrayBuffer.empty[Filter]
    filters.foreach {
      case f @ GreaterThan("id", v: Long) =>
        lo = math.max(lo, v + 1); accepted += f
      case f @ GreaterThanOrEqual("id", v: Long) =>
        lo = math.max(lo, v); accepted += f
      case f @ LessThan("id", v: Long) =>
        hi = math.min(hi, v); accepted += f
      case f @ LessThanOrEqual("id", v: Long) =>
        hi = math.min(hi, v + 1); accepted += f
      case f @ EqualTo("id", v: Long) =>
        lo = math.max(lo, v); hi = math.min(hi, v + 1); accepted += f
      case _ =>
        // not understood: left entirely to Spark — which also bars
        // complete aggregate pushdown (the aggregate path never
        // evaluates residuals per-row)
        allFiltersClamped = false
    }
    pushed = accepted.toArray
    filters.filterNot(accepted.contains) // residual = unrecognized only
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    // Spark hands back a projection of our schema; empty means a
    // count-style scan — keep zero fields and emit empty rows.
    required = requiredSchema

  override def build(): Scan = aggs match {
    case Some(fs) =>
      new SyntheticAggScan(math.max(lo, 0L), math.max(hi, lo), fs, pushed)
    case None =>
      new SyntheticScan(math.max(lo, 0L), math.max(hi, lo), slices, required,
        pushed, columnar, maxPerBatch)
  }
}

private[sources] class SyntheticScan(
    lo: Long, hi: Long, slices: Int, required: StructType, pushed: Array[Filter],
    columnar: Boolean = true, maxPerBatch: Long = 0L)
    extends Scan with Batch with SupportsReportStatistics
    with SupportsRuntimeV2Filtering {

  // Runtime-narrowed bounds: dynamic partition pruning delivers the
  // build side's observed join keys AFTER that side has executed;
  // [[filter]] shrinks these, and BatchScanExec re-plans partitions
  // from the narrowed range (filteredPartitions calls
  // planInputPartitions again). Like the static pushdown, the clamp
  // is advisory — the join above still evaluates the real condition —
  // so an envelope over a sparse IN-set is sound.
  @volatile private var rlo: Long = lo
  @volatile private var rhi: Long = hi

  override def readSchema(): StructType = required

  override def description(): String =
    s"graft-synthetic [$lo, $hi) slices=$slices " +
      s"PushedFilters: [${pushed.mkString(", ")}], " +
      s"ReadSchema: ${required.fieldNames.mkString(",")}"

  override def toBatch: Batch = this

  /** Streaming view of the same (statically clamped) range — filter
    * and column pushdown compose with the stream exactly as with the
    * batch path, since both funnel through this scan. */
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new SyntheticMicroBatchStream(rlo, rhi, slices, required.fieldNames, maxPerBatch)

  /** DPP eligibility: this scan can consume runtime predicates on
    * `id` — the same column the static pushdown prunes on. */
  override def filterAttributes(): Array[NamedReference] =
    Array(Expressions.column("id"))

  /** Narrow [lo, hi) to the envelope of the runtime IN-set (DPP hands
    * the build side's distinct keys as one IN predicate). Anything
    * unrecognized is ignored — pruning may only ever shrink, and only
    * when it provably covers the delivered key set. */
  override def filter(predicates: Array[Predicate]): Unit =
    predicates.foreach { p =>
      if (p.name() == "IN" && p.children().nonEmpty) {
        val onId = p.children().head match {
          case r: NamedReference => r.fieldNames().sameElements(Array("id"))
          case _ => false
        }
        val vals: Array[Long] = p.children().tail.collect {
          case l: Literal[_] if l.value().isInstanceOf[Long] =>
            l.value().asInstanceOf[Long]
        }
        if (onId && vals.length == p.children().length - 1 && vals.nonEmpty) {
          rlo = math.max(rlo, vals.min)
          rhi = math.min(rhi, vals.max + 1)
        }
      }
    }

  /** Partition planning AFTER the clamp — this is where pushdown
    * becomes pruning. Slice count scales down with the surviving
    * range so a point lookup plans one partition, a contradiction
    * plans none. */
  override def planInputPartitions(): Array[InputPartition] = {
    val span = math.max(0L, rhi - rlo)
    if (span == 0L) return Array.empty
    val n = math.max(1, math.min(slices.toLong, span).toInt)
    Array.tabulate[InputPartition](n) { k =>
      SyntheticPartition(
        rlo + span * k / n,
        rlo + span * (k + 1) / n)
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SyntheticReaderFactory(required.fieldNames, columnar)

  override def estimateStatistics(): Statistics = new Statistics {
    private val n = math.max(0L, hi - lo)
    // 8 bytes per long + ~4 per category char; close enough for
    // broadcast decisions, which only need order of magnitude
    private val width = required.fields.map {
      case f if f.dataType == StringType => 4L
      case _ => 8L
    }.sum
    override def sizeInBytes(): OptionalLong = OptionalLong.of(n * math.max(width, 1L))
    override def numRows(): OptionalLong = OptionalLong.of(n)
  }
}

/** The connector's STREAMING tier: the same ledger served as a
  * bounded, exactly-replayable micro-batch stream — the contract a
  * Kafka-like source implements. The offset is the id high-watermark
  * (restart-safe: it serializes as the plain number), admission
  * control honors `maxRowsPerBatch` so one trigger never swallows the
  * backlog, and batch [s, e) planning reuses the batch slicing, so a
  * lost task replays its exact id range — idempotent by construction,
  * which is what makes end-to-end exactly-once with a transactional
  * sink possible. */
private[sources] class SyntheticMicroBatchStream(
    lo: Long, hi: Long, slices: Int, fields: Array[String], maxPerBatch: Long)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit, ReadMaxRows}

  /** Trigger.AvailableNow drains to the offset frozen here THROUGH the
    * admission-controlled batch loop — without this interface Spark
    * wraps the source and swallows the whole backlog in one batch,
    * which is exactly the OOM a rate limit exists to prevent. The
    * ledger's end is already fixed, so preparing is a no-op. */
  override def prepareForTriggerAvailableNow(): Unit = ()

  override def initialOffset(): Offset = SyntheticOffset(lo)

  override def getDefaultReadLimit: ReadLimit =
    if (maxPerBatch > 0L) ReadLimit.maxRows(maxPerBatch) else ReadLimit.allAvailable()

  override def latestOffset(): Offset = SyntheticOffset(hi)

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[SyntheticOffset].id
    limit match {
      case m: ReadMaxRows => SyntheticOffset(math.min(hi, s + m.maxRows()))
      case _ => SyntheticOffset(hi)
    }
  }

  override def reportLatestOffset(): Offset = SyntheticOffset(hi)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[SyntheticOffset].id
    val e = end.asInstanceOf[SyntheticOffset].id
    val span = math.max(0L, e - s)
    if (span == 0L) return Array.empty
    val n = math.max(1, math.min(slices.toLong, span).toInt)
    Array.tabulate[InputPartition](n) { k =>
      SyntheticPartition(s + span * k / n, s + span * (k + 1) / n)
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SyntheticReaderFactory(fields, columnar = false)

  override def deserializeOffset(json: String): Offset =
    SyntheticOffset(json.trim.toLong)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private[sources] case class SyntheticOffset(id: Long)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = id.toString
}

/** Complete-pushdown aggregate scan: COUNT(*)/MIN(id)/MAX(id) over the
  * clamped range are closed-form (span, lo, hi−1), so the "scan" is
  * one partition emitting one row and the fact table is never
  * enumerated — the connector analogue of answering MIN/MAX/COUNT
  * from parquet row-group footers. An empty range gives count 0 and
  * NULL extrema, matching SQL aggregate semantics on zero rows. */
private[sources] class SyntheticAggScan(
    lo: Long, hi: Long,
    aggs: Array[org.apache.spark.sql.connector.expressions.aggregate.AggregateFunc],
    pushed: Array[Filter])
    extends Scan with Batch {

  import org.apache.spark.sql.connector.expressions.aggregate.{CountStar, Max, Min}

  private val span = math.max(0L, hi - lo)

  override def readSchema(): StructType = StructType(aggs.zipWithIndex.map {
    case (_: CountStar, i) => StructField(s"agg_$i", LongType, nullable = false)
    case (_, i) => StructField(s"agg_$i", LongType, nullable = true)
  })

  override def description(): String =
    s"graft-synthetic-agg [$lo, $hi) " +
      s"PushedAggregates: [${aggs.mkString(", ")}], " +
      s"PushedFilters: [${pushed.mkString(", ")}]"

  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] =
    Array(SyntheticPartition(0L, 1L))

  override def createReaderFactory(): PartitionReaderFactory = {
    val values: Array[Any] = aggs.map {
      case _: CountStar => span
      case _: Min => if (span == 0L) null else lo
      case _: Max => if (span == 0L) null else hi - 1
      case other => throw new IllegalStateException(s"unpushable $other")
    }
    new PartitionReaderFactory {
      override def createReader(
          partition: InputPartition): PartitionReader[InternalRow] =
        new PartitionReader[InternalRow] {
          private var emitted = false
          override def next(): Boolean = { val r = !emitted; emitted = true; r }
          override def get(): InternalRow = new GenericInternalRow(values)
          override def close(): Unit = ()
        }
    }
  }
}

private[sources] case class SyntheticPartition(start: Long, end: Long)
    extends InputPartition

private[sources] class SyntheticReaderFactory(fields: Array[String], columnar: Boolean)
    extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[SyntheticPartition]
    new PartitionReader[InternalRow] {
      private var cur = p.start - 1
      override def next(): Boolean = { cur += 1; cur < p.end }
      override def get(): InternalRow =
        new GenericInternalRow(
          fields.map(f => SyntheticSource.fieldValue(f, cur)).toArray[Any])
      override def close(): Unit = ()
    }
  }

  /** Vectorized path — the same contract parquet's vectorized reader
    * serves: fill reusable on-heap column vectors in 4096-row batches
    * and hand Spark whole [[ColumnarBatch]]es, so the scan feeds
    * whole-stage codegen through one ColumnarToRow boundary instead
    * of allocating a row object per record. Long columns bulk-fill;
    * category goes through putByteArray (ASCII by construction). */
  override def supportColumnarReads(partition: InputPartition): Boolean = columnar

  override def createColumnarReader(
      partition: InputPartition): PartitionReader[ColumnarBatch] = {
    val p = partition.asInstanceOf[SyntheticPartition]
    val schema = StructType(fields.map(f =>
      SyntheticSource.schema(SyntheticSource.schema.fieldIndex(f))))
    new PartitionReader[ColumnarBatch] {
      private val vectors = OnHeapColumnVector.allocateColumns(
        SyntheticReaderFactory.batchSize, schema)
      private val batch =
        new ColumnarBatch(vectors.toArray[org.apache.spark.sql.vectorized.ColumnVector])
      private var cur = p.start
      override def next(): Boolean = {
        if (cur >= p.end) return false
        val n = math.min(SyntheticReaderFactory.batchSize.toLong, p.end - cur).toInt
        vectors.foreach(_.reset())
        var i = 0
        while (i < n) {
          val id = cur + i
          fields.indices.foreach { c =>
            fields(c) match {
              case "id" => vectors(c).putLong(i, id)
              case "value" => vectors(c).putLong(i, SyntheticSource.lcg(id))
              case "cents" => vectors(c).putLong(i, SyntheticSource.lcg(id) % 9973L)
              case "category" =>
                val b = ("c" + (SyntheticSource.lcg(id) % 23L)).getBytes("UTF-8")
                vectors(c).putByteArray(i, b, 0, b.length)
            }
          }
          i += 1
        }
        cur += n
        batch.setNumRows(n)
        true
      }
      override def get(): ColumnarBatch = batch
      override def close(): Unit = batch.close()
    }
  }
}

private[sources] object SyntheticReaderFactory {
  val batchSize = 4096
}
