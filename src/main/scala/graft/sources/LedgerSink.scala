package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** The connector family's WRITE half: a transactional v2 sink with the
  * manifest commit protocol every exactly-once batch writer uses
  * (Hadoop FileOutputCommitter v2's problem, solved the Iceberg way):
  *
  *   1. every task attempt writes to its own staging file, named by
  *      (partition, task attempt) — attempts never collide;
  *   2. a task that finishes hands the driver a commit MESSAGE (its
  *      file name + row count); a task that dies just leaves garbage
  *      in staging;
  *   3. job commit writes a MANIFEST listing exactly the message
  *      files, via write-temp-then-atomic-rename — the rename IS the
  *      commit point; job abort deletes the staged files instead;
  *   4. readers enumerate the MANIFEST, never the directory — torn
  *      writes, duplicate attempts, and aborted jobs are invisible by
  *      construction, not by cleanup.
  *
  * Speculative/retried attempts are therefore harmless: both attempts
  * stage files, at most one message reaches commit, exactly one file
  * enters the manifest (the spec stages a fake duplicate attempt and
  * pins its invisibility).
  *
  * The on-disk format is deliberately the engine's own (one UTF-8
  * line per row, fields percent-escaped, doubles as
  * `Double.toHexString` for bit-exact round-trips, `\N` for null) —
  * the point is the COMMIT PROTOCOL, not a parquet rewrite; the
  * reference gets this protocol for free from S3 + Glue job
  * boundaries (02_transform_sales.py writes whole prefixes), and this
  * is the same guarantee expressed at the connector layer.
  *
  * Supported column types: long, int, double, string (the fixture
  * entities' surface). Append mode unions manifests; overwrite
  * truncates first. Single-writer discipline is documented, not
  * locked (same as a Hive static partition overwrite).
  */
class LedgerSink extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val dir = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("ledger sink requires a path option"))
    LedgerSink.readManifest(Paths.get(dir)) match {
      case Some((schema, _)) => schema
      case None => throw new IllegalArgumentException(
        s"no committed ledger manifest under $dir")
    }
  }

  // Writes hand us the dataframe's schema (external metadata).
  override def supportsExternalMetadata(): Boolean = true

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val dir = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException("ledger sink requires a path option"))
    new LedgerTable(Paths.get(dir), schema)
  }
}

/** Oracle gate for the sink: the customer dimension pushed through the
  * full write protocol (stage → message → manifest commit) and read
  * back through the manifest — compared against DuckDB scanning the
  * original parquet directly, which only passes if every codec branch
  * (long, int, DOUBLE-as-hex, string) is bit-exact. */
object LedgerRoundtrip {
  import org.apache.spark.sql.{DataFrame, SparkSession}

  private def scratch(sfDir: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_ledger_rt_" +
      sfDir.replaceAll("[^A-Za-z0-9]", "_")

  def sinkRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = scratch(sfDir)
    graft.io.Tables.customer(spark, sfDir)
      .select("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.format(classOf[LedgerSink].getName)
      .option("path", dir).mode("overwrite").save()
    spark.read.format(classOf[LedgerSink].getName)
      .option("path", dir).load()
      .orderBy("c_custkey")
  }

  val sinkRoundtripOracle: String =
    """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
       FROM customer ORDER BY c_custkey"""
}

object LedgerSink {
  private[sources] val ManifestName = "_MANIFEST"
  private[sources] val NullMark = "\\N"

  private[sources] def checkSchema(schema: StructType): Unit =
    schema.fields.foreach { f =>
      f.dataType match {
        case LongType | IntegerType | DoubleType | StringType => ()
        case other => throw new IllegalArgumentException(
          s"ledger sink does not support ${f.name}: $other")
      }
    }

  /** %-escape the three structural bytes (field sep, newline family,
    * escape char itself); everything else passes through verbatim. */
  private[sources] def esc(s: String): String = {
    val b = new StringBuilder(s.length)
    s.foreach {
      case '%' => b.append("%25")
      case ',' => b.append("%2C")
      case '\n' => b.append("%0A")
      case '\r' => b.append("%0D")
      case '\\' => b.append("%5C")
      case c => b.append(c)
    }
    b.toString
  }

  private[sources] def unesc(s: String): String = {
    val b = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '%' && i + 3 <= s.length) {
        b.append(Integer.parseInt(s.substring(i + 1, i + 3), 16).toChar)
        i += 3
      } else { b.append(s.charAt(i)); i += 1 }
    }
    b.toString
  }

  private[sources] def encodeRow(row: InternalRow, schema: StructType): String =
    schema.fields.zipWithIndex.map { case (f, i) =>
      if (row.isNullAt(i)) NullMark
      else f.dataType match {
        case LongType => row.getLong(i).toString
        case IntegerType => row.getInt(i).toString
        case DoubleType => java.lang.Double.toHexString(row.getDouble(i))
        case StringType => esc(row.getUTF8String(i).toString)
        case other => throw new IllegalStateException(other.toString)
      }
    }.mkString(",")

  private[sources] def decodeRow(line: String, schema: StructType): InternalRow = {
    val parts = line.split(",", -1)
    require(parts.length == schema.length, s"ragged ledger line: $line")
    new GenericInternalRow(schema.fields.zipWithIndex.map { case (f, i) =>
      if (parts(i) == NullMark) null
      else (f.dataType match {
        case LongType => parts(i).toLong
        case IntegerType => parts(i).toInt
        case DoubleType => java.lang.Double.parseDouble(parts(i))
        case StringType => UTF8String.fromString(unesc(parts(i)))
        case other => throw new IllegalStateException(other.toString)
      }): Any
    })
  }

  /** Manifest: line 1 the schema DDL, then one staged file name per
    * line. Present-and-parseable == committed (the atomic rename in
    * [[LedgerBatchWrite.commit]] is what makes that equivalence hold). */
  private[sources] def readManifest(dir: Path): Option[(StructType, Seq[String])] = {
    val m = dir.resolve(ManifestName)
    if (!Files.exists(m)) return None
    val lines = Files.readAllLines(m, UTF_8).asScala.toSeq
    Some((StructType.fromDDL(lines.head), lines.tail))
  }

  private[sources] def writeManifestAtomic(
      dir: Path, schema: StructType, files: Seq[String]): Unit = {
    Files.createDirectories(dir)
    val tmp = dir.resolve(s"$ManifestName.tmp")
    Files.write(tmp, (schema.toDDL +: files).mkString("\n").getBytes(UTF_8))
    Files.move(tmp, dir.resolve(ManifestName),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }
}

private[sources] class LedgerTable(dir: Path, schema0: StructType)
    extends Table with SupportsRead with SupportsWrite {
  LedgerSink.checkSchema(schema0)

  override def name(): String = s"ledger(${dir.toString})"
  override def schema(): StructType = schema0
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new LedgerScan(dir, schema0)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new LedgerWriteBuilder(dir, info.schema())
}

private[sources] class LedgerScan(dir: Path, schema: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def description(): String = s"graft-ledger $dir"

  override def planInputPartitions(): Array[InputPartition] =
    LedgerSink.readManifest(dir) match {
      case Some((_, files)) =>
        files.map(f => LedgerFilePartition(dir.resolve(f).toString)).toArray
      case None => Array.empty
    }

  override def createReaderFactory(): PartitionReaderFactory = {
    val ddl = schema.toDDL
    partition => {
      val sch = StructType.fromDDL(ddl)
      val lines = Files.readAllLines(
        Paths.get(partition.asInstanceOf[LedgerFilePartition].file), UTF_8)
        .asScala.iterator
      new PartitionReader[InternalRow] {
        private var cur: InternalRow = _
        override def next(): Boolean =
          lines.hasNext && { cur = LedgerSink.decodeRow(lines.next(), sch); true }
        override def get(): InternalRow = cur
        override def close(): Unit = ()
      }
    }
  }
}

private[sources] case class LedgerFilePartition(file: String)
    extends InputPartition

private[sources] class LedgerWriteBuilder(dir: Path, schema: StructType)
    extends WriteBuilder with SupportsTruncate {
  LedgerSink.checkSchema(schema)
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new LedgerBatchWrite(dir, schema, doTruncate)
  }
}

private[sources] case class LedgerCommitMessage(file: String, rows: Long)
    extends WriterCommitMessage

private[sources] class LedgerBatchWrite(
    dir: Path, schema: StructType, truncate: Boolean) extends BatchWrite {

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory = {
    Files.createDirectories(dir.resolve("_staging"))
    val base = dir.toString
    val ddl = schema.toDDL
    (partitionId: Int, taskId: Long) =>
      new LedgerDataWriter(base, StructType.fromDDL(ddl), partitionId, taskId)
  }

  /** The commit point: the manifest names exactly the files whose
    * tasks reported success; append unions the previous manifest,
    * overwrite starts clean. Atomic rename makes torn job commits
    * impossible — either the old manifest or the new one exists. */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val prev =
      if (truncate) Seq.empty
      else LedgerSink.readManifest(dir).map(_._2).getOrElse(Seq.empty)
    val files = messages.map(_.asInstanceOf[LedgerCommitMessage].file)
    LedgerSink.writeManifestAtomic(dir, schema, prev ++ files)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case LedgerCommitMessage(f, _) =>
        Files.deleteIfExists(dir.resolve(f))
      case _ => ()
    }
}

private[sources] class LedgerDataWriter(
    base: String, schema: StructType, partitionId: Int, taskId: Long)
    extends DataWriter[InternalRow] {

  private val rel = s"_staging/part-$partitionId-$taskId.ledger"
  private val path = Paths.get(base, rel)
  Files.createDirectories(path.getParent) // executor-side, in case the
  // driver's mkdir raced or the writer runs on another host's view
  private val out = Files.newBufferedWriter(path, UTF_8)
  private var rows = 0L

  override def write(record: InternalRow): Unit = {
    out.write(LedgerSink.encodeRow(record, schema))
    out.write("\n")
    rows += 1
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    LedgerCommitMessage(rel, rows)
  }

  override def abort(): Unit = { out.close(); Files.deleteIfExists(path) }
  override def close(): Unit = out.close()
}
