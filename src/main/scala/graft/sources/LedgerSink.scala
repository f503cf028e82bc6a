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
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
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
  * boundaries (01_sales_revenue_etl.py:96-101 writes whole
  * partitioned prefixes), and this
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
    // time travel: the requested VERSION's schema, not the live one —
    // an overwrite may have changed it
    val version = Option(options.get("versionAsOf")).map(_.toInt)
    LedgerSink.readManifestAt(Paths.get(dir), version) match {
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
    new LedgerTable(Paths.get(dir), schema,
      Option(properties.get("versionAsOf")).map(_.toInt))
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

  /** `dsv2_stream_sink_roundtrip`: the connector's fourth quadrant —
    * micro-batch STREAM into the transactional ledger sink. The
    * synthetic source drains 100k rows under a 25k-row admission cap
    * (Trigger.AvailableNow ⇒ ≥ 4 epochs, each its own
    * stage→message→epoch-commit cycle through
    * [[LedgerStreamingWrite]]), then the table reads back through the
    * manifest and aggregates. The oracle regenerates the whole ledger
    * arithmetically in DuckDB, so the hash match pins exactly-once
    * delivery ACROSS epochs: a lost or doubled batch changes every
    * count and sum. Fresh table + checkpoint per run — replay
    * idempotence is the sink spec's job, not this gate's. */
  def streamSinkRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.Trigger
    val tag = sfDir.replaceAll("[^A-Za-z0-9]", "_")
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_ledger_stream_$tag"
    val ckpt = s"$dir/_checkpoint"
    val root = Paths.get(dir)
    if (Files.exists(root)) {
      val s = Files.walk(root).sorted(java.util.Comparator.reverseOrder())
      try s.iterator().asScala.foreach(Files.deleteIfExists(_))
      finally s.close()
    }
    val stream = spark.readStream.format(classOf[SyntheticSource].getName)
      .option("rows", "100000").option("slices", "16")
      .option("maxRowsPerBatch", "25000").load()
    val q = stream.writeStream.format(classOf[LedgerSink].getName)
      .option("path", dir).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.read.format(classOf[LedgerSink].getName)
      .option("path", dir).load()
      .groupBy(col("category"))
      .agg(count(lit(1)).as("n"),
        sum(col("value")).as("sum_value"),
        sum(col("cents")).as("sum_cents"),
        min(col("id")).as("min_id"), max(col("id")).as("max_id"))
      .orderBy("category")
  }

  val streamSinkRoundtripOracle: String =
    """SELECT 'c' || CAST(v % 23 AS VARCHAR) AS category,
         count(*) AS n,
         CAST(sum(v) AS BIGINT) AS sum_value,
         CAST(sum(v % 9973) AS BIGINT) AS sum_cents,
         min(id) AS min_id,
         max(id) AS max_id
       FROM (SELECT id, (id * 1103515245 + 12345) % 2147483648 AS v
             FROM range(0, 100000) t(id))
       GROUP BY 1 ORDER BY 1"""

  /** `dsv2_time_travel`: manifest-versioned TIME TRAVEL — every commit
    * archives the manifest it replaces, so `versionAsOf` reads any
    * historical table state through its own immutable manifest (the
    * lakehouse snapshot story at this format's scale: an overwrite
    * orphans data files rather than deleting them; vacuum reclaims
    * what no version references). The gate overwrites the customer
    * table with a filtered subset, then reads BOTH the pre-overwrite
    * version and the live table; DuckDB recomputes both digests from
    * the fixture, so the hash match pins that history is the history
    * — an overwrite that leaked into v1, or a version chain that
    * skipped, changes a digest. */
  def timeTravelRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val dir = scratch(sfDir) + "_tt"
    val root = Paths.get(dir)
    if (Files.exists(root)) {
      val s = Files.walk(root).sorted(java.util.Comparator.reverseOrder())
      try s.iterator().asScala.foreach(Files.deleteIfExists(_))
      finally s.close()
    }
    val cust = graft.io.Tables.customer(spark, sfDir)
      .select("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    cust.write.format(classOf[LedgerSink].getName)
      .option("path", dir).mode("overwrite").save()          // version 1
    cust.filter(col("c_nationkey") < 13)
      .write.format(classOf[LedgerSink].getName)
      .option("path", dir).mode("overwrite").save()          // version 2 (live)
    def digest(df: DataFrame, tag: String): DataFrame =
      df.agg(count(lit(1)).as("n_rows"),
          sum(expr("CAST(round(c_acctbal * 100) AS BIGINT)")).as("bal_cents"))
        .selectExpr(s"'$tag' AS snapshot", "n_rows", "bal_cents")
    digest(spark.read.format(classOf[LedgerSink].getName)
        .option("path", dir).option("versionAsOf", "1").load(), "v1")
      .unionByName(digest(spark.read.format(classOf[LedgerSink].getName)
        .option("path", dir).load(), "live"))
      .orderBy("snapshot")
  }

  /** `dsv2_merge_upsert`: SQL MERGE INTO through the catalog plugin —
    * the group-based copy-on-write path end to end (matched UPDATE
    * arm + not-matched INSERT arm, `__row_operation` slicing in the
    * COW writer, scanned-group swap at commit). The oracle replays
    * the upsert relationally in DuckDB; the read-back includes a
    * non-aligned DELETE first, so the metadata-delete vs COW
    * arbitration is inside the gate too. */
  def mergeUpsertRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val tag = sfDir.replaceAll("[^A-Za-z0-9]", "_")
    spark.conf.set("spark.sql.catalog.graft_cat",
      classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_cat.root",
      s"${System.getProperty("java.io.tmpdir")}/graft_catalog_rt")
    val t = s"graft_cat.rlo.upsert_$tag"
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_cat.rlo")
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (c_custkey BIGINT, bal_c BIGINT)")
    graft.io.Tables.customer(spark, sfDir)
      .selectExpr("CAST(c_custkey AS BIGINT) AS c_custkey",
        "CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c")
      .createOrReplaceTempView(s"mu_base_$tag")
    spark.sql(s"INSERT INTO $t SELECT c_custkey, bal_c FROM mu_base_$tag")
    // a non-aligned COW delete first: drop every third customer
    spark.sql(s"DELETE FROM $t WHERE c_custkey % 3 = 0")
    // upsert: bump balances of keys % 7 = 0, insert shadow keys
    spark.sql(
      s"""SELECT c_custkey AS id, bal_c + 100000 AS bal_c
          FROM mu_base_$tag WHERE c_custkey % 7 = 0
          UNION ALL
          SELECT c_custkey + 10000000, CAST(555 AS BIGINT)
          FROM mu_base_$tag WHERE c_custkey % 11 = 0""")
      .createOrReplaceTempView(s"mu_src_$tag")
    spark.sql(
      s"""MERGE INTO $t AS tgt USING mu_src_$tag AS src
          ON tgt.c_custkey = src.id
          WHEN MATCHED THEN UPDATE SET bal_c = src.bal_c
          WHEN NOT MATCHED THEN INSERT (c_custkey, bal_c)
            VALUES (src.id, src.bal_c)""")
    spark.sql(s"SELECT count(*) AS n_rows, sum(bal_c) AS bal_sum," +
      s" sum(c_custkey) AS key_sum FROM $t")
  }

  val mergeUpsertRoundtripOracle: String =
    """WITH base AS (SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
            CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c
          FROM customer),
        after_del AS (SELECT * FROM base WHERE c_custkey % 3 <> 0),
        src AS (SELECT c_custkey AS id, bal_c + 100000 AS bal_c
                FROM base WHERE c_custkey % 7 = 0
                UNION ALL
                SELECT c_custkey + 10000000, CAST(555 AS BIGINT)
                FROM base WHERE c_custkey % 11 = 0),
        merged AS (
          SELECT t.c_custkey,
            coalesce(s.bal_c, t.bal_c) AS bal_c
          FROM after_del t LEFT JOIN src s ON t.c_custkey = s.id
          UNION ALL
          SELECT s.id, s.bal_c FROM src s
          LEFT JOIN after_del t ON t.c_custkey = s.id
          WHERE t.c_custkey IS NULL)
        SELECT count(*) AS n_rows,
          CAST(sum(bal_c) AS BIGINT) AS bal_sum,
          CAST(sum(c_custkey) AS BIGINT) AS key_sum
        FROM merged"""

  /** `dsv2_version_history`: the DESCRIBE HISTORY analogue — one row
    * per table version with its row count and balance digest, read
    * through `versionAsOf`, across every commit kind in one lineage:
    * CREATE (v1, empty), INSERT (v2), append INSERT (v3), and a
    * non-aligned copy-on-write DELETE (v4 = live). The oracle
    * recomputes all four states from the fixture, so the hash pins
    * that each commit archived exactly the state it replaced — an
    * append that leaked into v2, or a COW delete that rewrote
    * history, changes a digest. */
  def versionHistory(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val tag = sfDir.replaceAll("[^A-Za-z0-9]", "_")
    spark.conf.set("spark.sql.catalog.graft_cat",
      classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_cat.root",
      s"${System.getProperty("java.io.tmpdir")}/graft_catalog_rt")
    val t = s"graft_cat.rlo.hist_$tag"
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_cat.rlo")
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (c_custkey BIGINT, bal_c BIGINT)")
    graft.io.Tables.customer(spark, sfDir)
      .selectExpr("CAST(c_custkey AS BIGINT) AS c_custkey",
        "CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c")
      .createOrReplaceTempView(s"vh_base_$tag")
    spark.sql(s"INSERT INTO $t SELECT c_custkey, bal_c FROM vh_base_$tag" +
      " WHERE c_custkey % 2 = 1")
    spark.sql(s"INSERT INTO $t SELECT c_custkey, bal_c FROM vh_base_$tag" +
      " WHERE c_custkey % 2 = 0")
    spark.sql(s"DELETE FROM $t WHERE c_custkey % 5 = 0")
    (1 to 4).map { v =>
      spark.sql(s"SELECT CAST($v AS INT) AS version," +
        s" count(*) AS n_rows, coalesce(sum(bal_c), CAST(0 AS BIGINT))" +
        s" AS bal_sum FROM $t VERSION AS OF $v")
    }.reduce(_ unionByName _).orderBy("version")
  }

  val versionHistoryOracle: String =
    """WITH base AS (SELECT CAST(c_custkey AS BIGINT) AS k,
            CAST(round(c_acctbal * 100) AS BIGINT) AS b
          FROM customer)
       SELECT CAST(1 AS INTEGER) AS version, 0 AS n_rows,
         CAST(0 AS BIGINT) AS bal_sum
       UNION ALL
       SELECT 2, count(*), CAST(sum(b) AS BIGINT) FROM base WHERE k % 2 = 1
       UNION ALL
       SELECT 3, count(*), CAST(sum(b) AS BIGINT) FROM base
       UNION ALL
       SELECT 4, count(*), CAST(sum(b) AS BIGINT) FROM base WHERE k % 5 <> 0
       ORDER BY version"""

  val timeTravelRoundtripOracle: String =
    """SELECT 'live' AS snapshot, count(*) AS n_rows,
         CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS bal_cents
       FROM customer WHERE c_nationkey < 13
       UNION ALL
       SELECT 'v1', count(*),
         CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
       FROM customer
       ORDER BY snapshot"""
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
    // Schema evolution (ADD COLUMN only): a row written before the
    // column was added has FEWER fields — the missing TRAILING columns
    // read as NULL, which is exactly what ADD COLUMN promises for
    // pre-existing rows. MORE fields than the schema is still
    // corruption (columns are never dropped), and so is a short row
    // under the ORIGINAL schema when no evolution happened — but the
    // codec can't distinguish those, so the width check is one-sided.
    require(parts.length <= schema.length, s"ragged ledger line: $line")
    new GenericInternalRow(schema.fields.zipWithIndex.map { case (f, i) =>
      if (i >= parts.length || parts(i) == NullMark) null
      else (f.dataType match {
        case LongType => parts(i).toLong
        case IntegerType => parts(i).toInt
        case DoubleType => java.lang.Double.parseDouble(parts(i))
        case StringType => UTF8String.fromString(unesc(parts(i)))
        case other => throw new IllegalStateException(other.toString)
      }): Any
    })
  }

  /** One committed file plus its data-skipping statistics: min/max of
    * the table's FIRST integral column over the file's non-null values
    * (None stats = no non-null values, or the schema has no integral
    * column). This is the micro version of a table format's column
    * stats: enough for a scan to skip whole files on range predicates. */
  private[sources] case class FileEntry(
      file: String, rows: Long, min: Option[Long], max: Option[Long]) {
    def render: String =
      s"$file\t$rows\t${min.getOrElse("-")}\t${max.getOrElse("-")}"
  }

  private[sources] object FileEntry {
    def parse(line: String): FileEntry = {
      val p = line.split("\t", -1)
      FileEntry(p(0), p(1).toLong,
        if (p(2) == "-") None else Some(p(2).toLong),
        if (p(3) == "-") None else Some(p(3).toLong))
    }
  }

  /** Index of the data-skipping stats column: the first long/int
    * field, if any. */
  private[sources] def statColIndex(schema: StructType): Option[Int] = {
    val i = schema.fields.indexWhere(f =>
      f.dataType == LongType || f.dataType == IntegerType)
    if (i < 0) None else Some(i)
  }

  /** Manifest: line 1 the schema DDL, then one tab-separated
    * [[FileEntry]] per line. Present-and-parseable == committed (the
    * atomic rename in [[LedgerBatchWrite.commit]] is what makes that
    * equivalence hold). */
  private[sources] def readManifest(dir: Path): Option[(StructType, Seq[FileEntry])] = {
    val m = dir.resolve(ManifestName)
    if (!Files.exists(m)) return None
    val lines = Files.readAllLines(m, UTF_8).asScala.toSeq
    Some((StructType.fromDDL(lines.head), lines.tail.map(FileEntry.parse)))
  }

  // ---- manifest versioning (time travel) ----

  private[sources] def archiveName(v: Int): String = s"$ManifestName.v$v"

  private val ArchiveRe = s"${ManifestName}\\.v(\\d+)".r

  /** Archived (historical) version numbers, ascending. */
  private[sources] def archivedVersions(dir: Path): Seq[Int] =
    if (!Files.isDirectory(dir)) Seq.empty
    else {
      val s = Files.list(dir)
      try s.iterator().asScala.flatMap(p =>
        p.getFileName.toString match {
          case ArchiveRe(v) => Some(v.toInt)
          case _ => None
        }).toSeq.sorted
      finally s.close()
    }

  /** The CURRENT manifest's version number: one past the newest
    * archive (the archive is written at replacement time, so the live
    * manifest is always the highest version). */
  private[sources] def currentVersion(dir: Path): Int =
    archivedVersions(dir).lastOption.getOrElse(0) + 1

  /** Manifest as of `version` — the live manifest when `version` is
    * None or equals [[currentVersion]]; an immutable archive
    * otherwise. */
  private[sources] def readManifestAt(dir: Path, version: Option[Int])
      : Option[(StructType, Seq[FileEntry])] =
    version.filter(_ != currentVersion(dir)) match {
      case None => readManifest(dir)
      case Some(v) =>
        val m = dir.resolve(archiveName(v))
        if (!Files.exists(m))
          throw new IllegalArgumentException(
            s"ledger $dir has no version $v (versions: " +
              s"${archivedVersions(dir).mkString(",")},${currentVersion(dir)})")
        val lines = Files.readAllLines(m, UTF_8).asScala.toSeq
        Some((StructType.fromDDL(lines.head), lines.tail.map(FileEntry.parse)))
    }

  /** Every file referenced by ANY retained version — the set a vacuum
    * or a post-DELETE cleanup must not touch. */
  private[sources] def referencedFiles(dir: Path): Set[String] = {
    val archived = archivedVersions(dir).flatMap { v =>
      Files.readAllLines(dir.resolve(archiveName(v)), UTF_8)
        .asScala.toSeq.tail.map(FileEntry.parse(_).file)
    }
    (archived ++ readManifest(dir).map(_._2.map(_.file)).getOrElse(Seq.empty))
      .toSet
  }

  /** Delete staged files no retained version references (the Delta
    * VACUUM analogue with retention = every version; expire versions
    * first — delete their archive files — to reclaim their data). */
  def vacuum(dir: Path): Seq[String] = {
    val live = referencedFiles(dir)
    val staging = dir.resolve("_staging")
    if (!Files.isDirectory(staging)) return Seq.empty
    val s = Files.list(staging)
    val orphans = try {
      s.iterator().asScala.map(p => s"_staging/${p.getFileName}")
        .filterNot(live).toSeq
    } finally s.close()
    orphans.foreach(f => Files.deleteIfExists(dir.resolve(f)): Unit)
    orphans.sorted
  }

  /** Replace the live manifest, ARCHIVING the one being replaced as
    * the next immutable version — every commit (append, overwrite,
    * epoch, metadata delete) leaves the previous table state readable
    * via `versionAsOf`. The archive lands before the rename: a crash
    * between the two leaves an archive that duplicates the live
    * manifest, which the duplicate check skips on the next write, so
    * the version chain never forks or gaps. Data files are never
    * deleted by commits (overwrite orphans them; [[vacuum]] reclaims
    * what no version references). */
  private[sources] def writeManifestAtomic(
      dir: Path, schema: StructType, files: Seq[FileEntry]): Unit = {
    Files.createDirectories(dir)
    val cur = dir.resolve(ManifestName)
    if (Files.exists(cur)) {
      val curBytes = Files.readAllBytes(cur)
      val vs = archivedVersions(dir)
      val isDup = vs.lastOption.exists(v => java.util.Arrays.equals(
        Files.readAllBytes(dir.resolve(archiveName(v))), curBytes))
      if (!isDup) {
        val tmpA = dir.resolve(s"$ManifestName.varc.tmp")
        Files.write(tmpA, curBytes)
        Files.move(tmpA, dir.resolve(archiveName(vs.lastOption.getOrElse(0) + 1)),
          StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
      }
    }
    val tmp = dir.resolve(s"$ManifestName.tmp")
    Files.write(tmp,
      (schema.toDDL +: files.map(_.render)).mkString("\n").getBytes(UTF_8))
    Files.move(tmp, dir.resolve(ManifestName),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }
}

private[sources] class LedgerTable(dir: Path, schema0: StructType,
    version: Option[Int] = None)
    extends Table with SupportsRead with SupportsWrite
    with SupportsDelete with SupportsRowLevelOperations {
  LedgerSink.checkSchema(schema0)

  /** A versionAsOf table is a SNAPSHOT: reads resolve the archived
    * manifest; writes and deletes are refused (they would have to
    * rewrite history). */
  private def requireCurrent(op: String): Unit =
    version.foreach(v => throw new UnsupportedOperationException(
      s"$op on a versionAsOf=$v snapshot; writes go to the current table"))

  override def name(): String =
    s"ledger(${dir.toString}${version.map(v => s"@v$v").getOrElse("")})"
  override def schema(): StructType = schema0
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE,
      TableCapability.STREAMING_WRITE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new LedgerScanBuilder(dir, schema0, version)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    requireCurrent("write")
    new LedgerWriteBuilder(dir, info.schema())
  }

  /** Row-level DELETE/UPDATE/MERGE as GROUP-BASED copy-on-write — the
    * path SQL takes when a predicate does NOT align with file
    * boundaries (the metadata delete above still wins when it does;
    * Spark's OptimizeMetadataOnlyDeleteFromTable arbitrates). Spark
    * rewrites the command into ReplaceData: the operation's SCAN
    * plans the candidate files (stats pruning applies — files that
    * provably hold no matching rows are neither read nor rewritten),
    * Spark recomputes those files' SURVIVING rows, and the write's
    * commit swaps exactly the scanned files for the replacement files
    * in one manifest rename. The scanned-file set travels from the
    * scan to the commit through the operation instance — both run on
    * the driver. */
  override def newRowLevelOperationBuilder(
      info: RowLevelOperationInfo): RowLevelOperationBuilder = {
    requireCurrent(info.command.toString)
    () => new LedgerRowLevelOperation(dir, schema0, info.command)
  }

  // ---- metadata-only DELETE (the Iceberg "metadata delete") ----

  /** Resolve the delete predicates to an inclusive [lo, hi] range on
    * the stats column, or None when any predicate falls outside the
    * provable shapes. */
  private def deleteRange(filters: Array[Filter]): Option[(Long, Long)] = {
    val statName = LedgerSink.statColIndex(schema0).map(schema0.fields(_).name)
    if (statName.isEmpty) return None
    var lo = Long.MinValue
    var hi = Long.MaxValue
    val ok = filters.forall {
      case GreaterThan(c, v: Long) if statName.contains(c) =>
        lo = math.max(lo, v + 1); true
      case GreaterThanOrEqual(c, v: Long) if statName.contains(c) =>
        lo = math.max(lo, v); true
      case LessThan(c, v: Long) if statName.contains(c) =>
        hi = math.min(hi, v - 1); true
      case LessThanOrEqual(c, v: Long) if statName.contains(c) =>
        hi = math.min(hi, v); true
      case EqualTo(c, v: Long) if statName.contains(c) =>
        lo = math.max(lo, v); hi = math.min(hi, v); true
      case _ => false
    }
    if (ok) Some((lo, hi)) else None
  }

  /** A file is decidable when its stats prove it fully inside the
    * delete range (every row's stat value lies in [min,max] ⊆ range)
    * or fully outside (ranges disjoint — including the all-null file,
    * which a null-excluding range predicate can never match). */
  private def classify(range: (Long, Long))
      : Option[(Seq[LedgerSink.FileEntry], Seq[LedgerSink.FileEntry])] = {
    val (lo, hi) = range
    val entries = LedgerSink.readManifest(dir).map(_._2).getOrElse(Seq.empty)
    val (drop, keep) = (Seq.newBuilder[LedgerSink.FileEntry],
      Seq.newBuilder[LedgerSink.FileEntry])
    entries.foreach { e =>
      (e.min, e.max) match {
        case (Some(mn), Some(mx)) if mn >= lo && mx <= hi => drop += e
        case (Some(mn), Some(mx)) if mx < lo || mn > hi => keep += e
        case (None, None) => keep += e // all-null: no row can match
        case _ => return None // straddling file: not a metadata delete
      }
    }
    Some((drop.result(), keep.result()))
  }

  /** Accept exactly the deletes the manifest can prove whole-file:
    * Spark surfaces a refusal as an analysis error telling the user
    * this table needs a rewrite for that predicate — the honest
    * boundary between a metadata delete and row-level ops. */
  override def canDeleteWhere(filters: Array[Filter]): Boolean = {
    requireCurrent("DELETE")
    deleteRange(filters).exists(r => classify(r).isDefined)
  }

  override def deleteWhere(filters: Array[Filter]): Unit = {
    requireCurrent("DELETE")
    val (drop, keep) = deleteRange(filters).flatMap(classify)
      .getOrElse(throw new UnsupportedOperationException(
        "delete predicate does not align with file boundaries"))
    LedgerSink.writeManifestAtomic(dir, schema0, keep)
    // physical cleanup AFTER the commit point — a crash between the
    // two leaves unreferenced files, never a manifest naming ghosts —
    // and only for files NO archived version still references (the
    // commit above archived the pre-delete manifest, so in practice
    // dropped files survive for time travel until vacuum)
    val live = LedgerSink.referencedFiles(dir)
    drop.filterNot(e => live(e.file))
      .foreach(e => Files.deleteIfExists(dir.resolve(e.file)))
  }
}

/** Stats-based file skipping, the OTHER pruning discipline (the
  * synthetic source's clamp is exact because generation is exact;
  * here the stats only BOUND each file, so pruning may keep a file
  * with no matching rows but can never drop a matching one, and every
  * filter is returned as a residual for Spark to evaluate row-wise —
  * the parquet row-group contract, reproduced at file grain). Range
  * predicates on the stats column shrink [flo, fhi]; a file survives
  * iff its [min, max] intersects it. A statless file always survives;
  * an all-null-stat-column file never matches a null-excluding range
  * predicate, so skipping it is exact. */
private[sources] class LedgerScanBuilder(dir: Path, schema: StructType,
    version: Option[Int] = None,
    onPlanned: Seq[String] => Unit = _ => ())
    extends ScanBuilder with SupportsPushDownFilters {

  private val statName: Option[String] =
    LedgerSink.statColIndex(schema).map(schema.fields(_).name)
  private var flo: Long = Long.MinValue
  private var fhi: Long = Long.MaxValue // inclusive
  private var pushed: Array[Filter] = Array.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val accepted = scala.collection.mutable.ArrayBuffer.empty[Filter]
    filters.foreach {
      case f @ GreaterThan(c, v: Long) if statName.contains(c) =>
        flo = math.max(flo, v + 1); accepted += f
      case f @ GreaterThanOrEqual(c, v: Long) if statName.contains(c) =>
        flo = math.max(flo, v); accepted += f
      case f @ LessThan(c, v: Long) if statName.contains(c) =>
        fhi = math.min(fhi, v - 1); accepted += f
      case f @ LessThanOrEqual(c, v: Long) if statName.contains(c) =>
        fhi = math.min(fhi, v); accepted += f
      case f @ EqualTo(c, v: Long) if statName.contains(c) =>
        flo = math.max(flo, v); fhi = math.min(fhi, v); accepted += f
      case _ => ()
    }
    pushed = accepted.toArray
    filters // ALL residual: stats bound files, they don't filter rows
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan =
    new LedgerScan(dir, schema, flo, fhi, pushed.nonEmpty, version, onPlanned)
}

private[sources] class LedgerScan(
    dir: Path, schema: StructType,
    flo: Long = Long.MinValue, fhi: Long = Long.MaxValue,
    filtered: Boolean = false, version: Option[Int] = None,
    onPlanned: Seq[String] => Unit = _ => ())
    extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-ledger $dir" + version.map(v => s" @v$v").getOrElse("") +
      (if (filtered) s" StatsRange: [$flo, $fhi]" else "")

  override def planInputPartitions(): Array[InputPartition] =
    LedgerSink.readManifestAt(dir, version) match {
      case Some((_, files)) =>
        val chosen = files.filter { e =>
          !filtered || ((e.min, e.max) match {
            case (Some(lo), Some(hi)) => hi >= flo && lo <= fhi
            case _ =>
              // no stats: a file with rows but no non-null stat values
              // cannot match a null-excluding range predicate; a
              // statless schema (no integral column) never pushes
              e.min.isEmpty && e.max.isEmpty && statlessSchema
          })
        }
        onPlanned(chosen.map(_.file))
        chosen.map(f => LedgerFilePartition(dir.resolve(f.file).toString)).toArray
      case None => Array.empty
    }

  private def statlessSchema: Boolean = LedgerSink.statColIndex(schema).isEmpty

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
    override def toStreaming
        : org.apache.spark.sql.connector.write.streaming.StreamingWrite =
      new LedgerStreamingWrite(dir, schema)
  }
}

private[sources] case class LedgerCommitMessage(entry: LedgerSink.FileEntry)
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
    val existing = LedgerSink.readManifest(dir)
    // An APPEND preserves the TABLE's schema: the write schema is the
    // incoming dataframe's (Spark has already checked compatibility),
    // and its tighter nullability must not overwrite the manifest —
    // an evolved table whose manifest flipped to NOT NULL made
    // pre-evolution rows read 0 instead of NULL (codegen skips null
    // checks on non-nullable columns; caught by the evolution spec).
    // An OVERWRITE (or a first write) takes the write schema — that
    // is how a path-based save defines the table.
    val keepSchema =
      if (truncate) schema else existing.map(_._1).getOrElse(schema)
    val prev =
      if (truncate) Seq.empty
      else existing.map(_._2).getOrElse(Seq.empty)
    val files = messages.map(_.asInstanceOf[LedgerCommitMessage].entry)
    LedgerSink.writeManifestAtomic(dir, keepSchema, prev ++ files)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case LedgerCommitMessage(e) =>
        Files.deleteIfExists(dir.resolve(e.file))
      case _ => ()
    }
}

/** Group-based copy-on-write row-level operation (see
  * [[LedgerTable.newRowLevelOperationBuilder]]). One implementation
  * serves DELETE, UPDATE and MERGE: the command only changes how
  * Spark computes the replacement rows; the connector's contract is
  * the same either way — replace the scanned groups with the written
  * ones atomically. */
private[sources] class LedgerRowLevelOperation(
    dir: Path, schema: StructType,
    cmd: RowLevelOperation.Command) extends RowLevelOperation {

  /** Files the operation's scan planned — the groups being replaced.
    * Written once by planInputPartitions (driver side), read by
    * commit (driver side). */
  @volatile private[sources] var scannedFiles: Seq[String] = Seq.empty

  override def command: RowLevelOperation.Command = cmd

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new LedgerScanBuilder(dir, schema,
      onPlanned = files => scannedFiles = files)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new BatchWrite {
          override def createBatchWriterFactory(
              pinfo: PhysicalWriteInfo): DataWriterFactory = {
            Files.createDirectories(dir.resolve("_staging"))
            val base = dir.toString
            val ddl = schema.toDDL
            val tag = java.util.UUID.randomUUID().toString.take(8)
            (partitionId: Int, taskId: Long) =>
              new CowDataWriter(base, StructType.fromDDL(ddl),
                partitionId, taskId, s"cow-$tag-")
          }

          /** Swap the scanned groups for the replacement files —
            * files the scan skipped are untouched, and the archived
            * pre-operation manifest keeps the old state readable
            * (time travel applies to row-level ops like any commit). */
          override def commit(messages: Array[WriterCommitMessage]): Unit = {
            val prev = LedgerSink.readManifest(dir)
              .map(_._2).getOrElse(Seq.empty)
            val replaced = scannedFiles.toSet
            val fresh = messages.map(_.asInstanceOf[LedgerCommitMessage].entry)
            LedgerSink.writeManifestAtomic(dir, schema,
              prev.filterNot(e => replaced(e.file)) ++ fresh)
          }

          override def abort(messages: Array[WriterCommitMessage]): Unit =
            messages.foreach {
              case LedgerCommitMessage(e) =>
                Files.deleteIfExists(dir.resolve(e.file)): Unit
              case _ => ()
            }
        }
      }
    }
}

/** DataWriter for the copy-on-write path. Spark's group-based
  * ReplaceData prepends a `__row_operation` column to every row
  * (RowDeltaUtils: DELETE=1 … WRITE_WITH_METADATA=6) and — verified
  * against the 4.1 bytecode — applies NO projection before the writer
  * when the operation requests no metadata columns
  * (`ReplaceDataExec.writingTask` falls through to the plain
  * `DataWritingSparkTask` whenever `metadataProjection` is None), so
  * the connector slices the data columns out itself: the payload is
  * the LAST schema-width fields, and a row marked DELETE is dropped
  * rather than written (group-based plans emit only write-ops today;
  * the filter makes the writer safe if a future rewrite emits delete
  * markers). Plain writes (no leading operation column) pass through
  * untouched. */
private[sources] class CowDataWriter(
    base: String, schema: StructType, partitionId: Int, taskId: Long,
    prefix: String)
    extends LedgerDataWriter(base, schema, partitionId, taskId, prefix) {
  private val width = schema.fields.length
  override def write(r: InternalRow): Unit = {
    val off = r.numFields - width
    if (off <= 0) super.write(r)
    else if (r.getInt(0) != 1) { // RowDeltaUtils.DELETE_OPERATION
      val proj = new GenericInternalRow(width)
      var i = 0
      while (i < width) {
        proj.update(i,
          if (r.isNullAt(i + off)) null
          else r.get(i + off, schema.fields(i).dataType))
        i += 1
      }
      super.write(proj)
    }
  }
}

/** Exactly-once STREAMING sink over the same staged-file + manifest
  * protocol as the batch write — the connector's fourth quadrant
  * (batch read, batch write, micro-batch read, and now micro-batch
  * WRITE). The one genuinely new obligation is EPOCH IDEMPOTENCE:
  * after a failure, Structured Streaming re-runs the last epoch and
  * calls `commit(epochId, …)` AGAIN for an epoch that may already be
  * in the manifest. Staged files carry their epoch in the name
  * (`_staging/epoch-<e>-part-…`), so a replayed commit detects its
  * epoch's files already present and returns without appending —
  * at-least-once task attempts compose with an idempotent commit
  * into exactly-once table state, which is the entire contract of a
  * transactional streaming sink. Append output mode only: an epoch
  * never rewrites previous epochs' files. */
private[sources] class LedgerStreamingWrite(dir: Path, schema: StructType)
    extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {
  import org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory = {
    Files.createDirectories(dir.resolve("_staging"))
    val base = dir.toString
    val ddl = schema.toDDL
    (partitionId: Int, taskId: Long, epochId: Long) =>
      new LedgerDataWriter(base, StructType.fromDDL(ddl), partitionId,
        taskId, filePrefix = s"epoch-$epochId-")
  }

  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val existing = LedgerSink.readManifest(dir)
    // epoch commits are appends: preserve the table's schema (see
    // LedgerBatchWrite.commit)
    val keepSchema = existing.map(_._1).getOrElse(schema)
    val prev = existing.map(_._2).getOrElse(Seq.empty)
    val marker = s"_staging/epoch-$epochId-"
    if (prev.exists(_.file.startsWith(marker))) {
      // replayed epoch: the manifest already holds its files — drop
      // the re-staged duplicates instead of double-appending
      messages.foreach {
        case LedgerCommitMessage(e) if !prev.exists(_.file == e.file) =>
          Files.deleteIfExists(dir.resolve(e.file)): Unit
        case _ => ()
      }
    } else {
      val files = messages.map(_.asInstanceOf[LedgerCommitMessage].entry)
      LedgerSink.writeManifestAtomic(dir, keepSchema, prev ++ files)
    }
  }

  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case LedgerCommitMessage(e) =>
        Files.deleteIfExists(dir.resolve(e.file)): Unit
      case _ => ()
    }
}

private[sources] class LedgerDataWriter(
    base: String, schema: StructType, partitionId: Int, taskId: Long,
    filePrefix: String = "")
    extends DataWriter[InternalRow] {

  private val rel = s"_staging/${filePrefix}part-$partitionId-$taskId.ledger"
  private val path = Paths.get(base, rel)
  Files.createDirectories(path.getParent) // executor-side, in case the
  // driver's mkdir raced or the writer runs on another host's view
  private val out = Files.newBufferedWriter(path, UTF_8)
  private var rows = 0L
  // data-skipping stats over the first integral column's non-null values
  private val statIdx = LedgerSink.statColIndex(schema)
  private var statMin = Long.MaxValue
  private var statMax = Long.MinValue
  private var statSeen = false

  override def write(record: InternalRow): Unit = {
    out.write(LedgerSink.encodeRow(record, schema))
    out.write("\n")
    rows += 1
    statIdx.foreach { i =>
      if (!record.isNullAt(i)) {
        val v = schema.fields(i).dataType match {
          case LongType => record.getLong(i)
          case _ => record.getInt(i).toLong
        }
        statSeen = true
        if (v < statMin) statMin = v
        if (v > statMax) statMax = v
      }
    }
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    LedgerCommitMessage(LedgerSink.FileEntry(rel, rows,
      if (statSeen) Some(statMin) else None,
      if (statSeen) Some(statMax) else None))
  }

  override def abort(): Unit = { out.close(); Files.deleteIfExists(path) }
  override def close(): Unit = out.close()
}
