package graft.sources

import java.nio.file.Path

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SQL `CALL` maintenance procedures for ledger tables — the Iceberg
  * stored-procedures surface on Spark 4's ProcedureCatalog: every
  * table-lifecycle operation this connector grew (rollback, retention,
  * vacuum, compaction, tags, branches, constraints) is reachable from
  * PLAIN SQL, so an operator never needs the Scala API:
  *
  * {{{
  *   CALL graft_cat.sys.rollback('ns.tbl', 3)
  *   CALL graft_cat.sys.expire_versions('ns.tbl', 2)
  *   CALL graft_cat.sys.vacuum('ns.tbl')
  *   CALL graft_cat.sys.optimize('ns.tbl')
  *   CALL graft_cat.sys.create_tag('ns.tbl', 'audit', 3)
  *   CALL graft_cat.sys.create_branch('ns.tbl', 'staging')
  *   CALL graft_cat.sys.fast_forward('ns.tbl', 'staging')
  *   CALL graft_cat.sys.add_check('ns.tbl', 'pos', 'v >= 0')
  * }}}
  *
  * Each call returns a one-row result (Spark surfaces it as the CALL's
  * output) via a [[LocalScan]] — the values come from the underlying
  * operation, so the SQL surface reports exactly what the Scala API
  * would. Table arguments are `namespace.table` strings resolved
  * against the catalog's root — the same resolution `tableDir` uses
  * for every other catalog operation. */
private[sources] object GraftProcedures {

  private case class ProcDef(
      name: String, description: String,
      params: Seq[(String, DataType)],
      output: StructType,
      body: (Path, InternalRow) => Seq[Any],
      multiRow: (Path, InternalRow) => Seq[Seq[Any]] = null) {
    def rows(dir: Path, r: InternalRow): Seq[Seq[Any]] =
      if (multiRow != null) multiRow(dir, r) else Seq(body(dir, r))
  }

  private def str(r: InternalRow, i: Int): String =
    r.getUTF8String(i).toString

  private val defs: Seq[ProcDef] = Seq(
    ProcDef("history",
      "one row per readable version: files, physical rows (DV-deleted " +
        "lines included — n_dvs flags merge-on-read tables), DVs",
      Seq("table" -> StringType),
      StructType(Seq(StructField("version", IntegerType),
        StructField("n_files", IntegerType),
        StructField("n_physical_rows", LongType),
        StructField("n_dvs", IntegerType),
        StructField("is_current", IntegerType))),
      body = null,
      multiRow = (dir, _) => {
        val cur = LedgerSink.currentVersion(dir)
        (LedgerSink.archivedVersions(dir) :+ cur).map { v =>
          val m = LedgerSink.readManifestAt(dir, Some(v)).get
          Seq(v, m.files.length, m.files.map(_.rows).sum,
            m.files.count(_.dv.nonEmpty), if (v == cur) 1 else 0)
        }
      }),
    ProcDef("rollback",
      "restore the table to an earlier version as a new commit",
      Seq("table" -> StringType, "version" -> IntegerType),
      StructType(Seq(StructField("restored_as", IntegerType))),
      (dir, r) => Seq(LedgerRefs.restore(dir, r.getInt(1)))),
    ProcDef("expire_versions",
      "drop history beyond keep_last (tags and branch forks survive)",
      Seq("table" -> StringType, "keep_last" -> IntegerType),
      StructType(Seq(StructField("expired_count", IntegerType),
        StructField("oldest_retained", IntegerType))),
      (dir, r) => {
        val expired = LedgerRefs.expireVersions(dir, r.getInt(1))
        Seq(expired.length,
          LedgerSink.archivedVersions(dir).headOption
            .getOrElse(LedgerSink.currentVersion(dir)))
      }),
    ProcDef("vacuum",
      "reclaim files no retained version references; staged files " +
        "younger than the default horizon are kept (in-flight-writer " +
        "guard) — use remove_orphan_files to set the horizon",
      Seq("table" -> StringType),
      StructType(Seq(StructField("reclaimed", IntegerType))),
      (dir, r) => Seq(LedgerSink.vacuum(dir).length)),
    ProcDef("remove_orphan_files",
      "vacuum with an explicit horizon: reclaim unreferenced staged " +
        "files last modified BEFORE older_than (epoch millis or " +
        "'yyyy-MM-dd[ HH:mm:ss]') — Iceberg remove_orphan_files " +
        "semantics; never pass a time a writer could still be " +
        "staging at",
      Seq("table" -> StringType, "older_than" -> StringType),
      StructType(Seq(StructField("reclaimed", IntegerType))),
      (dir, r) => {
        val horizon = System.currentTimeMillis() -
          LedgerSink.parseTsMillis(str(r, 1))
        Seq(LedgerSink.vacuum(dir, math.max(0L, horizon)).length)
      }),
    ProcDef("rollback_to_timestamp",
      "restore the table to the version current at an instant (epoch " +
        "millis or 'yyyy-MM-dd[ HH:mm:ss]') as a new commit",
      Seq("table" -> StringType, "timestamp" -> StringType),
      StructType(Seq(StructField("restored_version", IntegerType),
        StructField("restored_as", IntegerType))),
      (dir, r) => {
        val v = LedgerSink.versionForTimestamp(dir,
          LedgerSink.parseTsMillis(str(r, 1)))
        Seq(v, LedgerRefs.restore(dir, v))
      }),
    ProcDef("expire_older_than",
      "expire history committed strictly before a timestamp (epoch " +
        "millis or 'yyyy-MM-dd[ HH:mm:ss]'); tags, branch forks and " +
        "the newest historical version survive",
      Seq("table" -> StringType, "older_than" -> StringType),
      StructType(Seq(StructField("expired_versions", IntegerType))),
      (dir, r) => Seq(LedgerRefs.expireOlderThan(dir,
        LedgerSink.parseTsMillis(str(r, 1))).length)),
    ProcDef("delete_by_keys",
      "equality delete: kill rows whose key tuple appears in a view, " +
        "reading no data files",
      Seq("table" -> StringType, "key_cols" -> StringType,
        "keys_view" -> StringType),
      StructType(Seq(StructField("deleted_keys", LongType))),
      (dir, r) => Seq(LedgerMaintenance.deleteByKeys(SparkSession.active,
        dir.toString, str(r, 1).split(",").toSeq.map(_.trim),
        SparkSession.active.table(str(r, 2))))),
    ProcDef("upsert_by_keys",
      "single-commit equality-delete upsert from a view (O(batch), " +
        "no data file read)",
      Seq("table" -> StringType, "key_cols" -> StringType,
        "rows_view" -> StringType),
      StructType(Seq(StructField("upsert_keys", LongType),
        StructField("upsert_rows", LongType))),
      (dir, r) => {
        val (k, n) = LedgerMaintenance.upsertByKeys(SparkSession.active,
          dir.toString, str(r, 1).split(",").toSeq.map(_.trim),
          SparkSession.active.table(str(r, 2)))
        Seq(k, n)
      }),
    ProcDef("optimize",
      "bin-pack small files (and compact deletion vectors away)",
      Seq("table" -> StringType),
      StructType(Seq(StructField("files_before", IntegerType),
        StructField("files_after", IntegerType))),
      (dir, r) => {
        val (b, a) = LedgerMaintenance.optimize(
          SparkSession.active, dir.toString)
        Seq(b, a)
      }),
    ProcDef("create_tag",
      "name a version immutably (protects it from expiration)",
      Seq("table" -> StringType, "tag" -> StringType,
        "version" -> IntegerType),
      StructType(Seq(StructField("tagged_version", IntegerType))),
      (dir, r) => Seq(LedgerRefs.createTag(dir, str(r, 1),
        Some(r.getInt(2))))),
    ProcDef("drop_tag", "remove a tag",
      Seq("table" -> StringType, "tag" -> StringType),
      StructType(Seq(StructField("dropped", IntegerType))),
      (dir, r) => { LedgerRefs.dropTag(dir, str(r, 1)); Seq(1) }),
    ProcDef("create_branch",
      "fork a branch at the current version for staged appends",
      Seq("table" -> StringType, "branch" -> StringType),
      StructType(Seq(StructField("fork_version", IntegerType))),
      (dir, r) => Seq(LedgerRefs.createBranch(dir, str(r, 1)))),
    ProcDef("fast_forward",
      "publish a branch's commits onto main (refuses if main moved)",
      Seq("table" -> StringType, "branch" -> StringType),
      StructType(Seq(StructField("published_version", IntegerType))),
      (dir, r) => Seq(LedgerRefs.fastForward(dir, str(r, 1)))),
    ProcDef("drop_branch", "discard a branch and its staged commits",
      Seq("table" -> StringType, "branch" -> StringType),
      StructType(Seq(StructField("dropped", IntegerType))),
      (dir, r) => { LedgerRefs.dropBranch(dir, str(r, 1)); Seq(1) }),
    ProcDef("add_check",
      "add a CHECK constraint (validates existing data first)",
      Seq("table" -> StringType, "name" -> StringType,
        "expression" -> StringType),
      StructType(Seq(StructField("added", IntegerType))),
      (dir, r) => {
        LedgerConstraints.addCheck(SparkSession.active, dir.toString,
          str(r, 1), str(r, 2))
        Seq(1)
      }),
    ProcDef("drop_check", "remove a CHECK constraint",
      Seq("table" -> StringType, "name" -> StringType),
      StructType(Seq(StructField("dropped", IntegerType))),
      (dir, r) => {
        LedgerConstraints.dropCheck(dir.toString, str(r, 1)); Seq(1)
      }))

  private val byName: Map[String, ProcDef] =
    defs.map(d => d.name -> d).toMap

  def names: Seq[String] = defs.map(_.name)

  /** Resolve a procedure. `resolveTable` maps the `table` argument
    * (`namespace.table`) to its directory — supplied by the catalog so
    * resolution matches every other catalog operation. */
  def load(ident: Identifier, resolveTable: String => Path)
      : UnboundProcedure = {
    val d = byName.getOrElse(ident.name(),
      throw new IllegalArgumentException(
        s"no such procedure ${ident.name()} (procedures: " +
          s"${names.mkString(", ")})"))
    new UnboundProcedure {
      override def name(): String = d.name
      override def description(): String = d.description
      override def bind(inputType: StructType): BoundProcedure =
        new BoundProcedure {
          override def name(): String = d.name
          override def description(): String = d.description
          override def isDeterministic: Boolean = false
          override def parameters(): Array[ProcedureParameter] =
            d.params.map { case (n, t) =>
              ProcedureParameter.in(n, t).build()
            }.toArray
          override def call(input: InternalRow)
              : java.util.Iterator[Scan] = {
            val dir = resolveTable(str(input, 0))
            val out = d.rows(dir, input).map(values =>
              new GenericInternalRow(values.map {
                case s: String => UTF8String.fromString(s): Any
                case v => v: Any
              }.toArray): InternalRow)
            java.util.Collections.singletonList(new LocalScan {
              override def rows(): Array[InternalRow] = out.toArray
              override def readSchema(): StructType = d.output
              override def description(): String = s"graft-call ${d.name}"
            }: Scan).iterator()
          }
        }
    }
  }
}
