package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, StandardCopyOption}

import scala.jdk.CollectionConverters._

/** Named version references, rollback and retention for ledger tables —
  * the metadata lifecycle a production table format carries around its
  * commit log (the Iceberg refs/expire-snapshots and Delta
  * RESTORE/retention surface, at this format's scale):
  *
  *   - TAGS are immutable named pointers to committed versions
  *     (`createTag`/`dropTag`, read via the `tagAsOf` option — resolved
  *     to a `versionAsOf` read at table construction, so a tag read is
  *     byte-identical to reading its target version). A tag PROTECTS
  *     its target from [[expireVersions]] — the audit/reproducibility
  *     contract ("the training run read `tag=corpus-v3`") that pure
  *     version numbers can't give, because retention eventually
  *     renumbers nothing but deletes much.
  *   - RESTORE commits the table BACK to an earlier version's exact
  *     state (schema, partition spec, properties, file list) as a NEW
  *     version — history is never rewritten, the bad commits stay
  *     readable, and the restore itself is one manifest swap (no data
  *     is copied; the old files are still on disk because commits never
  *     delete data and vacuum only reclaims unreferenced files — which
  *     restore re-checks, failing loud if retention already took one).
  *   - EXPIRATION deletes old archived manifests so vacuum can reclaim
  *     the data files only they reference — the knob that stops a 100
  *     TB table's history from growing without bound. The newest
  *     archive is always retained (the version counter derives from the
  *     archive chain; expiring everything would reset it and corrupt
  *     CDC/time-travel identity), as is every tagged version.
  *   - WRITE-AUDIT-PUBLISH: `df.write.option("wapId", id)` stages a
  *     commit into `_MANIFEST.wap.<id>` without touching the live
  *     table; `option("wapId", id)` on read audits it (full planning —
  *     stats/partition/column pruning — over base ∪ staged);
  *     [[publishWap]] folds exactly the staged files into the
  *     then-current table under the optimistic-commit protocol;
  *     [[abortWap]] deletes them. Vacuum protects staged files
  *     throughout ([[LedgerSink.referencedFiles]] walks staged
  *     manifests too).
  *
  * Everything commits under the table's commit lock
  * ([[LedgerSink.withCommitLock]]); refs live in a `_REFS` file
  * replaced atomically, so a reader never sees a torn ref set.
  *
  * Reference trace: the reference pipeline keeps no history at all —
  * each Glue run overwrites its S3 prefix (01_sales_revenue_etl.py:
  * 96-101) — so reproducing "what did the dashboard read last Tuesday"
  * is impossible there; this module is that answer expressed at the
  * connector layer. */
object LedgerRefs {

  private val RefsName = "_REFS"

  private def checkRefName(name: String): Unit =
    require(name.nonEmpty && name.forall(c => c.isLetterOrDigit ||
      c == '-' || c == '_' || c == '.'),
      s"ref name must be [A-Za-z0-9._-]+, got '$name'")

  /** All tags, name → target version. Missing file = no tags. */
  def tags(dir: Path): Map[String, Int] = {
    val p = dir.resolve(RefsName)
    if (!Files.exists(p)) Map.empty
    else Files.readAllLines(p, UTF_8).asScala.filter(_.nonEmpty).map { l =>
      val parts = l.split("\t")
      parts(0) -> parts(1).toInt
    }.toMap
  }

  private def writeRefs(dir: Path, refs: Map[String, Int]): Unit = {
    val tmp = dir.resolve(s"$RefsName.tmp")
    Files.write(tmp, refs.toSeq.sortBy(_._1)
      .map { case (n, v) => s"$n\t$v" }.mkString("\n").getBytes(UTF_8))
    Files.move(tmp, dir.resolve(RefsName), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING): Unit
  }

  /** Tag `version` (default: the current version) as `name`. The
    * target must be a live version — archived or current — and the
    * name must be free: tags are immutable (drop + re-create to
    * move one; accidental retargeting is how reproducibility dies). */
  def createTag(dir: Path, name: String, version: Option[Int] = None): Int = {
    checkRefName(name)
    LedgerSink.withCommitLock(dir) {
      val cur = LedgerSink.currentVersion(dir)
      val target = version.getOrElse(cur)
      val known = LedgerSink.archivedVersions(dir).toSet + cur
      require(known.contains(target),
        s"cannot tag version $target of $dir (versions: " +
          s"${known.toSeq.sorted.mkString(",")})")
      val t = tags(dir)
      if (t.contains(name)) throw new IllegalStateException(
        s"tag '$name' already exists on $dir (→ v${t(name)}); " +
          "drop it first — tags are immutable")
      writeRefs(dir, t + (name -> target))
      target
    }
  }

  def dropTag(dir: Path, name: String): Unit =
    LedgerSink.withCommitLock(dir) {
      val t = tags(dir)
      require(t.contains(name), s"no tag '$name' on $dir")
      writeRefs(dir, t - name)
    }

  /** Tag → version, failing loud on an unknown name (a silent
    * empty read from a typo'd tag is the failure mode). */
  def resolveTag(dir: Path, name: String): Int =
    tags(dir).getOrElse(name, throw new IllegalArgumentException(
      s"no tag '$name' on $dir (tags: ${tags(dir).keys.toSeq.sorted
        .mkString(",")})"))

  /** Roll the table back to `version`'s exact committed state as a NEW
    * version (the Delta RESTORE contract): schema, ids, partition
    * spec, properties and file list all come from the target version's
    * self-contained manifest. Fails loud when retention already
    * reclaimed one of the target's data files — a restore that
    * resurrects a manifest naming ghost files would fail at first
    * read, which is later and worse. Restoring to the current state is
    * a no-op (no version bump). Returns the version the restore
    * committed as (the new current version). */
  def restore(dir: Path, version: Int): Int = {
    LedgerSink.commitRebase(dir, { _ =>
      val target = LedgerSink.readManifestAt(dir, Some(version)).getOrElse(
        throw new IllegalArgumentException(
          s"no committed ledger manifest under $dir"))
      val missing = target.files
        .flatMap(e => (e.file +: e.dv.toSeq) ++ e.bloom.toSeq)
        .filterNot(f => Files.exists(dir.resolve(f)))
      if (missing.nonEmpty) throw new IllegalStateException(
        s"cannot restore $dir to version $version: ${missing.size} " +
          s"referenced file(s) were vacuumed (first: ${missing.head})")
      Some(target)
    }, "unreachable: restore always rebases")
    LedgerSink.currentVersion(dir)
  }

  /** Delete archived manifests beyond the newest `keepLast`, keeping
    * every tagged version — then [[LedgerSink.vacuum]] can reclaim the
    * data files only those archives referenced. `keepLast >= 1`: the
    * version counter is derived from the archive chain, so the newest
    * archive must survive or versioning would silently restart at 1.
    * Reads of an expired version fail fast with the retained-version
    * list ([[LedgerSink.readManifestAt]]). Returns the expired
    * version numbers. */
  def expireVersions(dir: Path, keepLast: Int): Seq[Int] = {
    require(keepLast >= 1,
      s"keepLast must be >= 1 (always retain the newest historical " +
        s"version), got $keepLast")
    LedgerSink.withCommitLock(dir) {
      val vs = LedgerSink.archivedVersions(dir)
      LedgerSink.dropHistory(dir,
        vs.takeRight(keepLast).toSet ++ tags(dir).values)
    }
  }

  /** Publish a staged (write-audit-publish) commit: fold exactly its
    * `graft.wap.newfiles` into the table current AT PUBLISH TIME under
    * the optimistic-commit protocol — commits that landed between
    * stage and publish are composed with, not clobbered (the staged
    * files are an append; disjoint file sets commute). The one
    * conflict is a schema-changing commit since the stage: the staged
    * files' field-id binding would alias under the new definition, so
    * the publish aborts (staged data intact — re-stage against the new
    * definition). Deletes the staged manifest on success. Returns the
    * published version. */
  def publishWap(dir: Path, id: String): Int = {
    val w = LedgerSink.readWap(dir, id)
    val newNames = w.props.get(LedgerSink.WapNewFilesProp)
      .map(_.split(",", -1).toSet.filter(_.nonEmpty)).getOrElse(Set.empty)
    val newEntries = w.files.filter(e => newNames(e.file))
    LedgerSink.commitRebase(dir, {
      case Some(cur) =>
        if (cur.schema == w.schema && cur.ids == w.ids &&
          cur.partitionSpec == w.partitionSpec)
          Some(cur.copy(files = cur.files ++ newEntries))
        else None
      case None =>
        // stage against an empty table, still empty: the staged state
        // minus the wap bookkeeping props IS the table
        Some(w.copy(props =
          w.props - LedgerSink.WapBaseProp - LedgerSink.WapNewFilesProp))
    }, s"publish of wapId=$id on $dir raced a schema-changing commit; " +
      "re-stage against the table's new definition")
    Files.deleteIfExists(dir.resolve(LedgerSink.wapName(id))): Unit
    LedgerSink.currentVersion(dir)
  }

  /** Discard a staged commit: its staged files (with sidecars) and its
    * staged manifest. The live table was never touched. */
  def abortWap(dir: Path, id: String): Unit = {
    val w = LedgerSink.readWap(dir, id)
    val newNames = w.props.get(LedgerSink.WapNewFilesProp)
      .map(_.split(",", -1).toSet.filter(_.nonEmpty)).getOrElse(Set.empty)
    // delete the staged manifest FIRST: a crash mid-abort then leaves
    // unreferenced files for vacuum, never a staged manifest naming
    // deleted ones
    Files.deleteIfExists(dir.resolve(LedgerSink.wapName(id))): Unit
    w.files.filter(e => newNames(e.file))
      .foreach(e => LedgerSink.deleteStagedEntry(dir, e))
  }
}
