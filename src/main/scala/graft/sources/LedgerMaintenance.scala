package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
import org.apache.spark.sql.connector.expressions.{Expression => ConnectorExpression, Expressions, SortOrder => ConnectorSortOrder, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, CountStar, Max => AggMax, Min => AggMin}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, IsNotNull, IsNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
/** OPTIMIZE as a commit kind: bin-pack the table's small files into
  * target-sized ones and commit the swap as a new version — the
  * answer to epoch-grain streaming appends accumulating one file per
  * (epoch × partition). Because the row codec is line-oriented and a
  * bin only ever groups files with the SAME column-id list, stat
  * column and partition tuple, each bin's rewrite is a straight byte
  * concatenation — no decode, no shuffle — so the job is one Spark
  * task per bin (embarrassingly parallel on a cluster; the format's
  * single-filesystem assumption is the same one every path here
  * makes). Time travel sees OPTIMIZE like any commit: the
  * pre-OPTIMIZE manifest is archived, its files stay referenced, and
  * [[LedgerSink.vacuum]] reclaims them only when no version does. */
object LedgerMaintenance {
  import org.apache.spark.sql.SparkSession

  /** MERGE-ON-READ DELETE (deletion vectors — the Iceberg v2
    * position-delete / Delta DV design): instead of rewriting every
    * file a predicate touches (copy-on-write's O(files touched)), each
    * matching file gains a position-delete SIDECAR listing its deleted
    * row ordinals; scans merge the DV at read time, so the delete
    * costs O(rows deleted) and commits in one manifest swap. A second
    * delete on the same file writes a new sidecar holding the UNION of
    * ordinals (sidecars are immutable; the old one stays referenced by
    * the archived version for time travel until vacuum). [[optimize]]
    * compacts DVs away — the rewrite drops deleted lines and clears
    * the dv reference.
    *
    * `filters` is a CONJUNCTION over the Spark source-filter ADT
    * (equality/range/null/IN on the table's columns) — the evaluation
    * runs distributed, one task per candidate file; files the
    * manifest's partition/stats metadata can't exclude are scanned,
    * matching ordinals written from the executor, and the commit
    * rebases under the table lock (a racing rewrite of a target file
    * aborts cleanly). Returns the number of deleted rows. */
  def deleteMoR(spark: SparkSession, dirStr: String,
      filters: Array[org.apache.spark.sql.sources.Filter]): Long = {
    val dir = Paths.get(dirStr)
    val m = LedgerSink.readManifest(dir).getOrElse(
      throw new IllegalArgumentException(s"no ledger table at $dirStr"))
    val (newDvs, deleted) = planDvs(spark, dir, m, filters)
    if (newDvs.isEmpty) return 0L
    try LedgerSink.commitRebase(dir, cur =>
      // every target (file, dv-at-planning) entry must be unchanged —
      // a racing rewrite of a target file would make our ordinals wrong
      cur.filter(c => newDvs.keySet.subsetOf(c.files
          .filter(e => m.files.exists(o => o.file == e.file && o.dv == e.dv))
          .map(_.file).toSet))
        .map(c => c.copy(files = c.files.map(e =>
          newDvs.get(e.file).fold(e)(d => e.copy(dv = Some(d)))))),
      s"deleteMoR on $dirStr raced a commit that rewrote one of its " +
        "target files; re-run the delete")
    catch {
      case ex: java.util.ConcurrentModificationException =>
        newDvs.values.foreach(d =>
          Files.deleteIfExists(dir.resolve(d)): Unit)
        throw ex
    }
    deleted
  }

  /** The shared merge-on-read scan: stage a fresh DV sidecar for every
    * file holding LIVE rows matching `filters` (ordinals unioned with
    * the file's existing vector); returns (file → new sidecar,
    * matched-row count). Stages only — callers commit. */
  private def planDvs(spark: SparkSession, dir: Path,
      m: LedgerSink.Manifest,
      filters: Array[org.apache.spark.sql.sources.Filter])
      : (Map[String, String], Long) = {
    import org.apache.spark.sql.sources._
    val schema = m.schema
    val ddl = schema.toDDL
    // validate filter shapes AND literal types up front (fail before
    // any work): a literal cmp cannot evaluate would otherwise make
    // every row non-matching and the call return 0 as if the rows
    // were deleted. RANGE comparisons on strings are refused — Java's
    // UTF-16 compareTo and Spark's UTF-8 byte order diverge beyond the
    // BMP, and updateMoR re-evaluates the same predicate through SQL.
    def checkLit(c: String, v: Any, range: Boolean): Unit = {
      val dt = schema.fields(schema.fieldIndex(c)).dataType
      val ok = (dt, v) match {
        case (LongType | IntegerType | DoubleType, _: Number) => true
        case (StringType, _: String) => !range
        case _ => false
      }
      if (!ok) throw new IllegalArgumentException(
        s"MoR predicate: cannot ${if (range) "range-" else ""}compare " +
          s"column $c ($dt) with literal " +
          s"$v (${if (v == null) "null" else v.getClass.getSimpleName})")
    }
    def checkShape(f: Filter): Unit = f match {
      case EqualTo(c, v) => checkLit(c, v, range = false)
      case GreaterThan(c, v) => checkLit(c, v, range = true)
      case GreaterThanOrEqual(c, v) => checkLit(c, v, range = true)
      case LessThan(c, v) => checkLit(c, v, range = true)
      case LessThanOrEqual(c, v) => checkLit(c, v, range = true)
      case In(c, vs) => vs.foreach(checkLit(c, _, range = false))
      case IsNull(c) => schema.fieldIndex(c): Unit
      case IsNotNull(c) => schema.fieldIndex(c): Unit
      case other => throw new UnsupportedOperationException(
        s"MoR predicates support equality/range/null/IN conjunctions, got $other")
    }
    filters.foreach(checkShape)
    val base = dir.toString
    val runTag = java.util.UUID.randomUUID().toString.take(8)
    // one task per file: evaluate the conjunction on decoded rows,
    // union with the existing DV, stage a fresh sidecar
    val jobs = m.files.zipWithIndex.map { case (e, i) =>
      val (positions, width) = e.ids match {
        case Some(fids) =>
          (schema.fields.map(f => fids.indexOf(m.idOf(f.name))), fids.length)
        case None =>
          (schema.fields.map(f => schema.fieldIndex(f.name)), schema.length)
      }
      // equality deletes compose: rows they already killed are dead,
      // not "matched" — marking them again would inflate the returned
      // count and lie to the caller
      (e.file, e.dv, positions, width, i,
        LedgerSink.eqdBindings(dir, m, e),
        // INITIAL DEFAULTS must apply here exactly as in the public
        // reader: a predicate on a defaulted column would otherwise
        // see NULL where every SELECT shows the default — silently
        // matching the wrong rows (and updateMoR's DV set would
        // disagree with its own update images)
        LedgerSink.defaultsArray(m, positions, m.ids.toArray))
    }
    val results = spark.sparkContext
      .parallelize(jobs, math.max(1, jobs.length))
      .map { case (file, oldDv, positions, width, i, eqd, defEnc) =>
        val st = StructType.fromDDL(ddl)
        val types = st.fields.map(_.dataType)
        val colIdx: Map[String, Int] = st.fieldNames.zipWithIndex.toMap
        val lines = Files.readAllLines(Paths.get(base, file), UTF_8)
        val eqKilled = LedgerSink.eqdKillPredicate(eqd)
        val defVals: Array[Any] =
          if (defEnc.isEmpty) null
          else defEnc.indices.map(j =>
            if (defEnc(j) == null) null
            else LedgerSink.parseValue(types(j), defEnc(j)): Any).toArray
        def withDefaults(row: InternalRow): InternalRow = {
          if (defVals != null) {
            val g = row.asInstanceOf[GenericInternalRow]
            var j = 0
            while (j < defVals.length) {
              if (defVals(j) != null && positions(j) == -1)
                g.update(j, defVals(j))
              j += 1
            }
          }
          row
        }
        val dvOld = oldDv.map(d =>
          LedgerSink.readDvOrdinals(Paths.get(base, d)))
          .getOrElse(new java.util.BitSet())
        def matches(row: InternalRow): Boolean = filters.forall { f =>
          def idx(c: String) = colIdx(c)
          def cmp(c: String, v: Any): Option[Int] = {
            val j = idx(c)
            if (row.isNullAt(j)) None
            else (types(j), v) match {
              case (LongType, x: Number) =>
                Some(java.lang.Long.compare(row.getLong(j), x.longValue))
              case (IntegerType, x: Number) =>
                Some(java.lang.Long.compare(row.getInt(j).toLong, x.longValue))
              case (DoubleType, x: Number) =>
                Some(java.lang.Double.compare(row.getDouble(j), x.doubleValue))
              case (StringType, x: String) =>
                Some(row.getUTF8String(j).toString.compareTo(x))
              case _ => None
            }
          }
          f match {
            case EqualTo(c, v) => cmp(c, v).contains(0)
            case GreaterThan(c, v) => cmp(c, v).exists(_ > 0)
            case GreaterThanOrEqual(c, v) => cmp(c, v).exists(_ >= 0)
            case LessThan(c, v) => cmp(c, v).exists(_ < 0)
            case LessThanOrEqual(c, v) => cmp(c, v).exists(_ <= 0)
            case In(c, vs) => vs.exists(v => cmp(c, v).contains(0))
            case IsNull(c) => row.isNullAt(idx(c))
            case IsNotNull(c) => !row.isNullAt(idx(c))
            case _ => false
          }
        }
        val dvNew = dvOld.clone().asInstanceOf[java.util.BitSet]
        var hits = 0L
        var ord = 0
        lines.forEach { line =>
          if (!dvOld.get(ord) && (eqKilled == null || !eqKilled(line)) &&
              matches(withDefaults(LedgerSink.decodeProjected(
                line, positions, types, width)))) {
            dvNew.set(ord); hits += 1
          }
          ord += 1
        }
        if (hits == 0L) (file, None: Option[String], 0L)
        else {
          val rel = s"_staging/dv-$runTag-$i.dv"
          val sb = new StringBuilder
          var b = dvNew.nextSetBit(0)
          while (b >= 0) { sb.append(b).append('\n'); b = dvNew.nextSetBit(b + 1) }
          Files.write(Paths.get(base, rel), sb.toString.getBytes(UTF_8))
          (file, Some(rel), hits)
        }
      }.collect()
    val newDvs: Map[String, String] =
      results.collect { case (f, Some(d), _) => f -> d }.toMap
    val matched = results.map(_._3).sum
    (newDvs, matched)
  }

  /** MERGE-ON-READ UPDATE — the Delta DV-update design: ONE commit
    * carries (a) fresh deletion vectors marking the matched rows dead
    * in their files and (b) appended files holding the updated
    * versions, so readers see the update atomically and no touched
    * file is rewritten. `set` maps column → SQL expression over the
    * row (e.g. "price_c" → "price_c + 111"); the matched set comes
    * from the SAME predicate evaluated twice — once by the MoR scan
    * for ordinals, once through the public (DV-merging) reader for
    * values — which agree because [[planDvs]] only admits predicate
    * shapes whose semantics are identical in both evaluators.
    * Partitioned tables work too: the scratch ledger the update
    * images stage through is pre-created with the TARGET's partition
    * spec, so every staged file carries its partition tuple under the
    * same transforms (the [[org.apache.spark.sql.connector.write]]
    * SupportsDelta SQL path and this procedural path now share the
    * partition-aware write shape); a mid-flight partition-spec change
    * conflicts like any other racing rewrite.
    * Returns the number of updated rows. */
  def updateMoR(spark: SparkSession, dirStr: String,
      filters: Array[org.apache.spark.sql.sources.Filter],
      set: Map[String, String]): Long = {
    import org.apache.spark.sql.functions.{col, lit}
    val dir = Paths.get(dirStr)
    // pin the PLANNING VERSION: currentVersion-then-readManifestAt is a
    // consistent pair (a commit landing in between archives v, and the
    // archive read is identical), and the value read below targets the
    // same v — rows a concurrent append lands AFTER planning are
    // neither marked dead nor re-emitted, giving clean serializability
    // (this update happened at v; the append happened after)
    val planVersion = LedgerSink.currentVersion(dir)
    val m = LedgerSink.readManifestAt(dir, Some(planVersion)).getOrElse(
      throw new IllegalArgumentException(s"no ledger table at $dirStr"))
    val schema = m.schema
    set.keys.foreach(k => schema.fieldIndex(k): Unit)
    val (newDvs, matched) = planDvs(spark, dir, m, filters)
    if (matched == 0L) return 0L
    val tag = java.util.UUID.randomUUID().toString.take(8)
    // updated rows: the same predicate through the public DV-merging
    // reader, SET expressions applied per column
    def toColumn(f: org.apache.spark.sql.sources.Filter)
        : org.apache.spark.sql.Column = {
      import org.apache.spark.sql.sources._
      f match {
        case EqualTo(c, v) => col(c) === lit(v)
        case GreaterThan(c, v) => col(c) > lit(v)
        case GreaterThanOrEqual(c, v) => col(c) >= lit(v)
        case LessThan(c, v) => col(c) < lit(v)
        case LessThanOrEqual(c, v) => col(c) <= lit(v)
        case In(c, vs) => col(c).isin(vs.toSeq: _*)
        case IsNull(c) => col(c).isNull
        case IsNotNull(c) => col(c).isNotNull
        case other => throw new UnsupportedOperationException(other.toString)
      }
    }
    val updated = spark.read.format(classOf[LedgerSink].getName)
      .option("path", dirStr)
      .option("versionAsOf", planVersion.toString).load()
      .filter(filters.map(toColumn).reduce(_ && _))
      .selectExpr(schema.fieldNames.toSeq.map(n =>
        set.get(n).map(e => s"($e) AS $n").getOrElse(n)): _*)
    // stage the updated rows through the normal write protocol against
    // a scratch ledger, then MOVE its files into this table's staging —
    // same filesystem, so the move is metadata-only — and remap their
    // entries to the TARGET's field ids (the scratch table binds fresh
    // 1..n ids; positionally identical because the projection above is
    // in table-schema order)
    val tmp = Files.createTempDirectory(s"graft_mor_upd_$tag")
    Files.createDirectories(dir.resolve("_staging"))
    // the scratch table is PRE-CREATED with the target's partition
    // spec (by NAME, re-resolved against the scratch's fresh 1..n
    // ids), so the append below stamps every staged file with its
    // partition tuple under the SAME transforms the target prunes by
    LedgerSink.writeManifestAtomic(tmp,
      LedgerSink.Manifest.fresh(schema, m.namedPartitionSpec))
    val moved =
      try {
        updated.write.format(classOf[LedgerSink].getName)
          .option("path", tmp.toString).mode("append").save()
        LedgerSink.readManifest(tmp).get.files.zipWithIndex.map {
          case (e, i) =>
            val rel = s"_staging/upd-$tag-$i.ledger"
            Files.move(tmp.resolve(e.file), dir.resolve(rel))
            // the bloom sidecar moves with its file; its header's
            // field id remaps like the entry's ids
            val bloomRel = e.bloom.map { b =>
              val br = s"_staging/upd-$tag-$i.bf"
              val (bm, _, fid, bits) =
                LedgerSink.readBloomSidecar(tmp.resolve(b))
              val scratchIds = LedgerSink.readManifest(tmp).get.ids
              val pos = scratchIds.indexOf(fid)
              LedgerSink.writeBloomSidecar(dir.resolve(br), bm,
                m.ids.toSeq(pos), bits)
              br
            }
            // partition tuple carries over verbatim (same named spec,
            // same transforms); stamp the TARGET's current spec id so
            // the entry stays correct across later spec evolutions
            e.copy(file = rel, ids = Some(m.ids.toSeq), statId = m.statId,
              bloom = bloomRel,
              spec = if (m.specId == 0) None else Some(m.specId))
        }
      } finally {
        val s = Files.walk(tmp).sorted(java.util.Comparator.reverseOrder())
        try s.iterator().asScala.foreach(Files.deleteIfExists(_))
        finally s.close()
      }
    def cleanup(): Unit = {
      newDvs.values.foreach(d => Files.deleteIfExists(dir.resolve(d)): Unit)
      moved.foreach(e => LedgerSink.deleteStagedEntry(dir, e))
    }
    try LedgerSink.commitRebase(dir, cur =>
      cur.filter(c => newDvs.keySet.subsetOf(c.files
          .filter(e => m.files.exists(o => o.file == e.file && o.dv == e.dv))
          .map(_.file).toSet) &&
          // the update images commit with a fresh data sequence: an
          // equality delete installed after planning would be escaped
          // by them (resurrection) — conflict instead
          c.eqDeletes == m.eqDeletes &&
          // staged tuples were computed under m's spec — a racing
          // spec evolution would mis-key them
          c.specId == m.specId && c.partitionSpec == m.partitionSpec)
        .map(c => c.copy(files = c.files.map(e =>
          newDvs.get(e.file).fold(e)(d => e.copy(dv = Some(d)))) ++ moved)),
      s"updateMoR on $dirStr raced a commit that rewrote one of its " +
        "target files or installed equality deletes; re-run the update")
    catch {
      case ex: java.util.ConcurrentModificationException =>
        cleanup(); throw ex
    }
    matched
  }

  /** Key columns resolved to field ids, with every live data file
    * checked to CARRY them (a file written before an ADD COLUMN has no
    * key bytes — its rows' keys would read as null, which is not what
    * a delete-by-key means). Shared by install and rebase so a racing
    * schema change re-validates. */
  private def eqKeyIds(m: LedgerSink.Manifest,
      keyCols: Seq[String]): Seq[Int] = {
    require(keyCols.nonEmpty, "equality delete needs at least one key column")
    val ids = keyCols.map(m.idOf)
    // a legacy (id-less) entry's column layout is unknowable from the
    // manifest — a key column added after the file was written would
    // read as null and the delete would silently match nothing, so
    // refuse outright (the current manifest's ids would always
    // "contain" the freshly resolved key id — no test against them
    // can catch this)
    val legacy = m.files.filter(_.ids.isEmpty)
    if (legacy.nonEmpty) throw new IllegalArgumentException(
      s"equality delete on ${keyCols.mkString(",")}: ${legacy.length} " +
        s"legacy (id-less) data file(s) (e.g. ${legacy.head.file}) have " +
        "no recorded column layout; rewrite them (optimizeSorted or " +
        "re-append) first")
    val missing = m.files.filter(e =>
      ids.exists(id => !e.ids.exists(_.contains(id))))
    if (missing.nonEmpty) throw new IllegalArgumentException(
      s"equality delete on ${keyCols.mkString(",")}: ${missing.length} " +
        s"data file(s) predate the column(s) (e.g. ${missing.head.file}); " +
        "OPTIMIZE first")
    ids
  }

  /** Key matching happens in ENCODED space, so the key relation's
    * column types must equal the table's exactly — a double key
    * against a long column would encode differently and silently
    * match nothing. */
  private def checkKeyTypes(m: LedgerSink.Manifest, keyCols: Seq[String],
      provided: StructType): Unit =
    keyCols.foreach { c =>
      val want = m.schema.fields(m.schema.fieldIndex(c)).dataType
      val got = provided.find(_.name == c).map(_.dataType)
      require(got.contains(want),
        s"equality-delete key $c: provided relation has " +
          s"${got.map(_.simpleString).getOrElse("no such column")}, the " +
          s"table column is ${want.simpleString} — encoded-tuple " +
          "matching needs identical types (CAST the keys first)")
    }

  /** Stage `tuples` (already projected to the key columns, in order)
    * as equality-delete sidecars via a scratch-ledger write — the
    * ledger row codec IS the sidecar codec, one encoded tuple per
    * line. Returns (staged relative paths, tuple count). */
  private def stageEqdSidecars(spark: SparkSession, dir: Path,
      tuples: org.apache.spark.sql.DataFrame, tag: String)
      : (Seq[String], Long) = {
    val tmp = Files.createTempDirectory(s"graft_eqd_$tag")
    Files.createDirectories(dir.resolve("_staging"))
    try {
      tuples.write.format(classOf[LedgerSink].getName)
        .option("path", tmp.toString).mode("overwrite").save()
      val sm = LedgerSink.readManifest(tmp).get
      val staged = sm.files.filter(_.rows > 0).zipWithIndex.map {
        case (e, i) =>
          val rel = s"_staging/eqd-$tag-$i.eqdel"
          Files.move(tmp.resolve(e.file), dir.resolve(rel))
          rel
      }
      (staged, sm.files.map(_.rows).sum)
    } finally {
      val s = Files.walk(tmp).sorted(java.util.Comparator.reverseOrder())
      try s.iterator().asScala.foreach(Files.deleteIfExists(_))
      finally s.close()
    }
  }

  /** EQUALITY DELETE (the Iceberg v2 equality-delete design): kill
    * every row whose key tuple appears in `keys`, WITHOUT reading a
    * single data file — the keys are staged as sidecars and one
    * manifest commit installs them; scans anti-join at read time and
    * OPTIMIZE materializes (then drops) them. This is the shape a
    * 100 TB kill-list or GDPR erasure wants: O(keys) written,
    * O(metadata) committed, cost deferred to reads the same way DVs
    * defer it — but with no per-file planning scan at all.
    *
    * The delete applies to data files whose data sequence is strictly
    * below the installing commit — concurrent appends landing BEFORE
    * the install are covered (the delete serializes after them),
    * appends landing after are not. Key comparison happens in the
    * codec's encoded space; a null key field matches null (the
    * kill-list contract, not SQL ternary equality). Duplicate key
    * tuples collapse. Returns the distinct key-tuple count. */
  def deleteByKeys(spark: SparkSession, dirStr: String,
      keyCols: Seq[String],
      keys: org.apache.spark.sql.DataFrame): Long = {
    val dir = Paths.get(dirStr)
    val m = LedgerSink.readManifest(dir).getOrElse(
      throw new IllegalArgumentException(s"no ledger table at $dirStr"))
    val fieldIds = eqKeyIds(m, keyCols)
    checkKeyTypes(m, keyCols, keys.schema)
    val tag = java.util.UUID.randomUUID().toString.take(8)
    val (staged, nKeys) = stageEqdSidecars(spark, dir,
      keys.selectExpr(keyCols: _*).distinct(), tag)
    if (nKeys == 0L) {
      staged.foreach(f => Files.deleteIfExists(dir.resolve(f)): Unit)
      return 0L
    }
    try LedgerSink.commitRebase(dir, cur =>
      cur.filter(c =>
          // re-validate against the commit-time state: a racing schema
          // change could have dropped a key column or added files
          // without it
          scala.util.Try(eqKeyIds(c, keyCols) == fieldIds)
            .getOrElse(false))
        .map(c => c.copy(eqDeletes = c.eqDeletes ++
          staged.map(LedgerSink.EqDelete(_, 0, fieldIds)))),
      s"equality delete on $dirStr raced a schema change affecting its " +
        "key columns; re-run against the new schema")
    catch {
      case ex: java.util.ConcurrentModificationException =>
        staged.foreach(f => Files.deleteIfExists(dir.resolve(f)): Unit)
        throw ex
    }
    nKeys
  }

  /** EQUALITY-DELETE UPSERT: ONE commit that installs an equality
    * delete on `rows`' key tuples AND appends `rows` — last-writer-
    * wins replacement that reads NO data files (the delete applies
    * only to files with a strictly smaller data sequence, so the
    * rows appended by this very commit survive it). This is the
    * streaming-CDC apply shape at 100 TB: per batch, cost is
    * O(batch), not O(files touched) (MoR MERGE) or O(files rewritten)
    * (COW). `rows` must be key-unique (dedupe a CDC batch to its last
    * image first). Unpartitioned tables only, same as [[updateMoR]]
    * (the staged appends carry no partition tuple). CHECK constraints
    * are enforced on the incoming rows. Returns (keys, rows). */
  def upsertByKeys(spark: SparkSession, dirStr: String,
      keyCols: Seq[String],
      rows: org.apache.spark.sql.DataFrame): (Long, Long) = {
    val dir = Paths.get(dirStr)
    val m = LedgerSink.readManifest(dir).getOrElse(
      throw new IllegalArgumentException(s"no ledger table at $dirStr"))
    require(m.partitionSpec.isEmpty,
      "upsertByKeys stages unpartitioned appends only; partitioned " +
        "tables take the MoR MERGE path")
    val fieldIds = eqKeyIds(m, keyCols)
    // the whole row schema must match by type, not just the keys: the
    // staged files' entries remap POSITIONALLY to the target's ids
    m.schema.fields.foreach(f =>
      checkKeyTypes(m, Seq(f.name), rows.schema))
    val tag = java.util.UUID.randomUUID().toString.take(8)
    val projected = rows.selectExpr(m.schema.fieldNames.toSeq: _*)
    // Stage the appends through a scratch ledger (same move-and-remap
    // protocol as updateMoR). The input plan is evaluated EXACTLY ONCE
    // — this write; the CHECK scan and the key sidecars below read the
    // MATERIALIZED staged bytes, never the plan again. A
    // non-deterministic input (rand(), a view over a changing source)
    // would otherwise append one evaluation's rows while installing
    // another evaluation's delete keys, making the "single atomic
    // upsert" internally inconsistent (ADVICE r11).
    val tmp = Files.createTempDirectory(s"graft_equ_$tag")
    Files.createDirectories(dir.resolve("_staging"))
    val (moved, staged, nKeys) =
      try {
        projected.write.format(classOf[LedgerSink].getName)
          .option("path", tmp.toString).mode("overwrite").save()
        val stagedRows = spark.read.format(classOf[LedgerSink].getName)
          .option("path", tmp.toString).load()
        LedgerConstraints.constraintsOf(m.props).foreach { case (n, sql) =>
          val bad = stagedRows.filter(s"($sql) <=> false").count()
          if (bad > 0) throw new IllegalArgumentException(
            s"upsert into $dirStr violates CHECK constraint $n " +
              s"($sql) on $bad row(s)")
        }
        // key sidecars from the staged data — the appended rows and
        // the keys deleting their predecessors are the same rows by
        // construction
        val (st, nk) = stageEqdSidecars(spark, dir,
          stagedRows.selectExpr(keyCols: _*).distinct(), tag)
        val sm = LedgerSink.readManifest(tmp).get
        val mv = sm.files.zipWithIndex.map { case (e, i) =>
          val rel = s"_staging/equ-$tag-$i.ledger"
          Files.move(tmp.resolve(e.file), dir.resolve(rel))
          val bloomRel = e.bloom.map { b =>
            val br = s"_staging/equ-$tag-$i.bf"
            val (bm, _, fid, bits) = LedgerSink.readBloomSidecar(tmp.resolve(b))
            LedgerSink.writeBloomSidecar(dir.resolve(br), bm,
              m.ids.toSeq(sm.ids.indexOf(fid)), bits)
            br
          }
          e.copy(file = rel, ids = Some(m.ids.toSeq), statId = m.statId,
            bloom = bloomRel)
        }
        (mv, st, nk)
      } finally {
        val s = Files.walk(tmp).sorted(java.util.Comparator.reverseOrder())
        try s.iterator().asScala.foreach(Files.deleteIfExists(_))
        finally s.close()
      }
    val nRows = moved.map(_.rows).sum
    def cleanup(): Unit = {
      staged.foreach(f => Files.deleteIfExists(dir.resolve(f)): Unit)
      moved.foreach(e => LedgerSink.deleteStagedEntry(dir, e))
    }
    if (nRows == 0L && nKeys == 0L) { cleanup(); return (0L, 0L) }
    try LedgerSink.commitRebase(dir, cur =>
      cur.filter(c => c.partitionSpec.isEmpty &&
          scala.util.Try(eqKeyIds(c, keyCols) == fieldIds).getOrElse(false))
        .map(c => c.copy(
          files = c.files ++ moved,
          eqDeletes = c.eqDeletes ++
            staged.map(LedgerSink.EqDelete(_, 0, fieldIds)))),
      s"upsertByKeys on $dirStr raced a schema or partition-spec " +
        "change; re-run against the new table state")
    catch {
      case ex: java.util.ConcurrentModificationException =>
        cleanup(); throw ex
    }
    (nKeys, nRows)
  }

  /** Returns (files before, files after). Bins never mix column-id
    * lists, stat columns or partition tuples, so every rewritten file
    * is indistinguishable from one a single large write produced. */
  /** PARTITION-SPEC EVOLUTION (the Iceberg multi-spec design at this
    * format's scale): change how FUTURE files are partitioned without
    * rewriting a single existing file. The commit (one manifest swap
    * under the table lock):
    *
    *   1. STAMPS every entry that carried no explicit spec id with the
    *      outgoing spec's id — "unstamped" always means "current", so
    *      the meaning of existing tuples is frozen before the current
    *      pointer moves;
    *   2. archives the outgoing spec under its id (ids are never
    *      reused — the id space is append-only like field ids);
    *   3. installs the new spec as current.
    *
    * Readers resolve each file's tuple against the spec it was written
    * under: pruning applies per-file (same-transform fields keep
    * pruning, changed ones conservatively keep the file), metadata
    * DELETE only proves against identity fields of the FILE's spec,
    * SPJ and partition-grouped aggregate pushdown require a
    * spec-homogeneous file set, and OPTIMIZE never bins across specs.
    * Writers always write the current spec; every concurrent commit
    * kind treats a mid-flight spec change as a conflict. Old files
    * migrate only through explicit rewrites — exactly Iceberg's
    * contract, and the only one that works at 100 TB (the alternative
    * is rewriting the table to change its layout).
    *
    * `spec` is (column, transform, param) triples — e.g.
    * `("okey","bucket",8)`, `("day_ms","days",0)`, `("nk","identity",0)`;
    * empty = unpartitioned. Returns the new spec id. Re-declaring the
    * current spec is a no-op (no version bump). */
  def alterPartitionSpec(dirStr: String,
      spec: Seq[(String, String, Int)]): Int = {
    val dir = Paths.get(dirStr)
    var newId = -1
    LedgerSink.commitRebase(dir, {
      case None => throw new IllegalArgumentException(
        s"no ledger table at $dirStr")
      case Some(m) =>
        val named = spec.map(p => LedgerSink.NamedPartField(p._1, p._2, p._3))
        LedgerSink.checkPartitionSpec(m.schema, named)
        val fields = named.map(p =>
          LedgerSink.PartField(m.idOf(p.name), p.kind, p.param))
        if (fields == m.partitionSpec) { newId = m.specId; Some(m) }
        else {
          val stamped = m.files.map(e =>
            if (e.spec.isEmpty) e.copy(spec = Some(m.specId)) else e)
          newId = (m.oldSpecs.keySet + m.specId).max + 1
          Some(m.copy(partitionSpec = fields, files = stamped,
            specId = newId,
            oldSpecs = m.oldSpecs + (m.specId -> m.partitionSpec)))
        }
    }, "unreachable: spec changes always rebase"): Unit
    newId
  }

  def optimize(spark: SparkSession, dirStr: String,
      targetBytes: Long = 8L << 20): (Int, Int) = {
    val dir = Paths.get(dirStr)
    val m = LedgerSink.readManifest(dir).getOrElse(
      throw new IllegalArgumentException(s"no ledger table at $dirStr"))
    val sizeOf = m.files.map(e =>
      e.file -> (try Files.size(dir.resolve(e.file))
      catch { case _: java.io.IOException => 0L })).toMap
    val bins = Seq.newBuilder[Seq[LedgerSink.FileEntry]]
    // spec evolution: a bin never mixes files of different partition
    // specs — equal tuples under different specs mean different things
    m.files.groupBy(e => (e.ids, e.statId, e.partVals, m.specOf(e)))
      .toSeq.sortBy(_._2.head.file).foreach { case (_, es) =>
        var bin = Vector.empty[LedgerSink.FileEntry]
        var sz = 0L
        // a bin qualifies when it actually compacts (≥2 files) OR when
        // any member carries a deletion vector or an applicable
        // equality delete — OPTIMIZE is also the operation that
        // rewrites merge-on-read state away (the deferred cost, paid
        // here once)
        def accept(b: Vector[LedgerSink.FileEntry]): Unit =
          if (b.length >= 2 || b.exists(_.dv.nonEmpty) ||
            b.exists(e => m.eqDeletesFor(e).nonEmpty)) bins += b
        es.sortBy(e => (sizeOf(e.file), e.file)).foreach { e =>
          val s = sizeOf(e.file)
          if (bin.nonEmpty && sz + s > targetBytes) {
            accept(bin)
            bin = Vector.empty; sz = 0L
          }
          bin = bin :+ e; sz += s
        }
        accept(bin)
      }
    val packed = bins.result()
    if (packed.isEmpty) return (m.files.length, m.files.length)
    val base = dir.toString
    val runTag = java.util.UUID.randomUUID().toString.take(8)
    // the rewritten entry carries its bin's spec EXPLICITLY once the
    // table has evolution state (an unstamped entry means "current
    // spec", which may have moved on by commit time); never-evolved
    // tables stay stamp-free and byte-identical
    val specStamps: Seq[Option[Int]] = packed.map(b =>
      if (m.specId == 0 && m.oldSpecs.isEmpty) None
      else Some(m.specOf(b.head)))
    // equality-delete bindings resolve on the driver (they need the
    // manifest); the rewrite tasks get plain (path, ordinals) pairs
    val binEqds: Seq[Seq[Array[EqdFileBinding]]] =
      packed.map(_.map(e => LedgerSink.eqdBindings(dir, m, e)))
    val entries = spark.sparkContext
      .parallelize(packed.zip(binEqds).zip(specStamps).zipWithIndex,
        packed.length)
      .map { case (((bin, eqds), specStamp), i) =>
        val rel = s"_staging/opt-$runTag-$i.ledger"
        val out = Files.newOutputStream(Paths.get(base, rel))
        var liveRows = 0L
        try bin.zip(eqds).foreach { case (e, eqd) =>
          val eqKilled = LedgerSink.eqdKillPredicate(eqd)
          (e.dv, eqKilled) match {
            case (None, null) => // clean file: straight byte concatenation
              Files.copy(Paths.get(base, e.file), out): Unit
              liveRows += e.rows
            case (d, kill) => // merge-on-read state: drop DV-marked
              // LINES and equality-deleted rows (line-delimited, so the
              // DV half stays a byte-level filter; the equality half
              // splits fields but never type-decodes) — the rewrite
              // MATERIALIZES the deletes, which is exactly why the new
              // entry may take a fresh data sequence
              val dv = d.map(x => LedgerSink.readDvOrdinals(Paths.get(base, x)))
                .getOrElse(new java.util.BitSet())
              val lines = Files.readAllLines(Paths.get(base, e.file), UTF_8)
              var ord = 0
              lines.forEach { l =>
                if (!dv.get(ord) && (kill == null || !kill(l))) {
                  out.write(l.getBytes(UTF_8)); out.write('\n')
                  liveRows += 1
                }
                ord += 1
              }
          }
        } finally out.close()
        val mins = bin.flatMap(_.min)
        val maxs = bin.flatMap(_.max)
        LedgerSink.FileEntry(rel, liveRows,
          if (mins.isEmpty) None else Some(mins.min),
          if (maxs.isEmpty) None else Some(maxs.max),
          bin.head.ids, bin.head.statId, bin.head.partVals,
          spec = specStamp)
      }.collect().toSeq
    // CONCURRENCY: rebase onto the commit-time manifest — files
    // appended since planning survive untouched; if a racing commit
    // rewrote/removed one of this OPTIMIZE's input files, abort
    // cleanly (delete the staged bins) rather than resurrect it.
    // Input identity is the (file, dv) PAIR, not the name: a
    // concurrent deleteMoR changes only the entry's deletion vector,
    // and a name-only check would install bins built from the
    // planning-time (pre-delete) bytes — resurrecting the deleted
    // rows and dropping the new DV.
    val rewritten: Set[(String, Option[String])] =
      packed.flatten.map(e => (e.file, e.dv)).toSet
    val rewrittenNames = rewritten.map(_._1)
    val next =
      try LedgerSink.commitRebase(dir, cur =>
        cur.filter(c =>
            // a spec change since planning is a conflict too: the
            // rewritten entries' spec stamps were computed against the
            // planning manifest's id space — and so is an
            // equality-delete change: the rewrite applied the deletes
            // KNOWN AT PLANNING, and its output takes a fresh data
            // sequence that would wrongly escape a racing install
            c.specId == m.specId && c.oldSpecs == m.oldSpecs &&
              c.eqDeletes == m.eqDeletes &&
              rewritten.subsetOf(c.files.map(e => (e.file, e.dv)).toSet))
          .map { c =>
            val survivors = c.files.filterNot(e => rewrittenNames(e.file))
            // GC: a delete no remaining OLD file is subject to has been
            // fully materialized (the rewritten entries commit with a
            // sequence ABOVE every known delete)
            val kept = c.eqDeletes.filter(d =>
              survivors.exists(e => e.seq.getOrElse(0) < d.version))
            c.copy(files = survivors ++ entries, eqDeletes = kept)
          },
        s"OPTIMIZE on $dirStr raced a commit that rewrote one of its " +
          "input files, changed the partition spec, or installed " +
          "equality deletes; re-run OPTIMIZE against the new layout")
      catch {
        case e: java.util.ConcurrentModificationException =>
          entries.foreach(en => Files.deleteIfExists(dir.resolve(en.file)): Unit)
          throw e
      }
    (m.files.length, next.files.length)
  }

  /** OPTIMIZE … SORT BY the stats column — compaction in service of
    * PRUNING (the Delta/Iceberg "cluster by" story at this format's
    * scale). Epoch appends interleave key ranges, so every file's
    * [min, max] spans the whole key space and [[LedgerScan]]'s stats
    * pruning admits everything; this rewrite RANGE-CLUSTERS the rows
    * so file intervals become disjoint and a point/range predicate
    * plans O(1) files. Unlike [[optimize]] (byte-concat bins, no
    * decode) it is a real Spark job: scan → bucket → sort-within →
    * one transactional overwrite commit (time travel keeps the
    * unsorted history readable; vacuum reclaims it when expired).
    *
    * Bucket boundaries come from the MANIFEST's global stat range —
    * value-space quantiles, zero extra scan — rather than
    * `repartitionByRange`'s sampling pass: at 100 TB the boundaries
    * are metadata, and (equally load-bearing for the correctness
    * gates) the layout is DETERMINISTIC across runs, which sampling
    * is not. Skewed value distributions get uneven buckets; a
    * production variant would blend in sampled quantiles — the
    * commit/pruning mechanics are identical.
    *
    * `files` is a TARGET, not a guarantee — the range split may
    * merge adjacent buckets on quantile ties; disjointness of the
    * rewritten files' stat ranges is the invariant.
    *
    * Unpartitioned tables only: a partitioned write's clustered
    * distribution requirement would re-shuffle rows by the partition
    * tuple and destroy the range layout. Returns (files before,
    * files after). */
  def optimizeSorted(spark: SparkSession, dirStr: String,
      files: Int): (Int, Int) = {
    import org.apache.spark.sql.functions.col
    val dir = Paths.get(dirStr)
    val m = LedgerSink.readManifest(dir).getOrElse(
      throw new IllegalArgumentException(s"no ledger table at $dirStr"))
    require(m.partitionIds.isEmpty,
      "optimizeSorted rewrites unpartitioned tables only")
    val statName = LedgerSink.statColIndex(m.schema)
      .map(m.schema.fields(_).name).getOrElse(throw
        new IllegalArgumentException("no integer stats column to sort by"))
    val lo = m.files.flatMap(_.min) match {
      case Nil => 0L case ms => ms.min
    }
    val hi = m.files.flatMap(_.max) match {
      case Nil => 0L case ms => ms.max
    }
    val span = math.max(1L, hi - lo + 1L)
    val ledger = classOf[LedgerSink].getName
    // repartitionByRange on the BUCKET (not the raw stat): the range
    // partitioner's sample then sees `files` dense distinct values and
    // splits exactly one bucket per partition — hash repartitioning
    // would collide bucket values into shared partitions and merge
    // their ranges
    spark.read.format(ledger).option("path", dirStr).load()
      .selectExpr("*",
        s"CAST(least($files - 1, greatest(0, " +
          s"(($statName - ${lo}L) * $files) DIV ${span}L)) AS INT) AS __bkt")
      .repartitionByRange(files, col("__bkt"))
      .sortWithinPartitions(statName)
      .drop("__bkt")
      .write.format(ledger).option("path", dirStr)
      .mode("overwrite").save()
    (m.files.length,
      LedgerSink.readManifest(dir).map(_.files.length).getOrElse(0))
  }
}
