package graft.sources

import java.nio.file.Files
import java.util.ConcurrentModificationException

import scala.concurrent.{Await, Future}
import scala.concurrent.duration._
import scala.concurrent.ExecutionContext.Implicits.global

import org.apache.spark.sql.DataFrame

/** The optimistic-concurrency commit protocol
  * ([[LedgerSink.commitRebase]]): every commit re-reads the manifest
  * current AT COMMIT TIME under the table's lock and rebases its
  * intent onto it. What this pins, each case the exact failure the r10
  * verdict named (two appends both read v, both write v+1, one
  * silently orphaned):
  *
  *   - append ∥ append: both land, union of files, two versions;
  *   - append planned BEFORE an OPTIMIZE commits AFTER it: the append
  *     rebases onto the compacted manifest — both commits' rows
  *     survive (disjoint file sets commute);
  *   - a rewrite (OPTIMIZE / row-level COW) whose input files a
  *     concurrent commit removed: clean ConcurrentModificationException
  *     abort, staged output cleaned up, table state untouched;
  *   - an append racing a SCHEMA-CHANGING commit: aborts (the staged
  *     files' field-id binding is stale) instead of aliasing bytes;
  *   - concurrent CREATE TABLE: exactly one wins.
  */
class ConcurrencySpec extends graft.SparkSpec {

  private val ledger = classOf[LedgerSink].getName

  private def freshDir() = {
    val d = Files.createTempDirectory("ledger_conc_spec")
    Files.delete(d)
    d
  }

  private def write(dir: java.nio.file.Path, df: DataFrame,
      mode: String = "overwrite"): Unit =
    df.write.format(ledger).option("path", dir.toString).mode(mode).save()

  private def read(dir: java.nio.file.Path): DataFrame =
    spark.read.format(ledger).option("path", dir.toString).load()

  test("two concurrent appends both land with all files present") {
    val dir = freshDir()
    write(dir, spark.range(0, 10).selectExpr("id"))
    val v0 = LedgerSink.currentVersion(dir)
    // two full write jobs racing through the public API; the commit
    // lock serializes their manifest swaps in whichever order they
    // arrive — the invariant is that NEITHER commit's files vanish
    val fs = Seq(
      Future(write(dir, spark.range(100, 150).selectExpr("id"), "append")),
      Future(write(dir, spark.range(200, 280).selectExpr("id"), "append")))
    fs.foreach(Await.result(_, 120.seconds))
    assert(LedgerSink.currentVersion(dir) == v0 + 2,
      "each append must be its own version")
    val got = read(dir).collect().map(_.getLong(0)).sorted
    val want = ((0L until 10L) ++ (100L until 150L) ++ (200L until 280L)).sorted
    assert(got.toSeq == want.toSeq, "one append's files were orphaned")
  }

  test("an append planned before an OPTIMIZE rebases onto the compacted manifest") {
    val dir = freshDir()
    write(dir, spark.range(0, 10).selectExpr("id"))
    (1 to 3).foreach(i =>
      write(dir, spark.range(i * 100L, i * 100L + 10).selectExpr("id"), "append"))
    val schema = org.apache.spark.sql.types.StructType.fromDDL("id BIGINT")
    // a stale writer: its base manifest (and id binding) captured NOW
    val stale = new LedgerBatchWrite(dir, schema, truncate = false,
      Seq.empty, Seq.empty)
    val factory = stale.createBatchWriterFactory(null)
    // OPTIMIZE lands while the stale writer's tasks run
    val (before, after) = LedgerMaintenance.optimize(spark, dir.toString)
    assert(after < before, "compaction should have merged files")
    // now the stale writer stages its rows and commits
    val w = factory.createWriter(0, 7L)
    (9000L until 9005L).foreach(v =>
      w.write(org.apache.spark.sql.catalyst.InternalRow(v)))
    val msg = w.commit()
    stale.commit(Array(msg))
    val got = read(dir).collect().map(_.getLong(0)).sorted
    val want = ((0L until 10L) ++ (100L until 110L) ++ (200L until 210L) ++
      (300L until 310L) ++ (9000L until 9005L)).sorted
    assert(got.toSeq == want.toSeq,
      "append must rebase onto the optimized manifest, dropping nothing")
  }

  test("OPTIMIZE whose input file a racing DELETE removed aborts cleanly") {
    val dir = freshDir()
    write(dir, spark.range(0, 10).selectExpr("id"))
    write(dir, spark.range(10, 20).selectExpr("id"), "append")
    val m = LedgerSink.readManifest(dir).get
    assert(m.files.length >= 2)
    val victim = m.files.head.file
    val victimRows = m.files.head.rows
    // simulate the rewrite's commit arriving AFTER a commit that
    // removed one of its inputs: the rebase must refuse
    val ex = intercept[ConcurrentModificationException] {
      LedgerSink.commitRebase(dir, cur => {
        // the racing commit, sequenced inside the window between the
        // rewrite's planning (above) and its commit (the rebase below)
        LedgerSink.writeManifestAtomic(dir,
          cur.get.copy(files = cur.get.files.filterNot(_.file == victim)))
        val now = LedgerSink.readManifest(dir)
        now.filter(c => Set(victim).subsetOf(c.files.map(_.file).toSet))
          .map(identity)
      }, "rewrite raced a commit that removed its input")
    }
    assert(ex.getMessage.contains("removed its input"))
    // the table still reads consistently (the racing delete's state)
    assert(read(dir).count() == 20 - victimRows)
  }

  test("row-level COW commit aborts when a scanned file was rewritten") {
    val dir = freshDir()
    write(dir, spark.range(0, 10).selectExpr("id"))
    write(dir, spark.range(10, 20).selectExpr("id"), "append")
    val schema = org.apache.spark.sql.types.StructType.fromDDL("id BIGINT")
    val op = new LedgerRowLevelOperation(dir, schema,
      org.apache.spark.sql.connector.write.RowLevelOperation.Command.DELETE)
    // the operation scanned the table's current files...
    val m0 = LedgerSink.readManifest(dir).get
    op.scannedFiles = m0.files.map(_.file)
    op.scannedEntries = m0.files.map(e => (e.file, e.dv))
    // ...then a concurrent OPTIMIZE rewrote them all
    val (b, a) = LedgerMaintenance.optimize(spark, dir.toString)
    assert(a < b)
    val bw = op.newWriteBuilder(null).build().toBatch
    val ex = intercept[ConcurrentModificationException] {
      bw.commit(Array(LedgerCommitMessage(Seq.empty)))
    }
    assert(ex.getMessage.contains("rewrote one of its scanned files"))
    assert(read(dir).count() == 20, "aborted COW must leave the table intact")
  }

  test("COW commit aborts when a racing deleteMoR swapped a scanned file's DV") {
    // the review-caught DV-blind rebase: entry identity must be the
    // (file, dv) PAIR — a deleteMoR changes only the vector, and a
    // name-only check would install replacement files computed from
    // the pre-delete scan, silently resurrecting the deleted rows
    val dir = freshDir()
    write(dir, spark.range(0, 20).selectExpr("id"))
    val schema = org.apache.spark.sql.types.StructType.fromDDL("id BIGINT")
    val op = new LedgerRowLevelOperation(dir, schema,
      org.apache.spark.sql.connector.write.RowLevelOperation.Command.DELETE)
    val m = LedgerSink.readManifest(dir).get
    op.scannedFiles = m.files.map(_.file)
    op.scannedEntries = m.files.map(e => (e.file, e.dv)) // all dv=None
    // the racing MoR delete commits: same file names, new DVs
    val n = LedgerMaintenance.deleteMoR(spark, dir.toString,
      Array(org.apache.spark.sql.sources.LessThan("id", 3L)))
    assert(n == 3)
    val bw = op.newWriteBuilder(null).build().toBatch
    val ex = intercept[ConcurrentModificationException] {
      bw.commit(Array(LedgerCommitMessage(Seq.empty)))
    }
    assert(ex.getMessage.contains("rewrote one of its scanned files"))
    assert(read(dir).count() == 17, "the MoR delete must survive the abort")
  }

  test("append racing a schema-changing commit aborts instead of aliasing") {
    val dir = freshDir()
    write(dir, spark.range(0, 10).selectExpr("id"))
    val schema = org.apache.spark.sql.types.StructType.fromDDL("id BIGINT")
    val stale = new LedgerBatchWrite(dir, schema, truncate = false,
      Seq.empty, Seq.empty)
    val factory = stale.createBatchWriterFactory(null)
    // an overwrite redefines the table (fresh ids, new column) while
    // the stale append is in flight
    write(dir, spark.range(0, 5).selectExpr("id AS renamed", "id * 2 AS extra"))
    val w = factory.createWriter(0, 3L)
    w.write(org.apache.spark.sql.catalyst.InternalRow(77L))
    val msg = w.commit()
    val ex = intercept[ConcurrentModificationException] {
      stale.commit(Array(msg))
    }
    assert(ex.getMessage.contains("schema-, spec- or constraint-changing"))
    assert(read(dir).count() == 5, "aborted append must not land")
  }

  test("concurrent CREATE TABLE: exactly one wins") {
    val cat = new GraftCatalog
    val root = Files.createTempDirectory("ledger_conc_cat")
    cat.initialize("conc_cat", new org.apache.spark.sql.util
      .CaseInsensitiveStringMap(java.util.Map.of("root", root.toString)))
    val ident = org.apache.spark.sql.connector.catalog.Identifier
      .of(Array.empty[String], "t1")
    val schema = org.apache.spark.sql.types.StructType.fromDDL("id BIGINT")
    val results = Seq(Future(
      try { cat.createTable(ident, schema,
        Array.empty[org.apache.spark.sql.connector.expressions.Transform],
        java.util.Map.of()); 1 }
      catch { case _: org.apache.spark.sql.catalyst.analysis
        .TableAlreadyExistsException => 0 }),
      Future(
      try { cat.createTable(ident, schema,
        Array.empty[org.apache.spark.sql.connector.expressions.Transform],
        java.util.Map.of()); 1 }
      catch { case _: org.apache.spark.sql.catalyst.analysis
        .TableAlreadyExistsException => 0 }))
      .map(Await.result(_, 60.seconds))
    assert(results.sum == 1, s"exactly one create must win, got $results")
    assert(cat.tableExists(ident))
  }

  test("vacuum during an uncommitted write keeps its stage; " +
      "commit then succeeds and reads back") {
    val dir = freshDir()
    write(dir, spark.range(0, 10).selectExpr("id"))
    val m = LedgerSink.readManifest(dir).get
    val e = m.files.head
    // An in-flight writer's stage: bytes on disk in _staging that NO
    // manifest references yet (tasks stage before the commit lock).
    // Clone a committed file's bytes so the later commit is a real,
    // decodable table state.
    val rel = "_staging/inflight-part-0-777-0.ledger"
    Files.copy(dir.resolve(e.file), dir.resolve(rel))
    // default-horizon vacuum: unreferenced but YOUNG → kept
    assert(LedgerSink.vacuum(dir).isEmpty,
      "vacuum must not reclaim a staged file younger than the horizon")
    assert(Files.exists(dir.resolve(rel)))
    // the racing writer then commits — its stage is intact, so the
    // commit installs and the rows read back
    LedgerSink.commitRebase(dir,
      cur => cur.map(c => c.copy(files =
        c.files :+ e.copy(file = rel, dv = None, bloom = None))),
      "unexpected conflict"): Unit
    assert(read(dir).count() == 10 + e.rows,
      "the committed stage must read back after the racing vacuum")
    // now referenced: even a zero-horizon vacuum keeps it
    assert(LedgerSink.vacuum(dir, olderThanMillis = 0L).isEmpty)
    // a genuinely old orphan IS reclaimed by the default horizon
    val old = "_staging/inflight-part-0-778-0.ledger"
    Files.copy(dir.resolve(e.file), dir.resolve(old))
    Files.setLastModifiedTime(dir.resolve(old),
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 2 * LedgerSink.DefaultVacuumHorizonMillis))
    assert(LedgerSink.vacuum(dir) == Seq(old),
      "an aged-out orphan must still be reclaimed by default vacuum")
  }
}
