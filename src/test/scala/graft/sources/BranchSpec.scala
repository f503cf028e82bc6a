package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import org.apache.spark.sql.DataFrame

/** Branches ([[LedgerRefs]]) below the `dsv2_branch_ff` oracle's
  * reach: ref-namespace collisions, forking at historical versions,
  * sequential branch appends rebasing onto the branch head,
  * constraint enforcement on branch writes, retention protecting fork
  * points, scope refusals, and fast-forward off a legacy-layout
  * table. */
class BranchSpec extends graft.SparkSpec {

  private val ledger = classOf[LedgerSink].getName

  private def freshDir() = {
    val d = Files.createTempDirectory("ledger_branch_spec")
    Files.delete(d)
    d
  }

  private def write(dir: java.nio.file.Path, df: DataFrame, mode: String,
      branch: Option[String] = None): Unit = {
    val w = df.write.format(ledger).option("path", dir.toString).mode(mode)
    branch.fold(w)(b => w.option("branch", b)).save()
  }

  private def read(dir: java.nio.file.Path, branch: Option[String] = None)
      : DataFrame = {
    val r = spark.read.format(ledger).option("path", dir.toString)
    branch.fold(r)(b => r.option("branch", b)).load()
  }

  test("refs share one namespace; forks may be historical versions") {
    val dir = freshDir()
    write(dir, spark.range(0, 10).selectExpr("id"), "overwrite")   // v1
    write(dir, spark.range(0, 20).selectExpr("id"), "overwrite")   // v2
    LedgerRefs.createTag(dir, "t1"): Unit
    intercept[IllegalStateException] { LedgerRefs.createBranch(dir, "t1") }
    assert(LedgerRefs.createBranch(dir, "old", Some(1)) == 1)
    // the branch sees the FORK state, not the head
    assert(read(dir, Some("old")).count() == 10)
    write(dir, spark.range(100, 105).selectExpr("id"), "append",
      branch = Some("old"))
    assert(read(dir, Some("old")).count() == 15)
    assert(read(dir).count() == 20, "main untouched")
    // fast-forward from a historical fork refuses (main is past it)
    intercept[java.util.ConcurrentModificationException] {
      LedgerRefs.fastForward(dir, "old")
    }
    LedgerRefs.dropBranch(dir, "old")
    intercept[IllegalArgumentException] { LedgerRefs.branchHead(dir, "old") }
  }

  test("sequential branch appends rebase onto the branch head; ff lands all") {
    val dir = freshDir()
    write(dir, spark.range(0, 10).selectExpr("id"), "overwrite")   // v1
    LedgerRefs.createBranch(dir, "b"): Unit
    (1 to 3).foreach(i => write(dir,
      spark.range(i * 100L, i * 100L + 5).selectExpr("id"), "append",
      branch = Some("b")))
    assert(LedgerRefs.branchHead(dir, "b") == 4)
    assert(read(dir, Some("b")).count() == 25)
    assert(LedgerRefs.fastForward(dir, "b") == 4)
    assert(read(dir).count() == 25)
    assert(LedgerSink.currentVersion(dir) == 4)
    // the intermediate branch commits are now MAIN history
    assert(spark.read.format(ledger).option("path", dir.toString)
      .option("versionAsOf", "2").load().count() == 15)
    // overwrite on a branch is refused (append-only staging)
    LedgerRefs.createBranch(dir, "c"): Unit
    val e = intercept[Exception] {
      write(dir, spark.range(0, 3).selectExpr("id"), "overwrite",
        branch = Some("c"))
    }
    assert(e.toString.contains("append-only") ||
      Option(e.getCause).exists(_.toString.contains("append-only")))
    LedgerRefs.dropBranch(dir, "c")
  }

  test("branch writes enforce the table's constraints") {
    val dir = freshDir()
    write(dir, spark.range(0, 10)
      .selectExpr("id",
        "CAST(CASE WHEN id >= 0 THEN id END AS BIGINT) AS v"), "overwrite")
    LedgerConstraints.addCheck(spark, dir.toString, "v_pos", "v >= 0")
    LedgerRefs.createBranch(dir, "b"): Unit
    val ex = intercept[Exception] {
      write(dir, spark.range(0, 3)
        .selectExpr("id", "CAST(-1 AS BIGINT) AS v"), "append",
        branch = Some("b"))
    }
    assert(chain(ex).exists(_.contains("CHECK constraint 'v_pos'")))
    assert(read(dir, Some("b")).count() == 10, "failed branch write is atomic")
  }

  test("retention protects live branches' fork points") {
    val dir = freshDir()
    write(dir, spark.range(0, 10).selectExpr("id"), "overwrite")   // v1
    write(dir, spark.range(0, 12).selectExpr("id"), "overwrite")   // v2
    LedgerRefs.createBranch(dir, "b", Some(2)): Unit
    write(dir, spark.range(50, 55).selectExpr("id"), "append",
      branch = Some("b"))
    write(dir, spark.range(0, 14).selectExpr("id"), "overwrite")   // v3
    write(dir, spark.range(0, 16).selectExpr("id"), "overwrite")   // v4
    assert(LedgerRefs.expireVersions(dir, keepLast = 1) == Seq(1))
    LedgerSink.vacuum(dir, olderThanMillis = 0L): Unit
    // fork v2 was protected (materialized exact), so the branch reads
    assert(read(dir, Some("b")).count() == 17)
    // branch scope refusal: no streaming read of a branch snapshot
    val m = LedgerSink.readManifest(dir).get
    intercept[UnsupportedOperationException] {
      new LedgerScanBuilder(dir, m.schema, branch = Some("b"))
        .build().toMicroBatchStream("unused")
    }
  }

  test("two concurrent branch appends both land on the branch chain") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val dir = freshDir()
    write(dir, spark.range(0, 10).selectExpr("id"), "overwrite")
    LedgerRefs.createBranch(dir, "b"): Unit
    val fs = Seq(
      Future(write(dir, spark.range(100, 130).selectExpr("id"), "append",
        branch = Some("b"))),
      Future(write(dir, spark.range(200, 250).selectExpr("id"), "append",
        branch = Some("b"))))
    fs.foreach(Await.result(_, 120.seconds))
    assert(LedgerRefs.branchHead(dir, "b") == 3,
      "each branch append must be its own branch version")
    val got = read(dir, Some("b")).collect().map(_.getLong(0)).sorted
    val want =
      ((0L until 10L) ++ (100L until 130L) ++ (200L until 250L)).sorted
    assert(got.toSeq == want.toSeq, "one branch append's files vanished")
    assert(read(dir).count() == 10, "main untouched throughout")
    assert(LedgerRefs.fastForward(dir, "b") == 3)
    assert(read(dir).count() == 90)
  }

  test("fast-forward resumes after a crash mid-move; drop deletes stranded logs") {
    val dir = freshDir()
    write(dir, spark.range(0, 10).selectExpr("id"), "overwrite")   // v1
    LedgerRefs.createBranch(dir, "b"): Unit
    (1 to 3).foreach(i => write(dir,
      spark.range(i * 100L, i * 100L + 5).selectExpr("id"), "append",
      branch = Some("b")))
    // simulate the crash: the first branch log already moved to main
    LedgerSink.ensureLogLayout(dir)
    Files.move(dir.resolve(LedgerSink.branchLogName("b", 2)),
      dir.resolve(LedgerSink.logName(2)))
    assert(LedgerSink.currentVersion(dir) == 2)
    // the retry detects the half-done move and completes it
    assert(LedgerRefs.fastForward(dir, "b") == 4)
    assert(read(dir).count() == 25)
    // stranded-log cleanup: forge a gap and drop
    write(dir, spark.range(0, 10).selectExpr("id"), "overwrite")
    LedgerRefs.createBranch(dir, "c"): Unit
    (1 to 2).foreach(i => write(dir,
      spark.range(i * 10L, i * 10L + 2).selectExpr("id"), "append",
      branch = Some("c")))
    val head = LedgerRefs.branchHead(dir, "c")
    Files.delete(dir.resolve(LedgerSink.branchLogName("c", head - 1)))
    LedgerRefs.dropBranch(dir, "c") // must delete the log PAST the gap
    assert(LedgerSink.branchLogVersions(dir, "c").isEmpty,
      "stranded branch logs must not survive a drop")
  }

  test("fast-forward off a legacy full-archive table migrates in place") {
    val dir = freshDir()
    Files.createDirectories(dir.resolve("_staging"))
    Files.write(dir.resolve("_staging/leg.ledger"),
      "1\n2\n3\n".getBytes(UTF_8)): Unit
    Files.write(dir.resolve("_MANIFEST"),
      "id BIGINT\n#ids:1\n#nextid:2\n_staging/leg.ledger\t3\t1\t3\t1\t1\t-"
        .getBytes(UTF_8)): Unit
    assert(LedgerSink.currentVersion(dir) == 1)
    LedgerRefs.createBranch(dir, "b"): Unit
    write(dir, spark.range(10, 14).selectExpr("id"), "append",
      branch = Some("b"))
    assert(read(dir, Some("b")).count() == 7)
    assert(LedgerRefs.fastForward(dir, "b") == 2)
    assert(read(dir).count() == 7,
      "ff onto a legacy table must stamp the layout so logs replay")
    assert(LedgerSink.currentVersion(dir) == 2)
  }

  private def chain(e: Throwable): Seq[String] = {
    val b = Seq.newBuilder[String]
    var cur: Throwable = e
    var n = 0
    while (cur != null && n < 20) {
      if (cur.getMessage != null) b += cur.getMessage
      cur = cur.getCause; n += 1
    }
    b.result()
  }
}
