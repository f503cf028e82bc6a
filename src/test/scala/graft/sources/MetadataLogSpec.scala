package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame

/** The log-structured manifest layout below the `dsv2_metadata_log`
  * oracle's reach: delta round-trips for every commit kind (replace-
  * in-place, removes, the #full escape hatch RESTORE takes), the
  * checkpoint roll, in-place migration of a legacy full-archive
  * table, and retention materialization. */
class MetadataLogSpec extends graft.SparkSpec {

  private val ledger = classOf[LedgerSink].getName

  private def freshDir() = {
    val d = Files.createTempDirectory("ledger_mlog_spec")
    Files.delete(d)
    d
  }

  private def write(dir: java.nio.file.Path, df: DataFrame,
      mode: String): Unit =
    df.write.format(ledger).option("path", dir.toString).mode(mode).save()

  private def read(dir: java.nio.file.Path, v: Option[Int] = None)
      : DataFrame = {
    val r = spark.read.format(ledger).option("path", dir.toString)
    v.fold(r)(x => r.option("versionAsOf", x.toString)).load()
  }

  test("every commit kind replays byte-exactly through the log") {
    val dir = freshDir()
    write(dir, spark.range(0, 40).selectExpr("id"), "overwrite")    // v1 ckpt
    write(dir, spark.range(40, 60).selectExpr("id"), "append")      // v2 add
    LedgerMaintenance.deleteMoR(spark, dir.toString, Array(
      org.apache.spark.sql.sources.LessThan("id", 5L))): Unit       // v3 replace-in-place (DV)
    LedgerMaintenance.optimize(spark, dir.toString): Unit           // v4 remove+add
    LedgerRefs.restore(dir, 2): Unit                                // v5 remove+re-add
    assert(read(dir).count() == 60)
    assert(read(dir, Some(4)).count() == 55)
    assert(read(dir, Some(3)).count() == 55)
    assert(read(dir, Some(2)).count() == 60)
    assert(read(dir, Some(1)).count() == 40)
    // the replayed head equals a from-scratch parse of its own render
    val m = LedgerSink.readManifest(dir).get
    assert(LedgerSink.Manifest.parse(m.render) == m)
    write(dir, spark.range(100, 110).selectExpr("id"), "append")    // v6
    assert(read(dir).count() == 70)
    assert(read(dir, Some(5)).count() == 60)
    // a commit that REORDERS surviving entries takes the #full escape
    // hatch (no ordinary commit kind does — this is the safety net)
    val head = LedgerSink.readManifest(dir).get
    assert(head.files.length >= 2)
    LedgerSink.writeManifestAtomic(dir, head.copy(files = head.files.reverse))
    val lastLog = dir.resolve(
      LedgerSink.logName(LedgerSink.currentVersion(dir)))
    assert(new String(Files.readAllBytes(lastLog), UTF_8)
      .contains("#full:1"))
    assert(read(dir).count() == 70)
    assert(LedgerSink.readManifest(dir).get.files == head.files.reverse)
  }

  test("checkpoint rolls every CheckpointEvery commits; replay crosses it") {
    val dir = freshDir()
    write(dir, spark.range(0, 10).selectExpr("id"), "overwrite")    // v1
    (1 to 10).foreach(i =>
      write(dir, spark.range(i * 100L, i * 100L + 3).selectExpr("id"),
        "append"))                                                  // v2..v11
    assert(LedgerSink.currentVersion(dir) == 11)
    assert(Files.exists(dir.resolve(LedgerSink.checkpointName(1))),
      "the v1 checkpoint must be preserved on roll")
    val mv = Files.readAllLines(dir.resolve("_MANIFEST"), UTF_8)
      .asScalaHead("#version:")
    assert(mv == Some(9), s"checkpoint should have rolled to v9, got $mv")
    // versions on BOTH sides of the roll replay correctly
    assert(read(dir, Some(5)).count() == 10 + 4 * 3)
    assert(read(dir, Some(10)).count() == 10 + 9 * 3)
    assert(read(dir).count() == 10 + 10 * 3)
  }

  private implicit class HeadOps(lines: java.util.List[String]) {
    def asScalaHead(prefix: String): Option[Int] = {
      val it = lines.iterator()
      while (it.hasNext) {
        val l = it.next()
        if (l.startsWith(prefix))
          return Some(l.stripPrefix(prefix).toInt)
      }
      None
    }
  }

  test("a legacy full-archive table migrates in place on its next commit") {
    val dir = freshDir()
    // forge the legacy layout by hand: full manifests, full archives,
    // no #version header anywhere
    Files.createDirectories(dir.resolve("_staging"))
    def entry(name: String, rows: Seq[Long]): String = {
      Files.write(dir.resolve(s"_staging/$name"),
        rows.map(_.toString).mkString("\n").concat("\n").getBytes(UTF_8)): Unit
      s"_staging/$name\t${rows.length}\t${rows.min}\t${rows.max}\t1\t1\t-"
    }
    val e1 = entry("legacy-a.ledger", Seq(1L, 2L, 3L))
    val e2 = entry("legacy-b.ledger", Seq(10L, 11L))
    Files.write(dir.resolve(LedgerSink.archiveName(1)),
      s"id BIGINT\n#ids:1\n#nextid:2\n$e1".getBytes(UTF_8)): Unit
    Files.write(dir.resolve("_MANIFEST"),
      s"id BIGINT\n#ids:1\n#nextid:2\n$e1\n$e2".getBytes(UTF_8)): Unit
    assert(LedgerSink.currentVersion(dir) == 2)
    assert(read(dir).count() == 5)
    assert(read(dir, Some(1)).count() == 3)
    // the next commit migrates: legacy state archived whole, new state
    // becomes the first versioned checkpoint, and commits after that
    // write log deltas
    write(dir, spark.range(100, 104).selectExpr("id"), "append")    // v3
    assert(Files.exists(dir.resolve(LedgerSink.archiveName(2))))
    assert(read(dir).count() == 9)
    write(dir, spark.range(200, 202).selectExpr("id"), "append")    // v4
    assert(Files.exists(dir.resolve(LedgerSink.logName(4))),
      "post-migration commits must be O(delta) log files")
    assert(read(dir, Some(1)).count() == 3, "legacy archives stay readable")
    assert(read(dir, Some(2)).count() == 5)
    assert(read(dir, Some(3)).count() == 9)
    assert(read(dir).count() == 11)
  }

  test("sixty-commit stress: replay stays exact, metadata stays O(delta)") {
    val dir = freshDir()
    write(dir, spark.range(0, 200).selectExpr("id").repartition(8),
      "overwrite")                                                  // v1
    var expect = 200L
    val probes = scala.collection.mutable.Map.empty[Int, Long]
    (1 to 56).foreach { i =>
      write(dir, spark.range(i * 1000L, i * 1000L + 10).selectExpr("id"),
        "append")
      expect += 10
      if (i % 9 == 0) probes(LedgerSink.currentVersion(dir)) = expect
    }
    LedgerMaintenance.deleteMoR(spark, dir.toString, Array(
      org.apache.spark.sql.sources.LessThan("id", 50L))): Unit      // v58
    expect -= 50
    probes(LedgerSink.currentVersion(dir)) = expect
    LedgerMaintenance.optimize(spark, dir.toString): Unit           // v59
    write(dir, spark.range(1, 4).selectExpr("id + 900000 AS id"),
      "append")                                                     // v60
    expect += 3
    assert(LedgerSink.currentVersion(dir) == 60)
    assert(read(dir).count() == expect)
    // every probe replays exactly, across multiple checkpoint rolls
    probes.foreach { case (v, n) =>
      assert(read(dir, Some(v)).count() == n, s"version $v")
    }
    // ~every CheckpointEvery commits a checkpoint rolled
    val ckpts = (1 to 60).count(v =>
      Files.exists(dir.resolve(LedgerSink.checkpointName(v))))
    assert(ckpts >= 5, s"expected repeated checkpoint rolls, got $ckpts")
    // the metadata-scaling claim: a typical APPEND delta is far
    // smaller than the full state it commits against
    val appendLogs = (30 to 55).filter(v =>
      Files.exists(dir.resolve(LedgerSink.logName(v))))
      .map(v => Files.size(dir.resolve(LedgerSink.logName(v))))
    val fullState = Files.size(dir.resolve("_MANIFEST"))
    assert(appendLogs.nonEmpty &&
      appendLogs.sum / appendLogs.length * 5 < fullState,
      s"append deltas (${appendLogs.sum / appendLogs.length}B avg) " +
        s"should be tiny vs the $fullState-byte state")
    // retention across the whole history still behaves
    assert(LedgerRefs.expireVersions(dir, keepLast = 3).length == 56)
    LedgerSink.vacuum(dir, olderThanMillis = 0L): Unit
    assert(read(dir).count() == expect)
    intercept[IllegalArgumentException] { read(dir, Some(10)).count() }
  }

  test("retention materializes protected versions and drops the log") {
    val dir = freshDir()
    write(dir, spark.range(0, 10).selectExpr("id"), "overwrite")    // v1
    (1 to 4).foreach(i =>
      write(dir, spark.range(i * 100L, i * 100L + 2).selectExpr("id"),
        "append"))                                                  // v2..v5
    LedgerRefs.createTag(dir, "keepme", Some(2)): Unit
    val expired = LedgerRefs.expireVersions(dir, keepLast = 1)
    assert(expired == Seq(1, 3))
    assert(Files.exists(dir.resolve(LedgerSink.checkpointName(2))) &&
      Files.exists(dir.resolve(LedgerSink.checkpointName(4))),
      "protected versions become exact snapshots")
    assert(!Files.exists(dir.resolve(LedgerSink.logName(2))),
      "the log is dropped once history is materialized")
    assert(read(dir, Some(2)).count() == 12)
    assert(read(dir, Some(4)).count() == 16)
    assert(read(dir).count() == 18)
    intercept[IllegalArgumentException] { read(dir, Some(3)).count() }
    // the table keeps committing normally afterwards
    write(dir, spark.range(900, 903).selectExpr("id"), "append")    // v6
    assert(read(dir).count() == 21)
    assert(read(dir, Some(5)).count() == 18)
  }
}
