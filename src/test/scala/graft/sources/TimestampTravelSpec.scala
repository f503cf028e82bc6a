package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.DataFrame

/** TIMESTAMP AS OF below the `dsv2_timestamp_travel` oracle's reach:
  * strictly-monotonic per-table commit clocks (rapid same-millisecond
  * commits still order), Delta's <=-boundary resolution contract,
  * option/SQL-surface equivalence, retention preserving original
  * commit times, and fail-loud behavior before the first commit and
  * on tables without timestamp metadata. */
class TimestampTravelSpec extends graft.SparkSpec {

  private val ledger = classOf[LedgerSink].getName

  private def freshDir() = {
    val d = Files.createTempDirectory("ledger_tsas_spec")
    Files.delete(d)
    d
  }

  private def write(dir: java.nio.file.Path, df: DataFrame,
      mode: String): Unit =
    df.write.format(ledger).option("path", dir.toString).mode(mode).save()

  private def readTs(dir: java.nio.file.Path, ts: Long): DataFrame =
    spark.read.format(ledger).option("path", dir.toString)
      .option("timestampAsOf", ts.toString).load()

  test("commit timestamps are strictly increasing, even within one millisecond") {
    val dir = freshDir()
    // 12 commits as fast as the engine can go — wall-clock WILL
    // collide; the per-table bump must keep them strictly ordered,
    // and the checkpoint roll (at v9) must not disturb the chain
    write(dir, spark.range(0, 5).selectExpr("id"), "overwrite")
    (2 to 12).foreach(i =>
      write(dir, spark.range(i * 10L, i * 10L + 1).selectExpr("id"), "append"))
    val ts = LedgerSink.commitTimestamps(dir)
    assert(ts.map(_._1) == (1 to 12), s"every version needs a timestamp: $ts")
    assert(ts.sliding(2).forall { case Seq((_, a), (_, b)) => a < b },
      s"timestamps must be strictly increasing: $ts")
  }

  test("timestampAsOf resolves on the <= boundary and between commits") {
    val dir = freshDir()
    write(dir, spark.range(0, 10).selectExpr("id"), "overwrite")   // v1
    write(dir, spark.range(10, 30).selectExpr("id"), "append")     // v2
    write(dir, spark.range(30, 35).selectExpr("id"), "append")     // v3
    val ts = LedgerSink.commitTimestamps(dir).toMap
    assert(readTs(dir, ts(1)).count() == 10)      // exact boundary => v1
    assert(readTs(dir, ts(2) - 1).count() == 10)  // just before v2 => v1
    assert(readTs(dir, ts(2)).count() == 30)
    assert(readTs(dir, ts(3) + 3600000L).count() == 35) // future => live
    val e = intercept[IllegalArgumentException](
      readTs(dir, ts(1) - 1).count())
    assert(e.getMessage.contains("before the first recorded commit"))
  }

  test("timestampAsOf equals versionAsOf; string timestamps parse; options conflict") {
    val dir = freshDir()
    write(dir, spark.range(0, 20).selectExpr("id"), "overwrite")
    write(dir, spark.range(20, 25).selectExpr("id"), "append")
    val ts = LedgerSink.commitTimestamps(dir).toMap
    val viaVersion = spark.read.format(ledger).option("path", dir.toString)
      .option("versionAsOf", "1").load()
    assert(readTs(dir, ts(1)).exceptAll(viaVersion).isEmpty &&
      viaVersion.exceptAll(readTs(dir, ts(1))).isEmpty)
    // a formatted local timestamp (how a user would type it) parses
    val fmt = java.time.LocalDateTime.ofInstant(
      java.time.Instant.ofEpochMilli(ts(1)),
      java.time.ZoneId.systemDefault())
      .format(java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss.SSS"))
    assert(spark.read.format(ledger).option("path", dir.toString)
      .option("timestampAsOf", fmt).load().count() == 20)
    val e = intercept[IllegalArgumentException](
      spark.read.format(ledger).option("path", dir.toString)
        .option("versionAsOf", "1")
        .option("timestampAsOf", ts(1).toString).load())
    assert(e.getMessage.contains("conflicting ledger read options"))
  }

  test("SQL TIMESTAMP AS OF through the catalog resolves the snapshot") {
    val root = Files.createTempDirectory("graft_cat_tsas")
    spark.conf.set("spark.sql.catalog.ts_cat", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.ts_cat.root", root.toString)
    try {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS ts_cat.ns")
      spark.sql("CREATE TABLE ts_cat.ns.t (id BIGINT)")
      spark.sql("INSERT INTO ts_cat.ns.t SELECT id FROM range(0, 7)")
      spark.sql("INSERT INTO ts_cat.ns.t SELECT id FROM range(100, 103)")
      val dir = root.resolve("ns").resolve("t")
      val ts = LedgerSink.commitTimestamps(dir).toMap
      // CREATE TABLE commits v1 (empty), the inserts v2 and v3
      def at(millis: Long): Long = {
        val lit = java.sql.Timestamp.from(
          java.time.Instant.ofEpochMilli(millis)).toString
        spark.sql(
          s"SELECT count(*) FROM ts_cat.ns.t TIMESTAMP AS OF '$lit'")
          .collect()(0).getLong(0)
      }
      assert(at(ts(2)) == 7)
      assert(at(ts(3)) == 10)
      assert(spark.sql("SELECT count(*) FROM ts_cat.ns.t VERSION AS OF 2")
        .collect()(0).getLong(0) == 7)
    } finally {
      spark.sql("DROP TABLE IF EXISTS ts_cat.ns.t")
      spark.conf.unset("spark.sql.catalog.ts_cat")
    }
  }

  test("expireOlderThan drops exactly the pre-cutoff history, protecting refs") {
    val dir = freshDir()
    write(dir, spark.range(0, 10).selectExpr("id"), "overwrite")     // v1
    (2 to 5).foreach(i =>
      write(dir, spark.range(i * 10L, i * 10L + 2).selectExpr("id"),
        "append"))                                                   // v2..v5
    val ts = LedgerSink.commitTimestamps(dir).toMap
    LedgerRefs.createTag(dir, "pin", Some(1)): Unit // protects v1
    // cutoff between v3 and v4: v2, v3 expire; v1 survives via the tag
    val expired = LedgerRefs.expireOlderThan(dir, ts(4))
    assert(expired == Seq(2, 3), s"got $expired")
    assert(readTs(dir, ts(4)).count() == 10 + 3 * 2)
    assert(spark.read.format(ledger).option("path", dir.toString)
      .option("tagAsOf", "pin").load().count() == 10)
    val e = intercept[IllegalArgumentException](
      spark.read.format(ledger).option("path", dir.toString)
        .option("versionAsOf", "2").load())
    assert(e.getMessage.contains("no version 2"))
    // CALL surface: a far-future cutoff expires everything unprotected
    val root = Files.createTempDirectory("graft_cat_exp")
    spark.conf.set("spark.sql.catalog.exp_cat", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.exp_cat.root", root.toString)
    try {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS exp_cat.ns")
      spark.sql("CREATE TABLE exp_cat.ns.t (id BIGINT)")
      spark.sql("INSERT INTO exp_cat.ns.t SELECT id FROM range(0, 5)")
      spark.sql("INSERT INTO exp_cat.ns.t SELECT id FROM range(5, 9)")
      val n = spark.sql(
        "CALL exp_cat.sys.expire_older_than('ns.t', '2999-01-01')")
        .collect()(0).getInt(0)
      assert(n == 1, "v1 expires; v2 (newest historical) survives")
      // rollback by instant: v2's exact boundary restores the 5-row state
      val dirT = root.resolve("ns").resolve("t")
      val ts2 = LedgerSink.commitTimestamps(dirT).toMap.apply(2)
      val rb = spark.sql(
        s"CALL exp_cat.sys.rollback_to_timestamp('ns.t', '$ts2')")
        .collect()(0)
      assert(rb.getInt(0) == 2 && rb.getInt(1) == 4)
      assert(spark.sql("SELECT count(*) FROM exp_cat.ns.t")
        .collect()(0).getLong(0) == 5)
    } finally {
      spark.sql("DROP TABLE IF EXISTS exp_cat.ns.t")
      spark.conf.unset("spark.sql.catalog.exp_cat")
    }
  }

  test("retention materializes protected versions with their ORIGINAL clock") {
    val dir = freshDir()
    write(dir, spark.range(0, 10).selectExpr("id"), "overwrite")
    (2 to 6).foreach(i =>
      write(dir, spark.range(i * 10L, i * 10L + 2).selectExpr("id"), "append"))
    val before = LedgerSink.commitTimestamps(dir).toMap
    LedgerRefs.expireVersions(dir, keepLast = 3): Unit
    val after = LedgerSink.commitTimestamps(dir).toMap
    (4 to 6).foreach(v => assert(after(v) == before(v),
      s"v$v's commit time must survive retention"))
    assert(readTs(dir, before(4)).count() == 10 + 3 * 2)
  }

  test("timestampAsOf parses ISO-with-zone and bare dates; garbage names the option") {
    assert(LedgerSink.parseTsMillis("1700000000123") == 1700000000123L)
    assert(LedgerSink.parseTsMillis("1970-01-01T00:00:01Z") == 1000L)
    assert(LedgerSink.parseTsMillis("1970-01-02") ==
      java.time.LocalDate.of(1970, 1, 2)
        .atStartOfDay(java.time.ZoneId.systemDefault())
        .toInstant.toEpochMilli)
    val e = intercept[IllegalArgumentException](
      LedgerSink.parseTsMillis("last tuesday"))
    assert(e.getMessage.contains("timestampAsOf"))
  }

  test("a table without timestamp metadata fails loud on timestampAsOf") {
    val dir = freshDir()
    // forge a LEGACY manifest by hand: no #version header, no #ts
    Files.createDirectories(dir.resolve("_staging"))
    val line = graft.sources.LedgerSink.Manifest(
      org.apache.spark.sql.types.StructType.fromDDL("id BIGINT"),
      Seq(1), 2, Nil, Nil).render
    Files.write(dir.resolve("_MANIFEST"),
      line.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val e = intercept[IllegalArgumentException](
      spark.read.format(ledger).option("path", dir.toString)
        .option("timestampAsOf", "1700000000000").load())
    assert(e.getMessage.contains("no commit-timestamp metadata"))
  }

  test("a timestamp inside an expired history gap fails loud, " +
      "never serves the older surviving snapshot") {
    val dir = freshDir()
    write(dir, spark.range(0, 10).selectExpr("id"), "overwrite")    // v1
    write(dir, spark.range(0, 20).selectExpr("id"), "overwrite")    // v2
    write(dir, spark.range(0, 30).selectExpr("id"), "overwrite")    // v3
    write(dir, spark.range(0, 40).selectExpr("id"), "overwrite")    // v4
    write(dir, spark.range(0, 50).selectExpr("id"), "overwrite")    // v5
    val ts = LedgerSink.commitTimestamps(dir).toMap
    // protect v1 with a tag, then expire: v2+v3 (and their clocks)
    // die (keepLast=1 keeps v4, the newest archive; v1 is tagged),
    // leaving retained versions {1, 4, 5} with a gap at 2-3
    LedgerRefs.createTag(dir, "keep1", Some(1)): Unit
    assert(LedgerRefs.expireVersions(dir, keepLast = 1) == Seq(2, 3))
    // a timestamp that belonged to the expired v2's reign resolves
    // structurally to v1 — whose successor is gone, so the read must
    // refuse instead of silently serving v1's rows
    val e = intercept[IllegalArgumentException](
      readTs(dir, ts(3) - 1).count())
    assert(e.getMessage.contains("expired span"), e.getMessage)
    // timestamps squarely inside retained reigns still resolve
    assert(readTs(dir, ts(4)).count() == 40)
    assert(readTs(dir, ts(5) + 100000).count() == 50)
  }

  test("inferSchema and the scan bind the SAME version for a " +
      "timestamp even when a commit lands in between (memo)") {
    val dir = freshDir()
    write(dir, spark.range(0, 5).selectExpr("id"), "overwrite")     // v1
    // a FUTURE timestamp: resolution depends on what has committed —
    // exactly the case where two independent resolutions can diverge
    val future = System.currentTimeMillis() + 60000
    val first = LedgerSink.versionForTimestampMemo(dir, future)
    write(dir, spark.range(0, 50).selectExpr("id"), "overwrite")    // v2
    // within the memo TTL the paired call must see the SAME version,
    // even though a fresh resolution now answers v2
    assert(LedgerSink.versionForTimestampMemo(dir, future) == first)
    assert(LedgerSink.versionForTimestamp(dir, future) == first + 1)
  }
}
