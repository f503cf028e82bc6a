package graft.sources

/** The SQL CALL surface ([[GraftProcedures]]): every lifecycle
  * operation reachable from plain SQL through the catalog, returning
  * the underlying operation's result row. */
class ProcedureSpec extends graft.SparkSpec {

  private lazy val root: String = {
    // a DEDICATED catalog name: Spark caches catalog instances per name,
    // so sharing graft_cat with parallel suites would bind whichever
    // root won the race while this spec reads paths under its own
    spark.conf.set("spark.sql.catalog.graft_proc",
      classOf[GraftCatalog].getName)
    val r = s"${System.getProperty("java.io.tmpdir")}/graft_catalog_proc"
    spark.conf.set("spark.sql.catalog.graft_proc.root", r)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_proc.pr")
    r
  }

  private def fresh(name: String): String = {
    root: Unit
    spark.sql(s"DROP TABLE IF EXISTS graft_proc.pr.$name")
    spark.sql(s"CREATE TABLE graft_proc.pr.$name (id BIGINT, v BIGINT)")
    spark.sql(s"INSERT INTO graft_proc.pr.$name " +
      "SELECT id, id * 10 FROM range(50)")
    s"graft_proc.pr.$name"
  }

  private def one(sql: String): org.apache.spark.sql.Row =
    spark.sql(sql).collect()(0)

  test("rollback, tag, expire and vacuum through CALL") {
    val t = fresh("life") // v1 create, v2 insert
    spark.sql(s"INSERT INTO $t SELECT id, id FROM range(100, 120)") // v3
    assert(spark.table(t).count() == 70)
    assert(one(s"CALL graft_proc.sys.create_tag('pr.life', 'keep', 3)")
      .getInt(0) == 3)
    assert(one(s"CALL graft_proc.sys.rollback('pr.life', 2)")
      .getInt(0) == 4)
    assert(spark.table(t).count() == 50)
    val exp = one(s"CALL graft_proc.sys.expire_versions('pr.life', 1)")
    assert(exp.getInt(0) == 2, s"v1+v2 expire (v3 tagged): $exp")
    one(s"CALL graft_proc.sys.vacuum('pr.life')"): Unit
    // the tagged version still reads after retention
    assert(spark.read.format(classOf[LedgerSink].getName)
      .option("path", s"$root/pr/life").option("tagAsOf", "keep")
      .load().count() == 70)
  }

  test("remove_orphan_files: explicit horizon through CALL") {
    val t = fresh("rof")
    val dir = java.nio.file.Paths.get(s"$root/pr/rof")
    // a young orphan: plain vacuum (default horizon) keeps it — it
    // looks exactly like an in-flight writer's stage
    val orphan = dir.resolve("_staging/orphan-part-0-1-0.ledger")
    java.nio.file.Files.write(orphan, "1|1\n".getBytes("UTF-8"))
    assert(one(s"CALL graft_proc.sys.vacuum('pr.rof')").getInt(0) == 0)
    assert(java.nio.file.Files.exists(orphan))
    // remove_orphan_files with older_than = the future reclaims it
    // (Iceberg semantics: files modified BEFORE the instant go)
    val future = System.currentTimeMillis() + 60000
    assert(one(
      s"CALL graft_proc.sys.remove_orphan_files('pr.rof', '$future')")
      .getInt(0) == 1)
    assert(!java.nio.file.Files.exists(orphan))
    assert(spark.table(t).count() == 50, "live data untouched")
  }

  test("optimize and constraints through CALL") {
    val t = fresh("opt")
    (1 to 3).foreach(i => spark.sql(
      s"INSERT INTO $t SELECT id, id FROM range(${i * 100}, ${i * 100 + 5})"))
    val r = one(s"CALL graft_proc.sys.optimize('pr.opt')")
    assert(r.getInt(1) < r.getInt(0), s"should compact: $r")
    assert(spark.table(t).count() == 65)
    assert(one(s"CALL graft_proc.sys.add_check('pr.opt', 'vbound', 'v >= 0')")
      .getInt(0) == 1)
    val ex = intercept[Exception] {
      spark.sql(s"INSERT INTO $t VALUES (9999, -5)")
    }
    assert(exChain(ex).exists(_.contains("CHECK constraint 'vbound'")))
    one(s"CALL graft_proc.sys.drop_check('pr.opt', 'vbound')"): Unit
    spark.sql(s"INSERT INTO $t VALUES (9999, -5)")
    assert(spark.table(t).count() == 66)
  }

  test("equality-delete surface through CALL: delete_by_keys and upsert_by_keys") {
    val t = fresh("eqd") // v1 create, v2 insert: ids 0..49, v = id*10
    spark.range(0, 10).selectExpr("id")
      .createOrReplaceTempView("proc_eqd_keys")
    assert(one(s"CALL graft_proc.sys.delete_by_keys('pr.eqd', 'id', " +
      "'proc_eqd_keys')").getLong(0) == 10)
    assert(spark.table(t).count() == 40)
    spark.range(5, 8).selectExpr("id", "CAST(999 AS BIGINT) AS v")
      .createOrReplaceTempView("proc_eqd_rows")
    val r = one(s"CALL graft_proc.sys.upsert_by_keys('pr.eqd', 'id', " +
      "'proc_eqd_rows')")
    assert(r.getLong(0) == 3 && r.getLong(1) == 3)
    assert(spark.table(t).count() == 43)
    assert(spark.table(t).filter("v = 999").count() == 3)
  }

  test("branch lifecycle through CALL") {
    val t = fresh("br")
    val fork = one(s"CALL graft_proc.sys.create_branch('pr.br', 'stage')")
      .getInt(0)
    spark.range(500, 510).selectExpr("id", "id AS v")
      .write.format(classOf[LedgerSink].getName)
      .option("path", s"$root/pr/br").option("branch", "stage")
      .mode("append").save()
    assert(spark.table(t).count() == 50, "main untouched")
    assert(one(s"CALL graft_proc.sys.fast_forward('pr.br', 'stage')")
      .getInt(0) == fork + 1)
    assert(spark.table(t).count() == 60)
    // unknown procedure fails with the available list
    val e = intercept[Exception] {
      spark.sql("CALL graft_proc.sys.no_such_proc('x')")
    }
    assert(e.getMessage.contains("no_such_proc"))
    // DESCRIBE HISTORY analogue: one row per readable version
    val hist = spark.sql(s"CALL graft_proc.sys.history('pr.br')")
      .collect().map(r => (r.getInt(0), r.getLong(2), r.getInt(4)))
    assert(hist.map(_._1).toSeq == hist.map(_._1).toSeq.sorted)
    assert(hist.last._2 == 60 && hist.last._3 == 1,
      s"current version row should carry the live row count: ${hist.toSeq}")
    assert(hist.count(_._3 == 1) == 1)
  }

  private def exChain(e: Throwable): Seq[String] = {
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
