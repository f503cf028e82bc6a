package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.DataFrame

/** The inspection relations below the `dsv2_metadata_tables` oracle's
  * reach: `.files` / `.history` / `.partitions` / `.refs` resolved
  * through the catalog as plain SQL, content cross-checked against the
  * manifest and the data itself. */
class MetadataTablesSpec extends graft.SparkSpec {

  private val ledger = classOf[LedgerSink].getName

  private def write(dir: java.nio.file.Path, df: DataFrame, mode: String,
      branch: Option[String] = None): Unit = {
    val w = df.write.format(ledger).option("path", dir.toString).mode(mode)
    branch.fold(w)(b => w.option("branch", b)).save()
  }

  // ONE catalog root for the whole suite: Spark caches catalog
  // instances by name, so a second conf.set of meta_cat.root would be
  // silently ignored (see the verify skill's round-11 notes)
  private lazy val catalogRoot: java.nio.file.Path = {
    val root = Files.createTempDirectory("graft_cat_meta")
    spark.conf.set("spark.sql.catalog.meta_cat", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.meta_cat.root", root.toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS meta_cat.ns")
    root
  }

  private def initCatalog(): java.nio.file.Path = catalogRoot

  test("files/partitions/history inspect a partitioned table with DVs") {
    val root = initCatalog()
    try {
      spark.sql("DROP TABLE IF EXISTS meta_cat.ns.pt")
      spark.sql(
        "CREATE TABLE meta_cat.ns.pt (id BIGINT, g BIGINT) PARTITIONED BY (g)")
      spark.range(0, 40).selectExpr("id", "id % 4 AS g")
        .createOrReplaceTempView("meta_pt_src")
      spark.sql("INSERT INTO meta_cat.ns.pt SELECT id, g FROM meta_pt_src")
      val dir = root.resolve("ns").resolve("pt")
      write(dir, spark.range(100, 106)
        .selectExpr("id", "CAST(id % 2 AS BIGINT) AS g"), "append")  // v3
      LedgerMaintenance.deleteMoR(spark, dir.toString, Array(
        org.apache.spark.sql.sources.LessThan("id", 2L))): Unit      // v4
      val f = spark.sql(
        """SELECT file, spec_id, n_physical_rows, partition, dv
           FROM meta_cat.ns.pt.files""").collect()
      assert(f.map(_.getLong(2)).sum == 46, "physical rows include DV lines")
      assert(f.count(!_.isNullAt(4)) > 0, "some file must carry a DV sidecar")
      assert(f.forall(_.getString(3).startsWith("g=")))
      val p = spark.sql(
        """SELECT partition, n_files, n_physical_rows
           FROM meta_cat.ns.pt.partitions ORDER BY partition""").collect()
      assert(p.map(_.getString(0)).toSeq == Seq("g=0", "g=1", "g=2", "g=3"))
      assert(p.map(_.getLong(2)).sum == 46)
      val h = spark.sql(
        """SELECT version, ts_millis, n_dvs, is_current
           FROM meta_cat.ns.pt.history ORDER BY version""").collect()
      assert(h.map(_.getInt(0)).toSeq == Seq(1, 2, 3, 4))
      assert(h.forall(!_.isNullAt(1)), "every version has a timestamp")
      assert(h.sliding(2).forall(w => w(0).getLong(1) < w(1).getLong(1)))
      assert(h.last.getInt(3) == 1 && h.init.forall(_.getInt(3) == 0))
      assert(h.last.getInt(2) > 0, "current version counts its DVs")
      // the live read agrees with physical minus DV-deleted
      assert(spark.sql("SELECT count(*) FROM meta_cat.ns.pt")
        .collect()(0).getLong(0) == 44)
    } finally {
      spark.sql("DROP TABLE IF EXISTS meta_cat.ns.pt")
    }
  }

  test("refs lists tags and branches; unknown tables get no inspection relations") {
    val root = initCatalog()
    try {
      spark.sql("DROP TABLE IF EXISTS meta_cat.ns.t")
      spark.sql("CREATE TABLE meta_cat.ns.t (id BIGINT, g BIGINT)")
      spark.sql("INSERT INTO meta_cat.ns.t SELECT id, id % 3 FROM range(0, 30)")
      val dir = root.resolve("ns").resolve("t")
      LedgerRefs.createTag(dir, "audit"): Unit              // tag at v2
      LedgerRefs.createBranch(dir, "dev"): Unit             // fork at v2
      write(dir, spark.range(500, 503).selectExpr("id", "id % 3 AS g"),
        "append", branch = Some("dev"))                     // branch head v3
      val files = spark.sql(
        "SELECT count(*), sum(n_physical_rows) FROM meta_cat.ns.t.files")
        .collect()(0)
      assert(files.getLong(1) == 30)
      val refs = spark.sql(
        "SELECT name, kind, version, head FROM meta_cat.ns.t.refs ORDER BY name")
        .collect()
      assert(refs.map(r => (r.getString(0), r.getString(1))).toSeq ==
        Seq(("audit", "tag"), ("dev", "branch")))
      assert(refs(0).getInt(2) == 2 && refs(0).isNullAt(3))
      assert(refs(1).getInt(2) == 2 && refs(1).getInt(3) == 3)
      // a missing base table does NOT get inspection relations
      val e = intercept[Exception](
        spark.sql("SELECT * FROM meta_cat.ns.nope.files").collect())
      assert(e.getMessage.toLowerCase.contains("table"))
    } finally {
      spark.sql("DROP TABLE IF EXISTS meta_cat.ns.t")
    }
  }

  test("refs resolve in SQL: tag/branch names in VERSION AS OF, branch_/tag_ identifiers") {
    val root = initCatalog()
    try {
      spark.sql("DROP TABLE IF EXISTS meta_cat.ns.r")
      spark.sql("CREATE TABLE meta_cat.ns.r (id BIGINT)")
      spark.sql("INSERT INTO meta_cat.ns.r SELECT id FROM range(0, 10)")  // v2
      val dir = root.resolve("ns").resolve("r")
      LedgerRefs.createTag(dir, "audit"): Unit                       // at v2
      LedgerRefs.createBranch(dir, "dev"): Unit                      // fork v2
      spark.sql("INSERT INTO meta_cat.ns.r SELECT id FROM range(50, 53)") // v3
      def count(sql: String): Long = spark.sql(sql).collect()(0).getLong(0)
      // tag name in VERSION AS OF reads its target snapshot
      assert(count("SELECT count(*) FROM meta_cat.ns.r VERSION AS OF 'audit'") == 10)
      // branch name in VERSION AS OF reads the branch head (still at fork)
      assert(count("SELECT count(*) FROM meta_cat.ns.r VERSION AS OF 'dev'") == 10)
      // tag_/branch_ identifiers resolve the same states
      assert(count("SELECT count(*) FROM meta_cat.ns.r.tag_audit") == 10)
      assert(count("SELECT count(*) FROM meta_cat.ns.r.branch_dev") == 10)
      // INSERT INTO the branch identifier appends to the BRANCH only
      spark.sql("INSERT INTO meta_cat.ns.r.branch_dev SELECT id FROM range(100, 104)")
      assert(count("SELECT count(*) FROM meta_cat.ns.r.branch_dev") == 14)
      assert(count("SELECT count(*) FROM meta_cat.ns.r") == 13,
        "main must not see branch appends")
      // an unknown ref fails loud
      val e = intercept[Exception](
        spark.sql("SELECT * FROM meta_cat.ns.r VERSION AS OF 'nope'").collect())
      assert(e.getMessage.contains("neither a version number nor a tag/branch"))
      // a tag snapshot refuses writes
      val e2 = intercept[Exception](
        spark.sql("INSERT INTO meta_cat.ns.r.tag_audit SELECT id FROM range(0, 1)"))
      assert(e2.getMessage.toLowerCase.contains("snapshot"))
    } finally {
      spark.sql("DROP TABLE IF EXISTS meta_cat.ns.r")
    }
  }
}
