package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.sources.{EqualTo, GreaterThanOrEqual, In, IsNull}
import org.apache.spark.sql.connector.read.Batch

/** The round-10 lakehouse tiers of the ledger connector: identity
  * partitioning with manifest-only pruning, field-id column pruning,
  * CDC (version-delta) reads, and OPTIMIZE as a commit kind. Each
  * test drives the public surface (SQL through the catalog plugin or
  * the DataFrame reader) and asserts the PLAN-LEVEL contract through
  * the connector's own planning entry points — fewer files planned,
  * narrower reader schema — not just result values. */
class LedgerLakehouseSpec extends graft.SparkSpec {

  private lazy val root =
    Files.createTempDirectory("graft_lake_spec").toString

  private def init(): Unit = {
    spark.conf.set("spark.sql.catalog.lake_cat", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.lake_cat.root", root)
  }

  private def tableDir(ns: String, t: String) = Paths.get(root, ns, t)

  /** Plan a scan against `dir` with `filters` pushed and return the
    * planned file count (the connector's own pruning verdict). */
  private def plannedFiles(dir: java.nio.file.Path,
      filters: Array[org.apache.spark.sql.sources.Filter]): Int = {
    val m = LedgerSink.readManifest(dir).get
    val b = new LedgerScanBuilder(dir, m.schema)
    b.pushFilters(filters)
    b.build().asInstanceOf[Batch].planInputPartitions().length
  }

  test("partitioned writes record tuples; equality/IN/null predicates prune files") {
    init()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake_cat.pp")
    spark.sql("DROP TABLE IF EXISTS lake_cat.pp.t")
    spark.sql(
      """CREATE TABLE lake_cat.pp.t (k BIGINT, seg STRING, v BIGINT)
         PARTITIONED BY (seg)""")
    spark.sql(
      """INSERT INTO lake_cat.pp.t VALUES
         (1, 'a', 10), (2, 'a', 20), (3, 'b', 30), (4, 'c', 40),
         (5, NULL, 50)""")
    val dir = tableDir("pp", "t")
    val m = LedgerSink.readManifest(dir).get
    // clustered distribution: one file per present partition tuple
    // (a, b, c, NULL), each carrying its tuple
    assert(m.files.forall(_.partVals.isDefined), m.files)
    assert(m.files.map(_.partVals.get).distinct.size == m.files.size,
      s"duplicate partition tuples across files: ${m.files}")
    assert(m.files.size == 4, m.files.map(e => (e.file, e.partVals)))
    assert(plannedFiles(dir, Array(EqualTo("seg", "a"))) == 1)
    assert(plannedFiles(dir, Array(In("seg", Array[Any]("a", "b")))) == 2)
    assert(plannedFiles(dir, Array(IsNull("seg"))) == 1)
    assert(plannedFiles(dir, Array.empty) == 4)
    // values stay exact under the pruned plan
    assert(spark.sql(
      "SELECT sum(v) FROM lake_cat.pp.t WHERE seg = 'a'").head.getLong(0) == 30L)
    assert(spark.sql(
      "SELECT sum(v) FROM lake_cat.pp.t WHERE seg IS NULL").head.getLong(0) == 50L)
    // partition pruning COMPOSES with stats pruning
    assert(plannedFiles(dir,
      Array(EqualTo("seg", "a"), GreaterThanOrEqual("k", 100L))) == 0)
  }

  test("partition-equality DELETE is a metadata delete (whole files dropped)") {
    init()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake_cat.pd")
    spark.sql("DROP TABLE IF EXISTS lake_cat.pd.t")
    spark.sql(
      """CREATE TABLE lake_cat.pd.t (k BIGINT, seg STRING)
         PARTITIONED BY (seg)""")
    spark.sql(
      "INSERT INTO lake_cat.pd.t VALUES (1,'a'), (2,'b'), (3,'b'), (4,'c')")
    val dir = tableDir("pd", "t")
    val before = LedgerSink.readManifest(dir).get.files.map(_.file).toSet
    spark.sql("DELETE FROM lake_cat.pd.t WHERE seg = 'b'")
    val after = LedgerSink.readManifest(dir).get.files
    // the surviving manifest is a SUBSET of the old files: nothing was
    // rewritten, the matching partition's file just left the manifest
    assert(after.map(_.file).toSet.subsetOf(before))
    assert(after.size == before.size - 1)
    assert(spark.sql("SELECT sum(k) FROM lake_cat.pd.t").head.getLong(0) == 5L)
  }

  test("column pruning reaches the reader: positions bind only requested ids") {
    init()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake_cat.cp")
    spark.sql("DROP TABLE IF EXISTS lake_cat.cp.t")
    spark.sql("CREATE TABLE lake_cat.cp.t (a BIGINT, b STRING, c BIGINT, d STRING)")
    spark.sql("INSERT INTO lake_cat.cp.t VALUES (1, 'x', 10, 'p'), (2, 'y', 20, 'q')")
    val dir = tableDir("cp", "t")
    val m = LedgerSink.readManifest(dir).get
    val b = new LedgerScanBuilder(dir, m.schema)
    b.pruneColumns(org.apache.spark.sql.types.StructType(
      m.schema.fields.filter(f => f.name == "c" || f.name == "a")))
    val scan = b.build()
    assert(scan.readSchema().fieldNames.toSeq == Seq("a", "c"),
      "scan must expose exactly the pruned schema")
    val parts = scan.asInstanceOf[Batch].planInputPartitions()
    parts.foreach { p =>
      val fp = p.asInstanceOf[LedgerFilePartition]
      assert(fp.positions.toSeq == Seq(0, 2),
        s"projection must bind a->0, c->2, got ${fp.positions.toSeq}")
    }
    // and through SQL the narrow projection is value-exact
    assert(spark.sql("SELECT sum(c) FROM lake_cat.cp.t").head.getLong(0) == 30L)
  }

  test("CDC reads the appended delta only; non-append ranges are refused") {
    init()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake_cat.cdc")
    spark.sql("DROP TABLE IF EXISTS lake_cat.cdc.t")
    spark.sql("CREATE TABLE lake_cat.cdc.t (k BIGINT)")       // v1
    spark.sql("INSERT INTO lake_cat.cdc.t VALUES (1), (2)")   // v2
    spark.sql("INSERT INTO lake_cat.cdc.t VALUES (3)")        // v3
    spark.sql("INSERT INTO lake_cat.cdc.t VALUES (4), (5)")   // v4
    val dir = tableDir("cdc", "t").toString
    def delta(from: Int, to: Int): Seq[Long] =
      spark.read.format(classOf[LedgerSink].getName)
        .option("path", dir)
        .option("changesFromVersion", from.toString)
        .option("changesToVersion", to.toString)
        .load().collect().map(_.getLong(0)).toSeq.sorted
    assert(delta(2, 3) == Seq(3L))
    assert(delta(2, 4) == Seq(3L, 4L, 5L))
    assert(delta(0, 2) == Seq(1L, 2L))
    assert(delta(3, 3) == Seq.empty)
    // a DELETE makes the range non-append-only: refuse, don't misreport
    spark.sql("DELETE FROM lake_cat.cdc.t WHERE k >= 4")
    val e = intercept[Exception] { delta(4, 5) }
    assert(e.getMessage.contains("non-append"), e.getMessage)
    // ranges entirely before the delete still read fine
    assert(delta(1, 3) == Seq(1L, 2L, 3L))
  }

  test("OPTIMIZE bin-packs within (ids, stats, partition) groups as a versioned commit") {
    init()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake_cat.opt")
    spark.sql("DROP TABLE IF EXISTS lake_cat.opt.t")
    spark.sql(
      """CREATE TABLE lake_cat.opt.t (k BIGINT, seg STRING)
         PARTITIONED BY (seg)""")
    (0 until 6).foreach { i =>
      spark.sql(s"INSERT INTO lake_cat.opt.t VALUES ($i, 'a'), (${i + 100}, 'b')")
    }
    val dir = tableDir("opt", "t")
    val before = LedgerSink.readManifest(dir).get.files
    assert(before.size == 12) // 6 epochs x 2 partitions
    val preVersion = LedgerSink.currentVersion(dir)
    val (nb, na) = LedgerMaintenance.optimize(spark, dir.toString)
    assert((nb, na) == (12, 2), s"expected 12 -> 2 files, got ($nb, $na)")
    val after = LedgerSink.readManifest(dir).get.files
    assert(after.size == 2)
    // partition tuples and merged stats survive the rewrite
    assert(after.flatMap(_.partVals).map(_.head).sorted == Seq("a", "b"))
    val aFile = after.find(_.partVals.exists(_.head == "a")).get
    assert((aFile.min, aFile.max) == (Some(0L), Some(5L)), aFile)
    assert(aFile.rows == 6)
    // data identical; the pre-OPTIMIZE version still readable
    assert(spark.sql("SELECT sum(k), count(*) FROM lake_cat.opt.t")
      .head.toSeq == Seq(630L, 12L))
    assert(spark.sql(
      s"SELECT sum(k), count(*) FROM lake_cat.opt.t VERSION AS OF $preVersion")
      .head.toSeq == Seq(630L, 12L))
    // partition pruning still applies to the compacted files
    assert(plannedFiles(dir, Array(EqualTo("seg", "a"))) == 1)
  }

  test("evolution chain: add -> rename -> drop, every version reads its own schema") {
    init()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake_cat.evo")
    spark.sql("DROP TABLE IF EXISTS lake_cat.evo.t")
    spark.sql("CREATE TABLE lake_cat.evo.t (k BIGINT, name STRING)")  // v1
    spark.sql("INSERT INTO lake_cat.evo.t VALUES (1, 'one'), (2, 'two')") // v2
    spark.sql("ALTER TABLE lake_cat.evo.t ADD COLUMN extra BIGINT")   // v3
    spark.sql("INSERT INTO lake_cat.evo.t VALUES (3, 'three', 30)")   // v4
    spark.sql("ALTER TABLE lake_cat.evo.t RENAME COLUMN name TO label") // v5
    spark.sql("ALTER TABLE lake_cat.evo.t DROP COLUMN extra")         // v6
    // live: rename visible, drop hides extra, OLD files decode by id
    assert(spark.table("lake_cat.evo.t").columns.toSeq == Seq("k", "label"))
    val live = spark.sql(
      "SELECT k, label FROM lake_cat.evo.t ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(live == Seq((1L, "one"), (2L, "two"), (3L, "three")), live)
    // v2: pre-evolution schema and data
    val v2 = spark.sql("SELECT * FROM lake_cat.evo.t VERSION AS OF 2")
    assert(v2.columns.toSeq == Seq("k", "name"))
    assert(v2.count() == 2)
    // v4: extra exists; pre-add rows read NULL, the post-add row its value
    val v4 = spark.sql(
      "SELECT k, extra FROM lake_cat.evo.t VERSION AS OF 4 ORDER BY k")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1))).toSeq
    assert(v4 == Seq((1L, -1L), (2L, -1L), (3L, 30L)), v4)
    // v5: renamed column feeds from both eras' files
    val v5 = spark.sql(
      "SELECT min(label), max(label) FROM lake_cat.evo.t VERSION AS OF 5")
      .head
    assert((v5.getString(0), v5.getString(1)) == ("one", "two"))
    // a fresh id is NEVER a reused one: re-adding a dropped name binds
    // none of the old bytes
    spark.sql("ALTER TABLE lake_cat.evo.t ADD COLUMN extra BIGINT")   // v7
    val readd = spark.sql(
      "SELECT count(extra) FROM lake_cat.evo.t").head.getLong(0)
    assert(readd == 0L,
      s"re-added column must NOT resurrect dropped data, found $readd values")
    // appends after the re-add carry the new id
    spark.sql("INSERT INTO lake_cat.evo.t VALUES (4, 'four', 44)")
    assert(spark.sql("SELECT sum(extra) FROM lake_cat.evo.t")
      .head.getLong(0) == 44L)
  }

  test("dropping a partition column or the last column is refused") {
    init()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake_cat.ref")
    spark.sql("DROP TABLE IF EXISTS lake_cat.ref.t")
    spark.sql(
      """CREATE TABLE lake_cat.ref.t (k BIGINT, seg STRING)
         PARTITIONED BY (seg)""")
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE lake_cat.ref.t DROP COLUMN seg")
    }
    assert(e.getMessage.contains("partition column"), e.getMessage)
    spark.sql("ALTER TABLE lake_cat.ref.t DROP COLUMN k")
    val e2 = intercept[Exception] {
      spark.sql("ALTER TABLE lake_cat.ref.t DROP COLUMN seg")
    }
    assert(e2.getMessage.contains("partition column"), e2.getMessage)
  }
}
