package graft.sources

/** The catalog plugin driven entirely through public SQL: DDL
  * lifecycle, INSERT/SELECT through the ledger protocol, rename, and
  * the honest unsupported edges. */
class GraftCatalogSpec extends graft.SparkSpec {

  private lazy val root =
    java.nio.file.Files.createTempDirectory("graft_cat_spec").toString

  private def init(): Unit = {
    spark.conf.set("spark.sql.catalog.spec_cat", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.spec_cat.root", root)
  }

  test("SQL lifecycle: create, insert, select, rename, drop") {
    init()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS spec_cat.ns")
    spark.sql("CREATE TABLE spec_cat.ns.t (k BIGINT, v STRING)")
    spark.sql("INSERT INTO spec_cat.ns.t VALUES (1, 'a'), (2, 'b,%'), (3, NULL)")
    val got = spark.sql("SELECT k, v FROM spec_cat.ns.t ORDER BY k").collect()
    assert(got.map(r => (r.getLong(0), Option(r.getString(1)))).toSeq ===
      Seq((1L, Some("a")), (2L, Some("b,%")), (3L, None)))
    // second INSERT appends through the manifest union
    spark.sql("INSERT INTO spec_cat.ns.t VALUES (4, 'd')")
    assert(spark.sql("SELECT count(*) FROM spec_cat.ns.t").head.getLong(0) === 4L)
    // SHOW TABLES sees it; rename moves it; drop removes it
    assert(spark.sql("SHOW TABLES IN spec_cat.ns").collect()
      .exists(_.getString(1) == "t"))
    // the TO identifier is resolved inside the table's catalog
    spark.sql("ALTER TABLE spec_cat.ns.t RENAME TO ns.t2")
    assert(spark.sql("SELECT count(*) FROM spec_cat.ns.t2").head.getLong(0) === 4L)
    spark.sql("DROP TABLE spec_cat.ns.t2")
    assert(!spark.sql("SHOW TABLES IN spec_cat.ns").collect()
      .exists(_.getString(1) == "t2"))
  }

  test("create refuses unsupported column types; alter is unsupported") {
    init()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS spec_cat.ns2")
    val e = intercept[Exception] {
      spark.sql("CREATE TABLE spec_cat.ns2.bad (k BIGINT, e ARRAY<FLOAT>)")
    }
    assert(e.getMessage.contains("does not support"))
    spark.sql("CREATE TABLE spec_cat.ns2.ok (k BIGINT)")
    val a = intercept[Exception] {
      spark.sql("ALTER TABLE spec_cat.ns2.ok ADD COLUMN x BIGINT")
    }
    assert(a.getMessage.contains("rewrite") || a.getMessage.contains("support"))
  }

  test("metadata delete drops whole files by stats; straddling deletes refuse") {
    init()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS spec_cat.del")
    spark.sql("CREATE TABLE spec_cat.del.t (k BIGINT, v STRING)")
    // two appends with disjoint key ranges → two files with aligned
    // stats boundaries at k = 5000
    spark.range(0, 5000).selectExpr("id AS k", "CAST(id AS STRING) AS v")
      .coalesce(1).writeTo("spec_cat.del.t").append()
    spark.range(5000, 10000).selectExpr("id AS k", "CAST(id AS STRING) AS v")
      .coalesce(1).writeTo("spec_cat.del.t").append()
    assert(spark.sql("SELECT count(*) FROM spec_cat.del.t").head.getLong(0) === 10000L)
    // aligned delete: whole second file disappears from the manifest
    spark.sql("DELETE FROM spec_cat.del.t WHERE k >= 5000")
    val left = spark.sql("SELECT count(*), max(k) FROM spec_cat.del.t").head
    assert((left.getLong(0), left.getLong(1)) === ((5000L, 4999L)))
    // straddling delete cannot be proven whole-file → refused
    val e = intercept[Exception] {
      spark.sql("DELETE FROM spec_cat.del.t WHERE k >= 2500")
    }
    assert(e.getMessage.toLowerCase.contains("delete") ||
      e.getMessage.contains("rewrite"))
    assert(spark.sql("SELECT count(*) FROM spec_cat.del.t").head.getLong(0) === 5000L)
  }

  test("fixture SQL roundtrip groups match the direct scan") {
    val out = CatalogRoundtrip.catalogSqlRoundtrip(spark, sfTiny).collect()
    assert(out.length === 5)
    assert(out.map(_.getLong(1)).sum === 25L)
  }
}
