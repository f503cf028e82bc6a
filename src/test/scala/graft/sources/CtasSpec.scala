package graft.sources

/** CREATE TABLE AS SELECT / REPLACE TABLE AS SELECT through the
  * catalog plugin — the DDL+DML composition every warehouse migration
  * leans on. Spark drives CTAS on a plain TableCatalog as
  * create-then-append (dropping the table if the write fails); the
  * ledger's atomic manifest commit makes the visible states clean:
  * absent → empty (create) → full (append commit). */
class CtasSpec extends graft.SparkSpec {

  private def init(): Unit = {
    spark.conf.set("spark.sql.catalog.ctas_cat",
      classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.ctas_cat.root",
      s"${System.getProperty("java.io.tmpdir")}/graft_catalog_ctas_spec")
  }

  test("CTAS creates, loads and reads back; RTAS replaces") {
    init()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ctas_cat.cts")
    spark.sql("DROP TABLE IF EXISTS ctas_cat.cts.t")
    spark.sql("CREATE TABLE ctas_cat.cts.t AS " +
      "SELECT id AS k, id * 2 AS v FROM range(10)")
    assert(spark.table("ctas_cat.cts.t").count() == 10)
    assert(spark.sql("SELECT sum(v) FROM ctas_cat.cts.t").head.getLong(0)
      == (0L until 10L).map(_ * 2).sum)
    // CTAS on an existing table refuses
    val e = intercept[Exception](spark.sql(
      "CREATE TABLE ctas_cat.cts.t AS SELECT id FROM range(3)"))
    assert(e.getMessage.toLowerCase.contains("exists"), e.getMessage)
    // RTAS swaps content and schema
    spark.sql("REPLACE TABLE ctas_cat.cts.t AS " +
      "SELECT id AS name_key, CAST(id AS STRING) AS label FROM range(4)")
    assert(spark.table("ctas_cat.cts.t").columns.toSeq ==
      Seq("name_key", "label"))
    assert(spark.table("ctas_cat.cts.t").count() == 4)
    // CTAS with partitioning honors the spec
    spark.sql("DROP TABLE IF EXISTS ctas_cat.cts.p")
    spark.sql("CREATE TABLE ctas_cat.cts.p PARTITIONED BY (p) AS " +
      "SELECT id, id % 3 AS p FROM range(9)")
    val m = LedgerSink.readManifest(java.nio.file.Paths.get(
      s"${System.getProperty("java.io.tmpdir")}/graft_catalog_ctas_spec/cts/p")).get
    assert(m.partitionSpec.nonEmpty, "CTAS must persist the partition spec")
    assert(spark.sql("SELECT count(*) FROM ctas_cat.cts.p WHERE p = 1")
      .head.getLong(0) == 3)
  }
}
