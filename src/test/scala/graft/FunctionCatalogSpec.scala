package graft

/** The FunctionCatalog tier: catalog-served V2 functions resolve from
  * plain SQL, the scalar saturates exactly at its clamp edges, the V2
  * aggregate is partitioning-independent, and bad bindings fail at
  * analysis with the function's own message. */
class FunctionCatalogSpec extends SparkSpec {

  private def installed(): Unit = {
    spark.conf.set("spark.sql.catalog.graft_cat",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_cat.root",
      s"${System.getProperty("java.io.tmpdir")}/graft_catalog_fnspec")
  }

  test("SHOW FUNCTIONS lists the catalog-served functions") {
    installed()
    val fns = spark.sql("SHOW FUNCTIONS IN graft_cat.fns")
      .collect().map(_.getString(0)).toSet
    assert(fns.exists(_.endsWith("hardsig")), s"hardsig missing: $fns")
    assert(fns.exists(_.endsWith("ssq")), s"ssq missing: $fns")
  }

  test("hardsig clamps exactly at both saturation edges") {
    installed()
    val got = spark.sql(
      """SELECT graft_cat.fns.hardsig(x) AS y FROM VALUES
           (CAST(-2048000000 AS BIGINT)), (CAST(-512000000 AS BIGINT)),
           (CAST(0 AS BIGINT)), (CAST(1024 AS BIGINT)),
           (CAST(512000000 AS BIGINT)), (CAST(2048000000 AS BIGINT)) AS t(x)""")
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(0L, 0L, 500000L, 500001L, 1000000L, 1000000L), got)
  }

  test("ssq is exact and partitioning-independent (merge tree varies)") {
    installed()
    spark.range(0, 10000).createOrReplaceTempView("fn_spec_r")
    def run(): Long = spark.sql(
      "SELECT graft_cat.fns.ssq(CAST(id % 100 AS BIGINT)) FROM fn_spec_r")
      .collect().head.getLong(0)
    val expected = (0L until 10000L).map(i => (i % 100) * (i % 100)).sum
    val base = run()
    assert(base == expected)
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "3")
    try assert(run() == expected)
    finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("binding rejects wrong argument types at analysis") {
    installed()
    val e = intercept[Exception] {
      spark.sql("SELECT graft_cat.fns.hardsig('nope')").collect()
    }
    assert(e.getMessage.contains("hardsig expects one BIGINT") ||
      e.getMessage.toLowerCase.contains("cannot resolve"), e.getMessage)
  }

  test("unknown function name raises, existing resolves via functionExists") {
    installed()
    val cat = new graft.sources.GraftCatalog
    cat.initialize("t", new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      java.util.Map.of("root",
        s"${System.getProperty("java.io.tmpdir")}/graft_catalog_fnspec")))
    import org.apache.spark.sql.connector.catalog.Identifier
    assert(cat.functionExists(Identifier.of(Array("fns"), "hardsig")))
    assert(!cat.functionExists(Identifier.of(Array("fns"), "nope")))
    assert(!cat.functionExists(Identifier.of(Array("other"), "hardsig")))
    intercept[Exception] {
      cat.loadFunction(Identifier.of(Array("fns"), "nope"))
    }
  }
}
