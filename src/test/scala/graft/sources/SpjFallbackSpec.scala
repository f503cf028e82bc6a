package graft.sources

import org.apache.spark.sql.functions._

/** The storage-partitioned-join grouping is an OPT-IN plan shape, not
  * a semantics change: with v2 bucketing disabled the scan must plan
  * per-file (the pre-round-10 contract every other gate was built
  * on), and the join answer must be identical either way. */
class SpjFallbackSpec extends graft.SparkSpec {

  private val bucketingConf = "spark.sql.sources.v2.bucketing.enabled"

  test("bucketing off → per-file planning; answers identical either way") {
    spark.conf.set("spark.sql.catalog.spjfb", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.spjfb.root",
      java.nio.file.Files.createTempDirectory("spj_fb").toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS spjfb.t")
    spark.sql("CREATE TABLE spjfb.t.a (k BIGINT, p BIGINT) PARTITIONED BY (p)")
    spark.sql("CREATE TABLE spjfb.t.b (v BIGINT, q BIGINT) PARTITIONED BY (q)")
    spark.sql("INSERT INTO spjfb.t.a SELECT id, id % 3 FROM range(0, 30)")
    spark.sql("INSERT INTO spjfb.t.b SELECT id * 10, id % 4 FROM range(0, 20)")

    def planned(): Int = {
      val dir = java.nio.file.Paths.get(
        spark.conf.get("spark.sql.catalog.spjfb.root"), "t", "a")
      val m = LedgerSink.readManifest(dir).get
      new LedgerScanBuilder(dir, m.schema).build()
        .asInstanceOf[org.apache.spark.sql.connector.read.Batch]
        .planInputPartitions().length
    }
    def answer(): Seq[(Long, Long, Long)] =
      spark.table("spjfb.t.a")
        .join(spark.table("spjfb.t.b"), expr("p = q"), "full_outer")
        .groupBy(expr("coalesce(p, q)").as("part"))
        .agg(count(col("k")).as("nk"), count(col("v")).as("nv"))
        .orderBy("part")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

    val prev = spark.conf.get(bucketingConf, "true")
    try {
      spark.conf.set(bucketingConf, "true")
      val grouped = planned()
      val withSpj = answer()
      spark.conf.set(bucketingConf, "false")
      val perFile = planned()
      val withoutSpj = answer()
      // table a: 3 partition values; the INSERT's clustered
      // distribution gives one file per value, so grouped == 3; the
      // per-file fallback must see at least as many partitions and
      // never fewer
      assert(grouped == 3, s"expected 3 key groups, got $grouped")
      assert(perFile >= grouped, s"per-file $perFile < grouped $grouped")
      assert(withSpj == withoutSpj && withSpj.nonEmpty,
        "join answer differs between SPJ and fallback planning")
    } finally spark.conf.set(bucketingConf, prev)
  }
}
