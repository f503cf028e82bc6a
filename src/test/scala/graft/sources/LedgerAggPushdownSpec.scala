package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame

/** Metadata-only aggregate pushdown ([[SupportsPushDownAggregates]]):
  * COUNT(*) / MIN / MAX (globally or grouped by identity partition
  * columns) answered from the manifest with zero data I/O. Pins the
  * honesty boundary explicitly: a deletion vector disables MIN/MAX
  * pushdown (a deleted row may have held the extreme) but not
  * COUNT(*) (sidecar ordinal counts are committed metadata); any
  * residual filter disables the path; answers are identical either
  * way. */
class LedgerAggPushdownSpec extends graft.SparkSpec {

  private val ledger = classOf[LedgerSink].getName

  private def freshDir() = {
    val d = Files.createTempDirectory("ledger_agg_spec")
    Files.delete(d)
    d.toString
  }

  private def pushed(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("graft-ledger-agg")

  test("global count/min/max from the manifest, zero files read") {
    val dir = freshDir()
    spark.range(0, 1000).selectExpr("id", "id * 2 AS v")
      .repartition(4)
      .write.format(ledger).option("path", dir).mode("overwrite").save()
    val df = spark.read.format(ledger).option("path", dir).load()
      .selectExpr("count(*) AS n", "min(id) AS lo", "max(id) AS hi")
    assert(pushed(df), df.queryExecution.executedPlan.toString)
    val r = df.collect().head
    assert(r.getLong(0) == 1000 && r.getLong(1) == 0 && r.getLong(2) == 999)
  }

  test("grouped by identity partition column: one metadata row per group") {
    val dir = freshDir()
    spark.range(0, 300).selectExpr("id", "id % 3 AS p")
      .write.format(ledger).option("path", dir)
      .partitionBy("p").mode("overwrite").save()
    val df = spark.read.format(ledger).option("path", dir).load()
      .groupBy("p").agg(
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.min("id").as("lo"),
        org.apache.spark.sql.functions.max("id").as("hi"))
      .orderBy("p")
    assert(pushed(df), df.queryExecution.executedPlan.toString)
    val rows = df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq == Seq((0L, 100L, 0L, 297L), (1L, 100L, 1L, 298L),
      (2L, 100L, 2L, 299L)), rows.mkString(", "))
  }

  test("deletion vectors: COUNT stays pushed and exact, MIN/MAX refuse") {
    val dir = freshDir()
    spark.range(0, 100).selectExpr("id")
      .write.format(ledger).option("path", dir).mode("overwrite").save()
    LedgerMaintenance.deleteMoR(spark, dir,
      Array(org.apache.spark.sql.sources.LessThan("id", 10L)))
    val cnt = spark.read.format(ledger).option("path", dir).load()
      .selectExpr("count(*) AS n")
    assert(pushed(cnt), "COUNT must stay metadata-answerable under DVs")
    assert(cnt.collect().head.getLong(0) == 90)
    val mn = spark.read.format(ledger).option("path", dir).load()
      .selectExpr("min(id) AS lo")
    assert(!pushed(mn),
      "MIN under a DV must fall back to a real scan — the deleted row " +
        "may have held the extreme")
    assert(mn.collect().head.getLong(0) == 10)
    // the versionAsOf snapshot BEFORE the delete still pushes min/max
    val pre = spark.read.format(ledger).option("path", dir)
      .option("versionAsOf", "1").load()
      .selectExpr("count(*) AS n", "min(id) AS lo")
    assert(pushed(pre))
    val r = pre.collect().head
    assert(r.getLong(0) == 100 && r.getLong(1) == 0)
  }

  test("a residual filter disables the path; answer identical") {
    val dir = freshDir()
    spark.range(0, 1000).selectExpr("id", "id % 7 AS v")
      .write.format(ledger).option("path", dir).mode("overwrite").save()
    val df = spark.read.format(ledger).option("path", dir).load()
      .filter("v = 3").selectExpr("count(*) AS n")
    assert(!pushed(df), "filtered aggregates must read the data")
    assert(df.collect().head.getLong(0) == (0L until 1000L).count(_ % 7 == 3))
  }

  test("empty table: pushed global count is 0, min is null") {
    val dir = freshDir()
    spark.range(0, 1).filter("id < 0").selectExpr("id")
      .write.format(ledger).option("path", dir).mode("overwrite").save()
    val df = spark.read.format(ledger).option("path", dir).load()
      .selectExpr("count(*) AS n", "min(id) AS lo")
    assert(pushed(df))
    val r = df.collect().head
    assert(r.getLong(0) == 0L && r.isNullAt(1))
  }
}
