package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Contract for the materialized-rollup optimizer rule: it fires on
  * exactly the covered shape, is answer-preserving, and leaves every
  * non-covered aggregate untouched. */
class RollupRewriteSpec extends SparkSpec {

  private def scansRollup(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collect {
      case lr: LogicalRelation => lr
    }.exists(_.relation match {
      case fs: HadoopFsRelation =>
        fs.location.rootPaths.exists(_.toString.contains("graft_rollup_"))
      case _ => false
    })

  private def covered() = {
    graft.plans.RollupRewrite.ensure(spark, sfTiny)
    spark.read.parquet(s"$sfTiny/lineitem.parquet")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n_rows"),
        sum(expr("CAST(round(l_quantity * 100) AS BIGINT)")).as("sum_qty_c"))
  }

  test("covered aggregate is rewritten to the rollup scan") {
    assert(scansRollup(covered()), "rule did not fire on the covered shape")
  }

  test("rewrite is answer-preserving vs the unrewritten plan") {
    // the filtered twin does NOT match the rule (extra Filter above the
    // scan), so it computes from the raw fact table; a tautological
    // filter makes the relations equal
    graft.plans.RollupRewrite.ensure(spark, sfTiny)
    val raw = spark.read.parquet(s"$sfTiny/lineitem.parquet")
      .filter("l_orderkey IS NOT NULL")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n_rows"),
        sum(expr("CAST(round(l_quantity * 100) AS BIGINT)")).as("sum_qty_c"))
    assert(!scansRollup(raw), "filtered shape must not match the rule")
    val a = covered().orderBy("l_returnflag", "l_linestatus").collect()
    val b = raw.orderBy("l_returnflag", "l_linestatus").collect()
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
  }

  test("non-covered aggregates fall through untouched") {
    graft.plans.RollupRewrite.ensure(spark, sfTiny)
    val avgQ = spark.read.parquet(s"$sfTiny/lineitem.parquet")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(avg("l_quantity").as("m"))
    assert(!scansRollup(avgQ), "avg is not covered; rule must not fire")
    val oneDim = spark.read.parquet(s"$sfTiny/lineitem.parquet")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_rows"))
    assert(!scansRollup(oneDim),
      "grouping set != rollup dims; rule must not fire")
    val distinctAgg = spark.read.parquet(s"$sfTiny/lineitem.parquet")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(countDistinct("l_orderkey").as("n_keys"))
    assert(!scansRollup(distinctAgg), "distinct agg must not be rewritten")
  }

  test("a rewritten base file invalidates the rollup (no stale answers)") {
    // stage a private copy of the fixture so mutating it can't race
    // other suites
    val dir = java.nio.file.Files.createTempDirectory("rollup_stale_").toString
    val src = java.nio.file.Paths.get(s"$sfTiny/lineitem.parquet")
    val dst = java.nio.file.Paths.get(s"$dir/lineitem.parquet")
    java.nio.file.Files.copy(src, dst)
    def coveredHere() = {
      graft.plans.RollupRewrite.ensure(spark, dir)
      spark.read.parquet(dst.toString)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n_rows"))
    }
    assert(scansRollup(coveredHere()), "rule should fire on the fresh copy")
    // simulate an in-process rewrite: a parquet overwrite always lands
    // a new mtime, which is what the fingerprint watches (the file
    // must stay readable — Spark loads the footer when planning)
    java.nio.file.Files.setLastModifiedTime(dst,
      java.nio.file.attribute.FileTime.fromMillis(
        java.nio.file.Files.getLastModifiedTime(dst).toMillis + 10000))
    // the rule must refuse the stale rollup...
    val afterMutation = spark.read.parquet(dst.toString)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n_rows"))
    assert(!scansRollup(afterMutation),
      "stale rollup served an aggregate for a rewritten base file")
    // ...and the next ensure() rebuilds from the current base, after
    // which the rewrite fires again
    assert(scansRollup(coveredHere()), "ensure() did not rebuild after staleness")
  }
}
