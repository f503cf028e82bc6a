package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualTo, GreaterThanOrEqual, LessThan}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Contracts of the DSv2 connector: losslessness of the pushdown
  * clamp, filter-pushdown-as-partition-pruning, column pruning into
  * the reader's schema, residual re-evaluation safety, and
  * post-pushdown statistics. */
class SyntheticSourceSpec extends graft.SparkSpec {

  private def read(rows: Long, slices: Int): DataFrame =
    spark.read.format(classOf[SyntheticSource].getName)
      .option("rows", rows.toString).option("slices", slices.toString).load()

  private def scanOf(df: DataFrame): BatchScanExec =
    df.queryExecution.executedPlan.collectFirst { case b: BatchScanExec => b }
      .getOrElse(fail("no BatchScanExec in plan"))

  test("full scan equals the in-JVM generator") {
    val got = read(1000, 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1)
    val want = (0L until 1000L).map { id =>
      val v = SyntheticSource.lcg(id)
      (id, v, v % 9973L, "c" + (v % 23L))
    }
    assert(got.toSeq === want)
  }

  test("id-range pushdown clamps planned partitions") {
    // point lookup → one partition; contradiction → zero partitions
    val point = scanOf(read(1000, 8).where(col("id") === 123L))
    assert(point.inputRDD.getNumPartitions === 1)
    val none = scanOf(read(1000, 8).where(col("id") >= 5000L))
    assert(none.inputRDD.getNumPartitions === 0)
    // and the clamp is lossless at both boundaries
    val edge = read(1000, 8).where(col("id") >= 998L).select("id").collect()
      .map(_.getLong(0)).sorted
    assert(edge.toSeq === Seq(998L, 999L))
  }

  test("column pruning reaches the reader schema") {
    val pruned = scanOf(read(1000, 8).select("category"))
    assert(pruned.scan.readSchema().fieldNames.toSeq === Seq("category"))
    // zero-column scan (count) still enumerates every row
    assert(read(1000, 8).count() === 1000L)
  }

  test("non-pushable residuals stay exact") {
    val got = read(1000, 8).where(col("value") % 7L === 0L).count()
    val want = (0L until 1000L).count(id => SyntheticSource.lcg(id) % 7L == 0L)
    assert(got === want.toLong)
  }

  test("statistics reflect the post-pushdown range") {
    val b = new SyntheticScanBuilder(1000000L, 32)
    b.pushFilters(Array(GreaterThanOrEqual("id", 250000L), LessThan("id", 750000L)))
    val stats = b.build().asInstanceOf[SyntheticScan].estimateStatistics()
    assert(stats.numRows().getAsLong === 500000L)
    val eq = new SyntheticScanBuilder(1000000L, 32)
    eq.pushFilters(Array(EqualTo("id", 42L)))
    assert(eq.build().asInstanceOf[SyntheticScan]
      .estimateStatistics().numRows().getAsLong === 1L)
  }

  test("runtime IN-filter narrows the planned partition envelope") {
    val b = new SyntheticScanBuilder(1000000L, 32)
    val scan = b.build().asInstanceOf[SyntheticScan]
    assert(scan.planInputPartitions().length === 32)
    import org.apache.spark.sql.connector.expressions.Expressions
    import org.apache.spark.sql.connector.expressions.filter.Predicate
    val in = new Predicate("IN", Array(
      Expressions.column("id"),
      Expressions.literal(777000L), Expressions.literal(777003L)))
    scan.filter(Array(in))
    val parts = scan.planInputPartitions()
      .map(_.asInstanceOf[SyntheticPartition])
    assert(parts.map(_.start).min === 777000L)
    assert(parts.map(_.end).max === 777004L)
    // and a mismatched-column IN must not narrow anything
    val other = new Predicate("IN", Array(
      Expressions.column("value"), Expressions.literal(1L)))
    val fresh = new SyntheticScanBuilder(1000L, 8).build().asInstanceOf[SyntheticScan]
    fresh.filter(Array(other))
    assert(fresh.planInputPartitions().length === 8)
  }

  test("dynamic partition pruning reaches the v2 scan in a real join") {
    val df = SyntheticSource.runtimePrunedJoin(spark, sfTiny)
    val rows = df.collect()
    assert(rows.length === 5) // five nations in region 2
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    // AQE wraps materialized stages in leaf QueryStageExec nodes, so a
    // plain collect never reaches the scan — recurse through them.
    def findScan(p: SparkPlan): Seq[BatchScanExec] =
      p.collect {
        case b: BatchScanExec if b.scan.isInstanceOf[SyntheticScan] => Seq(b)
        case a: AdaptiveSparkPlanExec => findScan(a.executedPlan)
        case q: QueryStageExec => findScan(q.plan)
      }.flatten
    val scan = findScan(df.queryExecution.executedPlan).headOption
      .getOrElse(fail("no BatchScanExec over SyntheticScan in plan"))
    assert(scan.runtimeFilters.nonEmpty,
      "DPP inserted no runtime filter for the v2 scan")
    // collect() above already forced filteredPartitions, so the
    // scan's runtime bounds are applied: the re-planned envelope must
    // be strictly inside [0, 1e6) on both ends (region-2 nation keys
    // start well above 0 and end well below the table max)
    val parts = scan.scan.asInstanceOf[SyntheticScan].planInputPartitions()
      .map(_.asInstanceOf[SyntheticPartition])
    assert(parts.nonEmpty)
    assert(parts.map(_.start).min > 0L, "low bound not narrowed")
    assert(parts.map(_.end).max < 1000000L, "high bound not narrowed")
  }

  test("columnar batches equal the row path and plan a ColumnarToRow boundary") {
    val vec = read(10000, 8) // columnar by default, like parquet
    val row = spark.read.format(classOf[SyntheticSource].getName)
      .option("rows", "10000").option("slices", "8")
      .option("columnar", "false").load()
    assert(vec.queryExecution.executedPlan.toString.contains("ColumnarToRow"),
      "vectorized scan did not plan a columnar boundary")
    assert(!row.queryExecution.executedPlan.toString.contains("ColumnarToRow"))
    val a = vec.collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    val b = row.collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    assert(a.toSeq === b.toSeq)
    // batch boundaries: 10000 rows / 8 slices = 1250/partition — not a
    // multiple of 4096, so the last-batch partial-fill path is on; and
    // a pruned single column survives batching
    assert(vec.select("category").distinct().count() === 23L)
  }

  test("count/min/max push down completely and never enumerate the range") {
    val df = read(1000000, 64)
      .where(col("id") >= 100L && col("id") < 900L)
      .agg(count(lit(1)).as("n"), min("id").as("lo"), max("id").as("hi"))
    assert(df.queryExecution.executedPlan.toString.contains("PushedAggregates"),
      "aggregate did not push into the scan")
    val r = df.collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((800L, 100L, 899L)))
    // empty range: count 0, NULL extrema — SQL semantics preserved
    val e = read(1000, 8).where(col("id") >= 5000L)
      .agg(count(lit(1)), min("id"), max("id")).collect().head
    assert(e.getLong(0) === 0L && e.isNullAt(1) && e.isNullAt(2))
  }

  test("one unanswerable aggregate refuses the whole pushdown") {
    val df = read(1000, 8)
      .agg(count(lit(1)).as("n"), min("value").as("mv"))
    assert(!df.queryExecution.executedPlan.toString.contains("PushedAggregates"))
    val r = df.collect().head
    val wantMin = (0L until 1000L).map(SyntheticSource.lcg).min
    assert((r.getLong(0), r.getLong(1)) === ((1000L, wantMin)))
  }

  test("limit and top-n by id clamp the range; other sort keys refuse") {
    // LIMIT: the first n ids of the surviving range
    val lim = read(1000000, 64).where(col("id") >= 500L).limit(5)
    val scanL = scanOf(lim)
    assert(scanL.scan.description().contains("[500, 505)"))
    assert(lim.collect().map(_.getLong(0)).sorted.toSeq ===
      (500L to 504L).toSeq)
    // ORDER BY id DESC LIMIT n: the last n ids
    val top = read(1000, 8).orderBy(col("id").desc).limit(3)
    assert(scanOf(top).scan.description().contains("[997, 1000)"))
    assert(top.collect().map(_.getLong(0)).toSeq === Seq(999L, 998L, 997L))
    // a value-ordered top-n must NOT clamp (generation order proves
    // nothing about value order) — result must still be exact
    val byValue = read(1000, 8).orderBy(col("value").desc).limit(1)
    assert(scanOf(byValue).scan.description().contains("[0, 1000)"))
    val wantMax = (0L until 1000L).map(SyntheticSource.lcg).max
    assert(byValue.collect().head.getLong(1) === wantMax)
  }

  test("unknown option defaults and scan description carry the contract") {
    val provider = new SyntheticSource
    val t = provider.getTable(
      SyntheticSource.schema, Array.empty,
      new CaseInsensitiveStringMap(java.util.Map.of("rows", "10")).asCaseSensitiveMap())
    val scan = t.asInstanceOf[SyntheticTable]
      .newScanBuilder(CaseInsensitiveStringMap.empty()).build()
    assert(scan.description().contains("[0, 10)"))
  }
}
