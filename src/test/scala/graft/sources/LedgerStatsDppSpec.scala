package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

/** The two optimizer integrations that make ledger tables first-class
  * citizens of Spark's cost model at scale:
  *   - `SupportsReportStatistics`: post-pruning row/byte estimates
  *     from the manifest, so a small ledger DIMENSION auto-broadcasts
  *     with no hint (a stats-less DSv2 relation reports the default
  *     "unknown = huge" size and a 10-row dim would sort-merge-join —
  *     at 100 TB that is the whole difference between moving nothing
  *     and shuffling the fact table);
  *   - `SupportsRuntimeV2Filtering`: dynamic partition pruning — the
  *     dimension's OBSERVED join keys, known only at runtime, narrow
  *     the fact scan's planned files before they are read. */
class LedgerStatsDppSpec extends graft.SparkSpec {

  private val ledger = classOf[LedgerSink].getName

  private def freshDir() = {
    val d = Files.createTempDirectory("ledger_stats_spec")
    Files.delete(d)
    d.toString
  }

  private def write(dir: String, df: DataFrame,
      partitionBy: Seq[String] = Nil, mode: String = "overwrite"): Unit = {
    val w = df.write.format(ledger).option("path", dir).mode(mode)
    (if (partitionBy.isEmpty) w else w.partitionBy(partitionBy: _*)).save()
  }

  private def read(dir: String): DataFrame =
    spark.read.format(ledger).option("path", dir).load()

  test("manifest statistics auto-broadcast a small ledger dimension") {
    val factDir = freshDir()
    val dimDir = freshDir()
    write(factDir, spark.range(0, 20000)
      .selectExpr("id AS k", "id * 3 AS v"))
    write(dimDir, spark.range(0, 8)
      .selectExpr("id AS k", "concat('d', id) AS label"))
    // AQE off: a runtime SMJ→BHJ conversion from observed shuffle
    // sizes would mask the STATIC decision; with it off, only the
    // reported statistics can justify a broadcast
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val j = read(factDir).join(read(dimDir), "k")
      assert(j.count() == 8)
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("BroadcastHashJoin"),
        s"manifest stats did not drive an unhinted broadcast:\n$p")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("dim filter dynamically prunes fact files through a real join") {
    val factDir = freshDir()
    write(factDir, spark.range(0, 2000)
      .selectExpr("id", "id % 10 AS p"), partitionBy = Seq("p"))
    val total = LedgerSink.readManifest(
      java.nio.file.Paths.get(factDir)).get.files.length
    assert(total >= 10)
    // the dim's surviving p-values {3, 7} are only known at runtime
    spark.range(0, 10)
      .selectExpr("id AS p", "CASE WHEN id IN (3, 7) THEN 'hot' " +
        "ELSE 'cold' END AS tag")
      .createOrReplaceTempView("dpp_dim")
    val j = read(factDir)
      .join(spark.table("dpp_dim").filter(col("tag") === "hot"), "p")
      .selectExpr("p", "id")
    val rows = j.collect()
    assert(rows.length == 400)
    assert(rows.forall(r => r.getLong(0) == 3L || r.getLong(0) == 7L))
    // find the ledger scan through AQE's stage wrappers and check DPP
    // actually delivered a runtime filter and the re-planned selection
    // is exactly the two matching partitions' files
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def findScan(p: SparkPlan): Seq[BatchScanExec] =
      p.collect {
        case b: BatchScanExec if b.scan.isInstanceOf[LedgerScan] => Seq(b)
        case a: AdaptiveSparkPlanExec => findScan(a.executedPlan)
        case q: QueryStageExec => findScan(q.plan)
      }.flatten
    val scanExec = findScan(j.queryExecution.executedPlan).headOption
      .getOrElse(fail("no BatchScanExec over LedgerScan in plan"))
    assert(scanExec.runtimeFilters.nonEmpty,
      "DPP inserted no runtime filter for the ledger scan")
    val planned = scanExec.scan.asInstanceOf[LedgerScan]
      .planInputPartitions().map {
        case g: LedgerFileGroupPartition => g.files.length
        case _ => 1
      }.sum
    val want = LedgerSink.readManifest(java.nio.file.Paths.get(factDir))
      .get.files.count(_.partVals.exists(v => v.head == "3" || v.head == "7"))
    assert(planned == want && planned < total,
      s"runtime pruning planned $planned files, expected $want of $total")
  }

  test("a column-pruned scan does not advertise filter attributes it lost") {
    // regression (caught by the bench): Spark's PartitionPruning rule
    // resolves filterAttributes against the scan OUTPUT and fails the
    // whole query when a pruned-out column is advertised — a join that
    // only selects the join key from a stat-column-bearing table must
    // still plan
    val aDir = freshDir()
    val bDir = freshDir()
    write(aDir, spark.range(0, 500)
      .selectExpr("id AS k", "id % 7 AS nk", "id * 5 AS payload"))
    write(bDir, spark.range(0, 7).selectExpr("id AS nk_b", "id * 11 AS w"))
    val j = read(aDir).select("nk") // k (stat col) and payload pruned out
      .join(read(bDir), expr("nk = nk_b"), "full_outer")
      .groupBy("nk_b").count()
    assert(j.collect().length == 7)
  }

  test("runtime IN-set narrows the stats-column envelope") {
    val dir = freshDir()
    // files laid out by key range: 4 appends of disjoint id ranges
    (0 until 4).foreach { i =>
      write(dir, spark.range(i * 1000L, i * 1000L + 1000)
        .selectExpr("id", "id * 2 AS v"), mode = if (i == 0) "overwrite" else "append")
    }
    val m = LedgerSink.readManifest(java.nio.file.Paths.get(dir)).get
    val b = new LedgerScanBuilder(java.nio.file.Paths.get(dir), m.schema)
    val scan = b.build().asInstanceOf[LedgerScan]
    val before = scan.planInputPartitions().length
    // simulate DPP delivering observed keys 2100 and 2900 (one file's
    // range at this layout)
    import org.apache.spark.sql.connector.{expressions => cx}
    scan.filter(Array(new cx.filter.Predicate("IN",
      Array[cx.Expression](cx.Expressions.column("id"),
        cx.Expressions.literal(2100L),
        cx.Expressions.literal(2900L)))))
    val after = scan.planInputPartitions().length
    assert(after < before, s"envelope did not narrow: $after of $before")
    val admitted = LedgerSink.readManifest(java.nio.file.Paths.get(dir))
      .get.files.count(e => e.max.exists(_ >= 2100L) && e.min.exists(_ <= 2900L))
    assert(after == admitted)
  }
}
