package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.sources.{EqualTo, Filter, In}

/** Bloom-filter file skipping: per-file sidecar blooms over the first
  * string column prune point predicates min/max stats cannot (an
  * unsorted key's [min,max] spans everything). Pins:
  *   - a point probe plans only the file(s) whose bloom may hold the
  *     value; an absent value plans zero files on this fixture;
  *   - IN-lists probe as a disjunction, conjunctions compose;
  *   - results are exact either way (every filter stays residual —
  *     blooms only over-approximate);
  *   - a deletion vector leaves the bloom conservative (the deleted
  *     value still admits its file; the scan returns nothing);
  *   - OPTIMIZE drops blooms on compacted bins (sound degradation),
  *     and a fresh write regenerates them;
  *   - vacuum never reclaims a referenced sidecar. */
class LedgerBloomSpec extends graft.SparkSpec {

  private val ledger = classOf[LedgerSink].getName

  private def freshDir() = {
    val d = Files.createTempDirectory("ledger_bloom_spec")
    Files.delete(d)
    d.toString
  }

  /** 8 files, each holding one disjoint band of names. */
  private def writeBanded(dir: String): Unit =
    spark.range(0, 800)
      .selectExpr("id", "concat('key_', id) AS name")
      .repartitionByRange(8, org.apache.spark.sql.functions.col("id"))
      .write.format(ledger).option("path", dir).mode("overwrite").save()

  private def plannedFiles(dir: String, filters: Array[Filter]): Int = {
    val m = LedgerSink.readManifest(Paths.get(dir)).get
    val sb = new LedgerScanBuilder(Paths.get(dir), m.schema)
    sb.pushFilters(filters): Unit
    sb.build().toBatch.planInputPartitions().length
  }

  private def read(dir: String): DataFrame =
    spark.read.format(ledger).option("path", dir).load()

  test("point probe plans only the bloom-admitted files; exact rows") {
    val dir = freshDir()
    writeBanded(dir)
    val m = LedgerSink.readManifest(Paths.get(dir)).get
    assert(m.files.length == 8 && m.files.forall(_.bloom.nonEmpty))
    val hit = plannedFiles(dir, Array(EqualTo("name", "key_300")))
    assert(hit >= 1 && hit <= 2, s"expected ~1 admitted file, got $hit")
    assert(plannedFiles(dir, Array(EqualTo("name", "no_such_key"))) == 0)
    // end-to-end: the SQL filter reaches the builder and the plan
    // carries the probe; the answer is exact
    val df = read(dir).filter("name = 'key_300'")
    assert(df.queryExecution.executedPlan.toString.contains("BloomProbe"))
    val rows = df.collect()
    assert(rows.length == 1 && rows.head.getLong(0) == 300L)
    assert(read(dir).filter("name = 'no_such_key'").count() == 0)
  }

  test("IN-lists probe as disjunctions; conjunctions compose") {
    val dir = freshDir()
    writeBanded(dir)
    val in = plannedFiles(dir,
      Array(In("name", Array("key_10", "key_790"))))
    assert(in >= 2 && in <= 3, s"two bands expected, got $in")
    // conjunction of two disjoint point probes: no file holds both
    assert(plannedFiles(dir,
      Array(EqualTo("name", "key_10"), EqualTo("name", "key_790"))) == 0)
    assert(read(dir)
      .filter("name IN ('key_10', 'key_790')").count() == 2)
  }

  test("deletion vectors leave blooms conservative; exact answers") {
    val dir = freshDir()
    writeBanded(dir)
    LedgerMaintenance.deleteMoR(spark, dir,
      Array(EqualTo("name", "key_300")))
    // the file is still admitted (the bloom remembers the dead value)…
    assert(plannedFiles(dir, Array(EqualTo("name", "key_300"))) >= 1)
    // …but the DV-merging scan returns nothing
    assert(read(dir).filter("name = 'key_300'").count() == 0)
  }

  test("OPTIMIZE drops blooms soundly; a rewrite regenerates them") {
    val dir = freshDir()
    writeBanded(dir)
    LedgerMaintenance.optimize(spark, dir)
    val m = LedgerSink.readManifest(Paths.get(dir)).get
    assert(m.files.forall(_.bloom.isEmpty),
      "compacted bins carry no bloom (concatenation cannot reuse one)")
    // pruning degrades to keep-everything; answers stay exact
    assert(plannedFiles(dir, Array(EqualTo("name", "no_such_key")))
      == m.files.length)
    assert(read(dir).filter("name = 'key_300'").count() == 1)
    // a sorted rewrite goes through the normal writer: blooms return
    LedgerMaintenance.optimizeSorted(spark, dir, 4)
    val m2 = LedgerSink.readManifest(Paths.get(dir)).get
    assert(m2.files.forall(_.bloom.nonEmpty))
    assert(plannedFiles(dir, Array(EqualTo("name", "no_such_key"))) == 0)
  }

  test("vacuum protects referenced sidecars; time travel keeps pruning") {
    val dir = freshDir()
    writeBanded(dir)
    assert(LedgerSink.vacuum(Paths.get(dir), olderThanMillis = 0L).isEmpty)
    // append a second commit; v1 reads still bloom-prune
    spark.range(800, 900).selectExpr("id", "concat('key_', id) AS name")
      .coalesce(1)
      .write.format(ledger).option("path", dir).mode("append").save()
    assert(LedgerSink.vacuum(Paths.get(dir), olderThanMillis = 0L).isEmpty)
    val v1 = spark.read.format(ledger).option("path", dir)
      .option("versionAsOf", "1").load().filter("name = 'key_850'")
    assert(v1.count() == 0, "v1 predates the append")
    assert(read(dir).filter("name = 'key_850'").count() == 1)
  }
}
