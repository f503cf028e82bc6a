package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.io.{Readers, Writers}
import graft.orchestrate.Orchestrator
import graft.pipelines.InventoryReconciliation
import graft.schema.Schemas

/** The reference's actual ingest shape, end to end: raw CSVs with
  * headers → explicit-schema read (S1) with file provenance (S5) →
  * generation split via negated contains (P6, 05:39-45) → pipeline →
  * partitioned parquet write → read-back. Also drives the orchestrator
  * routing into a real pipeline run.
  */
class CsvEndToEndSpec extends SparkSpec {
  import spark.implicits._

  test("inventory CSVs: provenance split, reconciliation, partitioned write") {
    val raw = Files.createTempDirectory("graft_csv").toString
    Files.writeString(java.nio.file.Path.of(raw, "inventory_batch1.csv"),
      "product_id,date,stock_received,damaged_stock\n" +
        "p1,2024-01-10,100,5\np2,2024-01-10,50,0\n")
    Files.writeString(java.nio.file.Path.of(raw, "inventoryNew_batch1.csv"),
      "product_id,date,stock_received,damaged_stock\n" +
        "p1,2024-01-10,80,5\np3,2024-01-10,30,1\n")

    val all = Readers.csvWithProvenance(spark, Schemas.inventory, s"$raw/*.csv")
      .withColumn("date", to_date(col("date")))
      .withColumn("src_order", lit(0L)).withColumn("src_line", lit(0))
    // P6: the reference's filename-substring generation split (05:39-45)
    val old = all.filter(!col("source_file").contains("inventoryNew")).drop("source_file")
    val nw = all.filter(col("source_file").contains("inventoryNew")).drop("source_file")
    assert(old.count() == 2 && nw.count() == 2)

    val products = Seq(("p1", "P1", "CAT", 2.0), ("p2", "P2", "CAT", 4.0), ("p3", "P3", "CAT", 8.0))
      .toDF("product_id", "product_name", "category", "price")
    val recon = InventoryReconciliation.run(old, nw, products)
    val byId = recon.select("product_id", "stock_variance", "has_discrepancy", "severity")
      .as[(String, Int, Int, String)].collect().map(r => r._1 -> r).toMap
    assert(byId("p1") == (("p1", -20, 1, "Medium"))) // both gens
    assert(byId("p2") == (("p2", -50, 1, "Medium"))) // old-only
    assert(byId("p3") == (("p3", 30, 1, "Medium")))  // new-only

    val out = Files.createTempDirectory("graft_csv_out").toString
    Writers.processed(recon, out, Seq("year", "month"))
    val back = spark.read.parquet(out)
    assert(back.count() == 3)
    assert(new java.io.File(s"$out/year=2024/month=1").isDirectory)
  }

  test("orchestrator routes an inventory drop to the reconciliation pipeline only") {
    val ran = scala.collection.mutable.ArrayBuffer.empty[Orchestrator.Job]
    Orchestrator.run("raw/inventory/inventoryNew_batch1.csv")(ran += _)
    assert(ran.toSeq == Seq(Orchestrator.InventoryReconciliation))
  }
}
