package graft

import java.sql.Date
import org.apache.spark.sql.functions._
import graft.pipelines.InventoryReconciliation

/** Full-outer + coalesce merge matrix (05:66-90, SURVEY §5.2): rows
  * only-in-old, only-in-new, in-both-equal, in-both-different, with
  * variances crossing the 10/50/100 severity thresholds. */
class InventoryMergeSpec extends SparkSpec {
  import spark.implicits._

  private val d = Date.valueOf("2024-01-15")

  private def inv(rows: (Long, Date, Long, Int, Int, Int)*) =
    rows.toDF("product_id", "date", "src_order", "src_line",
      "stock_received", "damaged_stock")
      .withColumn("src_line", col("src_line").cast("int"))

  private val products = Seq((1L, "p1", "CAT", 10.0), (2L, "p2", "CAT", 10.0),
    (3L, "p3", "CAT", 10.0), (4L, "p4", "CAT", 10.0), (5L, "p5", "CAT", 10.0))
    .toDF("product_id", "product_name", "category", "price")

  test("merge matrix: old-only, new-only, both-equal, both-diff") {
    val old = inv((1L, d, 1L, 1, 100, 5), (3L, d, 2L, 1, 7, 0), (4L, d, 3L, 1, 20, 2))
    val nw = inv((2L, d, 4L, 1, 60, 1), (3L, d, 5L, 1, 7, 0), (4L, d, 6L, 1, 140, 2))
    val out = InventoryReconciliation.run(old, nw, products)
      .select("product_id", "stock_variance", "damaged_variance",
        "has_discrepancy", "severity", "financial_impact")
      .as[(Long, Int, Int, Int, String, Double)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (1L, -100, -5, 1, "High", 100 * 10.0 + 5 * 10.0 * 0.5), // old-only: new coalesces to 0
      (2L, 60, 1, 1, "High", 60 * 10.0 + 1 * 10.0 * 0.5),     // new-only
      (3L, 0, 0, 0, "Low", 0.0),                              // both equal
      (4L, 120, 0, 1, "Critical", 120 * 10.0)))               // both diff, >100
  }

  test("deterministic dedup keeps smallest (src_order, src_line) per key") {
    val old = inv((1L, d, 9L, 2, 50, 0), (1L, d, 2L, 1, 30, 0), (1L, d, 2L, 2, 40, 0))
    val nw = inv((1L, d, 1L, 1, 30, 0))
    val out = InventoryReconciliation.run(old, nw, products)
      .select("stock_variance").as[Int].collect().toSeq
    assert(out == Seq(0)) // survivor old row is (2,1): 30; 30-30=0
  }

  test("product join on renamed key drops prod_id and keeps unmatched products null-priced") {
    val old = inv((99L, d, 1L, 1, 5, 0)) // no product 99 → left join nulls
    val out = InventoryReconciliation.run(old, inv(), products)
    assert(!out.columns.contains("prod_id"))
    val r = out.select("product_name", "financial_impact").first()
    assert(r.isNullAt(0))
    assert(r.getDouble(1) == 0.0) // coalesce(price, 0)
  }
}
