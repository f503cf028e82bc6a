package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.{Cleaning, Metrics}

/** Pipeline 05 (reference `05_inventory_reconciliation_etl.py`): the
  * old/new inventory generations (a filter fork of one scan, 05:39-45)
  * are deduped, renamed (P8), full-outer joined on the composite key
  * with alias disambiguation and coalesce-merged keys (J4, 05:66-80),
  * then variance / discrepancy / severity / financial impact are
  * derived (05:82-107) with a left join to products on a
  * differently-named key (J5, 05:104-106).
  *
  * Scale notes: the full-outer join cannot broadcast; both sides
  * shuffle on (product_id, date) — the same partitioning as their dedup
  * windows, so the exchanges are reused. A hot (product_id, date) would
  * skew: AQE skew-join splitting is on in the session config
  * (SURVEY §7.4.5).
  */
object InventoryReconciliation {

  /** Tiebreak spans every non-key column: (src_order, src_line) alone
    * can collide inside a (product_id, date) group in the fixture. */
  private def cleanGen(inv: DataFrame, prefix: String): DataFrame =
    Cleaning.dedupByKeyDeterministic(
        Cleaning.requireNonNull(inv, "product_id", "date"),
        Seq("product_id", "date"),
        Seq("src_order", "src_line", "stock_received", "damaged_stock"))
      .withColumnRenamed("stock_received", s"${prefix}_stock_received")
      .withColumnRenamed("damaged_stock", s"${prefix}_damaged_stock")
      .drop("src_order", "src_line")

  def run(invOld: DataFrame, invNew: DataFrame, products: DataFrame): DataFrame = {
    val old = cleanGen(invOld, "old").as("o")
    val nw = cleanGen(invNew, "new").as("n")
    val merged = old
      .join(nw, col("o.product_id") === col("n.product_id")
        && col("o.date") === col("n.date"), "full_outer")
      .select(
        coalesce(col("o.product_id"), col("n.product_id")).as("product_id"),
        coalesce(col("o.date"), col("n.date")).as("date"),
        col("o.old_stock_received"), col("o.old_damaged_stock"),
        col("n.new_stock_received"), col("n.new_damaged_stock"))
      .withColumn("stock_variance",
        Metrics.variance(col("new_stock_received"), col("old_stock_received")))
      .withColumn("damaged_variance",
        Metrics.variance(col("new_damaged_stock"), col("old_damaged_stock")))
      .withColumn("has_discrepancy",
        Metrics.hasDiscrepancy(col("stock_variance"), col("damaged_variance")))
      .withColumn("severity", Metrics.severity(col("stock_variance")))

    val prod = products
      .withColumnRenamed("product_id", "prod_id")
      .select("prod_id", "product_name", "category", "price")

    merged
      .join(prod, merged("product_id") === prod("prod_id"), "left")
      .drop("prod_id")
      .withColumn("financial_impact", Metrics.financialImpact(
        col("stock_variance"), col("damaged_variance"), col("price")))
      .withColumn("year", year(col("date")))
      .withColumn("month", month(col("date")))
  }
}
