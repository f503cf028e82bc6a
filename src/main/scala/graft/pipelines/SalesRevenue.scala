package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.{Cleaning, Metrics}

/** Pipeline 01 (reference `01_sales_revenue_etl.py`, also the
  * byte-identical `02_*` — SURVEY §0.1.1): dedup + null-filter the
  * three inputs, 3-way equi-join, derive line_total / profit and
  * year/month/day partition columns.
  *
  * Operators exercised: S1, P3–P5, P7, P10, J1, F1, F3, F10.
  *
  * Scale notes (100 TB): the items→orders join shuffles both sides on
  * order_id (co-partitioned with the upstream dedup shuffle, so AQE
  * reuses the exchange); products is dimension-sized relative to the
  * fact and is left to AQE/broadcast-threshold to broadcast — no
  * hand-scheduling. Filters are pushed into the parquet scans by
  * Catalyst (verified via explain in SalesRevenueSpec).
  */
object SalesRevenue {

  /** orders cleaned per 01:53-55. */
  def cleanOrders(orders: DataFrame): DataFrame =
    Cleaning.requireNonNull(
      Cleaning.dedupByKey(orders, "order_id"), "order_id", "order_date")

  /** order_items cleaned per 01:57-61. */
  def cleanItems(items: DataFrame): DataFrame =
    Cleaning.requireNonNull(items, "order_id", "product_id")
      .filter(col("quantity") > 0)

  /** products cleaned per 01:63-64. */
  def cleanProducts(products: DataFrame): DataFrame =
    Cleaning.requireNonNull(
      Cleaning.dedupByKey(products, "product_id"), "product_id")

  /** Full pipeline 01:70-89. */
  def run(orders: DataFrame, items: DataFrame, products: DataFrame): DataFrame =
    cleanItems(items)
      .join(cleanOrders(orders), Seq("order_id"), "inner")
      .join(cleanProducts(products), Seq("product_id"), "inner")
      .withColumn("line_total", Metrics.lineTotal(col("quantity"), col("unit_price")))
      .withColumn("profit", Metrics.profit(col("line_total"), col("margin_percentage")))
      .withColumn("year", year(col("order_date")))
      .withColumn("month", month(col("order_date")))
      .withColumn("day", dayofmonth(col("order_date")))
      .select("order_id", "line_number", "product_id", "supplier_id",
        "category", "customer_id", "quantity", "unit_price", "line_total",
        "profit", "year", "month", "day")
}
