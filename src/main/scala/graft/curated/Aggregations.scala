package graft.curated

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.Metrics

/** The six curated aggregation tables (SURVEY §2.10). Five have no
  * producing code in the reference — their schemas are back-derived
  * from the Athena SELECT lists; `curated_area_feedback_metrics` is the
  * one the reference actually writes (03:132-141, built in
  * CustomerFeedback.areaMetrics).
  *
  * Determinism policy (SURVEY §7.4.7): sums over non-exact doubles are
  * quantized first — `round(x·10^n)` (scale-0 round, which is
  * cross-engine consistent) cast to long, summed exactly, then divided
  * by 10^n. Sums of ints and of quarter-granular synthetic money are
  * exact as-is. Averages are expressed as exact-sum / count.
  *
  * Scale notes: every aggregation here is a hash aggregate with
  * map-side partial aggregation on a low-cardinality key — the
  * cheapest distributed shape. `countDistinct` is exact for oracle
  * parity; the 100 TB variant is `approx_count_distinct` (exposed as
  * [[revenueByCategoryApprox]]).
  */
object Aggregations {

  /** Exact distributed sum of a ~2-decimal money column: quantize to
    * cents (scale-0 round is bit-identical across engines), sum longs
    * (order-independent), un-scale. */
  private def centSum(c: Column): Column =
    sum(round(c * 100).cast("long")) / 100.0

  /** Order-independent quantized mean (basis-point granularity). */
  private def quantAvg(c: Column): Column =
    sum(round(c * 10000).cast("long")) / 10000.0 / count(lit(1))

  /** curated_revenue_by_category (customer_metrics.sql:2-12,
    * inventory_and_revenue.sql:9-11) over sales_transactions. */
  def revenueByCategory(sales: DataFrame): DataFrame =
    sales.groupBy("category").agg(
        countDistinct(col("order_id")).as("total_orders"),
        countDistinct(col("customer_id")).as("unique_customers"),
        centSum(col("line_total")).as("total_revenue"),
        centSum(col("profit")).as("total_profit"))
      .withColumn("avg_order_value", col("total_revenue") / col("total_orders"))
      .orderBy("category")

  /** 100 TB variant: HLL-sketched distinct counts (not oracle-checked —
    * approximate by construction). */
  def revenueByCategoryApprox(sales: DataFrame): DataFrame =
    sales.groupBy("category").agg(
        approx_count_distinct(col("order_id")).as("total_orders"),
        approx_count_distinct(col("customer_id")).as("unique_customers"),
        centSum(col("line_total")).as("total_revenue"),
        centSum(col("profit")).as("total_profit"))
      .withColumn("avg_order_value", col("total_revenue") / col("total_orders"))
      .orderBy("category")

  /** Relational bounds audit for [[revenueByCategoryApprox]] — the
    * oracle-checkable face of an approximate operator. The HLL sketch
    * value itself can never hash-match a DuckDB oracle, so the audit
    * outputs the EXACT counts plus within-bound FLAGS: the approx
    * count must sit inside a 4-sigma band (rsd 0.05 ⇒ 20%, matching
    * ApproxBoundsSpec) with an absolute slack of 3 for tiny groups
    * (HLL is exact in sparse mode, so the slack is never exercised at
    * fixture scale), and the non-sketched money columns must be
    * bit-identical to the exact aggregation's. The oracle asserts the
    * contract by emitting literal 1s — if the sketch ever drifts past
    * its bound, the Spark side emits 0 and the hash compare fails
    * loudly. Flags are deterministic because HLL++ is a deterministic,
    * order-independent function of the value set. */
  def revenueByCategoryApproxAudit(sales: DataFrame): DataFrame = {
    val exact = revenueByCategory(sales)
      .selectExpr("category", "total_orders", "unique_customers",
        "total_revenue", "total_profit")
    val approx = revenueByCategoryApprox(sales)
      .selectExpr("category", "total_orders AS approx_orders",
        "unique_customers AS approx_customers",
        "total_revenue AS approx_revenue", "total_profit AS approx_profit")
    exact.join(approx, Seq("category"))
      .selectExpr("category", "total_orders", "unique_customers",
        "CAST(abs(approx_orders - total_orders) <= " +
          "greatest(CAST(3 AS BIGINT), CAST(ceil(0.2 * total_orders) AS BIGINT)) AS INT) AS orders_within_bound",
        "CAST(abs(approx_customers - unique_customers) <= " +
          "greatest(CAST(3 AS BIGINT), CAST(ceil(0.2 * unique_customers) AS BIGINT)) AS INT) AS customers_within_bound",
        "CAST(approx_revenue = total_revenue AND approx_profit = total_profit AS INT) AS exact_columns_match")
      .orderBy("category")
  }

  /** curated_campaign_performance_summary (campaign_roi.sql:3-14) over
    * marketing_performance. */
  def campaignPerformanceSummary(mktg: DataFrame): DataFrame =
    mktg.groupBy("campaign_id", "campaign_name", "channel").agg(
        sum(col("spend")).as("total_spend"),
        sum(col("revenue_generated")).as("total_revenue"),
        sum(col("conversions")).as("total_conversions"),
        quantAvg(col("ctr")).as("avg_ctr"),
        quantAvg(col("conversion_rate")).as("avg_conversion_rate"),
        quantAvg(col("roas")).as("avg_roas"))
      .withColumn("overall_roi", when(col("total_spend") > 0,
        (col("total_revenue") - col("total_spend")) * 100.0 / col("total_spend"))
        .otherwise(0.0))
      .orderBy("campaign_id", "channel")

  /** curated_delivery_partner_performance (delivery_partner.sql:3-15)
    * over the reconstructed delivery pipeline. */
  def deliveryPartnerPerformance(deliveries: DataFrame): DataFrame =
    deliveries.groupBy("delivery_partner_id").agg(
        count(lit(1)).as("total_deliveries"),
        sum(col("is_delayed")).as("delayed_deliveries"),
        (sum(col("delivery_minutes")) / 60.0 / count(lit(1)))
          .as("avg_delivery_time_hours"),
        avg(col("distance_km")).as("avg_distance_km"))
      .withColumn("delay_percentage",
        col("delayed_deliveries") / col("total_deliveries") * 100)
      .orderBy("delivery_partner_id")

  /** curated_category_inventory_impact (inventory_and_revenue.sql:3-13)
    * over inventory_reconciliation. */
  def categoryInventoryImpact(recon: DataFrame): DataFrame =
    recon.groupBy("category").agg(
        centSum(col("financial_impact")).as("total_impact"),
        countDistinct(when(col("has_discrepancy") === 1, col("product_id")))
          .as("affected_products"),
        avg(col("stock_variance")).as("avg_stock_variance"),
        avg(col("damaged_variance")).as("avg_damaged_variance"))
      .orderBy("category")

  /** curated_product_inventory_discrepancies
    * (inventory_discrepancies.sql:1-14). total_*_variance uses
    * sum(abs(...)) — the documented choice for the reference's
    * ambiguous column (SURVEY §2.10); max_severity via the ordinal
    * ladder, not lexicographic max. */
  def productInventoryDiscrepancies(recon: DataFrame): DataFrame =
    recon.groupBy("product_id", "product_name", "category").agg(
        sum(col("has_discrepancy")).as("discrepancy_occurrences"),
        sum(abs(col("stock_variance"))).as("total_stock_variance"),
        sum(abs(col("damaged_variance"))).as("total_damaged_variance"),
        centSum(col("financial_impact")).as("total_impact"),
        Metrics.severityFromOrdinal(
          max(Metrics.severityOrdinal(col("severity")))).as("max_severity"))
      .orderBy("product_id")
}
