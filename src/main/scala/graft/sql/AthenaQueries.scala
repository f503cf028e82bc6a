package graft.sql

/** The six analytical queries (reference `athena-queries` SQL files,
  * SURVEY §2.11), normalized to a dialect common to Spark SQL and
  * DuckDB so one text serves both the engine and the oracle:
  *   - `::float` (customer_satisfaction.sql:11, non-Athena syntax per
  *     SURVEY §0.1.4) → CAST(... AS DOUBLE);
  *   - the §0.1.3 double-scaling bug is fixed: satisfaction_rate is
  *     already a percentage in the curated table and is NOT
  *     re-multiplied by 100 here (documented deviation);
  *   - ROUND(x, 2) → round(x * 100) / 100: scale-0 round is
  *     bit-identical across engines for every double, while scale-2
  *     differs at non-representable half boundaries;
  *   - a full-key tie-break is appended to every ORDER BY, and the
  *     projection is wrapped in a subquery so the sort key resolves
  *     unambiguously to the rounded output column in both engines
  *     (alias-vs-base-column resolution differs across dialects).
  */
object AthenaQueries {

  /** campaign_roi.sql — rank campaigns by overall ROI. */
  val campaignRoi: String =
    """SELECT * FROM (
         SELECT campaign_id, campaign_name, channel,
           round(total_spend * 100) / 100 AS total_spend,
           round(total_revenue * 100) / 100 AS total_revenue,
           total_conversions,
           round(avg_ctr * 100) / 100 AS avg_ctr,
           round(avg_conversion_rate * 100) / 100 AS avg_conversion_rate,
           round(overall_roi * 100) / 100 AS overall_roi,
           round(avg_roas * 100) / 100 AS avg_roas
         FROM curated_campaign_performance_summary
       ) t ORDER BY overall_roi DESC, campaign_id, channel"""

  /** campaign_roi.sql in faithful-compat form: the reference's own
    * column aliases and rounding scales — scale 4 for ctr/conversion
    * rate (campaign_roi.sql:10-11; small rates ~0.0x lose real
    * precision at the main variant's uniform scale 2), scale 2
    * elsewhere — and its ORDER BY on the UNROUNDED `overall_roi` base
    * column (the main variant sorts on the rounded output). Rounding
    * still uses the scale-0 normalization (round(x·10^s)/10^s):
    * scale-0 round is bit-identical across engines and the subsequent
    * division by a power of ten is one IEEE op on identical inputs, so
    * scale-4 stays hash-exact — no tolerance spec needed. A full-key
    * tie-break is appended; the reference's bare `overall_roi DESC` is
    * non-deterministic on ties (documented deviation). */
  val campaignRoiCompat: String =
    """SELECT campaign_id, campaign_name, channel,
         round(total_spend * 100) / 100 AS spend,
         round(total_revenue * 100) / 100 AS revenue,
         total_conversions,
         round(avg_ctr * 10000) / 10000 AS ctr,
         round(avg_conversion_rate * 10000) / 10000 AS conversion_rate,
         round(overall_roi * 100) / 100 AS roi_percentage,
         round(avg_roas * 100) / 100 AS roas
       FROM curated_campaign_performance_summary
       ORDER BY overall_roi DESC, campaign_id, channel"""

  /** customer_metrics.sql — per-category customer value ratios. */
  val customerMetrics: String =
    """SELECT * FROM (
         SELECT category, total_orders, unique_customers,
           round(total_revenue * 100) / 100 AS total_revenue,
           round(total_profit * 100) / 100 AS total_profit,
           round(avg_order_value * 100) / 100 AS avg_order_value,
           CASE WHEN unique_customers > 0
                THEN round(total_revenue / unique_customers * 100) / 100
                ELSE 0.0 END AS revenue_per_customer,
           CASE WHEN unique_customers > 0
                THEN round(total_orders / CAST(unique_customers AS DOUBLE) * 100) / 100
                ELSE 0.0 END AS orders_per_customer,
           CASE WHEN total_revenue > 0
                THEN round(total_profit / total_revenue * 100 * 100) / 100
                ELSE 0.0 END AS profit_margin_pct
         FROM curated_revenue_by_category
       ) t ORDER BY total_profit DESC, category"""

  /** customer_satisfaction.sql — area satisfaction scorecard
    * (double-scale + ::float bugs normalized, see object doc). */
  val customerSatisfaction: String =
    """SELECT * FROM (
         SELECT area, total_feedback,
           round(avg_rating * 100) / 100 AS avg_rating,
           positive_count, negative_count,
           round(satisfaction_rate * 100) / 100 AS satisfaction_rate,
           round(CAST(positive_count AS DOUBLE) / total_feedback * 100 * 100) / 100
             AS positive_ratio_pct,
           round(avg_sentiment_score * 100) / 100 AS avg_sentiment_score
         FROM curated_area_feedback_metrics
       ) t ORDER BY satisfaction_rate DESC, area"""

  /** customer_satisfaction.sql in faithful-compat form (SURVEY §0.1.3):
    * reproduces the reference's double-scaling bug verbatim —
    * `satisfaction_rate * 100` although the curated column is already a
    * percentage — and its `positive_count::float` cast (normalized to
    * CAST, the one syntax change Athena itself would also need). Kept
    * alongside the corrected [[customerSatisfaction]] so reference
    * users can reproduce historical numbers bit-for-bit. */
  val customerSatisfactionCompat: String =
    """SELECT * FROM (
         SELECT area, total_feedback,
           round(avg_rating * 100) / 100 AS avg_rating,
           positive_count, negative_count,
           round(satisfaction_rate * 100 * 100) / 100 AS satisfaction_rate,
           round(CAST(positive_count AS DOUBLE) / total_feedback * 100 * 100) / 100
             AS positive_ratio_pct,
           round(avg_sentiment_score * 100) / 100 AS avg_sentiment_score
         FROM curated_area_feedback_metrics
       ) t ORDER BY satisfaction_rate DESC, area"""

  /** delivery_partner.sql — partner scorecard + CASE risk tier. */
  val deliveryPartner: String =
    """SELECT * FROM (
         SELECT delivery_partner_id, total_deliveries, delayed_deliveries,
           round(delay_percentage * 100) / 100 AS delay_percentage,
           round(avg_delivery_time_hours * 100) / 100 AS avg_delivery_time_hours,
           round(avg_distance_km * 100) / 100 AS avg_distance_km,
           CASE WHEN delay_percentage > 10 THEN 'High Risk'
                WHEN delay_percentage > 5 THEN 'Medium Risk'
                ELSE 'Low Risk' END AS risk_category
         FROM curated_delivery_partner_performance
       ) t ORDER BY delay_percentage DESC, delivery_partner_id"""

  /** inventory_and_revenue.sql — LEFT JOIN impact vs revenue. */
  val inventoryAndRevenue: String =
    """SELECT * FROM (
         SELECT c.category,
           round(c.total_impact * 100) / 100 AS total_impact,
           c.affected_products,
           round(r.total_revenue * 100) / 100 AS total_revenue,
           CASE WHEN r.total_revenue > 0
                THEN round(c.total_impact / r.total_revenue * 100 * 100) / 100
                ELSE 0.0 END AS impact_pct_of_revenue
         FROM curated_category_inventory_impact c
         LEFT JOIN curated_revenue_by_category r ON c.category = r.category
       ) t ORDER BY total_impact DESC, category"""

  /** inventory_discrepancies.sql — WHERE + top-15 by impact
    * (TakeOrderedAndProject in the physical plan). */
  val inventoryDiscrepancies: String =
    """SELECT * FROM (
         SELECT product_id, product_name, category, discrepancy_occurrences,
           total_stock_variance, total_damaged_variance,
           round(total_impact * 100) / 100 AS total_impact,
           CASE WHEN discrepancy_occurrences > 0
                THEN round(total_impact / discrepancy_occurrences * 100) / 100
                ELSE 0.0 END AS avg_impact_per_occurrence,
           max_severity
         FROM curated_product_inventory_discrepancies
         WHERE total_impact > 0
       ) t ORDER BY total_impact DESC, product_id
       LIMIT 15"""

  val all: Map[String, String] = Map(
    "q_campaign_roi" -> campaignRoi,
    "q_campaign_roi_compat" -> campaignRoiCompat,
    "q_customer_metrics" -> customerMetrics,
    "q_customer_satisfaction" -> customerSatisfaction,
    "q_customer_satisfaction_compat" -> customerSatisfactionCompat,
    "q_delivery_partner" -> deliveryPartner,
    "q_inventory_and_revenue" -> inventoryAndRevenue,
    "q_inventory_discrepancies" -> inventoryDiscrepancies)
}
