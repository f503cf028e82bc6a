package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.{Cleaning, Metrics}

/** Reconstructed delivery pipeline (SURVEY §0.1.1: the reference's
  * `02_delivery_performance_etl.py` is a byte-copy of 01; the real
  * semantics exist only in `athena-queries/delivery_partner.sql`).
  * Reconstruction assumptions, documented per SURVEY §7.4.1:
  *   - delivery duration is delivered_time − order_date;
  *   - a delivery is delayed iff delivered_time > promised_time;
  *   - distance comes straight off the order record.
  * delivery_minutes is kept as an exact integer so downstream averages
  * are order-independent (sum of longs, then one division).
  */
object DeliveryPerformance {

  def run(orders: DataFrame): DataFrame =
    Cleaning.requireNonNull(
        Cleaning.dedupByKey(orders, "order_id"), "order_id", "order_date")
      .withColumn("delivery_minutes",
        ((unix_timestamp(col("delivered_time")) - unix_timestamp(col("order_date"))) / 60)
          .cast("long"))
      .withColumn("delivery_hours", col("delivery_minutes") / 60.0)
      .withColumn("is_delayed",
        Metrics.isDelayed(col("delivered_time"), col("promised_time")))
      .withColumn("year", year(col("order_date")))
      .withColumn("month", month(col("order_date")))
      .select("order_id", "delivery_partner_id", "delivery_status",
        "delivery_minutes", "delivery_hours", "is_delayed", "distance_km",
        "year", "month")
}
