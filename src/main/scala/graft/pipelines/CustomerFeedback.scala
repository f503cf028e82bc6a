package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Cleaning, Metrics}

/** Pipeline 03 (reference `03_customer_feedback_etl.py`): dedup/clean
  * feedback, broadcast-join the 5-row rating→icon literal dim (the
  * reference's deliberately relational, non-UDF lookup — 03:54-70,102),
  * normalize free-text sentiment via when/lower/isin chains (03:83-96),
  * enrich with customers/orders, then aggregate per area (03:132-141).
  *
  * Operators: S2, J2, J3, A1–A3, F4–F6, O1.
  *
  * Scale notes: the icon dim is broadcast explicitly (5 rows); customer
  * and order enrichment joins shuffle on their keys — at 100 TB these
  * are the natural sort-merge joins and AQE handles skew. The area
  * aggregation is a map-side-combinable hash aggregate on a
  * low-cardinality key.
  */
object CustomerFeedback {

  /** S2 — the literal in-memory rating→icon lookup (03:54-70).
    * Multi-byte UTF-8 stars exercise unicode round-trip (SURVEY §7.4.6). */
  def ratingIcons(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(1 -> "⭐", 2 -> "⭐⭐", 3 -> "⭐⭐⭐", 4 -> "⭐⭐⭐⭐", 5 -> "⭐⭐⭐⭐⭐")
      .toDF("rating", "rating_icon")
  }

  /** Feedback cleaned per 03:76-78. */
  def cleanFeedback(feedback: DataFrame): DataFrame =
    Cleaning.requireNonNull(
      Cleaning.dedupByKey(feedback, "feedback_id"), "feedback_id", "feedback_date")

  /** Enrichment chain 03:81-113. */
  def enrich(feedback: DataFrame, customers: DataFrame, orders: DataFrame,
             icons: DataFrame): DataFrame =
    cleanFeedback(feedback)
      .join(broadcast(icons), Seq("rating"), "left")
      .withColumn("sentiment_normalized", Metrics.sentimentNormalized(col("sentiment")))
      .withColumn("sentiment_score", Metrics.sentimentScore(col("sentiment_normalized")))
      .join(customers.select("customer_id", "area", "customer_segment"),
        Seq("customer_id"), "left")
      .join(orders.select("order_id", "delivery_status"), Seq("order_id"), "left")
      .withColumn("feedback_day", to_date(col("feedback_date")))
      .withColumn("year", year(col("feedback_date")))
      .withColumn("month", month(col("feedback_date")))
      .select("feedback_id", "order_id", "customer_id", "feedback_day",
        "rating", "rating_icon", "sentiment", "sentiment_normalized",
        "sentiment_score", "area", "customer_segment", "delivery_status",
        "year", "month")

  /** Area aggregation 03:132-141 (curated_area_feedback_metrics).
    * satisfaction_rate is a percentage, faithful to 03:140; the SQL
    * layer does NOT re-scale it (fixes the §0.1.3 double-scaling bug).
    */
  def areaMetrics(enriched: DataFrame): DataFrame =
    enriched.groupBy("area").agg(
        count(col("feedback_id")).as("total_feedback"),
        avg(col("rating")).as("avg_rating"),
        sum(when(col("sentiment_normalized") === "Positive", 1).otherwise(0))
          .as("positive_count"),
        sum(when(col("sentiment_normalized") === "Negative", 1).otherwise(0))
          .as("negative_count"),
        avg(col("sentiment_score")).as("avg_sentiment_score"))
      .withColumn("satisfaction_rate",
        col("positive_count") / col("total_feedback") * 100)
      .orderBy(desc("avg_rating"), asc("area"))
}
