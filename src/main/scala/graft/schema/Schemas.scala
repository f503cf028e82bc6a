package graft.schema

import org.apache.spark.sql.types._

/** Explicit StructTypes for the reference's raw entities (FIXTURES.md
  * §A; provenance per column in SURVEY §1.4). The reference infers all
  * CSV schemas (`inferSchema=true`, 01:35-48 etc.), which costs a full
  * pre-scan per read — at 100 TB that alone is disqualifying, so the
  * engine declares schemas and the readers never infer (SURVEY §4.3).
  */
object Schemas {

  val orders: StructType = StructType(Seq(
    StructField("order_id", StringType, nullable = true),
    StructField("customer_id", StringType, nullable = true),
    StructField("order_date", StringType, nullable = true), // parsed via to_timestamp (01:55)
    StructField("delivery_status", StringType, nullable = true),
    StructField("delivery_partner_id", StringType, nullable = true),
    StructField("promised_time", StringType, nullable = true),
    StructField("delivered_time", StringType, nullable = true),
    StructField("distance_km", DoubleType, nullable = true)))

  val orderItems: StructType = StructType(Seq(
    StructField("order_id", StringType, nullable = true),
    StructField("product_id", StringType, nullable = true),
    StructField("quantity", IntegerType, nullable = true),
    StructField("unit_price", DoubleType, nullable = true)))

  val products: StructType = StructType(Seq(
    StructField("product_id", StringType, nullable = true),
    StructField("product_name", StringType, nullable = true),
    StructField("category", StringType, nullable = true),
    StructField("price", DoubleType, nullable = true),
    StructField("margin_percentage", DoubleType, nullable = true)))

  val customers: StructType = StructType(Seq(
    StructField("customer_id", StringType, nullable = true),
    StructField("area", StringType, nullable = true),
    StructField("customer_segment", StringType, nullable = true)))

  val feedback: StructType = StructType(Seq(
    StructField("feedback_id", StringType, nullable = true),
    StructField("order_id", StringType, nullable = true),
    StructField("customer_id", StringType, nullable = true),
    StructField("feedback_date", StringType, nullable = true),
    StructField("rating", IntegerType, nullable = true),
    StructField("sentiment", StringType, nullable = true)))

  val marketing: StructType = StructType(Seq(
    StructField("campaign_id", StringType, nullable = true),
    StructField("campaign_name", StringType, nullable = true),
    StructField("channel", StringType, nullable = true),
    StructField("date", StringType, nullable = true),
    StructField("impressions", IntegerType, nullable = true),
    StructField("clicks", IntegerType, nullable = true),
    StructField("conversions", IntegerType, nullable = true),
    StructField("spend", DoubleType, nullable = true),
    StructField("revenue_generated", DoubleType, nullable = true)))

  val inventory: StructType = StructType(Seq(
    StructField("product_id", StringType, nullable = true),
    StructField("date", StringType, nullable = true), // to_date (05:57,64)
    StructField("stock_received", IntegerType, nullable = true),
    StructField("damaged_stock", IntegerType, nullable = true)))

  /** The one explicit schema the reference itself declares (03:62-66). */
  val ratingIcon: StructType = StructType(Seq(
    StructField("rating", IntegerType, nullable = false),
    StructField("rating_icon", StringType, nullable = false)))
}
