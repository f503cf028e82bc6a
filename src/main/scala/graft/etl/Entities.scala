package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables

/** Maps the driver fixture tables (TPC-H-ish, TESTDATA.md) onto the
  * reference's Blinkit entity schemas (FIXTURES.md §A, reconstructed in
  * SURVEY.md §1.4 from /root/reference usage).
  *
  * Every derivation here is deterministic integer / exact-binary
  * arithmetic so the DuckDB oracle can reproduce it bit-for-bit:
  *   - money-like synthesized columns use /4.0 (quarter granularity —
  *     exact in IEEE-754, so SUMs are order-independent),
  *   - categorical columns come from CASE over existing columns,
  *   - synthetic keys use modular arithmetic on int64 keys.
  */
object Entities {

  /** orders entity (reference: s3://raw/orders — 01:35-38, 03:46-49).
    * Delivery columns back-derived from delivery_partner.sql:4-9; the
    * reference's producing ETL is lost (SURVEY §0.1.1), so promised =
    * order_date + 24h and delivered = promised + jitter(-360..+1079 min)
    * is our documented reconstruction.
    */
  def orders(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir).select(
      col("o_orderkey").as("order_id"),
      col("o_custkey").as("customer_id"),
      col("o_orderdate").as("order_date"),
      col("o_orderstatus").as("delivery_status"),
      (col("o_orderkey") % 50).as("delivery_partner_id"),
      timestamp_seconds(unix_timestamp(col("o_orderdate")) + 1440L * 60)
        .as("promised_time"),
      timestamp_seconds(unix_timestamp(col("o_orderdate"))
        + (lit(1080L) + col("o_orderkey") % 1440) * 60).as("delivered_time"),
      ((col("o_orderkey") % 30) / 4.0 + 1.5).as("distance_km"))

  /** order_items entity (reference: s3://raw/order-items — 01:40-43).
    * supplier_id is carried because (order_id, line_number) alone is
    * NOT unique in the fixture — deterministic output ordering needs
    * the full tuple (..., product_id, supplier_id, quantity,
    * unit_price). */
  def orderItems(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir).select(
      col("l_orderkey").as("order_id"),
      col("l_partkey").as("product_id"),
      col("l_suppkey").as("supplier_id"),
      col("l_linenumber").as("line_number"),
      col("l_quantity").as("quantity"),
      (col("l_extendedprice") / col("l_quantity")).as("unit_price"))

  /** products entity (reference: s3://raw/products — 01:45-48, 05:47-50).
    * margin_percentage synthesized (10..39, int-exact). */
  def products(spark: SparkSession, sfDir: String): DataFrame =
    Tables.part(spark, sfDir).select(
      col("p_partkey").as("product_id"),
      col("p_name").as("product_name"),
      col("p_type").as("category"),
      col("p_retailprice").as("price"),
      (lit(10.0) + col("p_partkey") % 30).as("margin_percentage"))

  /** customers entity (reference: s3://raw/customers — 03:41-44). */
  def customers(spark: SparkSession, sfDir: String): DataFrame =
    Tables.customer(spark, sfDir).select(
      col("c_custkey").as("customer_id"),
      col("c_mktsegment").as("area"),
      when(col("c_acctbal") < 0, "at_risk")
        .when(col("c_acctbal") < 5000, "standard")
        .otherwise("premium").as("customer_segment"))

  /** feedback entity (reference: s3://raw/feedback — 03:36-39).
    * sentiment free-text comes from event_type; 'error' maps to a word
    * outside the 03:83-87 keyword lists to exercise the "Unknown" path.
    * Mixed case exercises the lower() normalization.
    */
  def feedback(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir).select(
      col("event_id").as("feedback_id"),
      col("event_id").as("order_id"),
      col("user_id").as("customer_id"),
      col("ts").as("feedback_date"),
      (lit(1) + (col("event_id") % 5)).cast("int").as("rating"),
      when(col("event_type") === "purchase", "Excellent")
        .when(col("event_type") === "click", "good")
        .when(col("event_type") === "signup", "POSITIVE")
        .when(col("event_type") === "view", "okay")
        .otherwise("broken").as("sentiment"))

  /** marketing entity (reference: s3://raw/marketing — 04:34-37).
    * spend / revenue at quarter granularity => exact-binary doubles. */
  def marketing(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir).select(
      col("event_id"),
      (col("user_id") % 20).as("campaign_id"),
      concat(lit("campaign_"), (col("user_id") % 20)).as("campaign_name"),
      col("event_type").as("channel"),
      date_trunc("DAY", col("ts")).as("date"),
      (lit(100) + (col("event_id") % 900)).cast("int").as("impressions"),
      (col("event_id") % 120).cast("int").as("clicks"),
      (col("event_id") % 7).cast("int").as("conversions"),
      ((col("event_id") % 1000) / 4.0).as("spend"),
      ((col("event_id") % 3000) / 4.0).as("revenue_generated"))

  /** inventory entity, old generation (reference: s3://raw/inventory
    * minus `inventoryNew` files — 05:33-41). Split is a filter fork of
    * one scan in the reference; here the fork key is l_linestatus. */
  def inventoryOld(spark: SparkSession, sfDir: String): DataFrame =
    inventoryGen(spark, sfDir, "F")

  /** inventory entity, new generation (`inventoryNew` files — 05:43-45). */
  def inventoryNew(spark: SparkSession, sfDir: String): DataFrame =
    inventoryGen(spark, sfDir, "O")

  private def inventoryGen(spark: SparkSession, sfDir: String, status: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .filter(col("l_linestatus") === status)
      .select(
        col("l_partkey").as("product_id"),
        to_date(col("l_shipdate")).as("date"),
        col("l_orderkey").as("src_order"),
        col("l_linenumber").as("src_line"),
        col("l_quantity").cast("int").as("stock_received"),
        round(col("l_tax") * 100, 0).cast("int").as("damaged_stock"))
}
