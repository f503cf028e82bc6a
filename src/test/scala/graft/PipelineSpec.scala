package graft

import org.apache.spark.sql.functions._
import graft.pipelines._

/** Golden pipeline tests on tiny literal frames shaped like the
  * reference's raw entities (SURVEY §5.3). */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("sales pipeline: dedup, null/quantity filters, 3-way join, metrics") {
    val orders = Seq(
      ("o1", "c1", "2024-03-05 10:00:00"),
      ("o1", "c1", "2024-03-05 10:00:00"), // dup order_id
      ("o2", "c2", null),                  // null order_date → dropped
      (null, "c3", "2024-03-06 11:00:00")) // null order_id → dropped
      .toDF("order_id", "customer_id", "order_date")
      .withColumn("order_date", to_timestamp(col("order_date")))
    val items = Seq(
      ("o1", "p1", "s1", 1, 2.0, 4.0), ("o1", "p2", "s1", 2, 0.0, 3.0), // qty 0 → dropped
      ("o1", null, "s1", 3, 2.0, 1.0), ("o2", "p1", "s2", 4, 5.0, 2.0)) // null pid dropped; o2 dropped via join
      .toDF("order_id", "product_id", "supplier_id", "line_number", "quantity", "unit_price")
    val products = Seq(("p1", "Widget", "CAT", 9.99, 20.0), ("p2", "Gadget", "CAT", 5.0, 10.0))
      .toDF("product_id", "product_name", "category", "price", "margin_percentage")

    val out = SalesRevenue.run(orders, items, products)
    val rows = out.select("order_id", "product_id", "quantity", "line_total",
      "profit", "year", "month", "day")
      .as[(String, String, Double, Double, Double, Int, Int, Int)]
      .collect().toSeq
    assert(rows == Seq(("o1", "p1", 2.0, 8.0, 8.0 * 20.0 / 100.0, 2024, 3, 5)))
  }

  test("feedback pipeline: icon join, normalizer, enrichment left joins") {
    val feedback = Seq(
      ("f1", "o1", "c1", "2024-02-01 09:00:00", 5, "EXCELLENT"),
      ("f2", "o9", "c9", "2024-02-02 10:00:00", 1, "garbage"),
      ("f2", "o9", "c9", "2024-02-02 10:00:00", 1, "garbage")) // dup feedback_id
      .toDF("feedback_id", "order_id", "customer_id", "feedback_date", "rating", "sentiment")
      .withColumn("feedback_date", to_timestamp(col("feedback_date")))
    val customers = Seq(("c1", "North", "premium"))
      .toDF("customer_id", "area", "customer_segment")
    val orders = Seq(("o1", "Delivered")).toDF("order_id", "delivery_status")
    val out = CustomerFeedback.enrich(feedback, customers, orders,
      CustomerFeedback.ratingIcons(spark)).orderBy("feedback_id")
    assert(out.count() == 2)
    val r1 = out.filter(col("feedback_id") === "f1").first()
    assert(r1.getAs[String]("rating_icon") == "⭐⭐⭐⭐⭐")
    assert(r1.getAs[String]("sentiment_normalized") == "Positive")
    assert(r1.getAs[Int]("sentiment_score") == 1)
    assert(r1.getAs[String]("area") == "North")
    assert(r1.getAs[String]("delivery_status") == "Delivered")
    val r2 = out.filter(col("feedback_id") === "f2").first()
    assert(r2.getAs[String]("sentiment_normalized") == "Unknown")
    assert(r2.isNullAt(r2.fieldIndex("area"))) // unmatched left joins → null
    assert(r2.isNullAt(r2.fieldIndex("delivery_status")))
  }

  test("area metrics: counts, conditional sums, satisfaction rate") {
    val enriched = Seq(
      ("f1", "North", 5, "Positive", 1), ("f2", "North", 1, "Negative", -1),
      ("f3", "North", 4, "Positive", 1), ("f4", "South", 3, "Neutral", 0))
      .toDF("feedback_id", "area", "rating", "sentiment_normalized", "sentiment_score")
    val m = CustomerFeedback.areaMetrics(enriched)
    val north = m.filter(col("area") === "North").first()
    assert(north.getAs[Long]("total_feedback") == 3)
    assert(north.getAs[Long]("positive_count") == 2)
    assert(north.getAs[Long]("negative_count") == 1)
    assert(math.abs(north.getAs[Double]("satisfaction_rate") - 200.0 / 3) < 1e-12)
    assert(m.select("area").as[String].collect().head == "North") // orderBy avg_rating desc
  }

  test("marketing pipeline: composite dedup keeps min event_id; guarded metrics") {
    val mkt = Seq(
      (10L, 1L, "campaign_1", "email", "2024-01-01 00:00:00", 200, 20, 4, 50.0, 150.0),
      (7L, 1L, "campaign_1", "email", "2024-01-01 00:00:00", 100, 10, 2, 25.0, 100.0), // survivor (min event_id)
      (8L, 1L, "campaign_1", "email", "2024-01-02 00:00:00", 0, 0, 0, 0.0, 0.0))
      .toDF("event_id", "campaign_id", "campaign_name", "channel", "date",
        "impressions", "clicks", "conversions", "spend", "revenue_generated")
      .withColumn("date", to_timestamp(col("date")))
    val out = MarketingRoi.run(mkt).orderBy("campaign_id", "date").collect()
    assert(out.length == 2)
    val d1 = out(0)
    assert(d1.getAs[Long]("event_id") == 7L)
    assert(d1.getAs[Double]("ctr") == 10.0)
    assert(d1.getAs[Double]("conversion_rate") == 20.0)
    assert(d1.getAs[Double]("roas") == 4.0)
    assert(d1.getAs[Double]("roi_pct") == 300.0)
    val d2 = out(1) // all-zero row: every guarded ratio collapses to 0
    Seq("ctr", "conversion_rate", "cpc", "cpa", "roas", "roi_pct",
      "effectiveness_score").foreach(c => assert(d2.getAs[Double](c) == 0.0, c))
  }

  test("delivery pipeline: minutes, hours, delayed flag from timestamps") {
    val orders = Seq(
      ("o1", "2024-01-01 00:00:00", "dp1", "2024-01-02 00:00:00", "2024-01-02 06:00:00", 4.5, "Delivered"),
      ("o2", "2024-01-01 00:00:00", "dp1", "2024-01-02 00:00:00", "2024-01-01 20:00:00", 2.0, "Delivered"))
      .toDF("order_id", "order_date", "delivery_partner_id", "promised_time",
        "delivered_time", "distance_km", "delivery_status")
      .withColumn("order_date", to_timestamp(col("order_date")))
      .withColumn("promised_time", to_timestamp(col("promised_time")))
      .withColumn("delivered_time", to_timestamp(col("delivered_time")))
    val out = DeliveryPerformance.run(orders)
      .select("order_id", "delivery_minutes", "delivery_hours", "is_delayed")
      .as[(String, Long, Double, Int)].collect().toSeq.sortBy(_._1)
    assert(out == Seq(("o1", 1800L, 30.0, 1), ("o2", 1200L, 20.0, 0)))
  }
}
