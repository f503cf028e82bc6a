package graft

import org.apache.spark.sql.functions._
import graft.pipelines._

/** Pipelines must be total on empty inputs (a real condition at scale:
  * an empty partition, a filter that drops everything, a new tenant). */
class EmptyInputSpec extends SparkSpec {
  import spark.implicits._

  private val noOrders = Seq.empty[(String, String, String)]
    .toDF("order_id", "customer_id", "order_date")
    .withColumn("order_date", to_timestamp(col("order_date")))
  private val noItems = Seq.empty[(String, String, String, Int, Double, Double)]
    .toDF("order_id", "product_id", "supplier_id", "line_number", "quantity", "unit_price")
  private val noProducts = Seq.empty[(String, String, String, Double, Double)]
    .toDF("product_id", "product_name", "category", "price", "margin_percentage")

  test("sales pipeline on empty inputs yields an empty, well-typed frame") {
    val out = SalesRevenue.run(noOrders, noItems, noProducts)
    assert(out.count() == 0)
    assert(out.columns.contains("line_total"))
  }

  test("marketing pipeline on empty input") {
    val empty = Seq.empty[(Long, Long, String, String, String, Int, Int, Int, Double, Double)]
      .toDF("event_id", "campaign_id", "campaign_name", "channel", "date",
        "impressions", "clicks", "conversions", "spend", "revenue_generated")
      .withColumn("date", to_timestamp(col("date")))
    assert(MarketingRoi.run(empty).count() == 0)
  }

  test("area metrics on empty enrichment") {
    val empty = Seq.empty[(String, String, Int, String, Int)]
      .toDF("feedback_id", "area", "rating", "sentiment_normalized", "sentiment_score")
    assert(CustomerFeedback.areaMetrics(empty).count() == 0)
  }
}
