package graft

import graft.etl.Entities
import graft.ops.InputMetrics
import graft.pipelines.DeliveryPerformance

/** observe()-based input metrics: same numbers the reference's eager
  * per-input count() logging produces, but computed inside the
  * pipeline's own action (no extra scan jobs). */
class InputMetricsSpec extends SparkSpec {

  test("observed input yields row count and null-key tally during the pipeline action") {
    val orders = Entities.orders(spark, sfTiny)
    val expectedRows = orders.count()
    val expectedNullKeys =
      orders.filter(orders("order_id").isNull).count()

    val (observedOrders, obs) = InputMetrics.observed(orders, "orders_in", "order_id")
    val out = DeliveryPerformance.run(observedOrders)
    out.write.format("noop").mode("overwrite").save() // one action, full scan

    assert(obs.get("n_rows") == expectedRows)
    assert(obs.get("null_keys") == expectedNullKeys)
  }
}
