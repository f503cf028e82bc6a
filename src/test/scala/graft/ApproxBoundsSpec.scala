package graft

import graft.curated.Aggregations
import graft.etl.Entities
import graft.pipelines.SalesRevenue

/** Verification story for the one query with no DuckDB oracle:
  * `curated_revenue_by_category_approx` is approximate by construction
  * (HLL sketches), so instead of a hash match we bound it against the
  * exact variant. Spark's `approx_count_distinct` defaults to
  * rsd = 0.05 (5% relative standard deviation); the HLL++ error is
  * tightly concentrated, so a 4-sigma band (20%) per category is a
  * conservative, non-flaky bound — and every non-sketched column must
  * still be bit-identical to the exact query's.
  */
class ApproxBoundsSpec extends SparkSpec {

  private def salesDf = SalesRevenue.run(
    Entities.orders(spark, sfTiny), Entities.orderItems(spark, sfTiny),
    Entities.products(spark, sfTiny))

  test("approx distinct counts are within HLL error of exact counts") {
    val sales = salesDf
    val exact = Aggregations.revenueByCategory(sales).collect()
      .map(r => r.getString(0) -> r).toMap
    val approx = Aggregations.revenueByCategoryApprox(sales).collect()

    assert(approx.length == exact.size, "same category set")
    val rsd = 0.05 // Spark default for approx_count_distinct
    approx.foreach { a =>
      val cat = a.getString(0)
      val e = exact(cat)
      for ((col, i) <- Seq("total_orders" -> 1, "unique_customers" -> 2)) {
        val ev = e.getLong(i).toDouble
        val av = a.getLong(i).toDouble
        val relErr = math.abs(av - ev) / math.max(ev, 1.0)
        assert(relErr <= 4 * rsd,
          s"$cat.$col: approx=$av exact=$ev relErr=$relErr > ${4 * rsd}")
      }
      // Non-sketched columns are computed identically — must be exact.
      assert(a.getDouble(3) == e.getDouble(3), s"$cat.total_revenue drifted")
      assert(a.getDouble(4) == e.getDouble(4), s"$cat.total_profit drifted")
    }
  }
}
